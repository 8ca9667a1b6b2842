"""A/B the huge-scene megakernel gate paths on the SAME scene.

A = tmask_hbm (per-tile gate lists DMA'd from HBM — megakernel.py
_TMASK_HBM_SMEM_LIMIT), B = the pre-round-5 sbox-only scalar skip-ahead
(forced by zeroing the limit). Quantifies VERDICT r4 item 6.

Usage: timeout 1750 python tools/bench_huge_ab.py [n_boxes]
"""

import json
import sys
import time

import numpy as np


def run(limit, n_boxes, width=1920, height=1080):
    import jax

    import bench
    import rusterix_tpu.ops.megakernel as mk
    from bench_huge import build_huge_scene
    from rusterix_tpu.ops.raster import Rasterizer

    mk._TMASK_HBM_SMEM_LIMIT = limit
    scene, cam, assets = build_huge_scene(n_boxes)
    rast = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(width, height)
    ).ambient([0.3, 0.3, 0.35, 1.0])
    rast.sun_dir = np.array([0.4, -1.0, 0.25], np.float32)
    rast.day_factor = 1.0
    t0 = time.perf_counter()
    frame = rast.rasterize(scene, width, height, 40, assets, readback=False)
    jax.block_until_ready(frame)
    compile_s = time.perf_counter() - t0
    dt = bench.measure_chained(rast, scene, assets, width, height, n=50)
    return {
        "compile_s": round(compile_s, 1),
        "fps": round(1.0 / dt, 1),
        "ms": round(dt * 1000, 2),
    }


def main():
    n_boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 10600
    sys.path.insert(0, ".")
    sys.path.insert(0, "tools")
    import rusterix_tpu.ops.megakernel as mk

    out = {}
    out["tmask_hbm"] = run(mk._TMASK_HBM_SMEM_LIMIT, n_boxes)
    # fresh process state not needed: zeroing the limit changes the static
    # trace key (use_tmask_hbm), so both variants compile independently
    from rusterix_tpu.ops import raster

    raster.render_frame.clear_cache()
    mk.mega_render.clear_cache()
    out["sbox_skip_ahead"] = run(0, n_boxes)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
