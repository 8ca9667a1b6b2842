"""Huge-scene benchmark: ~128K triangle slots through the megakernel.

Measures the scale story past the _CBOX_SMEM_LIMIT cliff (megakernel.py:84
— the prefetched chunk-box SMEM gate costs 4*t2 bytes and compile-OOMs past
~64K slots). Huge scenes now keep full per-tile gating via tmask_hbm
(megakernel.py _TMASK_HBM_SMEM_LIMIT: each tile DMAs its own two (ns,)
gate rows from HBM into SMEM scratch — no whole-table SMEM prefetch), on
top of HBM-DMA table streaming; tools/bench_huge_ab.py A/Bs the two gate
paths on the same scene. First-compile wall time and steady-state chained
fps recorded in CLAUDE.md / BENCH notes (VERDICT r4 item 8). Matches the
reference's chunked streaming intent (src/scenemanager.rs:272-285).

Usage: timeout 1750 python tools/bench_huge.py [n_boxes] [width height]
"""

import sys
import time

import numpy as np


def build_huge_scene(n_boxes=10600, seed=3):
    """n_boxes random boxes (12 tris each) over a 200x200 field -> ~128K
    candidate slots after the pack's next_pow2 padding."""
    sys.path.insert(0, ".")
    from rusterix_tpu import (
        Assets, Batch3D, D3FirstPCamera, Light, LightType, PixelSource, Scene,
    )
    from rusterix_tpu.ops.raster import Rasterizer

    rng = np.random.default_rng(seed)
    batches = []
    # one batch of many boxes keeps the host pack fast; colors per box ride
    # a handful of pixel sources
    colors = [(200, 140, 90, 255), (90, 160, 200, 255), (140, 200, 120, 255)]
    per = n_boxes // len(colors)
    for ci, col in enumerate(colors):
        verts, tris, uvs = [], [], []
        for b in range(per):
            x, z = rng.uniform(-100, 100, 2)
            y = 0.0
            w, h, d = rng.uniform(0.5, 3.0, 3)
            base = len(verts)
            bx = Batch3D.from_box(x, y, z, w, h, d)
            verts.extend(bx.vertices.tolist())
            tris.extend((bx.indices + base).tolist())
            uvs.extend(bx.uvs.tolist())
        batch = Batch3D.new(
            np.asarray(verts, np.float32),
            np.asarray(tris, np.int32),
            np.asarray(uvs, np.float32),
        ).set_source(PixelSource.pixel(col))
        batches.append(batch.with_computed_normals())

    scene = Scene.from_static([], batches)
    scene.set_lights(
        [Light(LightType.Point).with_position([0.0, 8.0, 0.0])
         .with_intensity(2.0).compile()]
    )
    cam = D3FirstPCamera()
    cam.set_parameter_vec3("position", [0.0, 12.0, 60.0])
    cam.set_parameter_vec3("center", [0.0, 0.0, 0.0])
    return scene, cam, Assets.default()


def main():
    n_boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 10600
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1080

    import jax

    sys.path.insert(0, ".")
    import bench
    from rusterix_tpu.ops.raster import Rasterizer

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

    from rusterix_tpu.ops.scene_pack import PackedScene

    packed = rast._scene_cache["packed"]
    slots = packed.d3.pos.shape[0]
    live = int((packed.d3.valid > 0.5).sum())

    dt = bench.measure_chained(rast, scene, assets, width, height, n=50)
    import json

    print(json.dumps({
        "metric": f"huge_map_{width}x{height}_fps",
        "slots": slots,
        "live_tris": live,
        "first_compile_s": round(compile_s, 1),
        "fps": round(1.0 / dt, 1),
        "ms_per_frame": round(dt * 1000, 2),
    }))


if __name__ == "__main__":
    main()
