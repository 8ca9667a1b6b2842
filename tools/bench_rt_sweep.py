"""Sweep the rt-kernel tuning knobs on the refl=1 @1080p map scene.

RT_CELL / RT_BH / RT_BW are import-time env knobs (ops/rt_kernel.py);
one config per invocation. Prints a JSON line with the chained frame
time for the current knob values.

Usage: RUSTERIX_TPU_RT_CELL=32 timeout 590 python tools/bench_rt_sweep.py
"""

import json
import os
import sys
import time


def main():
    sys.path.insert(0, ".")
    import jax

    import bench
    from rusterix_tpu.ops import rt_kernel

    w, h = 1920, 1080
    rast, scene, assets = bench.build_map_refl_scene(w, h)
    t0 = time.perf_counter()
    frame = rast.rasterize(scene, w, h, 40, assets, readback=False)
    jax.block_until_ready(frame)
    compile_s = time.perf_counter() - t0
    dt = bench.measure_chained(rast, scene, assets, w, h, n=50)
    print(json.dumps({
        "cell": rt_kernel.RT_CELL,
        "bh": rt_kernel.RT_BH,
        "bw": rt_kernel.RT_BW,
        "compile_s": round(compile_s, 1),
        "fps": round(1.0 / dt, 1),
        "ms": round(dt * 1000, 2),
    }))


if __name__ == "__main__":
    main()
