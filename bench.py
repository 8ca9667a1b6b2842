#!/usr/bin/env python
"""Benchmark driver: rasterize_cube config (reference
benches/rasterize_cube.rs / BASELINE.json) on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares achieved Mpixels/s against the driver north-star
requirement (≥60 fps at 1920x1080 = 124.4 Mpx/s on one chip, BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_cube_scene(width, height):
    from rusterix_tpu import (
        Assets,
        Batch2D,
        Batch3D,
        CullMode,
        D3OrbitCamera,
        PixelSource,
        Scene,
        Texture,
        Tile,
        VGrayGradientShader,
    )
    from rusterix_tpu.ops.raster import Rasterizer

    # scene per benches/rasterize_cube.rs:7-12 (+ a texture source so the
    # sampling path is exercised, as in examples/cube.rs:31)
    scene = Scene.from_static(
        [Batch2D.from_rectangle(0.0, 0.0, 200.0, 200.0)],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1.0, 1.0, 1.0)
            .set_cull_mode(CullMode.Off)
            .set_source(PixelSource.static_tile_index(0))
        ],
    ).set_background(VGrayGradientShader())
    assets = Assets.default().with_textures(
        [Tile.from_texture(Texture.checkerboard(128, 16))]
    )
    camera = D3OrbitCamera()
    rast = Rasterizer.setup(
        None, camera.view_matrix(), camera.projection_matrix(width, height)
    )
    return rast, scene, assets


def main():
    import jax
    import jax.numpy as jnp

    from rusterix_tpu.ops.raster import render_frame
    from rusterix_tpu.ops.scene_pack import PackedScene

    width, height = 800, 600
    rast, scene, assets = build_cube_scene(width, height)

    # full API warmup (validates the end-to-end path incl. packing)
    frame = rast.rasterize(scene, width, height, 40, assets)
    assert frame.shape == (height, width, 4)

    # Steady-state measurement: per-frame device render with a data
    # dependency chaining frames so async dispatch can't hide compute.
    # (Host readback over the axon tunnel costs ~100ms/frame of pure
    # harness transport; on a real TPU host D2H of 1.9MB is sub-ms, so the
    # metric is device frame time — the reference's criterion bench likewise
    # excludes window presentation.)
    packed = PackedScene.from_scene(scene, assets)
    cache = rast._scene_cache
    d3, d3_op, d2 = cache["d3"], cache["d3_op"], cache["d2"]
    atlas = cache["atlas"]
    lights = dict(packed.lights)
    lights["flicker_factor"] = rast._flicker_factors(lights)
    ld = {k: jnp.asarray(v) for k, v in lights.items()}
    bg = rast._bg_dev
    uni = rast._uniforms(scene)

    @jax.jit
    def chained(background, prev):
        background = background + prev[0, 0, 0].astype(jnp.float32) * 0.0
        return render_frame(
            d3, d3_op, d2, ld, atlas, uni, background,
            width, height, 0, False, False, True, False, True,
        )

    out = chained(bg, jnp.zeros((height, width, 4), jnp.uint8))
    out.block_until_ready()

    n = 50
    t0 = time.perf_counter()
    f = out
    for _ in range(n):
        f = chained(bg, f)
    f.block_until_ready()
    dt = (time.perf_counter() - t0) / n

    fps = 1.0 / dt
    mpix = width * height * fps / 1e6
    north_star = 1920 * 1080 * 60 / 1e6  # 124.4 Mpx/s

    print(
        json.dumps(
            {
                "metric": "rasterize_cube_800x600_mpixels_per_s",
                "value": round(mpix, 2),
                "unit": "Mpixel/s",
                "vs_baseline": round(mpix / north_star, 3),
                "fps": round(fps, 1),
                "ms_per_frame": round(dt * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
