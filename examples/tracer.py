#!/usr/bin/env python
"""Path-tracer example (reference Client::trace / examples tracer path):
progressive wavefront tracing of an emissive + diffuse scene. Saves
tracer.png."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rusterix_tpu import (
    Assets,
    Batch3D,
    D3OrbitCamera,
    Light,
    LightType,
    Material,
    MaterialModifier,
    MaterialRole,
    PixelSource,
    Scene,
)
from rusterix_tpu.tracer import AccumBuffer, Tracer

WIDTH, HEIGHT = 320, 240
SAMPLES = 8


def main():
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-2.0, -0.6, -2.0, 4.0, 0.1, 4.0)
            .set_source(PixelSource.pixel((200, 200, 200, 255)))
            .with_computed_normals(),
            Batch3D.from_box(-0.4, -0.5, -0.4, 0.8, 0.8, 0.8)
            .set_source(PixelSource.pixel((220, 90, 60, 255)))
            .with_computed_normals(),
            Batch3D.from_box(0.8, -0.5, -0.8, 0.4, 1.4, 0.4)
            .set_source(PixelSource.pixel((255, 240, 200, 255)))
            .set_material(
                Material(MaterialRole.Emissive, MaterialModifier.Nothing, 0.4, 0.0)
            )
            .with_computed_normals(),
        ],
    ).set_lights(
        [
            Light(LightType.Point)
            .with_position([1.5, 2.0, 1.5])
            .with_intensity(0.4)
            .compile()
        ]
    )

    cam = D3OrbitCamera()
    cam.azimuth = 0.8
    cam.elevation = 0.5
    cam.set_parameter_f32("distance", 4.0)

    buf = AccumBuffer(WIDTH, HEIGHT)
    tracer = Tracer()
    tracer.trace(cam, scene, buf, 64, Assets.default())  # compile warm-up
    buf.reset()
    t0 = time.time()
    for _ in range(SAMPLES):
        tracer.trace(cam, scene, buf, 64, Assets.default())
    import jax

    jax.block_until_ready(buf._dev)
    dt = (time.time() - t0) / SAMPLES
    print(f"tracer: {dt*1000:.1f} ms/sample at {WIDTH}x{HEIGHT}, {SAMPLES} samples")

    from PIL import Image

    Image.fromarray(buf.to_u8(), "RGBA").save("tracer.png")
    print("saved tracer.png")


if __name__ == "__main__":
    main()
