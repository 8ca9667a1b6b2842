#!/usr/bin/env python
"""SceneVM shading showcase: the reference game client's production 3D
path (src/client/mod.rs:596-667 -> embedded/shader/3d_shader.wgsl) renders
ray-traced per-light shadows, hemisphere ambient occlusion, Cook-Torrance
GGX shading and GGX reflections, all driven by RenderSettings
(src/render_settings.rs:423-429). This example turns the whole family on
at once over a Doom-style map: shadow maps baked by the visibility kernel,
screen-space AO, the GGX BRDF in the megakernel, and one deferred
reflection ray per pixel. Saves scenevm.png."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rusterix_tpu import (
    Assets,
    D3FirstPCamera,
    Light,
    LightType,
    Rasterizer,
    Scene,
    Texture,
)
from rusterix_tpu.builders import D3Builder, MapScript
from rusterix_tpu.models.render_settings import RenderSettings

WORLD = """
set_default("wall_tex", "brick")
set_default("floor_tex", "floor")
set_default("wall_height", 3.0)

wall(12)
turn_right()
wall(12)
turn_right()
wall(12)
turn_right()
wall(12)

move_to(4, 5)
wall(1)
turn_right()
wall(1)
turn_right()
wall(1)
turn_right()
wall(1)

move_to(9, 8)
add_point_light("#ffcc88", 2.2, 2.0, 9.0)
"""

WIDTH, HEIGHT = 800, 600


def main():
    assets = Assets.default()
    assets.textures["brick"] = Texture.checkerboard(32, 8)
    assets.textures["floor"] = Texture.checkerboard(32, 4)

    world = MapScript(assets).compile(WORLD)
    scene = Scene.empty()
    D3Builder().build(world, assets, scene)

    # a second light type so the shadow bake covers sun + cube maps
    spot = Light(LightType.Spot).with_position([5.0, 2.6, 5.0]).with_intensity(1.4)
    spot.end_distance = 10.0
    scene.lights.append(spot.compile())

    camera = D3FirstPCamera()
    camera.set_parameter_vec3("position", [9.5, 1.7, 10.5])
    camera.set_parameter_vec3("center", [4.0, 0.8, 4.0])

    # the SceneVM uniform block, verbatim keys (render_settings.rs:10-70)
    rs = RenderSettings(
        sun_direction=(0.8, -1.0, 0.55),
        sun_intensity=1.7,
        ambient_color=(0.22, 0.22, 0.28),
        ambient_strength=0.8,
        ao_samples=6,
        ao_radius=0.6,
        reflection_samples=1,
        max_shadow_distance=50.0,
        fog_density=0.0,
    )

    rast = (
        Rasterizer.setup(
            None, camera.view_matrix(), camera.projection_matrix(WIDTH, HEIGHT)
        )
        .apply_render_settings(rs)
        .set_shadows(True)
        .set_ambient_occlusion(True)
        .set_brdf("ggx")
    )
    frame = rast.rasterize(scene, WIDTH, HEIGHT, 40, assets)

    from PIL import Image

    Image.fromarray(frame, "RGBA").save("scenevm.png")
    tris = sum(len(b.indices) for b in scene.all_d3_batches())
    print(
        f"scenevm: {tris} triangles, shadows+AO+GGX+reflections on, "
        "saved scenevm.png"
    )


if __name__ == "__main__":
    main()
