#!/usr/bin/env python
"""Map example (reference examples/map.rs): a procedural Doom-style map
built with the MapScript DSL, first-person camera, sky + point lights.
Saves map.png."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rusterix_tpu import (
    Assets,
    D3FirstPCamera,
    Rasterizer,
    Scene,
    Texture,
)
from rusterix_tpu.builders import D3Builder, MapScript
from rusterix_tpu.shapefx import ShapeFXGraph

WORLD = """
set_default("wall_tex", "brick")
set_default("floor_tex", "floor")
set_default("wall_height", 3.0)

wall(12)
turn_right()
wall(12)
turn_right()
wall(5)
add_point_light("#ffddaa", 2.5, 2.0, 10.0)
wall(7)
turn_right()
wall(12)

move_to(4, 4)
add_point_light("#aaddff", 1.5, 1.0, 6.0)
"""

WIDTH, HEIGHT = 800, 600


def main():
    assets = Assets.default()
    assets.textures["brick"] = Texture.checkerboard(32, 8)
    assets.textures["floor"] = Texture.checkerboard(32, 4)

    script = MapScript(assets)
    world = script.compile(WORLD)

    scene = Scene.empty()
    D3Builder().build(world, assets, scene)

    camera = D3FirstPCamera()
    camera.set_parameter_vec3("position", [6.0, 1.6, 10.0])
    camera.set_parameter_vec3("center", [6.0, 1.2, 0.0])

    rast = Rasterizer.setup(
        None, camera.view_matrix(), camera.projection_matrix(WIDTH, HEIGHT)
    )
    rast.render_graph = ShapeFXGraph.default_render_graph(with_sky=True)
    rast.hour = 14.0
    frame = rast.rasterize(scene, WIDTH, HEIGHT, 64, assets)

    from PIL import Image

    Image.fromarray(frame, "RGBA").save("map.png")
    tris = sum(len(b.indices) for b in scene.all_d3_batches())
    print(f"map: {tris} triangles, sun_dir={rast.sun_dir}, saved map.png")


if __name__ == "__main__":
    main()
