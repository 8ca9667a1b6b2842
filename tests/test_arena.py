"""Per-frame upload arena (ops/arena.py): pack/unpack round-trip and
byte-exact parity of the arena-fed render entry (render_frame_arena) vs
the direct per-leaf render_frame.

The arena exists because one device transfer per pytree leaf is a host
round trip; the reference reads scene memory in-process
(src/rasterizer.rs:227+) and never pays this."""

import jax
import jax.numpy as jnp
import numpy as np

from rusterix_tpu import Assets, Batch3D, D3OrbitCamera, Light, LightType, Scene
from rusterix_tpu.ops.arena import pack_arena, unpack_arena
from rusterix_tpu.ops.raster import Rasterizer, render_frame

W, H = 96, 72


def test_pack_unpack_round_trip_under_jit():
    tree = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "nested": {
            "i": np.array([-5, 7], np.int32),
            "scalar": np.float32(3.25),
            "empty": np.zeros((0, 4), np.float32),
        },
        "none": None,
        "mat": np.linspace(-1, 1, 16, dtype=np.float32).reshape(4, 4),
    }
    arena, layout = pack_arena(tree)
    assert arena.dtype == np.uint32

    @jax.jit
    def rebuild(a):
        return unpack_arena(a, layout)

    out = rebuild(jnp.asarray(arena))
    flat_in, def_in = jax.tree_util.tree_flatten(tree)
    flat_out, def_out = jax.tree_util.tree_flatten(out)
    assert def_in == def_out
    for x, y in zip(flat_in, flat_out):
        y = np.asarray(y)
        assert y.shape == np.asarray(x).shape
        assert y.dtype == np.asarray(x).dtype
        np.testing.assert_array_equal(np.asarray(x), y)


def test_pack_rejects_non_word_leaves():
    assert pack_arena({"b": np.zeros(3, np.bool_)}) == (None, None)
    assert pack_arena({"b": np.zeros(3, np.float64)}) == (None, None)
    # device leaves would force a D2H readback — refused
    assert pack_arena({"d": jnp.zeros(3, jnp.float32)}) == (None, None)


def _dyn_scene():
    scene = Scene()
    scene.d3_static = [Batch3D.from_box(-1.0, -1.0, -1.0, 2.0, 2.0, 2.0)]
    dyn = Batch3D.from_box(1.5, 0.0, 0.0, 0.5, 0.5, 0.5)
    scene.d3_dynamic = [dyn]
    scene.lights = [Light(LightType.Point).with_position([0.0, 2.0, 3.0])]
    scene.touch()
    scene.touch_dynamic()
    return scene


def test_arena_render_matches_per_leaf_render():
    """rasterize() routes through render_frame_arena; re-running the stashed
    _frame_args through the direct entry must produce the same bytes."""
    scene = _dyn_scene()
    assets = Assets.default()
    cam = D3OrbitCamera()
    view = cam.view_matrix()
    proj = cam.projection_matrix(W, H)
    rast = Rasterizer.setup(None, view, proj)
    rast.ambient([0.3, 0.3, 0.3, 1.0])
    rast.keep_frame_args = True  # stash is opt-in (profiling consumer)
    frame_arena = rast.rasterize(scene, W, H, 32, assets)

    args = rast._frame_args
    assert any(isinstance(v, np.ndarray) for v in args["uniforms"].values())
    frame_direct = np.asarray(render_frame(**args))
    np.testing.assert_array_equal(frame_arena, frame_direct)
