"""RenderSettings, particles, soft rigs, wavefront, atlas, misc coverage."""

import numpy as np

from rusterix_tpu.map import (
    Keyform,
    Map,
    ParticleEmitter,
    SoftRig,
    SoftRigAnimator,
)
from rusterix_tpu.models import (
    RenderSettings,
    Texture,
    TextureAtlas,
    Tile,
    Wavefront,
)


def test_render_settings_toml_and_hour():
    rs = RenderSettings.from_toml(
        """
[render]
sky_color = [0.1, 0.2, 0.3]
sun_intensity = 2.0
fog_density = 0.5

[daylight]
enabled = true
sunrise_time = 6.0
sunset_time = 18.0
"""
    )
    assert rs.sky_color == (0.1, 0.2, 0.3)
    assert rs.sun_intensity == 2.0
    assert rs.fog_density == 0.5
    assert rs.simulation.enabled

    rs.apply_hour(12.0)
    midday_sky = rs.sky_color
    assert rs.sun_intensity == 1.0
    assert rs.sun_direction[1] < 0  # sun shines downward
    rs.apply_hour(23.0)
    assert rs.sky_color != midday_sky
    assert rs.sun_intensity < 0.5


def test_particle_emitter_lifecycle():
    em = ParticleEmitter(
        origin=np.zeros(3, np.float32),
        direction=np.array([0, 1, 0], np.float32),
    )
    em.rate = 100.0
    em.update(0.1)
    n1 = len(em.particles)
    assert n1 >= 9
    # particles move and die
    p0 = em.particles[0].pos.copy()
    em.update(0.05)
    assert not np.allclose(em.particles[0].pos, p0)
    em.update(10.0)
    assert len(em.particles) <= em.rate * 10 + 1
    em.particles = []
    em.update(0.001)
    batch = em.build_billboards([1, 0, 0], [0, 1, 0])
    assert len(batch.indices) == 2 * len(em.particles)


def test_softrig_blend_and_apply():
    m = Map()
    v0 = m.add_vertex_at(0.0, 0.0)
    rig_a = SoftRig(name="a")
    rig_a.keyforms.append(Keyform([(v0, (0.0, 0.0))]))
    rig_b = SoftRig(name="b")
    rig_b.keyforms.append(Keyform([(v0, (2.0, 4.0))]))
    m.softrigs = {rig_a.id: rig_a, rig_b.id: rig_b}

    anim = SoftRigAnimator(keyframes=[rig_a.id, rig_b.id], total_duration=1.0)
    anim.set_progress(0.5)
    blended = anim.blended_positions(m.softrigs)
    assert abs(blended[v0][0] - 1.0) < 1e-6
    assert abs(blended[v0][1] - 2.0) < 1e-6

    m.soft_animator = anim
    anim.apply_to_map(m)
    assert m.get_vertex(v0).x == 1.0

    anim.set_progress(0.0)
    anim.tick(0.25)
    assert abs(anim.progress - 0.25) < 1e-6
    anim.loop_playback = False
    anim.tick(2.0)
    assert anim.progress == 1.0 and not anim.playing


def test_wavefront_obj_parse():
    obj = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
"""
    batch = Wavefront.parse_string(obj).to_batch()
    assert len(batch.indices) == 2  # quad fan -> 2 tris
    assert len(batch.vertices) == 4
    assert len(batch.normals) == 4
    assert np.allclose(batch.normals[0], [0, 0, 1])


def test_texture_atlas_animation_frames():
    t1 = Texture.from_color((255, 0, 0, 255))
    t2 = Texture.from_color((0, 255, 0, 255))
    anim = Tile(textures=[t1, t2])
    static = Tile.from_texture(Texture.checkerboard(8, 2))
    atlas = TextureAtlas.build([anim, static])
    assert list(atlas.tile_count) == [2, 1]
    assert atlas.tile_first[1] == 2
    # frames land at distinct rects
    r0, r1 = atlas.rects[0], atlas.rects[1]
    assert tuple(r0) != tuple(r1)


def test_texture_material_ext():
    t = Texture.checkerboard(8, 2)
    t.set_materials(1, 1, 0.5, 1.0, 1.0, 0.0)
    r, m, o, e = t.get_materials(1, 1)
    assert abs(r - 0.5333) < 0.04 and m == 1.0
    t.set_normal(2, 2, 0.0, 1.0)
    nx, ny = t.get_normal(2, 2)
    assert abs(nx) < 0.01 and abs(ny - 1.0) < 0.01
    t.generate_normals(wrap=True)
    assert t.data_ext is not None


def test_pixel_source_to_tile_color_noise_and_lookup():
    """PixelSource::to_tile (pixelsource.rs:43-120): Color bakes a noisy
    texture, TileId resolves assets, ShapeFXGraphId uses the graph's
    dominant palette color, Off -> None."""
    from rusterix_tpu.map import Map, ValueContainer
    from rusterix_tpu.models import Assets, PixelSource, Texture, Tile
    from rusterix_tpu.shapefx import ShapeFX, ShapeFXGraph, ShapeFXRole

    assets = Assets.default()
    # Color with RGB noise: constant alpha, varying rgb around the base
    vals = ValueContainer()
    vals.set("noise_intensity", 0.5)
    tile = PixelSource.color((200, 100, 50, 255)).to_tile(assets, 32, vals)
    tex = tile.textures[0].data
    assert tex.shape == (32, 32, 4) and tex[..., 3].min() == 255
    assert tex[..., 0].std() > 0  # noise actually moved the channel
    # zero intensity -> flat fill
    flat = PixelSource.color((10, 20, 30, 255)).to_tile(assets, 8, ValueContainer())
    assert (flat.textures[0].data[..., :3] == [10, 20, 30]).all()
    # hue/luminance targets keep alpha and change rgb
    vals2 = ValueContainer()
    vals2.set("noise_target", 2)
    vals2.set("noise_intensity", 0.4)
    lum = PixelSource.color((200, 100, 50, 255)).to_tile(assets, 16, vals2)
    assert lum.textures[0].data[..., :3].std() > 0
    # TileId lookup
    t = Tile.from_texture(Texture.checkerboard(8, 4))
    assets.tiles[t.id] = t
    assert PixelSource.tile_id(t.id).to_tile(assets, 16) is t
    # graph dominant color via node[1]'s 'color' palette index
    m = Map()
    node = ShapeFX(ShapeFXRole.Color)
    node.values.set("color", 3)
    g = ShapeFXGraph(nodes=[ShapeFX(ShapeFXRole.Render), node])
    m.shapefx_graphs[g.id] = g
    gt = PixelSource.shapefx_graph(g.id).to_tile(assets, 4, map_=m)
    expect = tuple(
        int(float(c) * 255 + 0.5) for c in assets.palette[3][:3]
    )
    assert tuple(gt.textures[0].data[0, 0, :3]) == expect
    assert PixelSource.off().to_tile(assets, 8) is None


def test_hsl_round_trip_and_blur_sample():
    from rusterix_tpu.models import Texture
    from rusterix_tpu.utils.color import hsl_to_rgb, rgb_to_hsl

    for rgb in ([0.8, 0.4, 0.2], [0.0, 0.0, 0.0], [0.2, 0.9, 0.3]):
        h, s, l = rgb_to_hsl(rgb)
        np.testing.assert_allclose(hsl_to_rgb(h, s, l), rgb, atol=1e-5)
    # sample_nearest_blur: 0 strength = nearest; blur averages neighbors
    tex = Texture.checkerboard(8, 1)
    sharp = tex.sample_nearest_blur(0.5, 0.5, 0.0)
    blurred = tex.sample_nearest_blur(0.5, 0.5, 1.0)
    assert sharp != blurred
    assert 0 < blurred[0] < 255


def test_mini_move_and_navigation():
    """MapMini server-side navigation (mini.rs:98-540): swept move with
    sliding, lit-side visibility, A*-guided move_towards/close_in."""
    from rusterix_tpu.map.elements import CompiledLinedef
    from rusterix_tpu.map.mini import MapMini

    m = MapMini.empty()
    m.linedefs.append(
        CompiledLinedef(
            start=(0.0, 2.0), end=(10.0, 2.0), wall_width=0.0, wall_height=2.0
        )
    )
    # swept move stops radius+eps short of the wall and reports blocked
    pos, blocked = m.move_distance(np.array([5.0, 0.0]), np.array([0.0, 5.0]), 0.3)
    assert blocked and abs(pos[1] - 1.698) < 1e-2 and abs(pos[0] - 5.0) < 1e-5
    # sliding: diagonal into the wall keeps tangential motion
    pos2, _ = m.move_distance(np.array([5.0, 1.0]), np.array([2.0, 2.0]), 0.3)
    assert pos2[0] > 5.1 and pos2[1] < 2.0
    # lit-side asymmetry: the wall's normal faces one way
    assert not m.is_visible((5, 0), (5, 4))
    lit_a = m.is_visible_and_lit((5, 0), (5, 4))
    lit_b = m.is_visible_and_lit((5, 4), (5, 0))
    assert lit_a != lit_b
    # A* navigation around a blocked tile
    m2 = MapMini.empty()
    m2.blocked_tiles = {(1, 0)}
    # (like the reference, `arrived` flags reaching the next WAYPOINT
    # within `speed`, mini.rs:442-445 — use a small speed to step)
    pos3, arrived = m2.move_towards((0.5, 0.5), (2.5, 0.5), 0.3, 0.2, 1.0)
    assert not arrived and not np.allclose(pos3, [0.5, 0.5])
    pos4, arrived4 = m2.close_in((0.5, 0.5), (0.9, 0.5), 1.0, 0.6, 0.2, 1.0)
    assert arrived4  # already within dest_radius


def test_value_container_typed_getters():
    """Plain typed getters + toggle (value.rs:196-430)."""
    from rusterix_tpu.map import ValueContainer
    from rusterix_tpu.models import PixelSource

    vc = ValueContainer()
    vc.set("on", True)
    vc.set("n", 3)
    vc.set("x", 1.5)
    vc.set("name", "orc")
    vc.set("source", PixelSource.static_tile_index(2))
    assert vc.get_bool("on") is True
    assert vc.get_int("n") == 3 and vc.get_int("x") is None
    assert vc.get_float("x") == 1.5
    assert vc.get_str("name") == "orc"
    assert vc.get_default_source().index == 2
    vc.toggle("on")
    assert vc.get_bool("on") is False
    vc.toggle("n")  # non-bool: no-op
    assert vc.get_int("n") == 3
    assert vc.keys_sorted() == ["n", "name", "on", "source", "x"]
    assert len(vc.values()) == 5


def test_scenemanager_reference_api():
    """receive/tick_batch/is_busy/startup surface (scenemanager.rs:85-295)."""
    from rusterix_tpu.builders import MapScript
    from rusterix_tpu.builders.scenemanager import SceneManager
    from rusterix_tpu.models import Assets

    src = 'set_default("wall_tex", "t")\nmove_to(0, 0)\nwall(2)\n'
    m = MapScript().compile(src)
    sm = SceneManager()
    sm.startup()
    assert sm.receive().kind == "startup"
    sm.set_map(m, Assets.default())
    assert sm.is_busy() and sm.remaining_chunks() > 0
    n = sm.tick_batch(100)
    assert n == sm.total and not sm.is_busy()
    got = 0
    while (r := sm.receive()) is not None:
        assert r.kind == "chunk"
        got += 1
    assert got == n


def test_light_placement_from_map_elements():
    """Light placement on walls/sectors (light.rs:232-452): midpoint +
    normal offset, spot aiming, area spanning the segment."""
    from rusterix_tpu.models.light import Light, LightType

    proto = Light(LightType.Point).with_intensity(2.0).with_range(1.0, 8.0)
    wall = proto.place_on_linedef((0.0, 0.0), (4.0, 0.0), height=2.5)
    # midpoint (2,0) pushed 0.1 along the (0,-1) normal; y = height
    np.testing.assert_allclose(wall.position, [2.0, 2.5, -0.1], atol=1e-6)
    assert wall.intensity == 2.0 and wall.end_distance == 8.0

    spot = Light(LightType.Spot).place_on_linedef((0.0, 0.0), (4.0, 0.0), 2.0)
    np.testing.assert_allclose(spot.direction, [0.0, 0.0, -1.0], atol=1e-6)

    area = Light(LightType.Area).place_on_linedef((0.0, 0.0), (4.0, 0.0), 2.0)
    assert area.from_linedef and area.width == 4.0 and area.height == 1.0

    ceil = Light(LightType.Point).place_on_sector((1.0, 3.0, 1.0))
    np.testing.assert_allclose(ceil.position, [1.0, 3.1, 1.0], atol=1e-6)
    # ambient lights are position-independent: placement is a plain copy
    amb = Light(LightType.Ambient).with_intensity(0.3)
    assert amb.place_on_linedef((0, 0), (1, 0), 1.0).intensity == 0.3


def test_tile_role_and_buffers():
    """TileRole reference order + Tile frame buffer accessors
    (tile.rs:6-160)."""
    from rusterix_tpu.models import Texture, Tile
    from rusterix_tpu.models.texture import TileRole

    assert TileRole.Character == 0 and TileRole.ManMade == 5 and TileRole.UI == 9
    assert TileRole.from_index(6) == TileRole.Dungeon
    assert TileRole.from_index(99) == TileRole.ManMade
    assert TileRole.ManMade.to_string() == "Man Made"
    assert TileRole.Water.to_color() == (0x24, 0x3D, 0x5C, 255)
    assert len(list(TileRole.iterator())) == 10

    t = Tile.from_textures([Texture.checkerboard(4, 2), Texture.checkerboard(4, 1)])
    assert not t.is_empty() and Tile.empty().is_empty()
    assert len(t.to_buffer_array()) == 2
    assert t.to_material_array() == []
    t.textures[0].set_default_materials()
    assert len(t.to_material_array()) == 1
