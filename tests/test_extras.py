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
