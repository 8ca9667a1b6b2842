"""Progressive path tracer — TPU wavefront formulation.

reference: src/tracer/trace.rs (tile-parallel CPU path tracer: jittered
camera rays, <= 8 bounces, brute-force Möller-Trumbore over all batches,
direct lighting x10, specular/diffuse russian-roulette bounces, sky miss,
running-average AccumBuffer src/tracer/buffer.rs).

TPU design: the whole frame is one wavefront — rays are (P, 3) arrays, each
bounce intersects every ray against triangle chunks (vectorized
Möller-Trumbore with a running closest-hit reduce, the ray analogue of the
visibility pass), shading/bounce decisions use `jax.random` per-lane. Dead
lanes (missed/terminated) carry zero throughput; 8 bounces run always —
lane-masked instead of branchy.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.batch import MaterialModifier, MaterialRole
from ..ops.scene_pack import SRC_PIXEL, SRC_TEXTURE, PackedScene
from ..ops.shade import light_radiance, resolve_texel, take_iso
from ..utils.color import hash_u32, srgb_to_linear_fast


@dataclass
class AccumBuffer:
    """Running-average accumulation buffer (reference buffer.rs:5-127).

    Accumulation happens DEVICE-side (samples never leave HBM between
    bounces/samples); `pixels`/`to_u8` read back on demand."""

    width: int
    height: int
    _dev: object = None  # (H, W, 4) f32 linear, jax array
    frame: int = 0

    def __post_init__(self):
        if self._dev is None:
            import jax.numpy as jnp

            self._dev = jnp.zeros((self.height, self.width, 4), jnp.float32)

    def reset(self):
        self.frame = 0

    @property
    def pixels(self) -> np.ndarray:
        return np.asarray(self._dev)

    def accumulate(self, linear_rgba):
        import jax.numpy as jnp

        t = 1.0 / (self.frame + 1.0)
        self._dev = self._dev * (1.0 - t) + jnp.asarray(linear_rgba) * t
        self.frame += 1

    def to_u8(self) -> np.ndarray:
        """Accurate linear->sRGB (reference buffer.rs:69-76)."""
        x = np.clip(self.pixels, 0.0, 1.0)
        srgb = np.where(
            x <= 0.0031308, x * 12.92, 1.055 * np.power(np.maximum(x, 1e-8), 1 / 2.4) - 0.055
        )
        out = (np.clip(srgb, 0, 1) * 255.0 + 0.5).astype(np.uint8)
        out[..., 3] = 255
        return out


def _morton_order(centroids: np.ndarray) -> np.ndarray:
    """Z-order permutation of triangle centroids so spatially-near triangles
    share chunks (the same locality trick as the Pallas visibility kernel)."""
    if len(centroids) == 0:
        return np.zeros(0, np.int64)
    lo = centroids.min(axis=0)
    span = np.maximum(centroids.max(axis=0) - lo, 1e-20)
    q = np.clip(((centroids - lo) / span * 1023.0), 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 32)) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << 16)) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << 8)) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << 4)) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << 2)) & np.uint64(0x1249249249249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )
    return np.argsort(code, kind="stable")


TRACER_CHUNK = 128


def _pack_tracer_scene(scene, assets):
    """Triangle SoA + per-tri material for the tracer.

    Triangles are Morton-ordered and grouped into TRACER_CHUNK-sized chunks
    with precomputed AABBs: the bounce loop skips a chunk's Moller-Trumbore
    math entirely when NO ray in the wavefront enters its box (the
    wavefront analogue of the reference's per-ray spatial pruning)."""
    packed = PackedScene.from_scene(scene, assets)
    d3 = packed.d3
    t = d3.pos.shape[0]
    # per-tri material from the owning batch (evaluate_hit, trace.rs:378-470)
    mat_mod = np.zeros(t, np.int32)
    mat_role = np.zeros(t, np.int32)
    mat_value = np.zeros(t, np.float32)
    i = 0
    for batch in scene.all_d3_batches():
        n = len(batch.indices)
        if batch.material is not None:
            mat_role[i : i + n] = int(batch.material.role)
            mat_mod[i : i + n] = int(batch.material.modifier)
            mat_value[i : i + n] = batch.material.value
        i += n

    # Morton-reorder every per-triangle array (dead slots sort to the end
    # because their pos is the origin; their valid flag still guards them)
    centroids = d3.pos[:, :, :3].mean(axis=1)
    live = d3.valid > 0.5
    # keep dead padding at the end so chunk AABBs of padding are empty
    order_live = _morton_order(centroids[live])
    order = np.concatenate([np.nonzero(live)[0][order_live], np.nonzero(~live)[0]])
    for name in vars(d3):
        arr = getattr(d3, name)
        if isinstance(arr, np.ndarray) and arr.shape[:1] == (t,):
            setattr(d3, name, arr[order])
    mat_role, mat_mod, mat_value = mat_role[order], mat_mod[order], mat_value[order]

    # chunk AABBs (inverted boxes for all-dead chunks -> slab test misses)
    nchunks = (t + TRACER_CHUNK - 1) // TRACER_CHUNK
    box_min = np.full((nchunks, 3), 1e30, np.float32)
    box_max = np.full((nchunks, 3), -1e30, np.float32)
    for ci in range(nchunks):
        sl = slice(ci * TRACER_CHUNK, min((ci + 1) * TRACER_CHUNK, t))
        v = d3.valid[sl] > 0.5
        if v.any():
            pts = d3.pos[sl][v][:, :, :3].reshape(-1, 3)
            box_min[ci] = pts.min(axis=0)
            box_max[ci] = pts.max(axis=0)

    return packed, {
        "role": mat_role,
        "modifier": mat_mod,
        "value": mat_value,
    }, {"box_min": box_min, "box_max": box_max}


class Tracer:
    """reference src/tracer/trace.rs:31+."""

    def __init__(self):
        self.hour = 12.0
        self.sky_horizon = np.array([0.8, 0.7, 0.6], np.float32)
        self.sky_zenith = np.array([0.1, 0.4, 0.9], np.float32)
        self.bounces = 8
        #: wavefront chunk-AABB skipping (Morton-ordered 2-level pruning).
        #: Default OFF: measured on v5e @320x240/1200 tris the lax.cond gate
        #: costs ~6% and jnp.any(enters) over a 76k-ray wavefront is almost
        #: never false (primary+bounce rays touch most chunks). Enable for
        #: large sparse scenes where whole chunks sit off-camera.
        self.use_aabb_skip = False
        self._cache_key = None
        self._cache = None
        self.sample_mode = 0
        self.background = None

    def set_sample_mode(self, mode: int) -> "Tracer":
        """trace.rs sample_mode builder."""
        self.sample_mode = int(mode)
        return self

    def set_background(self, shader) -> "Tracer":
        """trace.rs background builder (miss shading falls back to the
        procedural sky when None)."""
        self.background = shader
        return self

    @staticmethod
    def reflect(i, n):
        """i - 2(i.n)n (trace.rs:478-480)."""
        i = np.asarray(i, np.float32)
        n = np.asarray(n, np.float32)
        return i - 2.0 * float(i @ n) * n

    def trace(self, camera, scene, buffer: AccumBuffer, tile_size: int, assets) -> None:
        """One progressive sample per pixel; accumulates into `buffer`."""
        key = (id(scene), scene.revision, id(assets))
        if self._cache_key != key:
            packed, mats, boxes = _pack_tracer_scene(scene, assets)
            atlas_np = packed.atlas_index.atlas
            self._cache = {
                "d3": {k: jnp.asarray(v) for k, v in vars(packed.d3).items()},
                "mats": {k: jnp.asarray(v) for k, v in mats.items()},
                "boxes": {k: jnp.asarray(v) for k, v in boxes.items()},
                "lights": packed.lights,
                "light_count": packed.light_count,
                "atlas": {
                    "flat": jnp.asarray(atlas_np.data.reshape(-1, 4)),
                    "w": jnp.int32(atlas_np.data.shape[1]),
                    "rects": jnp.asarray(atlas_np.rects),
                    "tile_first": jnp.asarray(atlas_np.tile_first),
                    "tile_count": jnp.asarray(atlas_np.tile_count),
                },
            }
            self._cache_key = key

        c = self._cache
        lights = dict(c["lights"])
        lights["flicker_factor"] = np.ones_like(lights["valid"])
        lights_dev = {k: jnp.asarray(v) for k, v in lights.items()}

        pos, forward, right, up = self._camera_basis(camera)
        linear = _trace_frame(
            c["d3"],
            c["mats"],
            c["boxes"],
            lights_dev,
            c["atlas"],
            jnp.asarray(pos),
            jnp.asarray(forward),
            jnp.asarray(right),
            jnp.asarray(up),
            jnp.float32(np.tan(np.radians(camera.fov) * 0.5)),
            jnp.asarray(self.sky_horizon),
            jnp.asarray(self.sky_zenith),
            jax.random.PRNGKey(buffer.frame * 7919 + 13),
            jnp.int32(scene.animation_frame),
            buffer.width,
            buffer.height,
            self.bounces,
            self.use_aabb_skip,
        )
        buffer.accumulate(linear)

    @staticmethod
    def _camera_basis(camera):
        forward, right, up = camera.basis_vectors()
        return camera.position(), forward, right, up


@partial(jax.jit, static_argnames=("width", "height", "bounces", "use_aabb_skip"))
def _trace_frame(
    d3,
    mats,
    boxes,
    lights,
    atlas,
    cam_pos,
    forward,
    right,
    up,
    half_height_tan,
    sky_horizon,
    sky_zenith,
    rng_key,
    anim_frame,
    width: int,
    height: int,
    bounces: int,
    use_aabb_skip: bool = False,
):
    p = width * height
    aspect = width / height

    keys = jax.random.split(rng_key, 4 + bounces * 3)
    jitter = jax.random.uniform(keys[0], (p, 2))

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    # screen uv with y flip + jitter (trace.rs:175-183, d3orbit create_ray)
    u = (xs.reshape(-1) + jitter[:, 0]) / width
    v = 1.0 - (ys.reshape(-1) + jitter[:, 1]) / height
    ndc_x = u * 2.0 - 1.0
    ndc_y = v * 2.0 - 1.0
    half_w = half_height_tan * aspect
    dirs = (
        forward[None, :]
        + right[None, :] * (ndc_x * half_w)[:, None]
        - up[None, :] * (-(ndc_y) * half_height_tan)[:, None]
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam_pos, (p, 3))

    tri_a = d3["pos"][:, 0, :3]
    tri_e1 = d3["pos"][:, 1, :3] - tri_a
    tri_e2 = d3["pos"][:, 2, :3] - tri_a
    tri_valid = d3["valid"] > 0.5

    def intersect_all(o, d):
        """Möller-Trumbore over all tris, chunked -> (t, tri, uhit, vhit).

        Each Morton-ordered chunk is gated by a wavefront slab test against
        its AABB: when no ray in flight can enter the box (or no ray could
        beat its current best t inside it), the whole chunk's MT math is
        skipped with lax.cond — the TPU wavefront analogue of a 2-level BVH.
        """
        tcount = tri_a.shape[0]
        chunk = min(TRACER_CHUNK, tcount)
        nchunks = (tcount + chunk - 1) // chunk
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)

        def step(carry, ci):
            best_t, best_i, best_u, best_v = carry

            # slab test of every ray vs this chunk's AABB
            bmin = boxes["box_min"][ci]
            bmax = boxes["box_max"][ci]
            t0 = (bmin[None] - o) * inv_d
            t1 = (bmax[None] - o) * inv_d
            tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
            tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
            enters = (tfar >= jnp.maximum(tnear, 0.0)) & (tnear < best_t)

            def run_chunk(carry):
                return _mt_chunk(carry, ci, o, d)

            if not use_aabb_skip:
                return run_chunk(carry), None
            return (
                jax.lax.cond(jnp.any(enters), run_chunk, lambda c: c, carry),
                None,
            )

        def _mt_chunk(carry, ci, o, d):
            best_t, best_i, best_u, best_v = carry
            s = ci * chunk
            a = jax.lax.dynamic_slice(tri_a, (s, 0), (chunk, 3))
            e1 = jax.lax.dynamic_slice(tri_e1, (s, 0), (chunk, 3))
            e2 = jax.lax.dynamic_slice(tri_e2, (s, 0), (chunk, 3))
            valid = jax.lax.dynamic_slice(tri_valid, (s,), (chunk,))
            h = jnp.cross(d[:, None, :], e2[None, :, :])  # (P, C, 3)
            det = jnp.sum(e1[None] * h, axis=-1)
            ok = (jnp.abs(det) >= 1e-6) & valid[None, :]
            f = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            sv = o[:, None, :] - a[None, :, :]
            uu = f * jnp.sum(sv * h, axis=-1)
            ok &= (uu >= 0.0) & (uu <= 1.0)
            q = jnp.cross(sv, e1[None, :, :])
            vv = f * jnp.sum(d[:, None, :] * q, axis=-1)
            ok &= (vv >= 0.0) & (uu + vv <= 1.0)
            tt = f * jnp.sum(e2[None] * q, axis=-1)
            ok &= tt > 1e-4
            tt = jnp.where(ok, tt, jnp.inf)
            local = jnp.argmin(tt, axis=-1)
            tmin = jnp.take_along_axis(tt, local[:, None], axis=-1)[:, 0]
            better = tmin < best_t
            best_t = jnp.where(better, tmin, best_t)
            best_i = jnp.where(better, s + local, best_i)
            best_u = jnp.where(
                better, jnp.take_along_axis(uu, local[:, None], -1)[:, 0], best_u
            )
            best_v = jnp.where(
                better, jnp.take_along_axis(vv, local[:, None], -1)[:, 0], best_v
            )
            return (best_t, best_i, best_u, best_v)

        init = (
            jnp.full((o.shape[0],), jnp.inf),
            jnp.full((o.shape[0],), -1, jnp.int32),
            jnp.zeros(o.shape[0]),
            jnp.zeros(o.shape[0]),
        )
        (bt, bi, bu, bv), _ = jax.lax.scan(
            step, init, jnp.arange(nchunks, dtype=jnp.int32)
        )
        return bt, bi, bu, bv

    def bounce(carry, kidx):
        o, d, ret, throughput, active = carry
        k1 = jax.random.fold_in(rng_key, kidx * 3 + 1)
        k2 = jax.random.fold_in(rng_key, kidx * 3 + 2)
        k3 = jax.random.fold_in(rng_key, kidx * 3 + 3)

        t, tri, uu, vv = intersect_all(o, d)
        hit = (tri >= 0) & active
        ti = jnp.maximum(tri, 0)

        w0 = 1.0 - uu - vv
        # fusion-isolated row gathers (see ops.shade.take_iso): fused
        # (P,)-indexed gathers degrade to element-at-a-time on TPU
        uv_rows = take_iso(d3["uv"], ti)  # (P,3,2)
        uv = (
            uv_rows[:, 0] * w0[:, None]
            + uv_rows[:, 1] * uu[:, None]
            + uv_rows[:, 2] * vv[:, None]
        )
        has_n = take_iso(d3["has_normals"], ti) > 0.5
        nrm_rows = take_iso(d3["nrm"], ti)  # (P,3,3)
        n_interp = (
            nrm_rows[:, 0] * w0[:, None]
            + nrm_rows[:, 1] * uu[:, None]
            + nrm_rows[:, 2] * vv[:, None]
        )
        n_geo = jnp.cross(take_iso(tri_e1, ti), take_iso(tri_e2, ti))
        n = jnp.where(has_n[:, None], n_interp, n_geo)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        # face the incoming ray (batch3d.rs:925-928)
        n = jnp.where(jnp.sum(n * d, axis=-1, keepdims=True) > 0, -n, n)

        texel = resolve_texel(
            take_iso(d3["kind"], ti), take_iso(d3["tex_slot"], ti),
            take_iso(d3["rgba"], ti), take_iso(d3["repeat"], ti),
            uv[:, 0], uv[:, 1], atlas, anim_frame, 0,
        )
        albedo = srgb_to_linear_fast(texel[:, :3])

        # material roles + per-hit modifier (trace.rs evaluate_hit:438-465:
        # modifier.modify(&texel, &material.value) on the SAMPLED texel)
        role = take_iso(mats["role"], ti)
        modifier = take_iso(mats["modifier"], ti)
        raw_value = take_iso(mats["value"], ti)
        tex = texel[:, :3]
        lum = 0.2126 * tex[:, 0] + 0.7152 * tex[:, 1] + 0.0722 * tex[:, 2]
        mx = jnp.max(tex, axis=-1)
        mn = jnp.min(tex, axis=-1)
        sat = jnp.where(mx > 0.0, (mx - mn) / jnp.maximum(mx, 1e-20), 0.0)
        value = jnp.where(
            modifier == int(MaterialModifier.Luminance), lum * raw_value,
            jnp.where(
                modifier == int(MaterialModifier.InvLuminance),
                (1.0 - lum) * raw_value,
                jnp.where(
                    modifier == int(MaterialModifier.Saturation), sat * raw_value,
                    jnp.where(
                        modifier == int(MaterialModifier.InvSaturation),
                        (1.0 - sat) * raw_value,
                        raw_value,
                    ),
                ),
            ),
        )
        spec_w = jnp.where(
            role == int(MaterialRole.Matte), 1.0 - value,
            jnp.where(
                (role == int(MaterialRole.Glossy)) | (role == int(MaterialRole.Metallic)),
                value, 0.0,
            ),
        )
        emissive = jnp.where(
            (role == int(MaterialRole.Emissive))[:, None],
            albedo * (raw_value * 10.0)[:, None],
            0.0,
        )

        world = o + d * t[:, None]
        is_emissive = jnp.any(emissive != 0.0, axis=-1)
        ret = ret + jnp.where((hit & is_emissive)[:, None], emissive * throughput, 0.0)

        # direct lighting x10 (trace.rs:281-291)
        radiance = light_radiance(lights, world, n)
        direct = jnp.sum(radiance, axis=-2) * 10.0
        brdf = albedo / jnp.pi
        ret = ret + jnp.where(
            (hit & ~is_emissive)[:, None], direct * throughput * brdf, 0.0
        )

        # bounce: specular vs cosine diffuse (trace.rs:293-307)
        p_spec = jnp.clip(spec_w, 0.0, 1.0)
        choose_spec = jax.random.uniform(k1, p_spec.shape) < p_spec
        pdf = jnp.where(choose_spec, p_spec, 1.0 - p_spec)
        refl = d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n

        # cosine hemisphere sample around n
        r1 = jax.random.uniform(k2, p_spec.shape)
        r2 = jax.random.uniform(k3, p_spec.shape)
        phi = 2.0 * jnp.pi * r1
        sq = jnp.sqrt(r2)
        tangent = jnp.cross(n, jnp.where(jnp.abs(n[:, 0:1]) < 0.9,
                                         jnp.array([1.0, 0, 0]), jnp.array([0, 1.0, 0])))
        tangent = tangent / jnp.maximum(jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-20)
        bitan = jnp.cross(n, tangent)
        cosdir = (
            tangent * (jnp.cos(phi) * sq)[:, None]
            + bitan * (jnp.sin(phi) * sq)[:, None]
            + n * jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))[:, None]
        )

        new_d = jnp.where(choose_spec[:, None], refl, cosdir)
        tp_spec = spec_w / jnp.maximum(pdf, 1e-6)
        tp_diff = (1.0 - p_spec) / jnp.maximum(pdf * jnp.pi, 1e-6)
        new_tp = jnp.where(
            choose_spec[:, None],
            throughput * tp_spec[:, None],
            throughput * albedo * tp_diff[:, None],
        )

        # miss -> sky gradient (debug sky, rasterizer.rs:1824-1842 analogue)
        up_y = jnp.clip(d[:, 1], -1.0, 1.0)
        sky_t = (up_y + 1.0) * 0.5
        sky = sky_horizon[None] + (sky_zenith - sky_horizon)[None] * sky_t[:, None]
        sky_lin = srgb_to_linear_fast(sky)
        missed = (~(tri >= 0)) & active
        ret = ret + jnp.where(missed[:, None], sky_lin * throughput, 0.0)

        # russian roulette (trace.rs:310-318)
        pmax = jnp.clip(jnp.max(new_tp, axis=-1), 0.001, 1.0)
        rr = jax.random.uniform(jax.random.fold_in(k1, 99), pmax.shape)
        survive = rr <= pmax
        new_tp = new_tp / pmax[:, None]

        new_active = hit & ~is_emissive & survive
        new_o = world + n * 0.01
        o = jnp.where(new_active[:, None], new_o, o)
        d = jnp.where(new_active[:, None], new_d, d)
        throughput = jnp.where(new_active[:, None], new_tp, throughput)
        return (o, d, ret, throughput, new_active), None

    init = (
        origins,
        dirs,
        jnp.zeros((p, 3)),
        jnp.ones((p, 3)),
        jnp.ones(p, bool),
    )
    (o, d, ret, tp, act), _ = jax.lax.scan(
        bounce, init, jnp.arange(bounces, dtype=jnp.int32)
    )

    rgba = jnp.concatenate([ret, jnp.ones((p, 1))], axis=-1)
    return rgba.reshape(height, width, 4)
