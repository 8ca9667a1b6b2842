"""Progressive path tracer — TPU wavefront formulation.

reference: src/tracer/trace.rs (tile-parallel CPU path tracer: jittered
camera rays, <= 8 bounces, brute-force Möller-Trumbore over all batches,
direct lighting x10, specular/diffuse russian-roulette bounces, sky miss,
running-average AccumBuffer src/tracer/buffer.rs).

TPU design: the whole frame is one wavefront — rays are (P,) component
arrays, each bounce intersects every ray against triangle chunks
(vectorized Möller-Trumbore with a running closest-hit reduce, the ray
analogue of the visibility pass), shading/bounce decisions use
`jax.random` per-lane. Dead lanes (missed/terminated) carry zero
throughput; 8 bounces run always — lane-masked instead of branchy.
Winner-hit attributes ride ONE fused selection per bounce: small packs
select rows on the MXU as `onehot(ti, T) @ fused_table` (exact at
Precision.HIGHEST — verified bit-equal to the gather on chip), large
packs one 38-col row gather — TPU gathers are index-count bound, so the
~25 per-component pulls this replaces were 3.5 ms/bounce @800x600
(34.5 -> 9.8 ms/sample, 28.7 -> ~100 samples/s on the bench scene).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..models.batch import MaterialModifier, MaterialRole
from ..ops.scene_pack import PackedScene
from ..ops.shade import (
    LT_AMBIENT,
    LT_AMBIENT_DAYLIGHT,
    LT_AREA,
    LT_DAYLIGHT,
    LT_POINT,
    LT_SPOT,
    take_iso,
)
from ..utils.color import srgb_to_linear_fast


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

    def accumulate_batch(self, linear_batch):
        """Fold a (n,H,W,4) batch of samples in index order — the exact
        running-average chain n sequential accumulate() calls produce
        (bit-identical; the sharded tracer's device-per-sample fan-out
        lands here, parallel/mesh.py trace_samples_sharded)."""
        import jax.numpy as jnp

        batch = jnp.asarray(linear_batch)
        for i in range(batch.shape[0]):
            t = 1.0 / (self.frame + 1.0)
            self._dev = self._dev * (1.0 - t) + batch[i] * t
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

#: largest pack (slots) shaded through the one-hot MXU gather. Winner
#: attributes are selected as `onehot(ti, T) @ fused_table` — a (P, T) x
#: (T, 39) matmul on the MXU — instead of an XLA gather: TPU gathers are
#: INDEX-count bound (~4 ns/index regardless of row width; measured
#: 1.8 ms/bounce for one 480K-index 39-col row gather @800x600) while the
#: one-hot product is exact 0/1 selection at MXU speed (measured
#: 34.5 -> 9.5 ms/sample on the bench scene). Past this limit the
#: (P, T) one-hot operand outgrows the flops win and the row gather
#: takes over.
_ONEHOT_GATHER_LIMIT = 512


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
        self._n_live_chunks = None
        self._has_tex = True
        #: pack-size ceiling for the one-hot MXU winner-attribute gather
        #: (see _ONEHOT_GATHER_LIMIT; tests pin parity by forcing 0)
        self.onehot_limit = _ONEHOT_GATHER_LIMIT
        self.sample_mode = 0
        self.background = None
        #: ShapeFX render graph (trace.rs:41-48,120-143 set_render_graph):
        #: when a Sky node sits on the graph's MISS terminal, missed rays
        #: shade through the same render_miss_d3 sky the rasterizer uses
        #: instead of the built-in debug gradient. (Reference divergence,
        #: documented: with NO miss nodes the reference contributes nothing
        #: — black sky; we keep the debug gradient as the default so the
        #: standalone tracer example stays legible.)
        self.render_graph = None

    def set_render_graph(self, graph) -> "Tracer":
        """trace.rs set_render_graph builder."""
        self.render_graph = graph
        return self

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

    def _ensure_cache(self, scene, assets) -> dict:
        """Device-side packed scene, keyed on (scene uid, revision, assets)."""
        key = (id(scene), scene.revision, id(assets))
        if self._cache_key != key:
            packed, mats, boxes = _pack_tracer_scene(scene, assets)
            atlas_np = packed.atlas_index.atlas
            # live tris are a Morton-ordered PREFIX (dead padding sorts to
            # the end in _pack_tracer_scene), so the intersect scan can be
            # statically truncated to the live chunks — the pack's
            # power-of-two padding is up to ~50% dead slots, and skipping
            # them statically costs nothing (vs the ~6% lax.cond gate)
            n_live = int((packed.d3.valid > 0.5).sum())
            t_slots = packed.d3.valid.shape[0]
            chunk = min(TRACER_CHUNK, t_slots)
            self._n_live_chunks = max(1, -(-n_live // chunk))
            # static texture specialization: a pack with no SRC_TEXTURE
            # triangle skips the in-bounce atlas fetch entirely
            from ..ops.shade import SRC_TEXTURE

            self._has_tex = bool((packed.d3.kind == SRC_TEXTURE).any())
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
        return self._cache

    def _lights_dev(self, cache) -> dict:
        lights = dict(cache["lights"])
        lights["flicker_factor"] = np.ones_like(lights["valid"])
        return {k: jnp.asarray(v) for k, v in lights.items()}

    def _sky_pre(self):
        """Sky node on the miss terminal -> render_miss_d3 device params."""
        if self.render_graph is None:
            return None
        from ..shapefx import ShapeFXRole
        from ..shapefx.render import sky_device_params

        for ni in self.render_graph.collect_nodes_from(0, 1):
            node = self.render_graph.nodes[ni]
            node.render_setup(self.hour)
            if node.role == ShapeFXRole.Sky:
                return sky_device_params(node)
        return None

    def trace_sharded(self, camera, scene, buffer: AccumBuffer,
                      tile_size: int, assets, mesh) -> None:
        """`mesh.size` progressive samples in one call — one full-frame
        sample per device (the rays/samples axis is embarrassingly
        parallel; the reference fans its sample loop over rayon tiles the
        same way, src/tracer/trace.rs:105-190).

        Byte-stable vs the sequential path: device i runs the IDENTICAL
        XLA program trace() runs with the key frame+i would use, and
        accumulate_batch folds the gathered samples in index order, so a
        fresh buffer after trace_sharded == the same buffer after
        mesh.size trace() calls, bit for bit (tests/test_multichip.py)."""
        import jax
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import AXIS

        c = self._ensure_cache(scene, assets)
        lights_dev = self._lights_dev(c)
        sky_pre = self._sky_pre()
        pos, forward, right, up = self._camera_basis(camera)
        n = mesh.devices.size
        seeds = jnp.asarray(
            [(buffer.frame + i) * 7919 + 13 for i in range(n)], jnp.uint32
        )

        hht = jnp.float32(np.tan(np.radians(camera.fov) * 0.5))
        bounces = self.bounces
        aabb = self.use_aabb_skip
        nlc = self._n_live_chunks
        htex = self._has_tex
        ohl = self.onehot_limit
        w, h = buffer.width, buffer.height

        def shard_fn(seed, d3, mats, boxes, lights, atlas, sky):
            linear = _trace_frame(
                d3, mats, boxes, lights, atlas,
                jnp.asarray(pos), jnp.asarray(forward),
                jnp.asarray(right), jnp.asarray(up),
                hht,
                jnp.asarray(self.sky_horizon), jnp.asarray(self.sky_zenith),
                jax.random.PRNGKey(seed[0]),
                jnp.int32(scene.animation_frame),
                w, h, bounces, aabb, n_live_chunks=nlc, sky_pre=sky,
                has_tex=htex, onehot_limit=ohl,
            )
            return linear[None]

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(AXIS), P(), P(), P(), P(), P(), P()),
            out_specs=P(AXIS),
            check_vma=False,
        )
        frames = fn(
            seeds, c["d3"], c["mats"], c["boxes"], lights_dev, c["atlas"],
            sky_pre,
        )
        buffer.accumulate_batch(frames)

    def trace(self, camera, scene, buffer: AccumBuffer, tile_size: int, assets) -> None:
        """One progressive sample per pixel; accumulates into `buffer`."""
        c = self._ensure_cache(scene, assets)
        lights_dev = self._lights_dev(c)

        # sky node on the miss terminal -> render_miss_d3 sky for miss rays
        sky_pre = self._sky_pre()

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
            n_live_chunks=self._n_live_chunks,
            sky_pre=sky_pre,
            has_tex=self._has_tex,
            onehot_limit=self.onehot_limit,
        )
        buffer.accumulate(linear)

    @staticmethod
    def _camera_basis(camera):
        forward, right, up = camera.basis_vectors()
        return camera.position(), forward, right, up



def _light_sum_soa(lights, wx, wy, wz, nx, ny, nz):
    """SoA re-expression of ops.shade.light_radiance summed over lights.

    Identical formulas (CompiledLight::radiance_at, light.rs:491-653) but
    component-wise over (P,) ray arrays with a static python loop over the
    padded light rows: (P, L, 3) intermediates put the 3-axis on the VPU's
    128-lane minor dim (2% utilization — measured 18x slower than SoA), so
    the tracer keeps everything lane-major."""
    L = lights["valid"].shape[0]
    acc_r = jnp.zeros_like(wx)
    acc_g = jnp.zeros_like(wx)
    acc_b = jnp.zeros_like(wx)
    for i in range(L):
        lt = lights["type"][i]
        start = lights["start"][i]
        end = lights["end"][i]
        inten_raw = lights["intensity"][i]
        inten = inten_raw * lights["flicker_factor"][i]
        tpx = wx - lights["position"][i, 0]
        tpy = wy - lights["position"][i, 1]
        tpz = wz - lights["position"][i, 2]
        dist = jnp.sqrt(tpx * tpx + tpy * tpy + tpz * tpz)
        in_range = dist < end
        # _smoothstep(end, start, dist)
        st = jnp.clip((dist - end) / (start - end), 0.0, 1.0)
        smooth_att = jnp.where(dist <= start, 1.0, st * st * (3.0 - 2.0 * st))

        point_c = inten * smooth_att
        ambient_c = inten
        lin_att = jnp.where(
            dist <= start,
            1.0,
            1.0 - (dist - start) / jnp.maximum(end - start, 1e-20),
        )
        inv_dist = 1.0 / jnp.maximum(dist, 1e-20)
        dpx, dpy, dpz = tpx * inv_dist, tpy * inv_dist, tpz * inv_dist
        cosang = jnp.clip(
            lights["direction"][i, 0] * dpx
            + lights["direction"][i, 1] * dpy
            + lights["direction"][i, 2] * dpz,
            -1.0,
            1.0,
        )
        spot_ok = jnp.arccos(cosang) <= lights["cone_angle"][i]
        spot_c = jnp.where(spot_ok, inten * lin_att, 0.0)

        area = lights["width"][i] * lights["height"][i]
        angle_att = jnp.maximum(
            lights["normal"][i, 0] * dpx
            + lights["normal"][i, 1] * dpy
            + lights["normal"][i, 2] * dpz,
            0.0,
        )
        area_main = angle_att * smooth_att * area * inten_raw
        area_linedef = smooth_att * area * inten_raw
        area_c = jnp.where(
            lights["from_linedef"][i] > 0.5, area_linedef, area_main
        )
        area_c = jnp.where(dist < 0.1, 1.0, area_c)
        day_c = angle_att * smooth_att * inten_raw

        scale = jnp.where(
            lt == LT_POINT,
            point_c,
            jnp.where(
                (lt == LT_AMBIENT) | (lt == LT_AMBIENT_DAYLIGHT),
                ambient_c,
                jnp.where(
                    lt == LT_SPOT,
                    spot_c,
                    jnp.where(lt == LT_AREA, area_c, day_c),
                ),
            ),
        )
        valid = (lights["valid"][i] > 0.5) & in_range
        valid = jnp.where(
            (lt == LT_AMBIENT) | (lt == LT_AMBIENT_DAYLIGHT),
            lights["valid"][i] > 0.5,
            valid,
        )
        valid = valid & jnp.where(lt == LT_SPOT, spot_ok, True)

        # Lambert for point/spot/area (light.rs:504-533): ldir = -to_point/|.|
        lambert = jnp.maximum(-(nx * dpx + ny * dpy + nz * dpz), 0.0)
        needs_lambert = ~(
            (lt == LT_AMBIENT) | (lt == LT_AMBIENT_DAYLIGHT) | (lt == LT_DAYLIGHT)
        )
        s = scale * jnp.where(needs_lambert, lambert, 1.0)
        s = jnp.where(valid, s, 0.0)
        acc_r = acc_r + lights["color"][i, 0] * s
        acc_g = acc_g + lights["color"][i, 1] * s
        acc_b = acc_b + lights["color"][i, 2] * s
    return acc_r, acc_g, acc_b


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "bounces", "use_aabb_skip", "n_live_chunks",
        "has_tex", "onehot_limit",
    ),
)
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
    n_live_chunks: int = None,
    sky_pre=None,
    has_tex: bool = True,
    onehot_limit: int = _ONEHOT_GATHER_LIMIT,
):
    """One progressive sample — SoA formulation.

    Every per-ray quantity is a separate (P,) component array: (P, 3)
    vectors put the xyz axis on the VPU's 128-wide minor dim (2% lane
    utilization, measured 18x slower than component arrays), so rays,
    normals, throughput and radiance all stay lane-major end to end."""
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
    cx = (u * 2.0 - 1.0) * half_height_tan * aspect
    cy = -(v * 2.0 - 1.0) * half_height_tan
    dx = forward[0] + right[0] * cx - up[0] * cy
    dy = forward[1] + right[1] * cx - up[1] * cy
    dz = forward[2] + right[2] * cx - up[2] * cy
    inv_len = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * inv_len, dy * inv_len, dz * inv_len
    ox = jnp.full((p,), cam_pos[0])
    oy = jnp.full((p,), cam_pos[1])
    oz = jnp.full((p,), cam_pos[2])

    pos = d3["pos"]
    t_ax, t_ay, t_az = pos[:, 0, 0], pos[:, 0, 1], pos[:, 0, 2]
    t_e1x, t_e1y, t_e1z = (
        pos[:, 1, 0] - t_ax, pos[:, 1, 1] - t_ay, pos[:, 1, 2] - t_az,
    )
    t_e2x, t_e2y, t_e2z = (
        pos[:, 2, 0] - t_ax, pos[:, 2, 1] - t_ay, pos[:, 2, 2] - t_az,
    )
    tri_valid = d3["valid"] > 0.5

    # fused per-tri attribute table, built ONCE per frame (loop-invariant —
    # hoists out of the bounce scan). Everything the bounce shading needs
    # rides ONE winner selection instead of ~25 separate (P,) element
    # gathers (measured 3.5 ms/bounce @800x600; the reflect.py fused-gather
    # lesson, ops/reflect.py:224-230). Columns:
    #   0-2 vertex A | 3-5 e1 | 6-8 e2 | 9-14 uv (ua ub uc va vb vc) |
    #   15-23 nrm a/b/c xyz | 24 has_normals | 25 kind | 26-29 rgba |
    #   30 repeat | 31 mat role | 32 mat modifier | 33 mat value |
    #   34-37 atlas rect (x y w h) prefolded for THIS anim frame — the
    #   tile_first/tile_count/rects gathers leave the bounce loop
    #   (resolve_texel semantics, ops/shade.py:116-142, at (T,) cost)
    slot_t = jnp.maximum(d3["tex_slot"], 0)
    tex_id_t = jnp.take(atlas["tile_first"], slot_t) + jnp.remainder(
        anim_frame, jnp.maximum(jnp.take(atlas["tile_count"], slot_t), 1)
    )
    rect_t = jnp.take(atlas["rects"], tex_id_t, axis=0).astype(jnp.float32)
    fused_tab = jnp.concatenate(
        [
            jnp.stack(
                [
                    t_ax, t_ay, t_az, t_e1x, t_e1y, t_e1z,
                    t_e2x, t_e2y, t_e2z,
                    d3["uv"][:, 0, 0], d3["uv"][:, 1, 0], d3["uv"][:, 2, 0],
                    d3["uv"][:, 0, 1], d3["uv"][:, 1, 1], d3["uv"][:, 2, 1],
                    d3["nrm"][:, 0, 0], d3["nrm"][:, 1, 0], d3["nrm"][:, 2, 0],
                    d3["nrm"][:, 0, 1], d3["nrm"][:, 1, 1], d3["nrm"][:, 2, 1],
                    d3["nrm"][:, 0, 2], d3["nrm"][:, 1, 2], d3["nrm"][:, 2, 2],
                    d3["has_normals"],
                    d3["kind"].astype(jnp.float32),
                    d3["rgba"][:, 0], d3["rgba"][:, 1],
                    d3["rgba"][:, 2], d3["rgba"][:, 3],
                    d3["repeat"].astype(jnp.float32),
                    mats["role"].astype(jnp.float32),
                    mats["modifier"].astype(jnp.float32),
                    mats["value"],
                ],
                axis=1,
            ),
            rect_t,
        ],
        axis=1,
    )  # (T, 38)
    n_fused = fused_tab.shape[1]
    tcount_all = fused_tab.shape[0]
    use_onehot = tcount_all <= onehot_limit

    def intersect_all(ox, oy, oz, dx, dy, dz):
        """Möller-Trumbore over all tris, chunked -> (t, tri, uhit, vhit).

        Each Morton-ordered chunk is gated by a wavefront slab test against
        its AABB: when no ray in flight can enter the box (or no ray could
        beat its current best t inside it), the whole chunk's MT math is
        skipped with lax.cond — the TPU wavefront analogue of a 2-level BVH.
        All math on (P,) / (P, C) lane-major arrays."""
        tcount = t_ax.shape[0]
        chunk = min(TRACER_CHUNK, tcount)
        nchunks = (tcount + chunk - 1) // chunk
        if n_live_chunks is not None:
            # live tris are a prefix (pack invariant): trailing all-dead
            # chunks can never win, drop them from the scan statically
            nchunks = min(nchunks, max(1, n_live_chunks))
        inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
        inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
        inv_dz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)

        def step(carry, ci):
            best_t = carry[0]

            # slab test of every ray vs this chunk's AABB
            t0x = (boxes["box_min"][ci, 0] - ox) * inv_dx
            t1x = (boxes["box_max"][ci, 0] - ox) * inv_dx
            t0y = (boxes["box_min"][ci, 1] - oy) * inv_dy
            t1y = (boxes["box_max"][ci, 1] - oy) * inv_dy
            t0z = (boxes["box_min"][ci, 2] - oz) * inv_dz
            t1z = (boxes["box_max"][ci, 2] - oz) * inv_dz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            enters = (tfar >= jnp.maximum(tnear, 0.0)) & (tnear < best_t)

            def run_chunk(carry):
                return _mt_chunk(carry, ci)

            if not use_aabb_skip:
                return run_chunk(carry), None
            return (
                jax.lax.cond(jnp.any(enters), run_chunk, lambda c: c, carry),
                None,
            )

        def _mt_chunk(carry, ci):
            # carry ONLY (t, index): u/v would need take_along_axis lane
            # gathers here, which force the whole (P, C) chain to
            # materialize (measured ~2.4 ms/bounce); instead the winner's
            # u/v are recomputed once per ray afterwards with (P,) math, so
            # the tt producer fuses straight into the min/argmin reduces.
            best_t, best_i = carry
            s = ci * chunk

            def row(arr):
                return jax.lax.dynamic_slice(arr, (s,), (chunk,))[None, :]

            ax_, ay_, az_ = row(t_ax), row(t_ay), row(t_az)
            e1x, e1y, e1z = row(t_e1x), row(t_e1y), row(t_e1z)
            e2x, e2y, e2z = row(t_e2x), row(t_e2y), row(t_e2z)
            valid = jax.lax.dynamic_slice(tri_valid, (s,), (chunk,))

            dxc, dyc, dzc = dx[:, None], dy[:, None], dz[:, None]
            # h = d x e2
            hx = dyc * e2z - dzc * e2y
            hy = dzc * e2x - dxc * e2z
            hz = dxc * e2y - dyc * e2x
            det = e1x * hx + e1y * hy + e1z * hz
            ok = (jnp.abs(det) >= 1e-6) & valid[None, :]
            f = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            svx = ox[:, None] - ax_
            svy = oy[:, None] - ay_
            svz = oz[:, None] - az_
            uu = f * (svx * hx + svy * hy + svz * hz)
            ok &= (uu >= 0.0) & (uu <= 1.0)
            # q = sv x e1
            qx = svy * e1z - svz * e1y
            qy = svz * e1x - svx * e1z
            qz = svx * e1y - svy * e1x
            vv = f * (dxc * qx + dyc * qy + dzc * qz)
            ok &= (vv >= 0.0) & (uu + vv <= 1.0)
            tt = f * (e2x * qx + e2y * qy + e2z * qz)
            ok &= tt > 1e-4
            tt = jnp.where(ok, tt, jnp.inf)
            local = jnp.argmin(tt, axis=-1)
            tmin = jnp.min(tt, axis=-1)
            better = tmin < best_t
            best_t = jnp.where(better, tmin, best_t)
            best_i = jnp.where(better, s + local, best_i)
            return (best_t, best_i)

        init = (
            jnp.full((p,), jnp.inf),
            jnp.full((p,), -1, jnp.int32),
        )
        (bt, bi), _ = jax.lax.scan(
            step, init, jnp.arange(nchunks, dtype=jnp.int32)
        )

        return bt, bi

    def bounce(carry, kidx):
        ox, oy, oz, dx, dy, dz, ret_r, ret_g, ret_b, tp_r, tp_g, tp_b, active = carry
        k1 = jax.random.fold_in(rng_key, kidx * 3 + 1)
        k2 = jax.random.fold_in(rng_key, kidx * 3 + 2)
        k3 = jax.random.fold_in(rng_key, kidx * 3 + 3)

        t, tri = intersect_all(ox, oy, oz, dx, dy, dz)
        hit = (tri >= 0) & active
        ti = jnp.maximum(tri, 0)

        # ---- winner attribute selection: ONE fused pull per bounce ----
        # TPU gathers are INDEX-count bound (~4 ns/index regardless of row
        # width), so ~25 per-component take_iso pulls cost 3.5 ms/bounce
        # @800x600 even fully overlapped. Small packs instead select rows
        # as `onehot(ti, T) @ fused_tab` — an exact 0/1 selection on the
        # MXU (bf16x3 decomposition recovers x*1 bit-exactly; zeros add
        # nothing) — measured 34.5 -> 9.5 ms/sample. Large packs keep one
        # 38-col row gather (2.5x the matmul, still 1.8x the old pulls).
        if use_onehot:
            onehot = (
                ti[:, None]
                == jnp.arange(tcount_all, dtype=jnp.int32)[None, :]
            ).astype(jnp.float32)
            # precision matters: the MXU's default single bf16 pass
            # QUANTIZES the table (measured 8.6e-3 abs error on chip) and
            # even bf16x3 (HIGH) leaves 3.4e-5 residue; HIGHEST is
            # bit-exact vs the row gather on chip (verified max diff 0.0)
            # at ~2% samples/s cost on the bench scene
            g = jnp.matmul(
                onehot, fused_tab,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

            def col(i):
                return g[:, i]
        else:
            g = take_iso(fused_tab, ti).reshape(height, width, n_fused)

            def col(i):
                return g[..., i].reshape(p)

        # winner u/v: one single-triangle Möller-Trumbore per ray on the
        # selected components (misses index row 0 — masked by `hit`)
        w_ax, w_ay, w_az = col(0), col(1), col(2)
        g_e1x, g_e1y, g_e1z = col(3), col(4), col(5)
        g_e2x, g_e2y, g_e2z = col(6), col(7), col(8)
        whx = dy * g_e2z - dz * g_e2y
        why = dz * g_e2x - dx * g_e2z
        whz = dx * g_e2y - dy * g_e2x
        wdet = g_e1x * whx + g_e1y * why + g_e1z * whz
        wf = jnp.where(
            jnp.abs(wdet) >= 1e-6,
            1.0 / jnp.where(wdet == 0.0, 1.0, wdet),
            0.0,
        )
        wsx, wsy, wsz = ox - w_ax, oy - w_ay, oz - w_az
        uu = wf * (wsx * whx + wsy * why + wsz * whz)
        wqx = wsy * g_e1z - wsz * g_e1y
        wqy = wsz * g_e1x - wsx * g_e1z
        wqz = wsx * g_e1y - wsy * g_e1x
        vv = wf * (dx * wqx + dy * wqy + dz * wqz)
        w0 = 1.0 - uu - vv

        uv_u = col(9) * w0 + col(10) * uu + col(11) * vv
        uv_v = col(12) * w0 + col(13) * uu + col(14) * vv
        has_n = col(24) > 0.5
        nx = jnp.where(
            has_n,
            col(15) * w0 + col(16) * uu + col(17) * vv,
            g_e1y * g_e2z - g_e1z * g_e2y,
        )
        ny = jnp.where(
            has_n,
            col(18) * w0 + col(19) * uu + col(20) * vv,
            g_e1z * g_e2x - g_e1x * g_e2z,
        )
        nz = jnp.where(
            has_n,
            col(21) * w0 + col(22) * uu + col(23) * vv,
            g_e1x * g_e2y - g_e1y * g_e2x,
        )
        inv_nl = 1.0 / jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-20)
        nx, ny, nz = nx * inv_nl, ny * inv_nl, nz * inv_nl
        # face the incoming ray (batch3d.rs:925-928)
        flip = jnp.where(nx * dx + ny * dy + nz * dz > 0, -1.0, 1.0)
        nx, ny, nz = nx * flip, ny * flip, nz * flip

        # texel resolve with the prefolded rect (resolve_texel semantics,
        # ops/shade.py:116-142, nearest mode): the only remaining in-bounce
        # gather is the atlas fetch itself — statically skipped when the
        # pack has no SRC_TEXTURE triangles (has_tex, e.g. pixel-source
        # scenes)
        kind_c = col(25).astype(jnp.int32)
        rgba_c = jnp.stack([col(26), col(27), col(28), col(29)], axis=-1)
        if has_tex:
            from ..ops.shade import (
                SRC_PIXEL,
                SRC_TEXTURE,
                _round_half_away,
                apply_repeat,
            )

            uu_r, vv_r = apply_repeat(uv_u, uv_v, col(30).astype(jnp.int32))
            rw_f = col(36)
            rh_f = col(37)
            tx_i = jnp.clip(
                _round_half_away(uu_r * (rw_f - 1.0)).astype(jnp.int32),
                0, rw_f.astype(jnp.int32) - 1,
            )
            ty_i = jnp.clip(
                _round_half_away(vv_r * (rh_f - 1.0)).astype(jnp.int32),
                0, rh_f.astype(jnp.int32) - 1,
            )
            flat_ix = (
                (col(35).astype(jnp.int32) + ty_i) * atlas["w"]
                + col(34).astype(jnp.int32) + tx_i
            )
            tx4 = take_iso(atlas["flat"], flat_ix).astype(jnp.float32) * (
                1.0 / 255.0
            )
            texel = jnp.where((kind_c == SRC_TEXTURE)[..., None], tx4, 0.0)
            texel = jnp.where((kind_c == SRC_PIXEL)[..., None], rgba_c, texel)
            is_other = (kind_c != SRC_TEXTURE) & (kind_c != SRC_PIXEL)
        else:
            from ..ops.shade import SRC_PIXEL

            texel = jnp.where((kind_c == SRC_PIXEL)[..., None], rgba_c, 0.0)
            is_other = kind_c != SRC_PIXEL
        black = jnp.zeros_like(rgba_c).at[..., 3].set(1.0)
        texel = jnp.where(is_other[..., None], black, texel)
        tex_r, tex_g, tex_b = texel[:, 0], texel[:, 1], texel[:, 2]
        alb_r = srgb_to_linear_fast(tex_r)
        alb_g = srgb_to_linear_fast(tex_g)
        alb_b = srgb_to_linear_fast(tex_b)

        # material roles + per-hit modifier (trace.rs evaluate_hit:438-465:
        # modifier.modify(&texel, &material.value) on the SAMPLED texel)
        role = col(31).astype(jnp.int32)
        modifier = col(32).astype(jnp.int32)
        raw_value = col(33)
        lum = 0.2126 * tex_r + 0.7152 * tex_g + 0.0722 * tex_b
        mx = jnp.maximum(jnp.maximum(tex_r, tex_g), tex_b)
        mn = jnp.minimum(jnp.minimum(tex_r, tex_g), tex_b)
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
        em_on = role == int(MaterialRole.Emissive)
        em_scale = jnp.where(em_on, raw_value * 10.0, 0.0)
        em_r, em_g, em_b = alb_r * em_scale, alb_g * em_scale, alb_b * em_scale

        wx = ox + dx * t
        wy = oy + dy * t
        wz = oz + dz * t
        is_emissive = (em_r != 0.0) | (em_g != 0.0) | (em_b != 0.0)
        add_em = (hit & is_emissive).astype(jnp.float32)
        ret_r = ret_r + add_em * em_r * tp_r
        ret_g = ret_g + add_em * em_g * tp_g
        ret_b = ret_b + add_em * em_b * tp_b

        # direct lighting x10 (trace.rs:281-291)
        dir_r, dir_g, dir_b = _light_sum_soa(lights, wx, wy, wz, nx, ny, nz)
        add_d = (hit & ~is_emissive).astype(jnp.float32) * (10.0 / jnp.pi)
        ret_r = ret_r + add_d * dir_r * tp_r * alb_r
        ret_g = ret_g + add_d * dir_g * tp_g * alb_g
        ret_b = ret_b + add_d * dir_b * tp_b * alb_b

        # bounce: specular vs cosine diffuse (trace.rs:293-307)
        p_spec = jnp.clip(spec_w, 0.0, 1.0)
        choose_spec = jax.random.uniform(k1, p_spec.shape) < p_spec
        pdf = jnp.where(choose_spec, p_spec, 1.0 - p_spec)
        d_dot_n = dx * nx + dy * ny + dz * nz
        refl_x = dx - 2.0 * d_dot_n * nx
        refl_y = dy - 2.0 * d_dot_n * ny
        refl_z = dz - 2.0 * d_dot_n * nz

        # cosine hemisphere sample around n
        r1 = jax.random.uniform(k2, p_spec.shape)
        r2 = jax.random.uniform(k3, p_spec.shape)
        phi = 2.0 * jnp.pi * r1
        sq = jnp.sqrt(r2)
        # tangent = n x pick, pick = |n.x| < 0.9 ? (1,0,0) : (0,1,0)
        pick_x = jnp.where(jnp.abs(nx) < 0.9, 1.0, 0.0)
        pick_y = 1.0 - pick_x
        tx = -nz * pick_y
        ty = nz * pick_x
        tz = nx * pick_y - ny * pick_x
        inv_tl = 1.0 / jnp.maximum(jnp.sqrt(tx * tx + ty * ty + tz * tz), 1e-20)
        tx, ty, tz = tx * inv_tl, ty * inv_tl, tz * inv_tl
        # bitan = n x tangent
        bx = ny * tz - nz * ty
        by = nz * tx - nx * tz
        bz = nx * ty - ny * tx
        ca, sa = jnp.cos(phi) * sq, jnp.sin(phi) * sq
        cz_ = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
        cos_x = tx * ca + bx * sa + nx * cz_
        cos_y = ty * ca + by * sa + ny * cz_
        cos_z = tz * ca + bz * sa + nz * cz_

        spec_f = choose_spec.astype(jnp.float32)
        new_dx = spec_f * refl_x + (1.0 - spec_f) * cos_x
        new_dy = spec_f * refl_y + (1.0 - spec_f) * cos_y
        new_dz = spec_f * refl_z + (1.0 - spec_f) * cos_z
        tp_spec = spec_w / jnp.maximum(pdf, 1e-6)
        tp_diff = (1.0 - p_spec) / jnp.maximum(pdf * jnp.pi, 1e-6)
        new_tp_r = jnp.where(choose_spec, tp_r * tp_spec, tp_r * alb_r * tp_diff)
        new_tp_g = jnp.where(choose_spec, tp_g * tp_spec, tp_g * alb_g * tp_diff)
        new_tp_b = jnp.where(choose_spec, tp_b * tp_spec, tp_b * alb_b * tp_diff)

        miss_f = ((~(tri >= 0)) & active).astype(jnp.float32)
        if sky_pre is not None:
            # ShapeFX Sky node on the miss terminal: the same render_miss_d3
            # sky the rasterizer draws (trace.rs:332-346 — color evaluated
            # in sRGB then converted to linear before accumulating). The
            # (P,3)/(P,4) AoS shapes inside sky_miss only touch miss lanes'
            # worth of work once per bounce.
            from ..shapefx.render import sky_miss

            rd = jnp.stack([dx, dy, dz], axis=-1)
            col = sky_miss(sky_pre, rd, cam_pos)

            def sky_lin(c):
                return srgb_to_linear_fast(jnp.clip(col[..., c], 0.0, 1.0))
        else:
            # miss -> sky gradient (debug sky, rasterizer.rs:1824-1842
            # analogue). Reference divergence (documented on Tracer): with
            # no miss nodes the reference adds NOTHING (black).
            sky_t = (jnp.clip(dy, -1.0, 1.0) + 1.0) * 0.5

            def sky_lin(c):
                return srgb_to_linear_fast(
                    sky_horizon[c] + (sky_zenith[c] - sky_horizon[c]) * sky_t
                )

        ret_r = ret_r + miss_f * sky_lin(0) * tp_r
        ret_g = ret_g + miss_f * sky_lin(1) * tp_g
        ret_b = ret_b + miss_f * sky_lin(2) * tp_b

        # russian roulette (trace.rs:310-318)
        pmax = jnp.clip(
            jnp.maximum(jnp.maximum(new_tp_r, new_tp_g), new_tp_b), 0.001, 1.0
        )
        rr = jax.random.uniform(jax.random.fold_in(k1, 99), pmax.shape)
        survive = rr <= pmax
        inv_pmax = 1.0 / pmax
        new_tp_r = new_tp_r * inv_pmax
        new_tp_g = new_tp_g * inv_pmax
        new_tp_b = new_tp_b * inv_pmax

        # carry updates select with where(), NOT arithmetic masking: missed
        # rays have t=inf, so wx=inf and 0*inf would NaN the carried origin —
        # today's accumulations all re-mask, but any future float-mask
        # contribution would silently NaN the frame
        new_active = hit & ~is_emissive & survive
        ox = jnp.where(new_active, wx + nx * 0.01, ox)
        oy = jnp.where(new_active, wy + ny * 0.01, oy)
        oz = jnp.where(new_active, wz + nz * 0.01, oz)
        dx = jnp.where(new_active, new_dx, dx)
        dy = jnp.where(new_active, new_dy, dy)
        dz = jnp.where(new_active, new_dz, dz)
        tp_r = jnp.where(new_active, new_tp_r, tp_r)
        tp_g = jnp.where(new_active, new_tp_g, tp_g)
        tp_b = jnp.where(new_active, new_tp_b, tp_b)
        return (
            ox, oy, oz, dx, dy, dz, ret_r, ret_g, ret_b, tp_r, tp_g, tp_b,
            new_active,
        ), None

    init = (
        ox, oy, oz, dx, dy, dz,
        jnp.zeros(p), jnp.zeros(p), jnp.zeros(p),
        jnp.ones(p), jnp.ones(p), jnp.ones(p),
        jnp.ones(p, bool),
    )
    carry, _ = jax.lax.scan(bounce, init, jnp.arange(bounces, dtype=jnp.int32))
    ret_r, ret_g, ret_b = carry[6], carry[7], carry[8]

    rgba = jnp.stack([ret_r, ret_g, ret_b, jnp.ones(p)], axis=-1)
    return rgba.reshape(height, width, 4)
