"""NumPy oracle: a direct scalar port of the reference rasterizer's per-pixel
algorithm (reference src/rasterizer.rs, src/batch/batch3d.rs, src/edge.rs).

Deliberately written loop-by-loop like the Rust code (slow — use tiny frames
in tests). The device pipeline must match this within quantization tolerance.
"""

from __future__ import annotations

import math

import numpy as np

from rusterix_tpu.models.batch import CullMode, SampleMode
from rusterix_tpu.utils.color import (
    linear_to_srgb_fast,
    srgb_to_linear_fast,
)

NEAR = 0.1


def clip_and_project(batch, view, proj, width, height):
    """Port of Batch3D::clip_and_project (batch3d.rs:482-740).

    Returns dict with projected_vertices, clipped_indices, clipped_uvs,
    clipped_normals, edges [(a,b,c)*3, visible].
    """
    vm = view @ batch.transform_3d
    vsv = [vm @ v for v in batch.vertices.astype(np.float64)]

    clipped_indices = [tuple(t) for t in batch.indices]
    clipped_uvs = [np.array(u, np.float64) for u in batch.uvs]
    has_n = len(batch.normals) == len(batch.vertices) and len(batch.normals) > 0
    clipped_normals = [np.array(n, np.float64) for n in batch.normals] if has_n else [
        np.zeros(3) for _ in batch.vertices
    ]

    new_vertices, new_uvs, new_normals = [], [], []
    edge_visibility = [True] * len(batch.indices)

    for tri_idx, (i0, i1, i2) in enumerate(batch.indices):
        v0, v1, v2 = vsv[i0], vsv[i1], vsv[i2]
        if batch.cull_mode != CullMode.Off:
            orient = (v1[0] - v0[0]) * (v2[1] - v0[1]) - (v1[1] - v0[1]) * (v2[0] - v0[0])
            is_front = orient > 0.0
            if batch.cull_mode == CullMode.Back and is_front:
                continue
            if batch.cull_mode == CullMode.Front and not is_front:
                continue
        uv0, uv1, uv2 = clipped_uvs[i0], clipped_uvs[i1], clipped_uvs[i2]
        n0, n1, n2 = clipped_normals[i0], clipped_normals[i1], clipped_normals[i2]

        ins = [v[2] < -NEAR for v in (v0, v1, v2)]
        if all(ins):
            continue
        edge_visibility[tri_idx] = False
        if not any(ins):
            continue

        verts = [(v0, uv0, n0), (v1, uv1, n1), (v2, uv2, n2)]
        poly_idx = []
        new_vis = []
        for i in range(3):
            cur, uvc, nc = verts[i]
            nxt, uvn, nn_ = verts[(i + 1) % 3]
            if cur[2] < -NEAR:
                new_vertices.append(cur.copy())
                new_uvs.append(uvc.copy())
                new_normals.append(nc.copy())
                poly_idx.append(len(batch.vertices) + len(new_vertices) - 1)
                new_vis.append(True)
            if (cur[2] < -NEAR) != (nxt[2] < -NEAR):
                t = (-NEAR - cur[2]) / (nxt[2] - cur[2])
                inter = cur + t * (nxt - cur)
                uvi = uvc + t * (uvn - uvc)
                ni = nc * (1.0 - t) + nn_ * t
                ln = np.linalg.norm(ni)
                if ln > 0:
                    ni = ni / ln
                new_vertices.append(inter)
                new_uvs.append(uvi)
                new_normals.append(ni)
                poly_idx.append(len(batch.vertices) + len(new_vertices) - 1)
                new_vis.append(True)
        for i in range(1, len(poly_idx) - 1):
            clipped_indices.append((poly_idx[0], poly_idx[i], poly_idx[i + 1]))
        edge_visibility.extend(new_vis)

    vsv = vsv + new_vertices
    clipped_uvs = clipped_uvs + new_uvs
    clipped_normals = clipped_normals + new_normals

    projected = []
    for v in vsv:
        r = proj @ v
        w = r[3]
        projected.append(
            np.array(
                [
                    ((r[0] / w) * 0.5 + 0.5) * width,
                    ((-r[1] / w) * 0.5 + 0.5) * height,
                    r[2] / w,
                    w,
                ]
            )
        )

    def is_front_facing(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) > 0.0

    edges = []
    for tri_idx, (i0, i1, i2) in enumerate(clipped_indices):
        v0 = projected[i0]
        v1 = projected[i1]
        v2 = projected[i2]
        if batch.cull_mode == CullMode.Off:
            if is_front_facing(v0, v1, v2):
                v1, v2 = v2, v1
            visible = True
        elif batch.cull_mode == CullMode.Front:
            visible = not is_front_facing(v0, v1, v2)
        else:
            if is_front_facing(v0, v1, v2):
                v1, v2 = v2, v1
                visible = True
            else:
                visible = False
        coeffs = []
        for a, b in ((v0, v1), (v1, v2), (v2, v0)):
            coeffs.append((b[1] - a[1], a[0] - b[0], b[0] * a[1] - b[1] * a[0]))
        ev = edge_visibility[tri_idx] if tri_idx < len(edge_visibility) else True
        edges.append((coeffs, ev and visible))

    return {
        "projected": projected,
        "indices": clipped_indices,
        "uvs": clipped_uvs,
        "normals": clipped_normals,
        "edges": edges,
        "has_normals": has_n,
    }


def barycentric(a, b, c, p):
    ac = (c[0] - a[0], c[1] - a[1])
    ab = (b[0] - a[0], b[1] - a[1])
    ap = (p[0] - a[0], p[1] - a[1])
    pc = (c[0] - p[0], c[1] - p[1])
    pb = (b[0] - p[0], b[1] - p[1])
    area = ac[0] * ab[1] - ac[1] * ab[0]
    alpha = (pc[0] * pb[1] - pc[1] * pb[0]) / area
    beta = (ac[0] * ap[1] - ac[1] * ap[0]) / area
    return alpha, beta, 1.0 - alpha - beta


def screen_to_world(x, y, z_ndc, inv_proj, inv_view, width, height):
    ndc = np.array([2 * x / width - 1, 1 - 2 * y / height, z_ndc, 1.0])
    view = inv_proj @ ndc
    view = view / view[3]
    world = inv_view @ view
    return world[:3]


def shade_fast_brdf(base, rough, metal, emissive, n, v, l, radiance):
    """rasterizer.rs:1906-1951"""
    ndl = max(0.0, float(np.dot(n, l)))
    if ndl <= 0.0:
        return np.array(emissive, np.float64)
    f0 = 0.04 + (np.asarray(base) - 0.04) * metal
    kd = np.asarray(base) * (1.0 - metal)
    kd = kd * (1.0 - float(np.max(f0)))
    a = max(rough * rough, 1e-4)
    shin = min(2048.0, max(1.0, 2.0 / a - 2.0))
    h = l + v
    h = h / np.linalg.norm(h)
    ndh = max(0.0, float(np.dot(n, h)))
    spec = 0.0 if ndh <= 0.0 else 2.0 ** (shin * math.log2(ndh))
    ndv = max(0.0, float(np.dot(n, v)))
    x5 = (1.0 - min(1.0, ndv)) ** 5
    f = f0 + (1.0 - f0) * x5
    return (kd * ndl + f * spec * ndl) * np.asarray(radiance) + emissive


def rasterize_oracle(
    scene,
    assets,
    view,
    proj,
    width,
    height,
    ambient=None,
    background_shader=None,
    background_color=None,
    sample_mode=SampleMode.Nearest,
    hash_anim=0,
):
    """Opaque-3D + background portion of Rasterizer::rasterize for small frames."""
    inv_view = np.linalg.inv(view.astype(np.float64))
    inv_proj = np.linalg.inv(proj.astype(np.float64))
    camera_pos = inv_view[:3, 3]

    buf = np.zeros((height, width, 4), np.uint8)
    if background_color is not None:
        buf[:, :] = background_color
    if background_shader is not None:
        for y in range(height):
            for x in range(width):
                buf[y, x] = background_shader.shade_pixel(
                    (x / width, y / height), (float(width), float(height))
                )

    zbuf = np.ones((height, width), np.float64)
    lights = scene.all_lights()

    for batch in scene.all_d3_batches():
        d = clip_and_project(batch, view, proj, width, height)
        for tri_idx, (coeffs, visible) in enumerate(d["edges"]):
            if not visible:
                continue
            i0, i1, i2 = d["indices"][tri_idx]
            v0, v1, v2 = d["projected"][i0], d["projected"][i1], d["projected"][i2]
            uv0, uv1, uv2 = d["uvs"][i0], d["uvs"][i1], d["uvs"][i2]

            min_x = max(0, int(np.floor(min(v0[0], v1[0], v2[0]))))
            max_x = min(width, int(np.ceil(max(v0[0], v1[0], v2[0]))))
            min_y = max(0, int(np.floor(min(v0[1], v1[1], v2[1]))))
            max_y = min(height, int(np.ceil(max(v0[1], v1[1], v2[1]))))
            for ty in range(min_y, max_y):
                for tx in range(min_x, max_x):
                    p = (tx + 0.5, ty + 0.5)
                    if not all(a * p[0] + b * p[1] + c >= 0.0 for a, b, c in coeffs):
                        continue
                    alpha, beta, gamma = barycentric(v0, v1, v2, p)
                    one_over_z = alpha / v0[2] + beta / v1[2] + gamma / v2[2]
                    z = 1.0 / one_over_z
                    if not (z < zbuf[ty, tx]):
                        continue
                    iu = uv0[0] / v0[3] * alpha + uv1[0] / v1[3] * beta + uv2[0] / v2[3] * gamma
                    iv = uv0[1] / v0[3] * alpha + uv1[1] / v1[3] * beta + uv2[1] / v2[3] * gamma
                    irw = alpha / v0[3] + beta / v1[3] + gamma / v2[3]
                    iu /= irw
                    iv /= irw
                    world = screen_to_world(p[0], p[1], z, inv_proj, inv_view, width, height)

                    if d["has_normals"]:
                        n0, n1, n2 = d["normals"][i0], d["normals"][i1], d["normals"][i2]
                        normal = n0 * alpha + n1 * beta + n2 * gamma
                        ln = np.linalg.norm(normal)
                        if ln > 0:
                            normal = normal / ln
                        vd = camera_pos - world
                        vd = vd / np.linalg.norm(vd)
                        if float(np.dot(normal, vd)) < 0.0:
                            normal = -normal
                    else:
                        normal = np.zeros(3)

                    # texel
                    from rusterix_tpu.models.batch import PixelSourceKind

                    src = batch.source
                    if src.kind == PixelSourceKind.StaticTileIndex:
                        tile = assets.tile_list[src.index]
                        fi = scene.animation_frame % len(tile.textures)
                        texel = tile.textures[fi].sample(iu, iv, sample_mode, batch.repeat_mode)
                    elif src.kind in (PixelSourceKind.Pixel, PixelSourceKind.Color):
                        texel = src.pixel
                    else:
                        texel = (0, 0, 0, 255)

                    color = np.array(texel, np.float64) / 255.0
                    base = srgb_to_linear_fast(color[:3])
                    opacity = color[3]
                    rough, metal = 0.5, 0.0
                    emissive = np.zeros(3)

                    lit = np.zeros(3)
                    occlusion = 1.0
                    vd = camera_pos - world
                    vd = vd / np.linalg.norm(vd)
                    if occlusion > 0.0:
                        if ambient is not None:
                            hemi = 0.5 * (normal[1] + 1.0)
                            kd = base * (1.0 - metal) * (1.0 - 0.04)
                            lit += np.asarray(ambient[:3]) * kd * hemi
                        lit *= occlusion
                    hemi = 0.5 * (normal[1] + 1.0)
                    kd = base * (1.0 - metal) * (1.0 - 0.04)
                    lit += np.asarray(batch.ambient_color, np.float64) * kd * hemi
                    for light in lights:
                        radiance = light.radiance_at(world, normal, hash_anim)
                        if radiance is None:
                            continue
                        ldir = light.position - world
                        ldir = ldir / np.linalg.norm(ldir)
                        lit += shade_fast_brdf(base, rough, metal, np.zeros(3), normal, vd, ldir, radiance)
                    lit += emissive

                    out = np.empty(4)
                    out[:3] = linear_to_srgb_fast(lit)
                    out[3] = opacity
                    texel_u8 = np.clip(out, 0, 1) * 255.0 + 0.5
                    texel_u8 = texel_u8.astype(np.int32).astype(np.uint8)
                    if texel_u8[3] == 255:
                        buf[ty, tx] = texel_u8
                        zbuf[ty, tx] = z
    return buf, zbuf
