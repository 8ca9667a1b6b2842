// Native host-side runtime components.
//
// The reference implements its host hot paths in Rust (earcutr triangulation
// used by the chunk builders, the swept-circle collision solver
// src/collision_world.rs:144-246, and Bresenham line rasterization
// src/rasterizer.rs:1777-1841). The TPU build keeps the device pipeline in
// JAX/Pallas and provides these host paths natively in C++ (loaded through
// ctypes; Python fallbacks exist for portability).
//
// Build: g++ -O2 -shared -fPIC -o librusterix_native.so rusterix_native.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- earcut --

// Ear-clipping triangulation of a simple polygon (CCW or CW), O(n^2).
// pts: n * 2 floats. out_idx: capacity 3*(n-2) ints. Returns tri count.
int rx_earcut(const double* pts, int n, int* out_idx) {
    if (n < 3) return 0;

    std::vector<int> idx(n);
    double area = 0.0;
    for (int i = 0; i < n; i++) {
        int j = (i + 1) % n;
        area += pts[2 * i] * pts[2 * j + 1] - pts[2 * j] * pts[2 * i + 1];
    }
    for (int i = 0; i < n; i++) idx[i] = i;
    if (area < 0.0) {  // normalize to CCW
        for (int i = 0; i < n; i++) idx[i] = n - 1 - i;
    }

    auto area2 = [&](int a, int b, int c) {
        double ax = pts[2 * a], ay = pts[2 * a + 1];
        double bx = pts[2 * b], by = pts[2 * b + 1];
        double cx = pts[2 * c], cy = pts[2 * c + 1];
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax);
    };
    auto inside = [&](int p, int a, int b, int c) {
        double px = pts[2 * p], py = pts[2 * p + 1];
        auto cross = [&](int u, int v) {
            return (pts[2 * v] - pts[2 * u]) * (py - pts[2 * u + 1]) -
                   (pts[2 * v + 1] - pts[2 * u + 1]) * (px - pts[2 * u]);
        };
        double d1 = cross(a, b), d2 = cross(b, c), d3 = cross(c, a);
        bool has_neg = (d1 < 0) || (d2 < 0) || (d3 < 0);
        bool has_pos = (d1 > 0) || (d2 > 0) || (d3 > 0);
        return !(has_neg && has_pos);
    };

    int count = 0;
    int guard = 10 * n * n;
    while ((int)idx.size() > 3 && guard-- > 0) {
        bool found = false;
        int m = (int)idx.size();
        for (int k = 0; k < m; k++) {
            int i0 = idx[(k - 1 + m) % m], i1 = idx[k], i2 = idx[(k + 1) % m];
            if (area2(i0, i1, i2) <= 1e-12) continue;
            bool ok = true;
            for (int j : idx) {
                if (j == i0 || j == i1 || j == i2) continue;
                // skip exact-duplicate bridge vertices
                if ((pts[2 * j] == pts[2 * i0] && pts[2 * j + 1] == pts[2 * i0 + 1]) ||
                    (pts[2 * j] == pts[2 * i1] && pts[2 * j + 1] == pts[2 * i1 + 1]) ||
                    (pts[2 * j] == pts[2 * i2] && pts[2 * j + 1] == pts[2 * i2 + 1]))
                    continue;
                if (inside(j, i0, i1, i2)) { ok = false; break; }
            }
            if (ok) {
                out_idx[count * 3] = i0;
                out_idx[count * 3 + 1] = i1;
                out_idx[count * 3 + 2] = i2;
                count++;
                idx.erase(idx.begin() + k);
                found = true;
                break;
            }
        }
        if (!found) {
            // clip the least-degenerate ear to guarantee progress
            int best_k = 0; double best_a = -1e300;
            for (int k = 0; k < m; k++) {
                double a = area2(idx[(k - 1 + m) % m], idx[k], idx[(k + 1) % m]);
                if (a > best_a) { best_a = a; best_k = k; }
            }
            int k = best_k;
            out_idx[count * 3] = idx[(k - 1 + m) % m];
            out_idx[count * 3 + 1] = idx[k];
            out_idx[count * 3 + 2] = idx[(k + 1) % m];
            count++;
            idx.erase(idx.begin() + k);
        }
    }
    if ((int)idx.size() == 3) {
        out_idx[count * 3] = idx[0];
        out_idx[count * 3 + 1] = idx[1];
        out_idx[count * 3 + 2] = idx[2];
        count++;
    }
    return count;
}

// ------------------------------------------------------------- collision --

// Swept-circle vs segments with wall sliding, friction 0.5, push-out.
// Port of collision_world.rs:144-246 (same constants and order).
// segs: ns * 4 floats (x0, y0, x1, y1). io_pos: in/out (x, y, z).
// move: (dx, dy, dz). Returns 1 when blocked.
static bool check_intersection(const float* s2d, const float* e2d,
                               const float* a, const float* b, float radius,
                               float* out_dist, float* out_nx, float* out_ny) {
    float lvx = b[0] - a[0], lvy = b[1] - a[1];
    float llen = std::sqrt(lvx * lvx + lvy * lvy);
    if (llen < 1e-7f) return false;
    float dx = lvx / llen, dy = lvy / llen;
    float nx = -dy, ny = dx;

    float sd = (s2d[0] - a[0]) * nx + (s2d[1] - a[1]) * ny;
    float ed = (e2d[0] - a[0]) * nx + (e2d[1] - a[1]) * ny;
    if (sd > radius && ed > radius) return false;
    if (sd < -radius && ed < -radius) return false;

    float diff = ed - sd, t;
    if (std::fabs(diff) < 1e-7f) {
        if (std::fabs(sd) <= radius) t = 0.0f; else return false;
    } else {
        float desired = sd < 0.0f ? -radius : radius;
        t = (desired - sd) / diff;
    }
    if (t < 0.0f || t > 1.0f) return false;

    float ix = s2d[0] + (e2d[0] - s2d[0]) * t;
    float iy = s2d[1] + (e2d[1] - s2d[1]) * t;
    float proj = (ix - a[0]) * dx + (iy - a[1]) * dy;
    if (proj < 0.0f || proj > llen) {
        const float* corner = proj < 0.0f ? a : b;
        float tcx = ix - corner[0], tcy = iy - corner[1];
        float d2 = tcx * tcx + tcy * tcy;
        if (d2 > radius * radius) return false;
        float d = std::sqrt(d2);
        float cnx, cny;
        if (d > 1e-7f) { cnx = tcx / d; cny = tcy / d; }
        else {
            float scx = s2d[0] - corner[0], scy = s2d[1] - corner[1];
            float sn = std::sqrt(scx * scx + scy * scy);
            if (sn > 1e-7f) { cnx = scx / sn; cny = scy / sn; }
            else { cnx = 1.0f; cny = 0.0f; }
        }
        float ddx = ix - s2d[0], ddy = iy - s2d[1];
        *out_dist = std::sqrt(ddx * ddx + ddy * ddy);
        *out_nx = cnx; *out_ny = cny;
        return true;
    }
    float ddx = ix - s2d[0], ddy = iy - s2d[1];
    *out_dist = std::sqrt(ddx * ddx + ddy * ddy);
    if (sd < 0.0f) { *out_nx = -nx; *out_ny = -ny; }
    else { *out_nx = nx; *out_ny = ny; }
    return true;
}

int rx_move_distance(const float* segs, int ns, float* io_pos,
                     const float* move, float radius) {
    const float EPS = 0.001f;
    float cur[2] = {io_pos[0], io_pos[2]};
    float rem[2] = {move[0], move[2]};
    io_pos[1] += move[1];
    int blocked = 0;

    for (int iter = 0; iter < 3; iter++) {
        float mag2 = rem[0] * rem[0] + rem[1] * rem[1];
        if (mag2 <= EPS * EPS) break;

        float best_d = 1e30f, best_nx = 0, best_ny = 0;
        bool found = false;
        float end2d[2] = {cur[0] + rem[0], cur[1] + rem[1]};
        for (int i = 0; i < ns; i++) {
            float d, nx, ny;
            if (check_intersection(cur, end2d, segs + 4 * i, segs + 4 * i + 2,
                                   radius, &d, &nx, &ny)) {
                if (d < best_d) { best_d = d; best_nx = nx; best_ny = ny; found = true; }
            }
        }
        if (!found) {
            cur[0] += rem[0]; cur[1] += rem[1];
            rem[0] = rem[1] = 0.0f;
        } else {
            blocked = 1;
            float mlen = std::sqrt(mag2);
            float mdx = rem[0] / mlen, mdy = rem[1] / mlen;
            cur[0] += mdx * (best_d - EPS);
            cur[1] += mdy * (best_d - EPS);
            float leftover = mlen - best_d;
            if (leftover > EPS) {
                float ncomp = best_nx * rem[0] + best_ny * rem[1];
                float sx = rem[0] - ncomp * best_nx;
                float sy = rem[1] - ncomp * best_ny;
                float slen = std::sqrt(sx * sx + sy * sy);
                if (slen > EPS) {
                    rem[0] = sx / slen * leftover * 0.5f;
                    rem[1] = sy / slen * leftover * 0.5f;
                } else { rem[0] = rem[1] = 0.0f; }
            } else { rem[0] = rem[1] = 0.0f; }
            cur[0] += best_nx * EPS;
            cur[1] += best_ny * EPS;
        }
    }

    // final push-out pass
    for (int i = 0; i < ns; i++) {
        const float* a = segs + 4 * i;
        const float* b = segs + 4 * i + 2;
        float ex = b[0] - a[0], ey = b[1] - a[1];
        float l2 = ex * ex + ey * ey;
        float px = cur[0] - a[0], py = cur[1] - a[1];
        float dist, nx, ny;
        if (l2 < 1e-12f) {
            float d2 = px * px + py * py;
            if (d2 > radius * radius) continue;
            dist = std::sqrt(d2);
            if (dist > 1e-7f) { nx = px / dist; ny = py / dist; }
            else { nx = 1.0f; ny = 0.0f; }
        } else {
            float llen = std::sqrt(l2);
            float dx = ex / llen, dy = ey / llen;
            float t = px * dx + py * dy;
            if (t < 0.0f) t = 0.0f;
            if (t > llen) t = llen;
            float cx = a[0] + dx * t, cy = a[1] + dy * t;
            float ddx = cur[0] - cx, ddy = cur[1] - cy;
            float d2 = ddx * ddx + ddy * ddy;
            if (d2 > radius * radius) continue;
            dist = std::sqrt(d2);
            if (dist > 1e-7f) { nx = ddx / dist; ny = ddy / dist; }
            else { nx = 1.0f; ny = 0.0f; }
        }
        float pen = radius - dist;
        if (pen > 0.0f) {
            blocked = 1;
            cur[0] += nx * (pen + EPS);
            cur[1] += ny * (pen + EPS);
        }
    }

    io_pos[0] = cur[0];
    io_pos[2] = cur[1];
    return blocked;
}

// ------------------------------------------------------------- bresenham --

// Batch Bresenham line draw into an RGBA8 buffer
// (port of rasterizer.rs:1777-1841, endpoint-exclusive).
void rx_draw_lines(uint8_t* pixels, int width, int height,
                   const float* segments, const uint8_t* colors, int n) {
    for (int i = 0; i < n; i++) {
        int x0 = (int)segments[4 * i], y0 = (int)segments[4 * i + 1];
        int x1 = (int)segments[4 * i + 2], y1 = (int)segments[4 * i + 3];
        const uint8_t* c = colors + 4 * i;
        int dx = std::abs(x1 - x0), dy = std::abs(y1 - y0);
        int sx = x0 < x1 ? 1 : -1, sy = y0 < y1 ? 1 : -1;
        int err = dx - dy, x = x0, y = y0;
        int guard = 4 * (dx + dy + 2);
        while ((x != x1 || y != y1) && guard-- > 0) {
            if (x >= 0 && x < width && y >= 0 && y < height)
                std::memcpy(pixels + 4 * (y * width + x), c, 4);
            int e2 = err * 2;
            if (e2 > -dy) { err -= dy; x += sx; }
            if (e2 < dx) { err += dx; y += sy; }
        }
    }
}

// ------------------------------------------------------ triangle packing --

// Denormalize indexed triangles into per-corner SoA (the per-frame scene
// pack hot loop, ops/scene_pack.py pack_batches_3d).
// verts: nv*4, uvs: nv*2, normals: nv*3 (may be null), indices: nt*3.
void rx_pack_triangles(const float* verts, const float* uvs,
                       const float* normals, const int32_t* indices, int nt,
                       float* out_pos, float* out_uv, float* out_nrm) {
    for (int t = 0; t < nt; t++) {
        for (int k = 0; k < 3; k++) {
            int vi = indices[3 * t + k];
            std::memcpy(out_pos + (t * 3 + k) * 4, verts + vi * 4, 16);
            std::memcpy(out_uv + (t * 3 + k) * 2, uvs + vi * 2, 8);
            if (normals)
                std::memcpy(out_nrm + (t * 3 + k) * 3, normals + vi * 3, 12);
        }
    }
}

}  // extern "C"
