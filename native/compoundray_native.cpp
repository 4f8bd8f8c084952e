// Native host runtime for compound_ray_tpu.
//
// The reference keeps its host-side runtime in C++ (scene ingest
// MulticamScene.cpp, GAS build :1229-1509, hitscan sutil/hitscanprocessing.cpp,
// .eye parsing :352-361).  The TPU build keeps the device path in XLA/Pallas
// but provides the same native substrate for the host-side hot spots:
//
//   cr_parse_eye_file    — .eye CSV -> packed (n, 8) float rows
//   cr_build_clusters    — recursive median-split clustering over triangle
//                          centroids (the accel build), returns the triangle
//                          reordering + per-cluster ranges
//   cr_point_in_mesh     — ray-parity point-in-mesh test over object-space
//                          triangles (isInsideHitGeometry backend)
//   cr_write_ppm         — binary P6 writer (saveFrameAs backend)
//
// Exposed via a plain C ABI for ctypes; Python falls back to numpy
// implementations when the library is absent.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <numeric>
#include <sstream>
#include <string>
#include <vector>

extern "C" {

void cr_free(void* p) { std::free(p); }

// ---------------------------------------------------------------- eye files
// Returns 0 on success; *out_data is malloc'd (n*8 floats), caller cr_free's.
// Accepts both the current 8-field format and the legacy 7-field format the
// reference's own eyeGenerator still writes (eyeGenerator/main.cpp:78,
// data/eyes/old-eye-specification/): a missing focal-point offset reads 0.
// A non-empty line with fewer than 7 numbers is malformed: returns -4 with
// *out_count set to its 1-based line number.
int cr_parse_eye_file(const char* path, float** out_data, int* out_count) {
    std::ifstream f(path);
    if (!f.is_open()) return -1;
    std::vector<float> rows;
    rows.reserve(8192);
    std::string line;
    int count = 0;
    int line_no = 0;
    while (std::getline(f, line)) {
        ++line_no;
        if (line.find_first_not_of(" \t\r\n") == std::string::npos) continue;
        const char* s = line.c_str();
        char* end = nullptr;
        float vals[8] = {0, 0, 0, 0, 0, 0, 0, 0};
        int got = 0;
        for (; got < 8; ++got) {
            vals[got] = std::strtof(s, &end);
            if (end == s) break;
            s = end;
        }
        if (got < 7) {  // garbage line: report it instead of silently skipping
            *out_count = line_no;
            return -4;
        }
        rows.insert(rows.end(), vals, vals + 8);
        ++count;
    }
    if (count == 0) return -2;
    float* buf = static_cast<float*>(std::malloc(rows.size() * sizeof(float)));
    if (!buf) return -3;
    std::memcpy(buf, rows.data(), rows.size() * sizeof(float));
    *out_data = buf;
    *out_count = count;
    return 0;
}

// ------------------------------------------------------------- cluster build
// tris: (n, 9) rows [v0, e1, e2].  Fills order[n] with the triangle
// permutation and cluster_sizes[max_clusters] with each cluster's triangle
// count; returns the number of clusters (or <0 on error).
static void median_split(const std::vector<float>& cx,
                         const std::vector<float>& cy,
                         const std::vector<float>& cz,
                         std::vector<int>& idx, int lo, int hi, int leaf,
                         std::vector<std::pair<int, int>>& ranges) {
    const int n = hi - lo;
    if (n <= leaf) {
        ranges.emplace_back(lo, hi);
        return;
    }
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = lo; i < hi; ++i) {
        const int t = idx[i];
        const float c[3] = {cx[t], cy[t], cz[t]};
        for (int d = 0; d < 3; ++d) {
            mn[d] = std::min(mn[d], c[d]);
            mx[d] = std::max(mx[d], c[d]);
        }
    }
    int axis = 0;
    float ext = mx[0] - mn[0];
    if (mx[1] - mn[1] > ext) { axis = 1; ext = mx[1] - mn[1]; }
    if (mx[2] - mn[2] > ext) { axis = 2; }
    const std::vector<float>& key = axis == 0 ? cx : (axis == 1 ? cy : cz);
    const int mid = lo + n / 2;
    std::nth_element(idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
                     [&key](int a, int b) { return key[a] < key[b]; });
    median_split(cx, cy, cz, idx, lo, mid, leaf, ranges);
    median_split(cx, cy, cz, idx, mid, hi, leaf, ranges);
}

int cr_build_clusters(const float* tris, int n, int leaf_size, int* order,
                      int* cluster_sizes, int max_clusters) {
    if (n <= 0 || leaf_size <= 0) return -1;
    std::vector<float> cx(n), cy(n), cz(n);
    for (int i = 0; i < n; ++i) {
        const float* r = tris + 9 * i;
        // centroid of (v0, v0+e1, v0+e2) = v0 + (e1 + e2) / 3
        cx[i] = r[0] + (r[3] + r[6]) / 3.0f;
        cy[i] = r[1] + (r[4] + r[7]) / 3.0f;
        cz[i] = r[2] + (r[5] + r[8]) / 3.0f;
    }
    std::vector<int> idx(n);
    std::iota(idx.begin(), idx.end(), 0);
    std::vector<std::pair<int, int>> ranges;
    median_split(cx, cy, cz, idx, 0, n, leaf_size, ranges);
    if (static_cast<int>(ranges.size()) > max_clusters) return -2;
    std::memcpy(order, idx.data(), n * sizeof(int));
    for (size_t c = 0; c < ranges.size(); ++c)
        cluster_sizes[c] = ranges[c].second - ranges[c].first;
    return static_cast<int>(ranges.size());
}

// ------------------------------------------------------------ point in mesh
// Ray-parity test in object space (semantics of the reference's hitscan:
// +x ray from just outside the AABB toward the query point; count triangle
// crossings with hit.x <= point.x; odd => inside).
// tris: (n, 9) rows of raw vertices [p0, p1, p2] in OBJECT space.
int cr_point_in_mesh(const float* tris, int n, const float* obj_point,
                     float aabb_min_x) {
    const float px = obj_point[0], py = obj_point[1], pz = obj_point[2];
    const float sx = aabb_min_x - 1.0f;
    // ray dir = normalize(p - start): start differs from p only in x
    const float dlen = px - sx;
    if (dlen == 0.0f) return 0;
    const float dir = dlen > 0.0f ? 1.0f : -1.0f;  // along x
    int crossings = 0;
    for (int i = 0; i < n; ++i) {
        const float* r = tris + 9 * i;
        const float p0[3] = {r[0], r[1], r[2]};
        const float p1[3] = {r[3], r[4], r[5]};
        const float p2[3] = {r[6], r[7], r[8]};
        const float e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
        const float e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
        float nrm[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                        e1[2] * e2[0] - e1[0] * e2[2],
                        e1[0] * e2[1] - e1[1] * e2[0]};
        const float nl = std::sqrt(nrm[0] * nrm[0] + nrm[1] * nrm[1] +
                                   nrm[2] * nrm[2]);
        if (nl == 0.0f) continue;
        nrm[0] /= nl; nrm[1] /= nl; nrm[2] /= nl;
        const float denom = nrm[0] * dir;
        if (denom == 0.0f) continue;
        const float dist =
            ((p0[0] - sx) * nrm[0] + (p0[1] - py) * nrm[1] +
             (p0[2] - pz) * nrm[2]) / denom;
        if (dist == 0.0f || dist < 0.0f) continue;
        const float hx = sx + dist * dir;
        if (hx > px) continue;
        const float hit[3] = {hx, py, pz};
        bool inside = true;
        const float* corners[4] = {p0, p1, p2, p0};
        for (int e = 0; e < 3 && inside; ++e) {
            const float* a = corners[e];
            const float* b = corners[e + 1];
            const float eg[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
            const float fs[3] = {hit[0] - a[0], hit[1] - a[1], hit[2] - a[2]};
            const float cp[3] = {eg[1] * fs[2] - eg[2] * fs[1],
                                 eg[2] * fs[0] - eg[0] * fs[2],
                                 eg[0] * fs[1] - eg[1] * fs[0]};
            if (nrm[0] * cp[0] + nrm[1] * cp[1] + nrm[2] * cp[2] < 0.0f)
                inside = false;
        }
        if (inside) ++crossings;
    }
    return crossings % 2;
}

// ----------------------------------------------------------------- PPM write
// data: (h, w, 4) RGBA uint8, rows written bottom-to-top (frame row 0 is the
// bottom scanline, like the reference's buffer orientation).
int cr_write_ppm(const char* path, const uint8_t* data, int w, int h) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    std::fprintf(f, "P6\n%d %d\n255\n", w, h);
    std::vector<uint8_t> row(w * 3);
    for (int y = h - 1; y >= 0; --y) {
        const uint8_t* src = data + static_cast<size_t>(y) * w * 4;
        for (int x = 0; x < w; ++x) {
            row[3 * x + 0] = src[4 * x + 0];
            row[3 * x + 1] = src[4 * x + 1];
            row[3 * x + 2] = src[4 * x + 2];
        }
        std::fwrite(row.data(), 1, row.size(), f);
    }
    std::fclose(f);
    return 0;
}

}  // extern "C"
