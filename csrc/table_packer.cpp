// Native packer for the blocked triangle tables (ops/pallas/tables.py).
//
// The reference performs its whole scene build in native code
// (ref: src/scene_utils.cpp + src/app_utils.cpp build path); here the
// per-triangle f64 precompute — plane/barycentric-gradient columns,
// watertight acceptance bounds, shading-normal basis, material payload
// rows and the per-triangle AABBs — was the dominant host cost of large
// imports in numpy (~60% of a 2M-tri build). This packer performs the
// identical arithmetic in one pass.
//
// BITWISE CONTRACT: every operation reproduces the numpy expression in
// ops/pallas/tables.py:build_blocked_tables in the same order and
// precision (f64 math, f32 on store; col 12 is computed in f32 like
// numpy's weak-scalar promotion). The Makefile compiles this file with
// -ffp-contract=off so the compiler cannot fuse a*b+c into fma (numpy
// never does) — tests/test_table_packer.py asserts bitwise equality
// against the numpy twin.
//
// Layouts packed here (see tables.py for the authoritative doc):
//   p   [Tp, 16] f32  — cols 0..2 dot terms, 3..11 n/g1/g2, 12..14
//                       watertight bounds, 15 zero
//   nrm [8, nb*3*TB] f32 viewed as [8, nb, 3(seg), TB]:
//     rows 0-2 seg0 N0 | seg1 dN1 | seg2 dN2
//     rows 3-5 seg0 albedo, row 6 seg0 id_hi, row 7 seg0 id_lo
//     row 3 seg1 type+4*emissive, row 4 seg1 ior, rows 5-7 seg1 emission
//   tlo/thi [Tp, 3] f32 — per-tri AABB (pad rows keep caller's +/-inf)

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {
constexpr int TB = 128;

inline double dot3(const double* a, const double* b) {
    return (a[0] * b[0] + a[1] * b[1]) + a[2] * b[2];
}
}  // namespace

extern "C" int pack_blocked_tables(
    const float* verts,          // [V, 3]
    const int32_t* tri_v,        // [T, 3]  (already treelet-ordered)
    const float* vert_normals,   // [V, 3] or nullptr
    const uint8_t* has_normals,  // [T]    (ordered)
    const int32_t* tri_mat,      // [T]    (ordered, clipped to [0, M))
    const float* mat_albedo,     // [M, 3]
    const float* mat_ior,        // [M]
    const int32_t* mat_type,     // [M]
    const int32_t* mat_emissive, // [M]
    const float* mat_emission,   // [M, 3]
    int64_t T,
    int64_t nb,                  // blocks (Tp = nb*TB)
    double wt_scale,             // WATERTIGHT_EPS_SCALE
    int64_t sb,                  // blocks per super (p8 layout only)
    int32_t p8_layout,           // 0: p rows [nb*TB, 16]; 1: p8 supers
    float* p,                    // [nb*TB, 16] or [ns*TB, sb*16], zeroed
    float* nrm,                  // [8, nb*3*TB]  pre-zeroed
    float* tlo,                  // [nb*TB, 3]    pre-filled +inf
    float* thi)                  // [nb*TB, 3]    pre-filled -inf
{
    const int64_t stride = nb * 3 * TB;  // nrm row stride
    const float wt_f = (float)wt_scale;
    const int64_t p8_row_w = sb * 16;    // p8 row width (floats)

    for (int64_t i = 0; i < T; ++i) {
        const int64_t v0 = tri_v[i * 3 + 0];
        const int64_t v1 = tri_v[i * 3 + 1];
        const int64_t v2 = tri_v[i * 3 + 2];
        double p0[3], p1[3], p2[3];
        for (int c = 0; c < 3; ++c) {
            p0[c] = (double)verts[v0 * 3 + c];
            p1[c] = (double)verts[v1 * 3 + c];
            p2[c] = (double)verts[v2 * 3 + c];
        }
        double e1[3], e2[3];
        for (int c = 0; c < 3; ++c) {
            e1[c] = p1[c] - p0[c];
            e2[c] = p2[c] - p0[c];
        }
        // n = cross(e1, e2); unit or zero for degenerates (numpy order):
        double n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                       e1[2] * e2[0] - e1[0] * e2[2],
                       e1[0] * e2[1] - e1[1] * e2[0]};
        const double nlen = std::sqrt(dot3(n, n));
        const bool degenerate = nlen < 1e-20;
        // numpy divides (n / max(nlen, 1e-30)), zeroing degenerates:
        const double nd = std::max(nlen, 1e-30);
        for (int c = 0; c < 3; ++c) n[c] = degenerate ? 0.0 : n[c] / nd;

        const double d00 = dot3(e1, e1);
        const double d01 = dot3(e1, e2);
        const double d11 = dot3(e2, e2);
        const double denom = d00 * d11 - d01 * d01;
        const double safe = std::fabs(denom) < 1e-30 ? 1.0 : denom;
        double g1[3], g2[3];
        for (int c = 0; c < 3; ++c) {
            g1[c] = degenerate ? 0.0 : (e1[c] * d11 - e2[c] * d01) / safe;
            g2[c] = degenerate ? 0.0 : (e2[c] * d00 - e1[c] * d01) / safe;
        }

        // ---- p row --------------------------------------------------
        // p8 layout (tables.py p8 contract): one super = a dense
        // [TB, SB*16] slab; block b of super s sits at columns
        // [b*16, (b+1)*16) of rows [s*TB, (s+1)*TB). Writing it here
        // skips the 2x-table transpose copy python would do (and, above
        // the VMEM table ceiling, the row-layout p entirely):
        float* pr;
        if (p8_layout) {
            const int64_t sup = i / (sb * TB);
            const int64_t blk = (i / TB) % sb;
            const int64_t row = sup * TB + i % TB;
            pr = p + row * p8_row_w + blk * 16;
        } else {
            pr = p + i * 16;
        }
        pr[0] = (float)dot3(n, p0);
        pr[1] = (float)dot3(g1, p0);
        pr[2] = (float)dot3(g2, p0);
        for (int c = 0; c < 3; ++c) {
            pr[3 + c] = (float)n[c];
            pr[6 + c] = (float)g1[c];
            pr[9 + c] = (float)g2[c];
        }
        // col 12 in f32 (numpy weak-scalar promotion keeps f32):
        pr[12] = wt_f * (std::fabs(pr[1]) + std::fabs(pr[2]));
        // col 13 in f64 then store:
        const double g1l1 = (std::fabs(g1[0]) + std::fabs(g1[1])) + std::fabs(g1[2]);
        const double g2l1 = (std::fabs(g2[0]) + std::fabs(g2[1])) + std::fabs(g2[2]);
        pr[13] = (float)(wt_scale * (g1l1 + g2l1));
        pr[14] = std::fabs(pr[0]);
        // pr[15] stays 0

        // ---- per-tri AABB (f64 min/max, f32 store — numpy order) ----
        for (int c = 0; c < 3; ++c) {
            tlo[i * 3 + c] = (float)std::min(std::min(p0[c], p1[c]), p2[c]);
            thi[i * 3 + c] = (float)std::max(std::max(p0[c], p1[c]), p2[c]);
        }

        // ---- nrm rows -----------------------------------------------
        const int64_t b = i / TB;
        const int64_t r = i % TB;
        const int64_t base = b * (3 * TB) + r;  // seg 0
        const bool hn = vert_normals != nullptr && has_normals[i] != 0;
        for (int c = 0; c < 3; ++c) {
            double N0c, dN1c, dN2c;
            if (hn) {
                const double a0 = (double)vert_normals[v0 * 3 + c];
                const double a1 = (double)vert_normals[v1 * 3 + c];
                const double a2 = (double)vert_normals[v2 * 3 + c];
                N0c = a0;
                dN1c = a1 - a0;
                dN2c = a2 - a0;
            } else {
                N0c = n[c];
                dN1c = 0.0;
                dN2c = 0.0;
            }
            nrm[c * stride + base] = (float)N0c;
            nrm[c * stride + base + TB] = (float)dN1c;       // seg 1
            nrm[c * stride + base + 2 * TB] = (float)dN2c;   // seg 2
        }
        const int64_t m = tri_mat[i];
        for (int c = 0; c < 3; ++c) {
            nrm[(3 + c) * stride + base] = (float)(double)mat_albedo[m * 3 + c];
            nrm[(5 + c) * stride + base + TB] =
                (float)(double)mat_emission[m * 3 + c];
        }
        nrm[6 * stride + base] = (float)(double)(m / 256);
        nrm[7 * stride + base] = (float)(double)(m % 256);
        nrm[3 * stride + base + TB] =
            (float)(double)(mat_type[m] + 4 * (int64_t)mat_emissive[m]);
        nrm[4 * stride + base + TB] = (float)(double)mat_ior[m];
    }
    return 0;
}
