"""Blocked scene tables for the Pallas intersector.

Triangles are Morton-ordered and packed into lanes-aligned blocks of
``TB`` with per-block AABBs, grouped into supers of ``SB`` blocks with
their own AABBs — a two-level, fixed-shape hierarchy designed for the
TPU kernel in :mod:`.intersect_kernel`:

* the whole table set lives in VMEM (the analogue of the reference
  keeping the entire scene in each tile's SRAM, src/IpuScene.cpp:231-237);
* culling decisions are per *ray-block x triangle-block*, so the inner
  loop is always a dense [TB, BR] computation — no per-ray divergence;
* layouts are transposed so rays ride the lane dimension everywhere.

Table layouts (f32 unless noted):
  p     [nb*TB, 16]    per-tri row: [n.p0, g1.p0, g2.p0,
                       nx,ny,nz, g1x,g1y,g1z, g2x,g2y,g2z, pad...] —
                       component columns let the kernel form the six
                       ray/triangle dot products as full-f32 VPU FMAs
                       (the MXU's bf16-rounded f32 dots are not accurate
                       enough for hit points)
  nrm   [8, nb*3*TB]   block b columns = [N0^T | dN1^T | dN2^T]: shading
                       normal basis so the kernel can emit per-ray normals
                       (N0 + b1*dN1 + b2*dN2); geometric-normal meshes get
                       dN1 = dN2 = 0. The spare rows (3..7) of segments 0
                       and 1 carry per-tri material data selected by the
                       same one-hot dot (no gathers in the hot loop):
                         seg0 rows 3..5 = albedo
                         seg0 row  6    = mat_id // 256   (id_hi)
                         seg0 row  7    = mat_id %  256   (id_lo)
                         seg1 row  3    = mat_type + 4*emissive
                         seg1 row  4    = ior
                         seg1 rows 5..7 = emission rgb
                       Precision contract: the one-hot selection dot runs
                       at the MXU's default f32 precision, which rounds
                       operands through bf16. Integer rows are exact only
                       because every value is an integer <= 256 (hence the
                       hi/lo split — exact for up to 65536 materials);
                       albedo/ior/emission/normal rows are bf16-rounded
                       (~0.4% rel), which is within normal texture
                       quantisation for shading inputs. Never put ray
                       geometry through these dots.
                       Selection contract: ONLY rows 0-2 (the normal
                       basis) may be dotted with the barycentric-weighted
                       w2/w3 one-hots; rows 3-7 must use the plain w1
                       one-hot — b1/b2-weighted leakage of seg1's
                       material rows into albedo/id was a real radiometry
                       bug (PROGRESS.md finding 30).
  baabb [nb, 8]        block AABB lo.xyz, hi.xyz (pad 2)
  saabb [ns, 8]        super AABB
  tri_geom/tri_prim [nb*TB] i32 (Morton order), padding -> -1
"""

from __future__ import annotations

from typing import NamedTuple

import os

import numpy as np

import jax.numpy as jnp

TB = 128  # triangles per block (lane width)
SB = 8    # blocks per super
PN_SUPER = TB + SB * 3 * 8  # fused pn8 rows per super (p slab + nrm chunks)


SUBB = 32  # finest cull granularity (tris per sub-block AABB)
# (sub-block culling measured neutral-to-slightly-positive on Cornell —
# PROGRESS.md finding 25 — kept for larger VMEM scenes where block AABBs
# are tighter relative to ray extents.)

# Above this many (padded) triangle rows the VMEM-layout p table is not
# materialised (p8 carries bitwise the same values in the HBM super
# layout, and no VMEM-mode kernel can hold such a scene anyway) — at
# 8.4M tris the duplicate costs 536 MB of device HBM + a full h2d
# transfer. An explicit intersector="pallas" build keeps it. Tests
# monkeypatch this down to cover the skip path:
VMEM_TABLE_MAX_TRIS = 65536

# Above this many (padded) triangle rows the HBM payload auto-splits
# into the bf16 pay8 table (~32% less HBM at a ~5-9% throughput cost —
# see build_blocked_tables). RAY_HBM_SPLIT=0/1 overrides:
HBM_SPLIT_MIN_TRIS = 4_000_000

# Up to this many (padded) triangle rows the fused deferred-payload
# table ``payt`` is built (256 B/tri of VMEM when the megakernel binds
# it — 4 MB at the cap, on top of the p/nrm residents, so it is a
# small-scene table by design; finding 60: the payload pass is 21% of
# iteration time and payt halves its MXU dispatches + drops the
# in-kernel bf16 split and slice-concat work):
PAYT_MAX_TRIS = 16384


class BlockedSceneTables(NamedTuple):
    p: jnp.ndarray | None  # [nb*TB, 16] f32 (None above VMEM_TABLE_MAX_TRIS)
    # Super slab(s) for the HBM-streamed kernels: Mosaic DMA slices
    # must be 128-aligned in the minor dimension, and a [*, 16] slab is
    # not. Instead of padding 16 -> 128 columns (8x wasted HBM and DMA
    # bytes — the round-2 p_wide layout), each super's 8 blocks sit SIDE
    # BY SIDE along the lane axis (the p8 packing, VERDICT r2 #4).
    # VMEM-sized scenes fuse the super's nrm payload chunks BELOW the p
    # rows so one super streams as ONE dense [PN_SUPER, 128] = 160 KB
    # f32 slab:
    #     pn8[s*PN + r, b*16 + c]            = p[(s*SB + b)*TB + r, c]
    #                                                        (r < TB)
    #     pn8[s*PN + TB + (b*3+j)*8 + r, c]  = nrm[r, ((s*SB+b)*3+j)*TB + c]
    # Kernel reads stay static slices: block b's p table is
    # [0:TB, b*16:(b+1)*16]; its nrm chunk j is
    # [TB+(b*3+j)*8 : +rows, :] — bitwise the same values, zero
    # in-kernel repacking cost.
    # ABOVE the VMEM ceiling the payload splits into the separate bf16
    # table `pay8` and pn8 carries ONLY the [TB, 128] p rows per super
    # (see pay8): HBM table bytes drop ~32% (2M tris: 335 -> 229 MB)
    # with TPU radiometry bitwise unchanged:
    pn8: jnp.ndarray      # [ns*PN_SUPER, SB*16] f32, or [ns*TB, SB*16]
                          # f32 when pay8 is not None
    # Big-scene payload slab, bf16: the payload is consumed ONLY as
    # DEFAULT-precision dot operands, which round f32 inputs through
    # bf16 on TPU anyway — storing bf16 pre-rounds identically, so the
    # TPU image is bitwise unchanged while the payload table and its
    # per-super DMA halve. Auto-engages above HBM_SPLIT_MIN_TRIS (the
    # split costs ~5-9% throughput for ~32% less HBM — see
    # build_blocked_tables). Layout (lane = triangle row within member):
    #     pay8[(s*SB + b)*24 + j*8 + r, c] = nrm[r, ((s*SB+b)*3+j)*TB + c]
    pay8: jnp.ndarray | None  # [nb*24, TB] bf16 (None when fused)
    # VMEM payload table (None above VMEM_TABLE_MAX_TRIS — the HBM
    # kernels read payloads from pn8's fused chunks / pay8 instead):
    nrm: jnp.ndarray | None  # [8, nb*3*TB] f32
    baabb: jnp.ndarray    # [nb, 8] f32
    baabb32: jnp.ndarray  # [nb*TB/SUBB, 8] f32 sub-block AABBs (32 tris each)
    baabb16: jnp.ndarray | None  # [nb*TB/16, 8] f32 16-tri sub-block AABBs
                          # (sub=8 VMEM walks only; None above the VMEM
                          # ceiling where only the HBM kernels apply)
    baabb8: jnp.ndarray | None   # [nb*TB/8, 8] f32 8-tri sub-block AABBs
                          # (sub=16 VMEM walks; None above the ceiling)
    saabb: jnp.ndarray    # [ns, 8] f32
    tri_geom: jnp.ndarray  # [nb*TB] i32
    tri_prim: jnp.ndarray  # [nb*TB] i32

    # Fused deferred-payload table (VMEM scenes <= PAYT_MAX_TRIS only):
    # everything the deferred winner-payload pass needs for block b as
    # ONE [64, TB] slab at lane offset b*TB, so the pass runs a single
    # [64, TB] x [TB, br] one-hot dot per winner block instead of two
    # dots + an in-kernel 3-way bf16 split + a 4-slice concat.
    #     rows  0:12  bf16-hi  of p[:, 0:12]   (stored upcast to f32)
    #     rows 12:24  bf16-mid (residual's bf16)
    #     rows 24:36  bf16-lo  (second residual's bf16)
    #     rows 36:44  nrm chunk 0 (N0 + albedo + id hi/lo)
    #     rows 44:52  nrm chunk 1 (dN1 rows 0:3 + type/ior/emission)
    #     rows 52:55  nrm chunk 2 rows 0:3 (dN2)
    #     rows 55:64  zero pad
    # The split triple reconstructs each f32 p value exactly
    # (hi + mid + lo, each term bf16-representable), so a DEFAULT-
    # precision dot — which rounds f32 operands through bf16 on TPU —
    # selects exactly the same bf16 factors the old explicit-bf16 dot
    # did, and on CPU the f32 dot selects the same stored values the
    # old path computed in-kernel: bitwise-identical payload on BOTH
    # platforms (gated in tests/test_megakernel_variants.py):
    payt: jnp.ndarray | None  # [64, nb*TB] f32

    # Super-group union AABBs (groups of SB supers; round 5, the HBM
    # walk's optional THIRD cull level — the same coarse-then-refine
    # monotonic-flag argument as the VMEM walk_cull2): at 8.4M tris the
    # flat super slab pass is [8191, br] per bounce iteration; the
    # coarse pass is [1024, br] + refinement of flagged groups only.
    # Padding supers carry inverted boxes, so partial tail groups union
    # correctly and all-pad groups never flag:
    sgaabb: jnp.ndarray | None = None  # [ceil(ns/SB), 8] f32

    @property
    def num_blocks(self) -> int:
        return self.baabb.shape[0]

    @property
    def num_supers(self) -> int:
        return self.saabb.shape[0]


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit quantised coords into 30-bit Morton codes."""

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return spread(x[:, 0]) | (spread(x[:, 1]) << np.uint64(1)) | (
        spread(x[:, 2]) << np.uint64(2)
    )


def _split_large_triangles(p0, p1, p2, vn0, vn1, vn2, tri_geom, tri_prim,
                           tri_has_normals, tri_mat, max_frac=0.25, max_rounds=4):
    """Subdivide triangles whose AABB edge exceeds ``max_frac`` of the
    scene extent (4-way midpoint split, repeated). Large wall/floor
    triangles otherwise inflate every Morton block's AABB and defeat
    block-level culling. Geometric results are identical (same planes);
    tri_geom/tri_prim keep the ORIGINAL ids so hit reporting and AOVs
    are unchanged."""
    scene_lo = np.minimum(np.minimum(p0, p1), p2).min(axis=0)
    scene_hi = np.maximum(np.maximum(p0, p1), p2).max(axis=0)
    limit = max(float(np.max(scene_hi - scene_lo)), 1e-20) * max_frac

    for _ in range(max_rounds):
        ext = (np.maximum(np.maximum(p0, p1), p2)
               - np.minimum(np.minimum(p0, p1), p2)).max(axis=1)
        big = ext > limit
        if not big.any():
            break
        keep = ~big
        b0, b1, b2 = p0[big], p1[big], p2[big]
        n0, n1, n2 = vn0[big], vn1[big], vn2[big]
        m01, m12, m20 = (b0 + b1) / 2, (b1 + b2) / 2, (b2 + b0) / 2
        k01, k12, k20 = (n0 + n1) / 2, (n1 + n2) / 2, (n2 + n0) / 2
        p0 = np.concatenate([p0[keep], b0, m01, m20, m01])
        p1 = np.concatenate([p1[keep], m01, b1, m12, m12])
        p2 = np.concatenate([p2[keep], m20, m12, b2, m20])
        vn0 = np.concatenate([vn0[keep], n0, k01, k20, k01])
        vn1 = np.concatenate([vn1[keep], k01, n1, k12, k12])
        vn2 = np.concatenate([vn2[keep], k20, k12, n2, k20])
        rep = lambda a: np.concatenate([a[keep]] + [a[big]] * 4)
        tri_geom = rep(tri_geom)
        tri_prim = rep(tri_prim)
        tri_has_normals = rep(tri_has_normals)
        tri_mat = rep(tri_mat)
    return p0, p1, p2, vn0, vn1, vn2, tri_geom, tri_prim, tri_has_normals, tri_mat


def build_blocked_tables(tri_v: np.ndarray, verts: np.ndarray,
                         tri_geom: np.ndarray, tri_prim: np.ndarray,
                         vert_normals: np.ndarray | None = None,
                         tri_has_normals: np.ndarray | None = None,
                         split_large: bool = False,
                         tri_mat: np.ndarray | None = None,
                         mat_albedo: np.ndarray | None = None,
                         mat_ior: np.ndarray | None = None,
                         mat_type: np.ndarray | None = None,
                         mat_emission: np.ndarray | None = None,
                         mat_emissive: np.ndarray | None = None,
                         with_vmem_p: bool | None = None,
                         native_pack: bool = True,
                         payload_split: bool | None = None,
                         tri_order: np.ndarray | None = None) -> BlockedSceneTables:
    T = len(tri_v)
    if T == 0:
        tri_v = np.zeros((1, 3), np.int64)
        verts = np.zeros((1, 3), np.float32) if len(verts) == 0 else verts
        tri_geom = np.full(1, -1, np.int32)
        tri_prim = np.full(1, -1, np.int32)
        vert_normals = None
        T = 1
    if tri_has_normals is None:
        tri_has_normals = np.zeros(T, bool)
    else:
        tri_has_normals = np.asarray(tri_has_normals, bool)[:T]
    if vert_normals is None:
        tri_has_normals = np.zeros(T, bool)

    # f64 vertex gathers feed the split path, the Morton fallback and
    # the numpy pack fallback — the treelet + native-packer fast path
    # touches only f32 bounds (min/max select exactly, so f64-of-f32
    # bounds == f32 bounds bitwise and the treelet order is unchanged).
    # Gather lazily so multi-million-triangle imports stay single-pass:
    _vcache: dict = {}

    def _gather_p64():
        if "p0" not in _vcache:
            verts64 = np.asarray(verts, np.float64)
            _vcache["p0"] = verts64[tri_v[:, 0]]
            _vcache["p1"] = verts64[tri_v[:, 1]]
            _vcache["p2"] = verts64[tri_v[:, 2]]
        return _vcache["p0"], _vcache["p1"], _vcache["p2"]

    def _gather_vn64():
        if "vn0" not in _vcache:
            if vert_normals is not None:
                vn64 = np.asarray(vert_normals, np.float64)
                _vcache["vn0"] = vn64[tri_v[:, 0]]
                _vcache["vn1"] = vn64[tri_v[:, 1]]
                _vcache["vn2"] = vn64[tri_v[:, 2]]
            else:
                z = np.zeros((T, 3), np.float64)
                _vcache["vn0"] = _vcache["vn1"] = _vcache["vn2"] = z
        return _vcache["vn0"], _vcache["vn1"], _vcache["vn2"]

    tri_geom = np.asarray(tri_geom, np.int32)
    tri_prim = np.asarray(tri_prim, np.int32)
    if tri_mat is None:
        tri_mat = np.zeros(T, np.int32)
        mat_albedo = np.zeros((1, 3), np.float32)
        mat_ior = np.full(1, 1.52, np.float32)
        mat_type = np.zeros(1, np.int32)
    if mat_emission is None:
        mat_emission = np.zeros((len(mat_albedo), 3), np.float32)
    if mat_emissive is None:
        mat_emissive = np.zeros(len(mat_albedo), np.int32)
    if len(mat_albedo) > 65536:
        raise ValueError(
            f"blocked tables support at most 65536 materials "
            f"(id hi/lo rows must stay bf16-exact); got {len(mat_albedo)}"
        )
    tri_mat = np.asarray(tri_mat, np.int32)[:T]
    if len(tri_mat) < T:
        tri_mat = np.pad(tri_mat, (0, T - len(tri_mat)))
    if split_large:
        p0, p1, p2 = _gather_p64()
        vn0, vn1, vn2 = _gather_vn64()
        (p0, p1, p2, vn0, vn1, vn2, tri_geom, tri_prim,
         tri_has_normals, tri_mat) = _split_large_triangles(
            p0, p1, p2, vn0, vn1, vn2, tri_geom, tri_prim, tri_has_normals,
            tri_mat,
        )
        T = len(p0)
        _vcache.update(p0=p0, p1=p1, p2=p2, vn0=vn0, vn1=vn1, vn2=vn2)

    # Spatial ordering so 128-tri runs form tight blocks. Preferred:
    # depth-first leaf order of the binned-SAH BVH (bvh/builder.py, the
    # same builder the bvh intersector uses) — consecutive leaves share
    # deep subtrees, so each TB-run approximates a SAH-optimal treelet
    # and its AABB is much tighter than a Morton snake's (round 3; the
    # Morton order remains the fallback):
    order = None
    if tri_order is not None and not split_large and T > TB:
        # Caller-supplied DFS leaf order (build_scene reuses the scene
        # BVH's triangle leaf order — one SAH build per import instead of
        # two; finding 43's remaining pole). Validate it is a permutation
        # of [0, T); anything else falls through to the internal build:
        cand = np.asarray(tri_order, np.int64).ravel()
        if (len(cand) == T and cand.min() >= 0 and cand.max() < T
                and np.bincount(cand, minlength=T).all()):
            order = cand
    if order is None and T > TB:
        try:
            from ...bvh.builder import INVALID_GEOM_ID, build_bvh

            if not split_large and np.asarray(verts).dtype == np.float32:
                # f32 shortcut — bitwise-identical bounds (min/max
                # select exactly) without the 6 f64 gathers:
                vf = np.asarray(verts)
                a0 = vf[tri_v[:, 0]]
                a1 = vf[tri_v[:, 1]]
                a2 = vf[tri_v[:, 2]]
                tlo_o = np.minimum(np.minimum(a0, a1), a2)
                thi_o = np.maximum(np.maximum(a0, a1), a2)
            else:
                p0b, p1b, p2b = _gather_p64()
                tlo_o = np.minimum(np.minimum(p0b, p1b), p2b).astype(np.float32)
                thi_o = np.maximum(np.maximum(p0b, p1b), p2b).astype(np.float32)
            t_bvh = build_bvh(tlo_o, thi_o, np.zeros(T, np.int64),
                              np.arange(T, dtype=np.int64),
                              max_leaf_size=1)
            leaves = t_bvh.geom != INVALID_GEOM_ID
            order = t_bvh.meta[leaves].astype(np.int64)
            if len(order) != T:           # defensive: malformed flatten
                order = None
        except Exception:
            order = None
    if order is None:
        # Morton order by centroid:
        p0m, p1m, p2m = _gather_p64()
        cent = (p0m + p1m + p2m) / 3.0
        lo = cent.min(axis=0)
        span = np.maximum(cent.max(axis=0) - lo, 1e-20)
        q = np.clip(((cent - lo) / span) * 1023.0, 0, 1023).astype(np.uint32)
        order = np.argsort(_morton3(q), kind="stable")
    tri_v_o = None if split_large else np.asarray(tri_v, np.int64)[order]
    tri_has_normals = tri_has_normals[order]
    tri_geom = tri_geom[order]
    tri_prim = tri_prim[order]
    tri_mat = tri_mat[order]

    nb = max(1, -(-T // TB))
    ns = -(-nb // SB)
    nb = ns * SB  # pad block count to a whole number of supers
    Tp = nb * TB

    from ...utils.constants import WATERTIGHT_EPS_SCALE as _WT_

    # Native one-pass packer (csrc/table_packer.cpp) — bitwise twin of
    # the numpy block below (gated by tests/test_table_packer.py); the
    # numpy path remains the fallback and the parity reference. Only
    # f32 inputs qualify (the native packer promotes f32 -> f64 the way
    # the numpy path does; other dtypes take the fallback):
    if with_vmem_p is None:
        with_vmem_p = Tp <= VMEM_TABLE_MAX_TRIS
    packed = None
    p8 = None
    if (native_pack and tri_v_o is not None
            and np.asarray(verts).dtype == np.float32
            and (vert_normals is None
                 or np.asarray(vert_normals).dtype == np.float32)):
        from .cpack import pack_tables_native

        m_safe_o = np.clip(tri_mat, 0, len(mat_albedo) - 1)
        # Above the VMEM table ceiling only the super-layout p8 is kept —
        # have the packer write it directly (skips materialising +
        # transposing the row-layout p, ~2 full-table copies at 2M tris):
        packed = pack_tables_native(
            verts, tri_v_o, vert_normals, tri_has_normals, m_safe_o,
            mat_albedo, mat_ior, mat_type, mat_emissive, mat_emission,
            nb, float(_WT_), p8_layout=not with_vmem_p, sb=SB)
    if packed is not None:
        p, nrm, tlo_p, thi_p = packed
        if not with_vmem_p:
            p8, p = p, None
    else:
        p0, p1, p2 = _gather_p64()
        vn0, vn1, vn2 = _gather_vn64()
        p0, p1, p2 = p0[order], p1[order], p2[order]
        vn0, vn1, vn2 = vn0[order], vn1[order], vn2[order]

        # Plane + barycentric-gradient precompute (as ops/dense.py):
        e1 = p1 - p0
        e2 = p2 - p0
        n = np.cross(e1, e2)
        nlen = np.linalg.norm(n, axis=-1, keepdims=True)
        degenerate = nlen[:, 0] < 1e-20
        n = np.where(degenerate[:, None], 0.0, n / np.maximum(nlen, 1e-30))
        d00 = np.sum(e1 * e1, axis=-1)
        d01 = np.sum(e1 * e2, axis=-1)
        d11 = np.sum(e2 * e2, axis=-1)
        denom = d00 * d11 - d01 * d01
        safe = np.where(np.abs(denom) < 1e-30, 1.0, denom)
        g1 = np.where(degenerate[:, None], 0.0, (e1 * d11[:, None] - e2 * d01[:, None]) / safe[:, None])
        g2 = np.where(degenerate[:, None], 0.0, (e2 * d00[:, None] - e1 * d01[:, None]) / safe[:, None])

        # Shading-normal basis: interpolated where vertex normals exist,
        # geometric (unit plane normal) otherwise:
        hasn = tri_has_normals[:, None]
        N0 = np.where(hasn, vn0, n)
        dN1 = np.where(hasn, vn1 - vn0, 0.0)
        dN2 = np.where(hasn, vn2 - vn0, 0.0)

        # Per-tri material payload (selected via the w1 one-hot dot; see the
        # module docstring for the bf16-exactness contract):
        m_safe = np.clip(tri_mat, 0, len(mat_albedo) - 1)
        mat_alb = np.asarray(mat_albedo, np.float64)[m_safe]
        mat_id_hi = (m_safe // 256).astype(np.float64)
        mat_id_lo = (m_safe % 256).astype(np.float64)
        mat_tp = (
            np.asarray(mat_type, np.int64)[m_safe]
            + 4 * np.asarray(mat_emissive, np.int64)[m_safe]
        ).astype(np.float64)
        mat_iors = np.asarray(mat_ior, np.float64)[m_safe]
        mat_em = np.asarray(mat_emission, np.float64)[m_safe]

        def padT(a, fill=0.0):
            # Single-copy pad (np.asarray is a no-op for the already-f64
            # inputs; .astype + np.pad made two full copies each and
            # dominated multi-million-triangle builds):
            a = np.asarray(a, np.float64)
            if Tp == T:
                return a
            shape = (Tp,) + a.shape[1:]
            # np.zeros is calloc-backed (lazily-zeroed pages) — measurably
            # faster than np.full's explicit fill at multi-million rows:
            out = (np.zeros(shape, np.float64) if fill == 0.0
                   else np.full(shape, fill, np.float64))
            out[:T] = a
            return out

        n_p, g1_p, g2_p = padT(n), padT(g1), padT(g2)
        N0_p, dN1_p, dN2_p = padT(N0), padT(dN1), padT(dN2)
        mat_alb_p = padT(mat_alb)
        mat_id_hi_p = padT(mat_id_hi)
        mat_id_lo_p = padT(mat_id_lo)
        mat_tp_p = padT(mat_tp)
        mat_ior_p = padT(mat_iors)
        mat_em_p = padT(mat_em)
        p0_p = padT(p0)

        # nrm: [8, nb*3*TB] — assembled through a [8, nb, 3, TB] view so the
        # per-block layout is pure vectorised numpy (the python-loop version
        # took minutes at multi-million-triangle scenes):
        nrm = np.zeros((8, nb, 3, TB), np.float32)

        def blocked(a):  # [Tp, ...] -> [nb, TB, ...] -> [.., nb, TB]
            a = a.reshape(nb, TB, -1)
            return np.moveaxis(a, 2, 0).astype(np.float32)

        nrm[0:3, :, 0] = blocked(N0_p)
        nrm[0:3, :, 1] = blocked(dN1_p)
        nrm[0:3, :, 2] = blocked(dN2_p)
        nrm[3:6, :, 0] = blocked(mat_alb_p)
        nrm[6, :, 0] = mat_id_hi_p.reshape(nb, TB)
        nrm[7, :, 0] = mat_id_lo_p.reshape(nb, TB)
        nrm[3, :, 1] = mat_tp_p.reshape(nb, TB)
        nrm[4, :, 1] = mat_ior_p.reshape(nb, TB)
        nrm[5:8, :, 1] = blocked(mat_em_p)
        nrm = nrm.reshape(8, nb * 3 * TB)

        # p: [nb*TB, 16]
        p = np.zeros((Tp, 16), np.float32)
        p[:, 0] = np.sum(n_p * p0_p, axis=-1)
        p[:, 1] = np.sum(g1_p * p0_p, axis=-1)
        p[:, 2] = np.sum(g2_p * p0_p, axis=-1)
        p[:, 3:6] = n_p
        p[:, 6:9] = g1_p
        p[:, 9:12] = g2_p
        # Watertight acceptance-widening bound terms (utils/constants.py
        # WATERTIGHT_EPS_SCALE), pre-scaled by the constant so the kernel
        # computes eps = p12 + p13 * (|o|_inf + E_t) in two ops:
        # col 12 = WT * S_tri = WT * (|g1p0|+|g2p0|), col 13 = WT * G_tri =
        # WT * (||g1||_1 + ||g2||_1), col 14 = |tnp0| (for E_t without an
        # in-kernel abs). Padding rows stay 0 (eps = 0):
        p[:, 12] = _WT_ * (np.abs(p[:, 1]) + np.abs(p[:, 2]))
        p[:, 13] = _WT_ * (np.abs(g1_p).sum(axis=-1)
                           + np.abs(g2_p).sum(axis=-1))
        p[:, 14] = np.abs(p[:, 0])

        # Block/super/sub-block AABBs over real triangles, vectorised via
        # padded grouped reductions (padding rows get inverted boxes that can
        # never be hit):
        tlo = np.minimum(np.minimum(p0, p1), p2).astype(np.float32)
        thi = np.maximum(np.maximum(p0, p1), p2).astype(np.float32)
        tlo_p = np.full((Tp, 3), np.inf, np.float32)
        thi_p = np.full((Tp, 3), -np.inf, np.float32)
        tlo_p[:T] = tlo
        thi_p[:T] = thi

    tg = np.pad(tri_geom, (0, Tp - T), constant_values=-1)
    tp = np.pad(tri_prim, (0, Tp - T), constant_values=-1)

    def group_aabb(lo, hi, g):
        n = lo.shape[0] // g
        out = np.zeros((n, 8), np.float32)
        out[:, 0:3] = lo.reshape(n, g, 3).min(axis=1)
        out[:, 3:6] = hi.reshape(n, g, 3).max(axis=1)
        return out

    baabb = group_aabb(tlo_p, thi_p, TB)
    baabb32 = group_aabb(tlo_p, thi_p, SUBB)
    baabb16 = group_aabb(tlo_p, thi_p, 16) if with_vmem_p else None
    baabb8 = group_aabb(tlo_p, thi_p, 8) if with_vmem_p else None
    saabb = group_aabb(tlo_p, thi_p, SB * TB)
    # Super-group union AABBs (the HBM walk's optional third cull
    # level; see the sgaabb field docstring). Tail groups pad with
    # inverted boxes so the union ignores them:
    ns_ = saabb.shape[0]
    sg_pad = (-ns_) % SB
    sg_lo = np.concatenate(
        [saabb[:, 0:3], np.full((sg_pad, 3), np.inf, np.float32)])
    sg_hi = np.concatenate(
        [saabb[:, 3:6], np.full((sg_pad, 3), -np.inf, np.float32)])
    sgaabb = group_aabb(sg_lo, sg_hi, SB)

    if p8 is None:
        p8 = (p.reshape(ns, SB, TB, 16).transpose(0, 2, 1, 3)
               .reshape(ns * TB, SB * 16))

    # HBM super slab(s) (see the pn8/pay8 field docstrings): the nrm
    # payload regrouped into per-member 24-row chunks in (member, chunk)
    # order — pure vectorised reshapes, one extra table-sized copy at
    # build. VMEM-sized scenes fuse it below the p8 rows (one f32 slab,
    # one DMA per super); bigger scenes keep p8 f32 and store the
    # payload as a separate bf16 table:
    nrm8 = (np.asarray(nrm, np.float32).reshape(8, nb * 3, TB)
              .transpose(1, 0, 2).reshape(ns, SB * 3 * 8, TB))
    # Payload placement (see the pn8/pay8 field docstrings). The split
    # layout costs ~5-9% throughput (second DMA + bf16 window reads:
    # 522k 511.3 vs 468.0 us/iter, 2M 924.1 vs 883.6, 2026-08-18,
    # radiometry bitwise-identical) for ~32% less HBM, so it only pays
    # where the fused table's footprint actually matters — auto engages
    # above HBM_SPLIT_MIN_TRIS (8.4M-tri fused tables run 1.34 GB);
    # RAY_HBM_SPLIT=0/1 overrides, VMEM-sized scenes always fuse:
    if payload_split is None:
        env = os.environ.get("RAY_HBM_SPLIT", "")
        payload_split = (env == "1" if env in ("0", "1")
                         else Tp > HBM_SPLIT_MIN_TRIS)
    if with_vmem_p or not payload_split:
        pn8 = np.concatenate(
            [np.asarray(p8, np.float32).reshape(ns, TB, SB * 16), nrm8],
            axis=1).reshape(ns * PN_SUPER, SB * 16)
        pay8 = None
    else:
        import ml_dtypes  # numpy bf16 dtype (ships with jax)

        pn8 = np.asarray(p8, np.float32)
        pay8 = nrm8.astype(ml_dtypes.bfloat16).reshape(nb * 24, TB)

    # Fused deferred-payload table (see the payt field docstring). Built
    # only for small VMEM scenes (256 B/tri of VMEM when bound). The
    # bf16 splits replicate the kernel's old in-kernel split bitwise:
    # numpy/ml_dtypes f32->bf16 casts round-to-nearest-even exactly like
    # XLA's convert, and each residual is exact in f32:
    payt = None
    if with_vmem_p and Tp <= PAYT_MAX_TRIS:
        import ml_dtypes

        pT = np.ascontiguousarray(np.asarray(p, np.float32)[:, 0:12].T)
        hi = pT.astype(ml_dtypes.bfloat16).astype(np.float32)
        r1 = pT - hi
        mid = r1.astype(ml_dtypes.bfloat16).astype(np.float32)
        lo = (r1 - mid).astype(ml_dtypes.bfloat16).astype(np.float32)
        n3 = np.asarray(nrm, np.float32).reshape(8, nb, 3, TB)
        payt = np.zeros((64, nb, TB), np.float32)
        payt[0:12] = hi.reshape(12, nb, TB)
        payt[12:24] = mid.reshape(12, nb, TB)
        payt[24:36] = lo.reshape(12, nb, TB)
        payt[36:44] = n3[:, :, 0]
        payt[44:52] = n3[:, :, 1]
        payt[52:55] = n3[0:3, :, 2]
        payt = payt.reshape(64, nb * TB)

    return BlockedSceneTables(
        payt=None if payt is None else jnp.asarray(payt),
        p=jnp.asarray(p) if with_vmem_p else None,
        pn8=jnp.asarray(pn8),
        pay8=None if pay8 is None else jnp.asarray(pay8),
        # Above the VMEM ceiling no VMEM-mode kernel can hold the scene
        # and the HBM kernels read payloads from pay8 — the [8, nb*3*TB]
        # f32 duplicate is skipped:
        nrm=jnp.asarray(nrm) if with_vmem_p else None,
        baabb=jnp.asarray(baabb),
        baabb32=jnp.asarray(baabb32),
        baabb16=None if baabb16 is None else jnp.asarray(baabb16),
        baabb8=None if baabb8 is None else jnp.asarray(baabb8),
        saabb=jnp.asarray(saabb),
        sgaabb=jnp.asarray(sgaabb),
        tri_geom=jnp.asarray(tg),
        tri_prim=jnp.asarray(tp),
    )
