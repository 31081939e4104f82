"""Pallas TPU closest-hit kernel over blocked scene tables.

Two-phase design tuned to how a TPU actually executes:

1. **Cull phase (XLA, vectorised):** slab-test every ray against every
   triangle-block AABB ([R, nb] — a few dozen flops per pair), reduce to
   per-ray-block hit masks, and pack them into per-ray-block *block
   lists* + counts. This is the scheduler: it decides which dense tiles
   each 1024-ray block must test.
2. **Dense phase (Pallas):** the block lists arrive as scalar-prefetch
   operands (SMEM), so the kernel's inner loop is `for j < count:
   blk = list[i, j]; test block` — scalar reads only, **no
   vector->scalar `any()` syncs** (profiling showed those dominate: a
   per-block reduce+branch costs more than the 128x1024 dense test it
   guards). Each tested block is one `[8, 3TB] x [8, 2BR]` MXU
   contraction + ~15 VPU ops per (tri, ray) pair against VMEM-resident
   tables, with the running closest hit in VMEM scratch.

The reference reaches the same goal (every tile's scene in fast memory,
zero pointer chasing in the hot loop) with per-tile SRAM replication and
a scalar megakernel (src/IpuScene.cpp:231-237,
codelets/TraceCodelets.cpp:170-264); here the hierarchy decision is
hoisted out of the hot loop entirely because lane-wide vectors make
per-node branching the expensive operation.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.constants import gamma
from .tables import TB, BlockedSceneTables

BR = 1024  # rays per block (lane-major)
_SLAB_SCALE = np.float32(1.0 + 2.0 * gamma(3))
_INF = np.float32(np.inf)


def block_cull_lists_bundle(tables: BlockedSceneTables, origins, dirs,
                            t_min, t_max, n_ray_blocks, br: int = BR):
    """Bundle cull against the triangle-block AABBs (see bundle_cull)."""
    return bundle_cull(tables.baabb, origins, dirs, t_min, t_max,
                       n_ray_blocks, br)


def super_cull_lists_bundle(tables: BlockedSceneTables, origins, dirs,
                            t_min, t_max, n_ray_blocks, br: int = BR):
    """Bundle cull against the super AABBs (SB blocks per super) — the
    coarse level used by the HBM-streamed kernel, where per-ray-block
    lists must stay small enough for SMEM scalar prefetch."""
    return bundle_cull(tables.saabb, origins, dirs, t_min, t_max,
                       n_ray_blocks, br)


def bundle_cull(aabb, origins, dirs, t_min, t_max, n_ray_blocks,
                br: int = BR):
    """O(nrb x n) conservative cull: per-ray-block *bundle* (interval
    AABB of origins + directions) vs a set of AABBs. A box is kept if any
    ray in the bundle could possibly hit it:

        max_axis(min possible entry t)  <=  min_axis(max possible exit t)

    Mixed-sign direction axes contribute no constraint (conservative).
    Orders of magnitude cheaper than the exact per-ray cull — the whole
    computation is [n_ray_blocks, num_boxes] sized.
    """
    nb = aabb.shape[0]
    blo = aabb[:, 0:3]                              # [nb,3]
    bhi = aabb[:, 3:6]

    # Bundle AABBs over *live* lanes only (dead rays carry t_max < 0):
    # as the wavefront dies off, bundles tighten and whole ray blocks
    # stop touching any triangle block.
    alive = (t_max > 0.0).reshape(n_ray_blocks, br, 1)
    INF0 = jnp.float32(jnp.inf)
    o_r = origins.reshape(n_ray_blocks, br, 3)
    d_r = dirs.reshape(n_ray_blocks, br, 3)
    olo = jnp.where(alive, o_r, INF0).min(axis=1)   # [nrb,3]
    ohi = jnp.where(alive, o_r, -INF0).max(axis=1)
    dlo = jnp.where(alive, d_r, INF0).min(axis=1)
    dhi = jnp.where(alive, d_r, -INF0).max(axis=1)
    tmax_hi = t_max.reshape(n_ray_blocks, br).max(axis=1)   # [nrb]
    tmin_lo = jnp.where(
        alive[..., 0], t_min.reshape(n_ray_blocks, br), INF0
    ).min(axis=1)

    INF = jnp.float32(jnp.inf)
    enter = jnp.full((n_ray_blocks, nb), -INF)
    exit_ = jnp.full((n_ray_blocks, nb), INF)
    for a in range(3):
        pos = dlo[:, a] > 0.0                        # all-positive axis
        neg = dhi[:, a] < 0.0                        # all-negative axis
        same_sign = pos | neg
        # inv-direction interval endpoints (same sign class only):
        i1 = 1.0 / jnp.where(same_sign, dlo[:, a], 1.0)
        i2 = 1.0 / jnp.where(same_sign, dhi[:, a], 1.0)
        ilo = jnp.minimum(i1, i2)
        ihi = jnp.maximum(i1, i2)
        # slab-minus-origin intervals [nrb, nb]:
        s1_lo = blo[None, :, a] - ohi[:, None, a]
        s1_hi = blo[None, :, a] - olo[:, None, a]
        s2_lo = bhi[None, :, a] - ohi[:, None, a]
        s2_hi = bhi[None, :, a] - olo[:, None, a]
        # interval products (4 corners per slab plane):
        def iprod(slos, shis):
            p1 = slos * ilo[:, None]
            p2 = slos * ihi[:, None]
            p3 = shis * ilo[:, None]
            p4 = shis * ihi[:, None]
            return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                    jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))
        lo1, hi1 = iprod(s1_lo, s1_hi)
        lo2, hi2 = iprod(s2_lo, s2_hi)
        ax_enter = jnp.minimum(lo1, lo2)             # lowest possible entry
        ax_exit = jnp.maximum(hi1, hi2) * _SLAB_SCALE
        ax_enter = jnp.where(same_sign[:, None], ax_enter, -INF)
        ax_exit = jnp.where(same_sign[:, None], ax_exit, INF)
        enter = jnp.maximum(enter, ax_enter)
        exit_ = jnp.minimum(exit_, ax_exit)

    # Fully-empty padding boxes are inverted (lo=+inf): mask them out —
    # interval arithmetic otherwise degenerates them to always-hit:
    hit = ((enter <= exit_) & (enter <= tmax_hi[:, None])
           & (exit_ >= tmin_lo[:, None]) & (blo[None, :, 0] < 1e30))

    # Near-to-far ordering + a provable early-stop bound: for unit-length
    # ray directions, any hit in block b satisfies
    #     t >= dist(origin-bundle box, block box)
    # so once every lane's best_t is below the next block's distance, no
    # remaining block can matter. Culled blocks sort to the end with an
    # infinite bound, which the early stop also kills — no counts needed.
    d2 = jnp.zeros((n_ray_blocks, nb), jnp.float32)
    for a in range(3):
        gap = jnp.maximum(
            blo[None, :, a] - ohi[:, None, a], olo[:, None, a] - bhi[None, :, a]
        )
        gap = jnp.maximum(gap, 0.0)
        d2 = d2 + gap * gap
    dist_lb = jnp.where(hit, jnp.sqrt(d2), jnp.float32(jnp.inf))
    order = jnp.argsort(dist_lb, axis=1).astype(jnp.int32)
    dist_sorted = jnp.take_along_axis(dist_lb, order, axis=1)
    counts = hit.sum(axis=1).astype(jnp.int32)
    return counts, order, dist_sorted


def block_cull_lists(tables: BlockedSceneTables, origins, dirs, t_min, t_max,
                     n_ray_blocks, br: int = BR):
    """Vectorised phase 1: per-ray-block hit-block lists + counts.

    Returns (counts [nrb] i32, lists [nrb, nb] i32): for ray block i the
    first counts[i] entries of lists[i] are the (ascending) indices of
    triangle blocks whose AABB at least one ray in the block hits.
    """
    nb = tables.num_blocks
    lo = tables.baabb[:, 0:3]  # [nb,3]
    hi = tables.baabb[:, 3:6]
    inv_d = 1.0 / dirs  # [R,3]

    t0 = jnp.broadcast_to(t_min[:, None], (t_min.shape[0], nb))
    t1 = jnp.broadcast_to(t_max[:, None], (t_max.shape[0], nb))
    for a in range(3):
        tmin = (lo[None, :, a] - origins[:, a : a + 1]) * inv_d[:, a : a + 1]
        tmax = (hi[None, :, a] - origins[:, a : a + 1]) * inv_d[:, a : a + 1]
        swap = tmin > tmax
        tmin, tmax = jnp.where(swap, tmax, tmin), jnp.where(swap, tmin, tmax)
        tmax = tmax * _SLAB_SCALE
        t0 = jnp.where(tmin > t0, tmin, t0)
        t1 = jnp.where(tmax < t1, tmax, t1)
    hit = (t0 <= t1).reshape(n_ray_blocks, br, nb).any(axis=1)  # [nrb, nb]

    counts = hit.sum(axis=1).astype(jnp.int32)
    # Stable argsort of (miss, block_index) puts hit blocks first, in order:
    order = jnp.argsort(jnp.where(hit, 0, 1), axis=1, stable=True).astype(jnp.int32)
    return counts, order


def _dense_kernel(count_ref, list_ref, dist_ref, rays_ref, p_ref, nrm_ref,
                  out_t_ref, out_i_ref, out_n_ref, out_m_ref,
                  bt_ref, bi_ref, bn_ref, bm_ref,
                  *, br, nb):
    i = pl.program_id(0)
    rays = rays_ref[:]                     # [8, br]
    t_min = rays[6:7, :]                   # [1, br]
    t_max = rays[7:8, :]

    bt_ref[:] = t_max
    bi_ref[:] = jnp.full((1, br), -1, jnp.int32)
    bn_ref[:] = jnp.zeros((8, br), jnp.float32)
    bm_ref[:] = jnp.zeros((8, br), jnp.float32)

    def step(blk, _):
        best_t = bt_ref[:]
        # One MXU contraction (K padded to 8 sublanes) for all six dot
        # products of o and d against n/g1/g2:
        # Precision note: the MXU's default f32 dot rounds operands
        # through bf16 (~0.4% rel) — visibly wrong hit points and shadow
        # acne — and Precision.HIGHEST lowers ~5x slower here. Full-f32
        # VPU FMAs over per-triangle component columns are exact and
        # competitive:
        pb = p_ref[pl.ds(blk * TB, TB), :]                 # [TB, 16]
        tnp0 = pb[:, 0:1]
        g1p0 = pb[:, 1:2]
        g2p0 = pb[:, 2:3]

        def tdot(c0, ray_rows):
            return (
                pb[:, c0 : c0 + 1] * ray_rows[0]
                + pb[:, c0 + 1 : c0 + 2] * ray_rows[1]
                + pb[:, c0 + 2 : c0 + 3] * ray_rows[2]
            )

        o_rows = [rays[a : a + 1, :] for a in range(3)]    # [1, br] each
        d_rows = [rays[a : a + 1, :] for a in range(3, 6)]
        on = tdot(3, o_rows)
        dn = tdot(3, d_rows)
        og1 = tdot(6, o_rows)
        dg1 = tdot(6, d_rows)
        og2 = tdot(9, o_rows)
        dg2 = tdot(9, d_rows)

        # Fast reciprocal + one Newton step (~f32 accurate):  # noqa
        r = pl.reciprocal(dn, approx=True)
        r = r * (2.0 - dn * r)
        t = (tnp0 - on) * r
        b1 = og1 + t * dg1 - g1p0
        b2 = og2 + t * dg2 - g2p0
        # Watertight widened acceptance (utils/constants.py
        # WATERTIGHT_EPS_SCALE; ref src/Mesh.cpp:8-104 contract):
        o_mag = jnp.maximum(jnp.maximum(jnp.abs(o_rows[0]),
                                        jnp.abs(o_rows[1])),
                            jnp.abs(o_rows[2]))
        et = (pb[:, 14:15] + jnp.abs(on)) * jnp.abs(r)
        eps = jnp.minimum(
                pb[:, 12:13] + pb[:, 13:14] * (o_mag + et),
                np.float32(1e-3))
        # t < best_t is deliberately absent: the block winner is taken by
        # min-t and `better` re-checks before any update (megakernel.py):
        ok = (
            (jnp.minimum(b1, b2) >= -eps) & (b1 + b2 <= 1.0 + eps)
            & (t > t_min)
        )
        tm = jnp.where(ok, t, _INF)
        bt = jnp.min(tm, axis=0, keepdims=True)            # [1, br]
        lane = jax.lax.broadcasted_iota(jnp.int32, (TB, br), 0) + blk * TB
        bi = jnp.min(
            jnp.where(tm <= bt, lane, jnp.int32(0x7FFFFFFF)),
            axis=0, keepdims=True,
        )
        # Shading normal (+ material payload rows) of the per-block
        # winner, selected densely via a one-hot matmul (no gathers);
        # (lane == bi) picks exactly one triangle even on t-ties:
        onehot = (lane == bi).astype(jnp.float32)          # [TB, br]
        nrm_blk = nrm_ref[:, pl.ds(blk * 3 * TB, 3 * TB)]  # [8, 3TB]
        # Zero barycentrics on failed rows first: degenerate/padding
        # triangles produce NaN b1/b2 there, and 0 * NaN = NaN would
        # poison the selection dot:
        w1 = onehot
        w2 = onehot * jnp.where(ok, b1, 0.0)
        w3 = onehot * jnp.where(ok, b2, 0.0)
        nd = (((1,), (0,)), ((), ()))
        # w2/w3 (barycentric interpolation weights) must touch ONLY the
        # normal rows 0-2: segments 1/2 carry material payload in their
        # spare rows, and b1/b2-weighted leakage into the albedo/id rows
        # was a real radiometry bug (test_megakernel_matches_dense_streaming):
        n_cand = jax.lax.dot_general(
            nrm_blk[:, 0:TB], w1, nd, preferred_element_type=jnp.float32)
        n_interp = (
            jax.lax.dot_general(nrm_blk[0:3, TB:2 * TB], w2, nd,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(nrm_blk[0:3, 2 * TB:3 * TB], w3, nd,
                                  preferred_element_type=jnp.float32)
        )
        n_cand = jnp.concatenate([n_cand[0:3] + n_interp, n_cand[3:8]],
                                 axis=0)                    # [8, br]
        # Second material payload bank: segment 1's spare rows selected by
        # the clean w1 one-hot (rows 0..2 come out as dN1 — ignored):
        m_cand = jax.lax.dot_general(
            nrm_blk[:, TB:2 * TB], w1, nd, preferred_element_type=jnp.float32
        )                                                   # [8, br]

        better = (bt < best_t) & (bt < _INF)
        bt_ref[:] = jnp.where(better, bt, best_t)
        bi_ref[:] = jnp.where(better, bi, bi_ref[:])
        bn_ref[:] = jnp.where(better, n_cand, bn_ref[:])
        bm_ref[:] = jnp.where(better, m_cand, bm_ref[:])
        return 0

    # Near-to-far walk with early termination: every CHECK_EVERY blocks,
    # compare the worst live best_t against the next block's distance
    # lower bound; once no remaining block can beat any lane, stop.
    CHECK_EVERY = 4
    count = count_ref[i]

    def cond(carry):
        j, stop = carry
        return (j < count) & jnp.logical_not(stop)

    def loop(carry):
        j, _ = carry
        step(list_ref[i, j], 0)
        j = j + 1
        do_check = (j % CHECK_EVERY == 0) & (j < nb)
        worst = jnp.max(bt_ref[:])
        stop = jnp.where(do_check, worst < dist_ref[i, j % nb], False)
        return j, stop

    jax.lax.while_loop(cond, loop, (jnp.int32(0), False))
    out_t_ref[:] = bt_ref[:]
    out_i_ref[:] = bi_ref[:]
    out_n_ref[:] = bn_ref[:]
    out_m_ref[:] = bm_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret", "br", "cull"))
def pallas_intersect(tables: BlockedSceneTables, origins, dirs, t_min, t_max,
                     interpret: bool = False, br: int | None = None,
                     cull: str = "bundle"):
    """Closest-hit against the blocked triangle tables.

    origins/dirs [R,3], t_min/t_max [R]; R is padded to BR internally.
    Returns (t [R], packed_tri_index [R]; -1 where no triangle hit).
    """
    if tables.p is None:
        raise RuntimeError(
            "VMEM-layout p table was skipped at build time (scene "
            "exceeds tables.VMEM_TABLE_MAX_TRIS); use pallas_intersect_hbm "
            "or rebuild with build_scene(..., intersector='pallas')")
    br = br or BR
    R = origins.shape[0]
    Rp = -(-R // br) * br
    pad = Rp - R
    nrb = Rp // br

    def padr(a, fill=0.0):
        cfg = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=fill)

    o_pad = padr(origins)
    d_pad = padr(dirs, 1.0)                 # pad dirs nonzero
    tmin_pad = padr(t_min)
    tmax_pad = padr(t_max, -1.0)            # pad rays never hit

    counts, order, dists = block_cull_lists_bundle(
        tables, o_pad, d_pad, tmin_pad, tmax_pad, nrb, br
    )

    o_t = o_pad.T
    d_t = d_pad.T
    rays = jnp.concatenate(
        [o_t, d_t, tmin_pad[None, :], tmax_pad[None, :]], axis=0
    )                                              # [8, Rp]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nrb,),
        in_specs=[
            pl.BlockSpec((8, br), lambda i, c_, o_, d_: (0, i)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nrm
        ],
        out_specs=[
            pl.BlockSpec((1, br), lambda i, c_, o_, d_: (0, i)),
            pl.BlockSpec((1, br), lambda i, c_, o_, d_: (0, i)),
            pl.BlockSpec((8, br), lambda i, c_, o_, d_: (0, i)),
            pl.BlockSpec((8, br), lambda i, c_, o_, d_: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, br), jnp.float32),
            pltpu.VMEM((1, br), jnp.int32),
            pltpu.VMEM((8, br), jnp.float32),
            pltpu.VMEM((8, br), jnp.float32),
        ],
    )
    out_t, out_i, out_n, out_m = pl.pallas_call(
        functools.partial(_dense_kernel, br=br, nb=tables.num_blocks),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
        ],
        interpret=interpret,
    )(counts, order, dists, rays, tables.p, tables.nrm)

    t = out_t[0, :R]
    idx = out_i[0, :R]
    found = idx >= 0
    normal = out_n[0:3, :R].T
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), jnp.float32(1e-30)
    )
    # Material payload (see tables.py layout/exactness contract):
    # rows 0-2 albedo, 3 id_hi, 4 id_lo, 5 mat_type+4*emissive, 6 ior,
    # 7-9 emission. w2/w3 only touch rows 0..2 of their segments, so the
    # payload rows come through the w1 one-hot alone:
    payload = jnp.concatenate([out_n[3:8, :R], out_m[3:8, :R]], axis=0)
    return jnp.where(found, t, t_max), idx, normal, payload
