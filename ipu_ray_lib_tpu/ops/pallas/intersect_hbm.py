"""HBM-blocked closest-hit kernel: scenes larger than VMEM.

TPU-native counterpart of the reference's 2-stage DRAM ray/scene pipeline
(ref: src/IpuScene.cpp:583-618 — the trick that lets an IPU trace scenes
bigger than tile SRAM): the blocked triangle tables stay in HBM; each ray
block walks only its culled *super* list (SB = 8 triangle blocks per
super, the two-level hierarchy built in tables.py), and each listed
super's 160 KB table slab streams through a double-buffered VMEM window
via explicit ``make_async_copy`` DMA — the next slab's fetch rides behind
the current slab's dense tests.

Why supers: per-ray-block candidate lists must live in SMEM scalar
prefetch (Mosaic has no unaligned dynamic vector reads), and SMEM tops
out around 512 KB. Super-granular lists are 8x smaller than block lists,
and the ray axis is additionally chunked (``RB_PER_CALL`` ray blocks per
pallas_call) so lists + distance bounds stay ~100 KB at any scene size.

Phase 1 (XLA): the same conservative ray-bundle cull as the VMEM kernel,
against the super AABBs, near-to-far with distance lower bounds for the
provable early stop.

Phase 2 (Pallas, grid = ray blocks): per listed super, DMA its p/nrm
slabs HBM->VMEM (2 slots, 2 semaphores each), then run the identical
dense test + one-hot payload selection as intersect_kernel.py over the
super's 8 blocks at static offsets.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_kernel import super_cull_lists_bundle
from .tables import PN_SUPER as PNS, SB, TB, BlockedSceneTables

BR = 1024
RB_PER_CALL = 32       # ray blocks per pallas_call (bounds SMEM lists)
_INF = np.float32(np.inf)


def _hbm_kernel(count_ref, list_ref, dist_ref, rays_ref, p_hbm, pay_hbm,
                out_t_ref, out_i_ref, out_n_ref, out_m_ref,
                p_buf, pay_buf, sems, bt_ref, bi_ref, bn_ref, bm_ref,
                *, br, ns, split):
    i = pl.program_id(0)
    rays = rays_ref[:]                     # [8, br]
    t_min = rays[6:7, :]
    t_max = rays[7:8, :]

    bt_ref[:] = t_max
    bi_ref[:] = jnp.full((1, br), -1, jnp.int32)
    bn_ref[:] = jnp.zeros((8, br), jnp.float32)
    bm_ref[:] = jnp.zeros((8, br), jnp.float32)

    o_rows = [rays[a : a + 1, :] for a in range(3)]
    d_rows = [rays[a : a + 1, :] for a in range(3, 6)]
    count = count_ref[i]

    def dmas(slot, j):
        sup = list_ref[i, j]
        # VMEM-sized scenes: fused pn8 layout — one super = a dense
        # [PN_SUPER, SB*16] f32 slab (p8 block columns in rows [0, TB),
        # the members' nrm payload chunks below), ONE DMA per super.
        # Big scenes (split): the payload rides the separate bf16 pay8
        # table — a second, half-size DMA (tables.py pay8 contract):
        if split:
            return (
                pltpu.make_async_copy(
                    p_hbm.at[pl.ds(sup * TB, TB), :], p_buf.at[slot],
                    sems.at[slot, 0]),
                pltpu.make_async_copy(
                    pay_hbm.at[pl.ds(sup * SB * 24, SB * 24), :],
                    pay_buf.at[slot], sems.at[slot, 1]),
            )
        return (
            pltpu.make_async_copy(
                p_hbm.at[pl.ds(sup * PNS, PNS), :], p_buf.at[slot],
                sems.at[slot, 0]),
        )

    @pl.when(count > 0)
    def _():
        for dma in dmas(0, 0):
            dma.start()

    def step(j):
        slot = j % 2

        @pl.when(j + 1 < count)
        def _():
            for dma in dmas((j + 1) % 2, j + 1):
                dma.start()

        for dma in dmas(slot, j):
            dma.wait()

        sup = list_ref[i, j]
        for b in range(SB):                                # static unroll
            best_t = bt_ref[:]
            pb = p_buf[slot, 0:TB, b * 16:(b + 1) * 16]    # [TB, 16]
            tnp0 = pb[:, 0:1]
            g1p0 = pb[:, 1:2]
            g2p0 = pb[:, 2:3]

            def tdot(c0, rr, pb=pb):
                return (pb[:, c0 : c0 + 1] * rr[0]
                        + pb[:, c0 + 1 : c0 + 2] * rr[1]
                        + pb[:, c0 + 2 : c0 + 3] * rr[2])

            on = tdot(3, o_rows)
            dn = tdot(3, d_rows)
            og1 = tdot(6, o_rows)
            dg1 = tdot(6, d_rows)
            og2 = tdot(9, o_rows)
            dg2 = tdot(9, d_rows)
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
            ok = ((jnp.minimum(b1, b2) >= -eps) & (b1 + b2 <= 1.0 + eps)
                  & (t > t_min))
            tm = jnp.where(ok, t, _INF)
            bt = jnp.min(tm, axis=0, keepdims=True)
            lane = jax.lax.broadcasted_iota(jnp.int32, (TB, br), 0)
            bi = jnp.min(jnp.where(tm <= bt, lane, jnp.int32(0x7FFFFFFF)),
                         axis=0, keepdims=True)
            onehot = (lane == bi).astype(jnp.float32)
            # On TPU the DEFAULT-precision dots round their f32 inputs
            # through bf16, so casting the weights explicitly for the
            # bf16 split table multiplies identical factors:
            cast = ((lambda a: a.astype(jnp.bfloat16)) if split
                    else (lambda a: a))
            w1 = cast(onehot)
            w2 = cast(onehot * jnp.where(ok, b1, 0.0))
            w3 = cast(onehot * jnp.where(ok, b2, 0.0))
            nd = (((1,), (0,)), ((), ()))
            # Member b's nrm payload chunks: below the p slab in the
            # fused super (chunk j at rows [TB + (b*3+j)*8, +8) —
            # tables.py pn8), or in the streamed bf16 pay slab (rows
            # [b*24 + j*8, +8) — tables.py pay8). w2/w3 interpolation
            # restricted to rows 0-2 (material rows ride chunks 1/2 —
            # see intersect_kernel.py):
            if split:
                c0 = b * 24
                ch = lambda lo, hi: pay_buf[slot, c0 + lo:c0 + hi, :]
            else:
                c0 = TB + b * 3 * 8
                ch = lambda lo, hi: p_buf[slot, c0 + lo:c0 + hi, :]
            n_cand = jax.lax.dot_general(
                ch(0, 8), w1, nd, preferred_element_type=jnp.float32)
            n_interp = (
                jax.lax.dot_general(ch(8, 11), w2, nd,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(ch(16, 19), w3, nd,
                                      preferred_element_type=jnp.float32))
            n_cand = jnp.concatenate([n_cand[0:3] + n_interp, n_cand[3:8]],
                                     axis=0)
            m_cand = jax.lax.dot_general(ch(8, 16), w1, nd,
                                         preferred_element_type=jnp.float32)
            bi_glob = bi + (sup * SB + b) * TB

            better = (bt < best_t) & (bt < _INF)
            bt_ref[:] = jnp.where(better, bt, best_t)
            bi_ref[:] = jnp.where(better, bi_glob, bi_ref[:])
            bn_ref[:] = jnp.where(better, n_cand, bn_ref[:])
            bm_ref[:] = jnp.where(better, m_cand, bm_ref[:])

    # Near-to-far walk with a provable early stop every other super
    # (worst live best_t vs the next super's distance lower bound):
    CHECK_EVERY = 2

    def cond(carry):
        j, stop = carry
        return (j < count) & jnp.logical_not(stop)

    def loop(carry):
        j, _ = carry
        step(j)
        j = j + 1
        do_check = (j % CHECK_EVERY == 0) & (j < ns)
        worst = jnp.max(bt_ref[:])
        stop = jnp.where(do_check, worst < dist_ref[i, j % ns], False)
        return j, stop

    j_fin, stopped = jax.lax.while_loop(cond, loop, (jnp.int32(0), False))

    # Early termination leaves the j_fin prefetch in flight; drain it so
    # the next grid step's semaphores start clean:
    @pl.when(stopped & (j_fin < count))
    def _():
        for dma in dmas(j_fin % 2, j_fin):
            dma.wait()

    out_t_ref[:] = bt_ref[:]
    out_i_ref[:] = bi_ref[:]
    out_n_ref[:] = bn_ref[:]
    out_m_ref[:] = bm_ref[:]


def _hbm_call(tables, counts, order, dists, rays, nrb, br, interpret):
    ns = tables.num_supers
    split = tables.pay8 is not None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nrb,),
        in_specs=[
            pl.BlockSpec((8, br), lambda i, c_, o_, d_: (0, i)),   # rays
            pl.BlockSpec(memory_space=pltpu.ANY),         # pn8/p8 (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),         # pay8 (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, br), lambda i, c_, o_, d_: (0, i)),
            pl.BlockSpec((1, br), lambda i, c_, o_, d_: (0, i)),
            pl.BlockSpec((8, br), lambda i, c_, o_, d_: (0, i)),
            pl.BlockSpec((8, br), lambda i, c_, o_, d_: (0, i)),
        ],
        scratch_shapes=[
            # super slab window(s): fused [PNS, 128] f32, or split
            # [TB, 128] f32 p + [SB*24, TB] bf16 payload:
            pltpu.VMEM((2, TB if split else PNS, SB * 16), jnp.float32),
            pltpu.VMEM((2, SB * 24, TB) if split else (1, 8, 128),
                       jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2 if split else 1)),
            pltpu.VMEM((1, br), jnp.float32),
            pltpu.VMEM((1, br), jnp.int32),
            pltpu.VMEM((8, br), jnp.float32),
            pltpu.VMEM((8, br), jnp.float32),
        ],
    )
    Rp = nrb * br
    pay_in = (tables.pay8 if split
              else jnp.zeros((8, 128), jnp.bfloat16))
    return pl.pallas_call(
        functools.partial(_hbm_kernel, br=br, ns=ns, split=split),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
        ],
        interpret=interpret,
    )(counts, order, dists, rays, tables.pn8, pay_in)


@functools.partial(jax.jit, static_argnames=("interpret", "br"))
def pallas_intersect_hbm(tables: BlockedSceneTables, origins, dirs,
                         t_min, t_max, interpret: bool = False,
                         br: int | None = None):
    """Closest-hit against HBM-resident blocked tables (any scene size).

    Same contract as intersect_kernel.pallas_intersect: origins/dirs
    [R, 3]; returns (t, packed_tri_index, normal, payload [10, R])."""
    br = br or BR
    R = origins.shape[0]
    Rp = -(-R // br) * br
    pad = Rp - R
    nrb = Rp // br

    def padr(a, fill=0.0):
        cfg = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=fill)

    o_pad = padr(origins)
    d_pad = padr(dirs, 1.0)
    tmin_pad = padr(t_min)
    tmax_pad = padr(t_max, -1.0)

    counts, order, dists = super_cull_lists_bundle(
        tables, o_pad, d_pad, tmin_pad, tmax_pad, nrb, br
    )
    rays = jnp.concatenate(
        [o_pad.T, d_pad.T, tmin_pad[None, :], tmax_pad[None, :]], axis=0
    )                                              # [8, Rp]

    # Chunk the ray axis so SMEM lists stay bounded at any scene size:
    # lists + bounds cost ns * 8 bytes per ray block; keep under ~384 KB.
    ns = tables.num_supers
    rb_per_call = max(1, min(RB_PER_CALL, 49152 // max(ns, 1)))
    outs = []
    for c0 in range(0, nrb, rb_per_call):
        c1 = min(c0 + rb_per_call, nrb)
        outs.append(_hbm_call(
            tables,
            jax.lax.dynamic_slice_in_dim(counts, c0, c1 - c0, 0),
            jax.lax.dynamic_slice_in_dim(order, c0, c1 - c0, 0),
            jax.lax.dynamic_slice_in_dim(dists, c0, c1 - c0, 0),
            jax.lax.dynamic_slice_in_dim(rays, c0 * br, (c1 - c0) * br, 1),
            c1 - c0, br, interpret,
        ))
    out_t, out_i, out_n, out_m = (
        outs[0] if len(outs) == 1 else
        tuple(jnp.concatenate(parts, axis=-1) for parts in zip(*outs))
    )

    t = out_t[0, :R]
    idx = out_i[0, :R]
    found = idx >= 0
    normal = out_n[0:3, :R].T
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), jnp.float32(1e-30)
    )
    payload = jnp.concatenate([out_n[3:8, :R], out_m[3:8, :R]], axis=0)
    return jnp.where(found, t, t_max), idx, normal, payload
