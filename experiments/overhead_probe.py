"""HISTORICAL: this probe targeted the MXU-dot kernel generation and is
retained for the engineering record; the current kernel uses VPU FMAs and
no longer takes the w table. See PROGRESS.md findings 1-2.

Probe the fixed per-grid-step overhead of the dense Pallas kernel.

Variants (all compute the same closest hit):
  A: baseline — (1, br) outputs, scalar-prefetch lists
  B: (8, br)-shaped outputs (avoid sublane-1 relayouts)
  C: B + explicit parallel dimension semantics
  D: in-kernel VMEM scalar list reads (no scalar prefetch)

Run: python experiments/overhead_probe.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ipu_ray_lib_tpu.ops.pallas import intersect_kernel as K  # noqa: E402
from ipu_ray_lib_tpu.ops.pallas.tables import TB  # noqa: E402
from experiments.kernel_sweep import log_result, make_inputs  # noqa: E402

BR = 4096


def _body_common(count, blk_of, rays_ref, od_ref, w_ref, p_ref, bt, bi, t_min, best_rows):
    od = od_ref[:]

    def step(j, _):
        blk = blk_of(j)
        best_t = bt[0:best_rows, :][0:1, :] if best_rows > 1 else bt[:]
        w = w_ref[:, pl.ds(blk * 3 * TB, 3 * TB)]
        dims = (((0,), (0,)), ((), ()))
        dots = jax.lax.dot_general(w, od, dims, preferred_element_type=jnp.float32)
        on = dots[0:TB, 0:BR]
        og1 = dots[TB:2 * TB, 0:BR]
        og2 = dots[2 * TB:3 * TB, 0:BR]
        dn = dots[0:TB, BR:2 * BR]
        dg1 = dots[TB:2 * TB, BR:2 * BR]
        dg2 = dots[2 * TB:3 * TB, BR:2 * BR]
        pb = p_ref[pl.ds(blk * TB, TB), 0:4]
        r = pl.reciprocal(dn, approx=True)
        r = r * (2.0 - dn * r)
        t = (pb[:, 0:1] - on) * r
        b1 = og1 + t * dg1 - pb[:, 1:2]
        b2 = og2 + t * dg2 - pb[:, 2:3]
        ok = (b1 >= 0.) & (b2 >= 0.) & (b1 + b2 <= 1.) & (t > t_min) & (t < best_t)
        tm = jnp.where(ok, t, jnp.inf)
        btl = jnp.min(tm, axis=0, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (TB, BR), 0) + blk * TB
        bil = jnp.min(jnp.where(tm <= btl, lane, jnp.int32(0x7FFFFFFF)), axis=0, keepdims=True)
        better = (btl < best_t) & (btl < jnp.inf)
        if best_rows > 1:
            bt[0:1, :] = jnp.where(better, btl, best_t)
            bi[0:1, :] = jnp.where(better, bil, bi[0:1, :])
        else:
            bt[:] = jnp.where(better, btl, best_t)
            bi[:] = jnp.where(better, bil, bi[:])
        return 0

    jax.lax.fori_loop(0, count, step, 0)


def make_variant(tables, variant):
    nrows = 8 if variant in ("B", "C") else 1
    prefetch = variant != "D"

    def kernel(*refs):
        if prefetch:
            count_ref, list_ref, rays_ref, od_ref, w_ref, p_ref, out_t, out_i, bt, bi = refs
        else:
            rays_ref, od_ref, w_ref, p_ref, count_ref, list_ref, out_t, out_i, bt, bi = refs
        i = pl.program_id(0)
        rays = rays_ref[:]
        t_min = rays[6:7, :]
        t_max = rays[7:8, :]
        if nrows > 1:
            bt[0:1, :] = t_max
            bi[0:1, :] = jnp.full((1, BR), -1, jnp.int32)
        else:
            bt[:] = t_max
            bi[:] = jnp.full((1, BR), -1, jnp.int32)
        count = count_ref[i] if prefetch else count_ref[i, 0]
        blk_of = (lambda j: list_ref[i, j])
        _body_common(count, blk_of, rays_ref, od_ref, w_ref, p_ref, bt, bi, t_min, nrows)
        if nrows > 1:
            out_t[:] = jnp.broadcast_to(bt[0:1, :], (8, BR))
            out_i[:] = jnp.broadcast_to(bi[0:1, :], (8, BR))
        else:
            out_t[:] = bt[:]
            out_i[:] = bi[:]

    @functools.partial(jax.jit, static_argnames=())
    def run(counts, lists, rays, od):
        Rp = rays.shape[1]
        nrb = Rp // BR
        out_block = (nrows, BR)
        out_shape_rows = nrows
        scratch = [pltpu.VMEM((nrows, BR), jnp.float32), pltpu.VMEM((nrows, BR), jnp.int32)]
        compiler_params = None
        if variant == "C":
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            )
        if prefetch:
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(nrb,),
                in_specs=[pl.BlockSpec((8, BR), lambda i, c, l: (0, i)),
                          pl.BlockSpec((8, 2 * BR), lambda i, c, l: (0, i)),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=[pl.BlockSpec(out_block, lambda i, c, l: (0, i)),
                           pl.BlockSpec(out_block, lambda i, c, l: (0, i))],
                scratch_shapes=scratch,
            )
            args = (counts, lists, rays, od, tables.w, tables.p)
            call = pl.pallas_call(
                kernel, grid_spec=gs,
                out_shape=[jax.ShapeDtypeStruct((out_shape_rows, Rp), jnp.float32),
                           jax.ShapeDtypeStruct((out_shape_rows, Rp), jnp.int32)],
                **({"compiler_params": compiler_params} if compiler_params else {}),
            )
        else:
            gs = dict(
                grid=(nrb,),
                in_specs=[pl.BlockSpec((8, BR), lambda i: (0, i)),
                          pl.BlockSpec((8, 2 * BR), lambda i: (0, i)),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM),   # counts [nrb,1]
                          pl.BlockSpec(memory_space=pltpu.SMEM)],  # lists [nrb, nb]
                out_specs=[pl.BlockSpec(out_block, lambda i: (0, i)),
                           pl.BlockSpec(out_block, lambda i: (0, i))],
                scratch_shapes=scratch,
            )
            args = (rays, od, tables.w, tables.p, counts[:, None], lists)
            call = pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct((out_shape_rows, Rp), jnp.float32),
                           jax.ShapeDtypeStruct((out_shape_rows, Rp), jnp.int32)],
                **gs,
            )
        out_t, out_i = call(*args)
        return out_t[0], out_i[0]

    return run


def main():
    tables, o, d, ro, rd, R = make_inputs()
    tmin = jnp.zeros(R)
    tmax = jnp.full(R, jnp.inf)
    nrb = R // BR
    counts, lists = jax.jit(
        lambda o_, d_: K.block_cull_lists_bundle(tables, o_, d_, tmin, tmax, nrb, BR)
    )(o, d)
    print("avg blocks:", float(np.asarray(counts).mean()), flush=True)

    o_t = o.T
    d_t = d.T
    rays = jnp.concatenate([o_t, d_t, tmin[None], tmax[None]], axis=0)
    od = jnp.concatenate(
        [o_t.reshape(3, nrb, BR), d_t.reshape(3, nrb, BR)], axis=2
    ).reshape(3, 2 * R)
    od = jnp.pad(od, ((0, 5), (0, 0)))

    zc = jnp.zeros_like(counts)
    ref = None
    for variant in ("A", "B", "C", "D"):
        try:
            run = make_variant(tables, variant)
            r = run(counts, lists, rays, od)
            out = [np.asarray(x) for x in r]
            if ref is None:
                ref = out
            else:
                assert (out[1] == ref[1]).mean() > 0.999, f"variant {variant} mismatch"
            t0 = time.time()
            for _ in range(10):
                r = run(counts, lists, rays, od)
            _ = [np.asarray(x) for x in r]
            dt = (time.time() - t0) / 10
            # empty-work floor:
            r0 = run(zc, lists, rays, od)
            _ = [np.asarray(x) for x in r0]
            t0 = time.time()
            for _ in range(10):
                r0 = run(zc, lists, rays, od)
            _ = [np.asarray(x) for x in r0]
            dt0 = (time.time() - t0) / 10
            log_result(exp="overhead_probe", variant=variant,
                       ms=dt * 1e3, floor_ms=dt0 * 1e3,
                       us_per_step=dt0 * 1e6 / nrb,
                       mrays=R / dt / 1e6)
        except Exception as e:
            log_result(exp="overhead_probe", variant=variant, error=repr(e)[:200])


if __name__ == "__main__":
    main()
