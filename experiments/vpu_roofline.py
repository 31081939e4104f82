#!/usr/bin/env python
"""Measure the TPU VPU's sustainable elementwise op rate (VERDICT r3 #4).

The megakernel's dense chain sustains ~0.96 T f32 vector-op/s (19.9 G
pair-tests/s x ~48 ops/pair, bench telemetry). Whether that is "the
roofline" depends on the actual per-op issue rate of the VPU, which this
microbench pins empirically: a Pallas kernel runs G independent
register-resident streams of U chained ops per fori_loop iteration over
an [S, 512] f32 block, for several op kinds (fma / mul / add / min /
max / cmp+select). G*U independent chains give the scheduler ILP; the
carry dependency defeats folding. ops = S*512 * G * U * iters.

Usage: python experiments/vpu_roofline.py [S] [iters]
       defaults: 8 20000 (one [8, 512] block = 4 native f32 tiles,
       matching the dense window shape; try S=256 for the cull-slab
       shape).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

f32 = jnp.float32
G = 8   # independent streams
U = 4   # chained ops per stream per iteration


def _mk_kernel(op, S, iters, dtype=f32):
    def kern(x_ref, o_ref):
        accs = [(x_ref[:] * f32(1.0 + 0.001 * g)).astype(dtype)
                for g in range(G)]

        def body(i, accs):
            out = []
            cst = lambda v: jnp.asarray(v, dtype)
            for g, a in enumerate(accs):
                c = cst(0.9999 + 0.0001 * g)
                for u in range(U):
                    if op == "fma":
                        a = a * c + cst(1e-7)
                    elif op == "mul":
                        a = a * c
                    elif op == "add":
                        a = a + c
                    elif op == "min":
                        a = jnp.minimum(a, a * cst(1.0002) + c)
                    elif op == "max":
                        a = jnp.maximum(a, c - a)
                    elif op == "sel":
                        a = jnp.where(a > c, a * cst(0.9999),
                                      a + cst(1e-6))
                    elif op == "slab":
                        # One slab-axis step: 2 products vs per-row
                        # consts + min + max + 2 accum — the cull
                        # pass's per-axis op mix:
                        p1 = a * c
                        p2 = a * cst(1.0001)
                        a = jnp.minimum(p1, p2) + jnp.maximum(p1, p2) * c
                out.append(a)
            return out

        accs = jax.lax.fori_loop(0, iters, body, accs)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[:] = acc.astype(f32)

    return kern


# vector ops issued per chain step (for the rate arithmetic):
OPS_PER_STEP = {"fma": 1, "mul": 1, "add": 1, "min": 2, "max": 2,
                "sel": 3, "slab": 6}


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    dtype = (jnp.bfloat16 if len(sys.argv) > 3 and sys.argv[3] == "bf16"
             else f32)
    x = jnp.full((S, 512), 0.5, f32)
    log = open(os.path.join(os.path.dirname(__file__), "results.jsonl"),
               "a")
    from _health import tunnel_probe_s
    probe_s = tunnel_probe_s()
    print(f"# tunnel probe: {probe_s}s", flush=True)
    for op, n_ops in OPS_PER_STEP.items():
        if op == "sel" and dtype != f32:
            continue  # cmpf on packed 8x128x2xbf16 fails to lower (Mosaic)
        kern = _mk_kernel(op, S, iters, dtype)
        f = jax.jit(pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((S, 512), f32)))
        r = f(x)
        np.asarray(r)  # compile + warm
        dt = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(f(x))
            dt = min(dt, time.time() - t0)
        total = S * 512 * G * U * iters
        rec = {"exp": "vpu_roofline", "op": op, "S": S, "iters": iters,
               "dtype": jnp.dtype(dtype).name,
               "chain_steps_per_s": round(total / dt / 1e9, 2),
               "vops_per_s_G": round(total * n_ops / dt / 1e9, 2),
               "dt": round(dt, 4), "probe_s": probe_s,
               "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
        log.write(json.dumps(rec) + "\n")
        log.flush()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
