#!/usr/bin/env python
"""Measure the Mosaic relayout cost of (1, 512) <-> (4, 128) reshapes.

Motivation (finding 65): every [1, br] elementwise op wastes 7/8 of the
VPU issue slot. If per-lane state lived as [4, 128] blocks (1 full-ish
vreg) the fixed/rest pool would shrink ~4x — IF the reshape at the
walk boundary (which needs [1, br] rows) is cheap. Three chains, all
G=8 streams x U ops x iters on 512-lane state:

  wide:   ops on (1, 512)            — today's layout
  narrow: ops on (4, 128)            — the dense layout, no boundary
  mixed:  (1,512) -> (4,128), U ops, -> (1,512) per iteration
          — the boundary round-trip cost on top of narrow

Usage: python experiments/relayout_bench.py [iters]  (default 2000000)
"""

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
G = 8
U = 4


def _mk(mode, iters):
    def kern(x_ref, o_ref):
        accs = [x_ref[:] * f32(1.0 + 0.001 * g) for g in range(G)]
        if mode == "narrow":
            accs = [a.reshape(4, 128) for a in accs]

        def body(i, accs):
            out = []
            for g, a in enumerate(accs):
                c = f32(0.9999 + 0.0001 * g)
                if mode == "mixed":
                    a = a.reshape(4, 128)
                for u in range(U):
                    a = jnp.minimum(a * c + f32(1e-7), a + c)
                if mode == "mixed":
                    a = a.reshape(1, 512)
                out.append(a)
            return out

        accs = jax.lax.fori_loop(0, iters, body, accs)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[:] = acc.reshape(1, 512)

    return kern


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000000
    x = jnp.full((1, 512), 0.5, f32)
    log = open(os.path.join(os.path.dirname(__file__), "results.jsonl"),
               "a")
    from _health import tunnel_probe_s
    probe_s = tunnel_probe_s()
    print(f"# tunnel probe: {probe_s}s", flush=True)
    for mode in ("wide", "narrow", "mixed"):
        kern = _mk(mode, iters)
        f = jax.jit(pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((1, 512), f32)))
        np.asarray(f(x))
        dt = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(f(x))
            dt = min(dt, time.time() - t0)
        steps = 512 * G * U * iters
        rec = {"exp": "relayout_bench", "mode": mode, "iters": iters,
               "lane_steps_per_s_G": round(steps / dt / 1e9, 2),
               "dt": round(dt, 4), "probe_s": probe_s,
               "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
        log.write(json.dumps(rec) + "\n")
        log.flush()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
