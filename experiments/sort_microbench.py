#!/usr/bin/env python
"""Microbenchmark: on-device ray re-binning primitives at slot-pool scale.

Decision data for the round-3 coherence bet (VERDICT r2 #1): re-sorting
the live ray pool by (origin cell, direction octant) every iteration only
pays if sort + permute of the full state costs well under the walk time
it saves (~2-3 ms per pool sweep at 131k slots). Measures, chained
in-jit (the tunnel adds ~85 ms per host dispatch — PROGRESS.md finding 1):

  a) jnp.argsort of [R] i32 keys
  b) counting-sort positions for B bins (one-hot cumsum formulation)
  c) jnp.take of a [S, R] f32 state along the lane axis (axis=1)
  d) row-gather of the transposed [R, S] state (+ the two transposes)
  e) jnp.cumsum over [R] i32

Usage: python experiments/sort_microbench.py  (TPU; one process only!)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

R = 1 << 17
S = 64          # state rows being permuted
B = 512         # re-binning bins
ITERS = 20


def timed(name, fn, *args):
    out = jax.jit(fn)(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # force (tunnel-safe)
    t0 = time.time()
    out = jax.jit(fn)(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.time() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:8.3f} ms/iter")
    return dt


def chain(body):
    """Run body ITERS times with a data dependency (anti-DCE)."""
    def run(x, *rest):
        def step(_, c):
            y = body(c, *rest)
            return y
        return jax.lax.fori_loop(0, ITERS, step, x)
    return run


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (R,), 0, B, dtype=jnp.int32)
    state = jax.random.normal(key, (S, R), jnp.float32)
    stateT = state.T.copy()

    # a) argsort keys
    timed("argsort [131k] i32", chain(
        lambda k: jnp.argsort(k + 1)), keys)

    # e) cumsum over [R]
    timed("cumsum [131k] i32", chain(
        lambda k: jnp.cumsum(k) % B), keys)

    # b) counting-sort positions: pos[i] = offset[key[i]] + rank_in_bin[i]
    def csort_pos(k):
        oh = (k[:, None] == jnp.arange(B, dtype=jnp.int32)[None, :])
        ohc = jnp.cumsum(oh.astype(jnp.int32), axis=0)       # [R, B]
        counts = ohc[-1]
        offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                jnp.cumsum(counts)[:-1]])
        rank = jnp.sum(jnp.where(oh, ohc - 1, 0), axis=1)
        return (offs[k] + rank) % B

    timed(f"counting-sort pos [131k x {B} bins]", chain(csort_pos), keys)

    # c) lane-axis gather of the state
    perm = jnp.argsort(keys)

    def lane_gather(st, p):
        return jnp.take(st, p, axis=1) + 1.0

    timed("take [64,131k] axis=1", chain(lane_gather), state, perm)

    # d) row gather on transposed state
    def row_gather(st, p):
        return jnp.take(st, p, axis=0) + 1.0

    timed("take [131k,64] axis=0", chain(row_gather), stateT, perm)

    def t_rt(st, p):
        return jnp.take(st.T, p, axis=0).T + 1.0

    timed("transpose+take+transpose [64,131k]", chain(t_rt), state, perm)

    # combined realistic pipeline: keys -> argsort -> lane gather
    def full_arg(st, k):
        p = jnp.argsort(k)
        return jnp.take(st, p, axis=1)

    def body_full(st, k):
        st2 = full_arg(st, k)
        return st2

    timed("argsort+take axis=1 combined", chain(body_full), state, keys)

    # sort-by-key of the packed state via lax.sort (multi-operand)
    def sortall(k, st):
        ops = (k,) + tuple(st[i] for i in range(0, S, 8))
        out = jax.lax.sort(ops, dimension=0, num_keys=1)
        return (out[0] * jnp.int32(1664525) + 1) % B

    timed("lax.sort key + 8 payload rows", chain(sortall), keys, state)


if __name__ == "__main__":
    main()
