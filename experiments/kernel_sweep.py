#!/usr/bin/env python
"""Intersector kernel experiments on real TPU hardware.

Run:  python experiments/kernel_sweep.py [--quick]

Measures, for the Cornell+monkey scene at 1440^2:
  * pallas v3 (scalar-prefetch lists) across ray-block sizes BR
  * per-grid-step fixed overhead (counts=0 vs counts=N)
  * coherent (tiled primary) vs incoherent (random) rays

Appends results to experiments/results.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ipu_ray_lib_tpu.ops.camera import generate_camera_rays  # noqa: E402
from ipu_ray_lib_tpu.ops.pallas import intersect_kernel as K  # noqa: E402
from ipu_ray_lib_tpu.ops.pallas.tables import build_blocked_tables  # noqa: E402
from ipu_ray_lib_tpu.scene.build import build_scene  # noqa: E402
from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene  # noqa: E402

RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")


def log_result(**kw):
    kw["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(RESULTS, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def make_inputs(R=1 << 17, size=1440, tile=32):
    scene = make_cornell_box_scene("assets/monkey_bust.glb", box_only=False)
    arrays, params, _ = build_scene(scene, image_width=size, image_height=size)
    tri_v = np.asarray(arrays.tri_v)
    verts = np.asarray(arrays.verts)
    n_tri = len(tri_v)
    tg = np.asarray(arrays.dense.tri_geom)[:n_tri]
    tp = np.asarray(arrays.dense.tri_prim)[:n_tri]
    tables = build_blocked_tables(tri_v, verts, tg, tp)

    ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    order = np.lexsort(
        (xs.ravel() % tile, ys.ravel() % tile, xs.ravel() // tile, ys.ravel() // tile)
    )
    ar = ys.ravel()[order].astype(np.float32)
    ac = xs.ravel()[order].astype(np.float32)
    mid = len(ar) // 2 - R // 2
    rows = jnp.asarray(ar[mid : mid + R])
    cols = jnp.asarray(ac[mid : mid + R])
    o, d = generate_camera_rays(rows, cols, size, size, params.fov_radians, 0.0, None)

    key = jax.random.PRNGKey(0)
    ro = jax.random.uniform(key, (R, 3), minval=-200.0, maxval=200.0) + jnp.array(
        [0.0, 0.0, -500.0]
    )
    rd = jax.random.normal(jax.random.fold_in(key, 1), (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return tables, o, d, ro, rd, R


def bench_fn(f, *args, iters=5):
    r = f(*args)
    _ = [np.asarray(x) for x in (r if isinstance(r, (tuple, list)) else [r])]
    t0 = time.time()
    for _i in range(iters):
        r = f(*args)
    _ = [np.asarray(x) for x in (r if isinstance(r, (tuple, list)) else [r])]
    return (time.time() - t0) / iters


def sweep_br(tables, o, d, ro, rd, R):
    tmin = jnp.zeros(R)
    tmax = jnp.full(R, jnp.inf)
    for cull in ("bundle", "ray"):
        for br in (1024, 2048, 4096):
            f = jax.jit(lambda o_, d_, br=br, cull=cull: K.pallas_intersect(
                tables, o_, d_, tmin, tmax, br=br, cull=cull))
            dt_c = bench_fn(f, o, d)
            dt_i = bench_fn(f, ro, rd)
            log_result(exp="sweep_br", br=br, cull=cull,
                       coherent_mrays=R / dt_c / 1e6, incoherent_mrays=R / dt_i / 1e6)


def cull_timing(tables, o, d, R):
    tmin = jnp.zeros(R)
    tmax = jnp.full(R, jnp.inf)
    nrb = R // K.BR
    f = jax.jit(lambda o_, d_: K.block_cull_lists(tables, o_, d_, tmin, tmax, nrb))
    dt = bench_fn(f, o, d)
    log_result(exp="cull_phase", br=K.BR, ms=dt * 1e3)


def main():
    tables, o, d, ro, rd, R = make_inputs()
    cull_timing(tables, o, d, R)
    sweep_br(tables, o, d, ro, rd, R)


if __name__ == "__main__":
    main()
