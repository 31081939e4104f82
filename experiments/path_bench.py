#!/usr/bin/env python
"""End-to-end path-trace throughput on TPU: intersector x ray-sorting.

Also times jnp.argsort at wavefront sizes (the sorting overhead driver).

Run: python experiments/path_bench.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from experiments.kernel_sweep import log_result  # noqa: E402
from ipu_ray_lib_tpu.ops.camera import generate_camera_rays, pixel_grid  # noqa: E402
from ipu_ray_lib_tpu.render.path import path_trace_sample  # noqa: E402
from ipu_ray_lib_tpu.scene.build import build_scene  # noqa: E402
from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene  # noqa: E402


def main():
    R = 1 << 17
    spp = 4
    scene = make_cornell_box_scene("assets/monkey_bust.glb", box_only=False)
    arrays, params, _ = build_scene(scene, image_width=1440, image_height=1440)

    # argsort timing at wavefront size:
    keys = jax.random.randint(jax.random.PRNGKey(0), (R,), 0, 1 << 15)
    f = jax.jit(jnp.argsort)
    np.asarray(f(keys))
    t0 = time.time()
    for _ in range(10):
        r = f(keys)
    np.asarray(r)
    log_result(exp="argsort", n=R, ms=(time.time() - t0) / 10 * 1e3)

    tile = 32
    ys, xs = np.meshgrid(np.arange(1440), np.arange(1440), indexing="ij")
    order = np.lexsort(
        (xs.ravel() % tile, ys.ravel() % tile, xs.ravel() // tile, ys.ravel() // tile)
    )
    ar = ys.ravel()[order].astype(np.float32)
    ac = xs.ravel()[order].astype(np.float32)
    mid = len(ar) // 2 - R // 2
    rows = jnp.asarray(ar[mid : mid + R])
    cols = jnp.asarray(ac[mid : mid + R])

    key = jax.random.PRNGKey(1442)

    for intersector, sorts in (("pallas", (0, -1)),):
        for sort in sorts:
            @functools.partial(jax.jit, static_argnames=())
            def run(k):
                def one(s, acc):
                    sk = jax.random.fold_in(k, s)
                    o, d = generate_camera_rays(
                        rows, cols, 1440, 1440, params.fov_radians,
                        params.anti_alias_scale, jax.random.fold_in(sk, 1),
                    )
                    res = path_trace_sample(
                        arrays, o, d, sk, params.max_path_length,
                        params.roulette_start_depth,
                        intersector=intersector, sort_rays=sort,
                    )
                    return acc + res.rgb

                return jax.lax.fori_loop(0, spp, one, jnp.zeros((R, 3), jnp.float32))

            try:
                t0 = time.time()
                out = np.asarray(run(key))
                compile_s = time.time() - t0
                t0 = time.time()
                for _ in range(3):
                    out = run(key)
                out = np.asarray(out)
                dt = (time.time() - t0) / 3
                log_result(
                    exp="path_bench", intersector=intersector, sort=sort,
                    compile_s=round(compile_s, 1),
                    mpaths=R * spp / dt / 1e6,
                    mean=float(out.mean()),
                )
            except Exception as e:
                log_result(exp="path_bench", intersector=intersector, sort=sort,
                           error=repr(e)[:160])



if __name__ == "__main__":
    main()
