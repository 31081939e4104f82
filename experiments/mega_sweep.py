#!/usr/bin/env python
"""Megakernel vs XLA-loop streaming timing decomposition (TPU).

Measures, in one process (one TPU worker), the end-to-end path rate of
the megakernel and the XLA-loop integrator at the bench workload, plus
variants that isolate where iterations go: primary-only (max_path_length
1), kernel ray-block size, and payload-dot cost.

Usage: python experiments/mega_sweep.py [quick]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def log_result(**kw):
    print(json.dumps(kw), flush=True)


def build(size, spp, maxlen=10):
    import dataclasses

    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

    scene = make_cornell_box_scene("assets/monkey_bust.glb", box_only=False)
    arrays, params, _ = build_scene(
        scene, image_width=size, image_height=size, samples_per_pixel=spp,
        intersector="pallas", max_path_length=maxlen,
    )
    return arrays, params


def time_render(arrays, params, spp, chunk, mega: bool, reps=1):
    from ipu_ray_lib_tpu.render import streaming as S

    orig = S._use_megakernel
    S._use_megakernel = (lambda p, e: False) if not mega else orig
    try:
        img, done = S.render_streaming(arrays, params, chunk_slots=chunk, spp=spp)
        t0 = time.time()
        for _ in range(reps):
            img, done = S.render_streaming(arrays, params, chunk_slots=chunk,
                                           spp=spp)
        dt = (time.time() - t0) / reps
    finally:
        S._use_megakernel = orig
    n_pix = params.window_w * params.window_h
    return n_pix * spp / dt / 1e6, dt, float(np.mean(img)), int(done)


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    size = 720 if quick else 1440
    spp = 8 if quick else 16
    chunk = 1 << 17

    arrays, params = build(size, spp)
    for mega in (True, False):
        rate, dt, mean, done = time_render(arrays, params, spp, chunk, mega)
        log_result(exp="bench", mega=mega, size=size, spp=spp,
                   mpaths_s=round(rate, 3), dt_s=round(dt, 2), mean=round(mean, 5))

    # Primary-only segments (coherent; cull-friendly):
    arrays1, params1 = build(size, spp, maxlen=1)
    for mega in (True, False):
        rate, dt, mean, done = time_render(arrays1, params1, spp, chunk, mega)
        log_result(exp="primary_only", mega=mega, size=size, spp=spp,
                   mpaths_s=round(rate, 3), dt_s=round(dt, 2))

    # Kernel ray-block size sweep (megakernel only):
    from ipu_ray_lib_tpu.ops.pallas.megakernel import megakernel_path_trace
    from ipu_ray_lib_tpu.render.streaming import _pixel_stream

    rows_np, cols_np, order = _pixel_stream(params, 32)
    n_pix = size * size
    R = chunk
    J = -(-n_pix // R)
    pad = R * J - n_pix
    rows = jnp.asarray(np.pad(rows_np, (0, pad)))
    cols = jnp.asarray(np.pad(cols_np, (0, pad)))
    max_iters = J * spp * params.max_path_length + 16
    for br in (512, 1024, 2048):
        if R % br:
            continue
        f = jax.jit(lambda rows, cols, br=br: megakernel_path_trace(
            arrays, rows, cols, jnp.uint32(1442), jnp.int32(n_pix),
            params=params, slots=R, j_per_slot=J, spp=spp,
            max_iters=max_iters, br=br))
        accum, done = f(rows, cols)
        np.asarray(accum)
        t0 = time.time()
        accum, done = f(rows, cols)
        np.asarray(accum)
        dt = time.time() - t0
        log_result(exp="br_sweep", br=br, mpaths_s=round(n_pix * spp / dt / 1e6, 3),
                   dt_s=round(dt, 2))


if __name__ == "__main__":
    main()
