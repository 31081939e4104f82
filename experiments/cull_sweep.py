#!/usr/bin/env python
"""Megakernel block-cull sweep (TPU): rate and blocks-walked vs ray-block
size, cull on/off, at the bench workload. The cull changes the br
trade-off — smaller bundles cull tighter (less union over lanes) but pay
more fixed cost per grid step.

Usage: python experiments/cull_sweep.py [size] [spp]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1440
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from ipu_ray_lib_tpu.ops.pallas.megakernel import megakernel_path_trace
    from ipu_ray_lib_tpu.render import streaming as S
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

    scene = make_cornell_box_scene(
        os.path.join(os.path.dirname(__file__), "..", "assets", "monkey_bust.glb"),
        box_only=False)
    arrays, params, _ = build_scene(
        scene, image_width=size, image_height=size, samples_per_pixel=spp,
        intersector="pallas")
    nb = arrays.blocked.num_blocks

    n_pix = size * size
    R = min(1 << 17, -(-n_pix // 256) * 256)
    J = -(-n_pix // R)
    pad = R * J - n_pix
    rows_np, cols_np, _ = S._pixel_stream(params, 32)
    rows = jnp.asarray(np.pad(rows_np, (0, pad)))
    cols = jnp.asarray(np.pad(cols_np, (0, pad)))
    max_iters = J * spp * params.max_path_length + 16

    def run(br, use_cull, reps=3):
        f = functools.partial(
            megakernel_path_trace, arrays, rows, cols, jnp.uint32(42),
            jnp.int32(n_pix), params=params, slots=R, j_per_slot=J, spp=spp,
            max_iters=max_iters, br=br, use_cull=use_cull, return_stats=True)
        flat, done, iters, blocks, *_ = f()  # compile + warm
        dt = float("inf")
        for _ in range(reps):
            t0 = time.time()
            flat, done, iters, blocks, *_ = f()
            mean = float(jnp.mean(flat))
            dt = min(dt, time.time() - t0)
        iters, blocks = int(iters), int(blocks)
        rate = n_pix * spp / dt / 1e6
        print(json.dumps({
            "br": br, "cull": use_cull, "Mpaths_s": round(rate, 2),
            "dt": round(dt, 3), "iters": iters,
            "blocks_per_iter": round(blocks / max(iters, 1), 2), "nb": nb,
            "done": int(done), "mean": round(mean, 5),
        }), flush=True)
        return rate

    for br in (256, 512, 1024, 2048):
        run(br, True)
    run(1024, False)


if __name__ == "__main__":
    main()
