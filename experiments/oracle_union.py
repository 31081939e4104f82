#!/usr/bin/env python
"""Measure the true-need block union vs what the cull actually walks.

The round-3 design question (VERDICT r2 #1): how much of the ~19
blocks-walked/iter on Cornell bounces is conservative-cull overshoot
(initial flags test the INFINITE ray because best_t is unknown), and how
much is the genuine bundle-union bound? The kernel's _count_oracle mode
recomputes the flags after the walk with the *converged* best_t — the
blocks a perfect ordered walk would still have to test.

If oracle ~= walked: the union bound is real, binning is the only lever.
If oracle << walked: a near-to-far ordered walk with dense reflags can
capture the gap without moving any rays.

Usage: python experiments/oracle_union.py [size] [spp]   (TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax.numpy as jnp

from ipu_ray_lib_tpu.ops.pallas.megakernel import megakernel_path_trace
from ipu_ray_lib_tpu.render.streaming import (_device_stream, _pick_br,
                                              _pixel_stream)
from ipu_ray_lib_tpu.scene.build import build_scene
from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 720
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sub = int(os.environ.get("ORACLE_SUB", 1))
    reflag = int(os.environ.get("ORACLE_REFLAG", 3))

    mesh = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "monkey_bust.glb")
    mesh = mesh if os.path.exists(mesh) else None
    scene = make_cornell_box_scene(mesh, box_only=False)
    arrays, params, _ = build_scene(
        scene, image_width=size, image_height=size, samples_per_pixel=spp,
        intersector="pallas")

    n_pix = size * size
    R = min(1 << 17, -(-n_pix // 256) * 256)
    J = -(-n_pix // R)
    rows_np, cols_np, _ = _pixel_stream(params, 32)
    rows_d, cols_d = _device_stream(rows_np, cols_np, R * J - n_pix,
                                    ("oracle", size, R, J))
    max_iters = J * spp * params.max_path_length + 16

    def run():
        return megakernel_path_trace(
            arrays, rows_d, cols_d, jnp.uint32(1234), jnp.int32(n_pix),
            params=params, slots=R, j_per_slot=J, spp=spp,
            max_iters=max_iters, br=_pick_br(R, J), sub=sub, reflag=reflag,
            return_stats=True, _count_oracle=True)

    out = run()
    [o.block_until_ready() for o in out]
    t0 = time.time()
    flat, done, iters, walked, oracle, *_ = [np.asarray(o) for o in run()]
    dt = time.time() - t0
    nb = arrays.blocked.num_blocks * sub
    print(f"size {size} spp {spp} sub {sub} reflag {reflag}: "
          f"{int(done)} paths, {dt:.2f}s, mean {flat.mean():.4f}")
    print(f"bundle-iters {int(iters)}  walked/iter {walked/iters:.2f}  "
          f"oracle/iter {oracle/iters:.2f}  (of {nb} blocks; "
          f"overshoot {100*(walked-oracle)/max(walked,1):.1f}%)")


if __name__ == "__main__":
    main()
