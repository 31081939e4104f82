#!/usr/bin/env python
"""Sweep kernel ray-block size (br) for the HBM-streamed megakernel.

Hypothesis (round 3, post-SAH-treelets): on >VMEM scenes every walked
super costs a fixed 64 KB p8 DMA + an [SB, br] refinement pass, and
bundle unions grow sublinearly with width (PROGRESS.md finding 32), so
wider bundles should amortise per-super costs better than the br=512
VMEM-scene pick.

Usage: python experiments/hbm_sweep.py [grid] [br...]   (TPU)
       default: grid=512, br in {512, 1024, 2048}
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from ipu_ray_lib_tpu.render.streaming import render_streaming
from ipu_ray_lib_tpu.scene.build import build_scene
from ipu_ray_lib_tpu.scene.builtin import make_stress_scene


def main():
    args = sys.argv[1:]
    grid = int(args[0]) if args else 512
    brs = [int(a) for a in args[1:]] or [512, 1024, 2048]
    scene = make_stress_scene(grid)
    arrays, params, _ = build_scene(
        scene, image_width=256, image_height=256,
        samples_per_pixel=8, max_path_length=5, intersector="pallas-hbm")
    ntris = arrays.blocked.p.shape[0]
    paths = 256 * 256 * 8
    print(f"grid {grid}: {ntris} tri rows", flush=True)
    for br in brs:
        os.environ["RAY_BR"] = str(br)
        render_streaming(arrays, params, stats_out={})  # compile + warm
        best, stats = float("inf"), {}
        for _ in range(2):
            stats = {}
            t0 = time.time()
            img, done = render_streaming(arrays, params, stats_out=stats)
            best = min(best, time.time() - t0)
        iters = max(1, stats.get("iters", 0))
        print(f"br={br}: {paths / best / 1e6:.3f} Mpaths/s ({best:.2f}s, "
              f"mean {img.mean():.5f}, iters {iters}, "
              f"supers/iter {stats.get('blocks_walked', 0) / iters:.1f}, "
              f"us/iter {best * 1e6 / iters:.1f})", flush=True)


if __name__ == "__main__":
    main()
