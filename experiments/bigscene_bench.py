#!/usr/bin/env python
"""Big-scene throughput: HBM-streamed walk + two-level VMEM walk (TPU).

Round-2 baselines (PROGRESS.md):
  522k-tri heightfield  256² spp8 maxlen5  pallas-hbm : 0.335 Mpaths/s
  2.09M-tri heightfield 256² spp8 maxlen5  pallas-hbm : 0.182 Mpaths/s
  65k-tri stress        256² spp4 maxlen5  pallas     : 0.82  Mpaths/s

Round-3 state (findings 48-50): 522k 0.506 (union-bound ceiling at
br=512, finding 49), 2M 0.266, 65k 1.016 via the flat sub=2 compact
walk (finding 50; two-level retired from the auto path).

Usage: python experiments/bigscene_bench.py [which...]   (TPU)
  which in {hbm512, hbm1024, vmem64k}; default: hbm512 vmem64k
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from ipu_ray_lib_tpu.render.streaming import render_streaming
from ipu_ray_lib_tpu.scene.build import build_scene
from ipu_ray_lib_tpu.scene.builtin import make_stress_scene

CONFIGS = {
    "hbm512": dict(grid=512, spp=8, intersector="pallas-hbm"),
    "hbm1024": dict(grid=1024, spp=8, intersector="pallas-hbm"),
    "vmem64k": dict(grid=182, spp=4, intersector="pallas"),
    "vmem32k": dict(grid=126, spp=4, intersector="pallas"),
    "vmem16k": dict(grid=90, spp=4, intersector="pallas"),
    "vmem8k": dict(grid=56, spp=4, intersector="pallas"),
}


def run(name):
    cfg = CONFIGS[name]
    scene = make_stress_scene(cfg["grid"])
    arrays, params, _ = build_scene(
        scene, image_width=256, image_height=256,
        samples_per_pixel=cfg["spp"], max_path_length=5,
        intersector=cfg["intersector"])
    ntris = arrays.blocked.tri_geom.shape[0]
    render_streaming(arrays, params, stats_out={})  # warm-up / compile
    best = float("inf")
    stats = {}
    for _ in range(2):
        stats = {}
        t0 = time.time()
        img, done = render_streaming(arrays, params, stats_out=stats)
        best = min(best, time.time() - t0)
    paths = 256 * 256 * cfg["spp"]
    iters = max(1, stats.get("iters", 0))
    print(f"{name}: {ntris} tri rows, {paths / best / 1e6:.3f} Mpaths/s "
          f"({best:.2f}s, mean {img.mean():.5f}, done {done}, "
          f"iters {iters}, blocks/iter {stats.get('blocks_walked', 0) / iters:.1f}, "
          f"us/iter {best * 1e6 / iters:.1f}, br {stats.get('br')})",
          flush=True)


def main():
    names = sys.argv[1:] or ["hbm512", "vmem64k"]
    for n in names:
        run(n)


if __name__ == "__main__":
    main()
