#!/usr/bin/env python
"""Sweep kernel ray-block size (br) and flag-refresh cadence for the
HBM-streamed megakernel.

Hypotheses (round 3, post-SAH-treelets):
- br: on >VMEM scenes every walked super costs a fixed 64 KB p8 DMA +
  an [SB, br] refinement pass, and bundle unions grow sublinearly with
  width (PROGRESS.md finding 32), so wider bundles should amortise
  per-super costs better than the br=512 VMEM-scene pick.
- reflag cadence (RAY_HBM_REFLAG): refreshing super flags against the
  converging best_t drops settled supers from the walk, but each
  refresh costs a [ns, br] compare + column max. At ns=4096 (522k
  tris) the refresh itself is ~2 MB of VMEM traffic — the default
  16-super cadence was never swept at this scale.

Usage: python experiments/hbm_sweep.py [grid=N] [br=A,B,..] [rf=A,B,..]
                                         [probe=scan|refine|dense]
       defaults: grid=512, br=512, rf=16   (TPU)
       probe= doubles one cost centre idempotently (megakernel
       _timing_double_*): the marginal wall time vs the base run is an
       exact attribution of that centre.
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    grid, brs, rfs, probe, paygate, pbstage = 512, [512], [16], None, None, None
    hsub = None
    hwu = None
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        if k == "probe":
            probe = v
            continue
        vals = [int(x) for x in v.split(",")]
        if k == "grid":
            grid = vals[0]
        elif k == "br":
            brs = vals
        elif k == "rf":
            rfs = vals
        elif k == "paygate":
            paygate = bool(vals[0])
        elif k == "pbstage":
            pbstage = bool(vals[0])
        elif k == "hsub":
            hsub = vals[0]
        elif k == "hwu":
            hwu = vals[0]
        else:
            raise SystemExit(f"unknown arg {a!r}")
    mega_kwargs = {f"_timing_double_{probe}": True} if probe else {}
    if hsub is not None:
        mega_kwargs["hbm_sub"] = hsub
    if hwu is not None:
        mega_kwargs["hbm_wu"] = hwu
    if paygate is not None:
        mega_kwargs["hbm_pay_gate"] = paygate
    if pbstage is not None:
        mega_kwargs["hbm_pb_stage"] = pbstage
    mega_kwargs = mega_kwargs or None

    from ipu_ray_lib_tpu.render.streaming import render_streaming
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_stress_scene

    scene = make_stress_scene(grid)
    arrays, params, _ = build_scene(
        scene, image_width=256, image_height=256,
        samples_per_pixel=8, max_path_length=5, intersector="pallas-hbm")
    ntris = arrays.blocked.tri_geom.shape[0]
    paths = 256 * 256 * 8
    log = open("/root/repo/experiments/results.jsonl", "a")
    print(f"grid {grid}: {ntris} tri rows", flush=True)
    for br, rf in itertools.product(brs, rfs):
        os.environ["RAY_BR"] = str(br)
        os.environ["RAY_HBM_REFLAG"] = str(rf)
        t0 = time.time()
        render_streaming(arrays, params, stats_out={},
                         _mega_kwargs=mega_kwargs)  # compile + warm
        compile_s = time.time() - t0
        best, stats = float("inf"), {}
        for _ in range(2):
            stats = {}
            t0 = time.time()
            img, done = render_streaming(arrays, params, stats_out=stats,
                                         _mega_kwargs=mega_kwargs)
            best = min(best, time.time() - t0)
        iters = max(1, stats.get("iters", 0))
        rec = {"exp": "hbm_sweep", "grid": grid, "br": br, "rf": rf,
               **({"hsub": hsub} if hsub is not None else {}),
               **({"hwu": hwu} if hwu is not None else {}),
               **({"probe": probe} if probe else {}),
               **({"paygate": int(paygate)} if paygate is not None else {}),
               **({"pbstage": int(pbstage)} if pbstage is not None else {}),
               "mpaths": paths / best / 1e6, "s": best,
               "mean": float(img.mean()), "iters": int(iters),
               "supers_per_iter": stats.get("blocks_walked", 0) / iters,
               # hbm: the winner stats lane carries member blocks walked
               "members_per_iter": stats.get("winner_blocks", 0) / iters,
               "compile_s": round(compile_s, 1),
               "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
        log.write(json.dumps(rec) + "\n")
        log.flush()
        print(f"br={br} rf={rf}: {rec['mpaths']:.3f} Mpaths/s "
              f"({best:.2f}s, mean {img.mean():.5f}, iters {iters}, "
              f"supers/iter {rec['supers_per_iter']:.1f}, "
              f"members/iter {rec['members_per_iter']:.1f}, "
              f"us/iter {best * 1e6 / iters:.1f})", flush=True)


if __name__ == "__main__":
    main()
