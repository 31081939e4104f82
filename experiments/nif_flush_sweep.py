#!/usr/bin/env python
"""Round-5 NIF lever sweep (VERDICT r4 #5): deferred env-flush cadence
(RAY_ENV_EVERY) x flush-on-count threshold (RAY_ENV_COUNT) on the
flagship spheres+NIF workload (BASELINE config 4: HDRI-lit spheres,
512x512, fused bf16 env MLP).

The mechanism already ships (megakernel env_count — fire the [P, br]
MLP flush as soon as >= count lanes are parked instead of waiting out
the cadence clock; estimator bitwise across triggers,
tests/test_megakernel_variants.py): this sweep is the measurement that
decides its default. On the sky-dominated primitive scene escapes are
dense, so the prior is cadence 1 stays best and count triggers matter
only on interior scenes; the Cornell+monkey rows below test that side.

Usage: python experiments/nif_flush_sweep.py [every=1,4,8,16]
        [count=0,64,128,256] [size=512] [spp=64] [scene=spheres|box]
Appends JSON rows to experiments/results.jsonl.
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from experiments._health import tunnel_probe_s


def main():
    everys, counts, size, spp, scene_name = [1, 4, 8, 16], [0, 64, 128, 256], 512, 64, "spheres"
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        if k == "every":
            everys = [int(x) for x in v.split(",")]
        elif k == "count":
            counts = [int(x) for x in v.split(",")]
        elif k == "size":
            size = int(v)
        elif k == "spp":
            spp = int(v)
        elif k == "scene":
            scene_name = v
        else:
            raise SystemExit(f"unknown arg {a!r}")

    from ipu_ray_lib_tpu.nif import load_nif_env
    from ipu_ray_lib_tpu.render import streaming as S
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import (make_cornell_box_scene,
                                               make_primitive_scene)

    asset = os.path.join(os.path.dirname(__file__), "..", "assets", "nif",
                         "synthetic_urban_4k")
    env_fn, env_params = load_nif_env(asset)
    if scene_name == "spheres":
        scene = make_primitive_scene()
    else:
        scene = make_cornell_box_scene(
            os.path.join(os.path.dirname(__file__), "..", "assets",
                         "monkey_bust.glb"), box_only=False)
    arrays, params, _ = build_scene(
        scene, image_width=size, image_height=size, samples_per_pixel=spp,
        intersector="pallas")

    probe = tunnel_probe_s()
    print(f"probe {probe}", flush=True)
    log = open(os.path.join(os.path.dirname(__file__), "results.jsonl"), "a")
    ref_mean = None
    for ev, cn in itertools.product(everys, counts):
        if ev == 1 and cn > 0:
            continue   # count trigger only exists with a deferral window
        os.environ["RAY_ENV_EVERY"] = str(ev)
        os.environ["RAY_ENV_COUNT"] = str(cn)

        def run():
            img, done = S.render_streaming(
                arrays, params, env_fn=env_fn, env_params=env_params,
                spp=spp)
            return np.asarray(img), done

        img, done = run()                          # compile + warm
        dt = float("inf")
        for _ in range(int(os.environ.get("BENCH_REPS", 2))):
            t0 = time.time()
            img, done = run()
            dt = min(dt, time.time() - t0)
        if ref_mean is None:
            ref_mean = float(img.mean())
        rec = {"exp": "nif_flush_sweep", "scene": scene_name, "size": size,
               "spp": spp, "every": ev, "count": cn,
               "mpaths": round(done / dt / 1e6, 3), "s": round(dt, 3),
               "mean": float(img.mean()),
               "mean_drift": float(img.mean()) - ref_mean,
               "probe_s": probe,
               "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
        log.write(json.dumps(rec) + "\n")
        log.flush()
        print(json.dumps(rec), flush=True)
    os.environ.pop("RAY_ENV_EVERY", None)
    os.environ.pop("RAY_ENV_COUNT", None)


if __name__ == "__main__":
    main()
