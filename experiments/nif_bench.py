#!/usr/bin/env python
"""Warmed NIF-flagship bench: spheres + fused in-kernel env MLP.

The reference's NIF demo config (BASELINE config 4): the HDRI-lit
spheres scene, 512x512, fused bf16 env MLP in the megakernel. trace.py's
printed rate includes XLA compile on the first call, so this harness
warms once and reports the best of BENCH_REPS timed repeats (same
discipline as bench.py).

Usage: python experiments/nif_bench.py [asset_dir] [size] [spp]
       defaults: assets/nif/synthetic_urban_4k 512 64
Appends one JSON line to experiments/results.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    asset = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "assets", "nif",
        "synthetic_urban_4k")
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from ipu_ray_lib_tpu.nif import load_nif_env
    from ipu_ray_lib_tpu.render import streaming as S
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_primitive_scene

    env_fn, env_params = load_nif_env(asset)
    scene = make_primitive_scene()
    arrays, params, _ = build_scene(
        scene, image_width=size, image_height=size, samples_per_pixel=spp,
        intersector="pallas")

    def run():
        img, done = S.render_streaming(
            arrays, params, env_fn=env_fn, env_params=env_params, spp=spp)
        np.asarray(img)   # force (block_until_ready unreliable on axon)
        return done

    done = run()                                   # compile + warm
    reps = int(os.environ.get("BENCH_REPS", 3))
    dt = float("inf")
    for _ in range(reps):
        t0 = time.time()
        done = run()
        dt = min(dt, time.time() - t0)
    rec = {"exp": "nif_bench", "asset": os.path.basename(asset.rstrip("/")),
           "size": size, "spp": spp,
           "mpaths": round(done / dt / 1e6, 3), "dt": round(dt, 3),
           "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    with open(os.path.join(os.path.dirname(__file__),
                           "results.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
