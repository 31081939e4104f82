#!/usr/bin/env python
"""Sweep the VMEM-walk mid-walk flag-refresh count (reflag) at the bench
workload (TPU).

reflag=3 was tuned in round 2 — before the deferred winner payload and
the sub=2 auto pick changed the per-block cost balance (findings 36/39).
Each refresh costs a [nbs, br] compare + column max but lets settled
(sub-)blocks drop out mid-walk; the optimum moves when per-block cost
shrinks.

Usage: python experiments/reflag_sweep.py [size] [spp] [rf...] [br=A,B]
                                            [subq=A,B] [nowalk=1]
       defaults: 1440 64 rf 0,1,2,3,5,7 br 1024 subq 1
       (numeric args are reflag counts; br=/subq= add axes; nowalk=1
       measures the per-iteration fixed cost F(br): walk skipped,
       synthetic diffuse hit — see megakernel _timing_no_walk)
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
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    brs = [1024]
    subqs = [1]
    nowalk = cullonly = stub = compact = nodots = constpb = False
    vd2 = vd2c = False
    cull = True
    mxu = False
    cull2 = None
    fresh = None
    pay2 = prep2 = cam2 = bxdf2 = rng2 = bank2 = False
    bns = [None]
    payt = None
    wu = [None]
    subs = [None]
    pu = 1
    stress_grid = 0
    maxlen = None
    reflags = []
    for a in sys.argv[3:]:
        if a.startswith("br="):
            brs = [int(x) for x in a[3:].split(",")]
        elif a.startswith("nowalk="):
            nowalk = bool(int(a[7:]))
        elif a.startswith("cullonly="):
            cullonly = bool(int(a[9:]))
        elif a.startswith("stub="):
            stub = bool(int(a[5:]))
        elif a.startswith("compact="):
            compact = bool(int(a[8:]))
        elif a.startswith("nodots="):
            nodots = bool(int(a[7:]))
        elif a.startswith("mxu="):
            mxu = bool(int(a[4:]))
        elif a.startswith("cull2="):
            cull2 = bool(int(a[6:]))
        elif a.startswith("fresh="):
            fresh = bool(int(a[6:]))
        elif a.startswith("constpb="):
            constpb = bool(int(a[8:]))
        elif a.startswith("vd2="):
            vd2 = bool(int(a[4:]))
        elif a.startswith("vd2c="):
            vd2c = bool(int(a[5:]))
        elif a.startswith("cull="):
            # cull=0 forces EVERY window through the (gated) walk each
            # iteration: identical control flow regardless of hit
            # semantics, which is what makes constpb=0 vs constpb=1
            # a valid marginal comparison (finding 59 — the cull-on
            # probe diverged to 3.98 windows/iter when the constant
            # columns made every ray miss):
            cull = bool(int(a[5:]))
        elif a.startswith("payt="):
            payt = bool(int(a[5:]))
        elif a.startswith("pay2="):
            pay2 = bool(int(a[5:]))
        elif a.startswith("prep2="):
            prep2 = bool(int(a[6:]))
        elif a.startswith("cam2="):
            cam2 = bool(int(a[5:]))
        elif a.startswith("bxdf2="):
            bxdf2 = bool(int(a[6:]))
        elif a.startswith("rng2="):
            rng2 = bool(int(a[5:]))
        elif a.startswith("bank2="):
            bank2 = bool(int(a[6:]))
        elif a.startswith("bn="):
            bns = [int(x) for x in a[3:].split(",")]
        elif a.startswith("wu="):
            wu = [int(x) for x in a[3:].split(",")]
        elif a.startswith("pu="):
            pu = int(a[3:])
        elif a.startswith("subq="):
            subqs = [int(x) for x in a[5:].split(",")]
        elif a.startswith("stress="):
            stress_grid = int(a[7:])
        elif a.startswith("maxlen="):
            maxlen = int(a[7:])
        elif a.startswith("sb="):
            subs = [None if x == "a" else int(x) for x in a[3:].split(",")]
        else:
            reflags.append(int(a))
    reflags = reflags or [0, 1, 2, 3, 5, 7]

    from ipu_ray_lib_tpu.ops.pallas.megakernel import megakernel_path_trace
    from ipu_ray_lib_tpu.render import streaming as S
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

    if stress_grid:
        from ipu_ray_lib_tpu.scene.builtin import make_stress_scene
        scene = make_stress_scene(stress_grid)
    else:
        scene = make_cornell_box_scene(
            os.path.join(os.path.dirname(__file__), "..", "assets",
                         "monkey_bust.glb"), box_only=False)
    arrays, params, _ = build_scene(
        scene, image_width=size, image_height=size, samples_per_pixel=spp,
        max_path_length=maxlen or 10,
        intersector="pallas")

    n_pix = size * size
    R = min(1 << 17, -(-n_pix // 256) * 256)
    J = -(-n_pix // R)
    pad = R * J - n_pix
    rows_np, cols_np, _ = S._pixel_stream(params, 32)
    rows = jnp.asarray(np.pad(rows_np, (0, pad)))
    cols = jnp.asarray(np.pad(cols_np, (0, pad)))
    max_iters = J * spp * params.max_path_length + 16
    log = open(os.path.join(os.path.dirname(__file__), "results.jsonl"), "a")
    from _health import tunnel_probe_s
    probe_s = tunnel_probe_s()
    print(f"# tunnel probe: {probe_s}s ({'healthy' if probe_s < 0.25 else 'DEGRADED'})",
          flush=True)

    import itertools
    for br, rf, sq, wu1, sb1, bn1 in itertools.product(
            brs, reflags, subqs, wu, subs, bns):
        if br % (128 * sq):
            continue
        f = functools.partial(
            megakernel_path_trace, arrays, rows, cols, jnp.uint32(42),
            jnp.int32(n_pix), params=params, slots=R, j_per_slot=J,
            spp=spp, max_iters=max_iters, br=br, reflag=rf, subq=sq,
            sub=sb1,
            _timing_no_walk=nowalk, _timing_cull_only=cullonly,
            _timing_stub_walk=stub, walk_compact=compact,
            _timing_no_dots=nodots, walk_mxu=mxu,
            _timing_const_pb=constpb, use_cull=cull,
            _timing_double_vdense=vd2,
            _timing_double_vdense_const=vd2c,
            walk_cull2=cull2, walk_fresh=fresh,
            _timing_double_pay=pay2, _timing_double_prep=prep2,
            _timing_double_camera=cam2, _timing_double_bxdf=bxdf2,
            _timing_double_rng=rng2, _timing_double_bank=bank2,
            walk_unroll=wu1, pay_unroll=pu, pay_fused=payt,
            bundles=bn1,
            return_stats=True)
        flat, done, iters, blocks, *rest = f()  # compile + warm
        dt = float("inf")
        for _ in range(3):
            t0 = time.time()
            flat, done, iters, blocks, *rest = f()
            mean = float(jnp.mean(flat))
            dt = min(dt, time.time() - t0)
        iters, blocks = int(iters), int(blocks)
        winners = int(rest[-1]) if rest else 0
        rec = {"exp": "reflag_sweep", "size": size, "spp": spp,
               "br": br, "subq": sq,
               # Resolved walk mode recorded UNCONDITIONALLY (finding 64:
               # four rows with `compact` merely absent were misread as
               # production config):
               "compact": int(compact),
               **({"nowalk": 1} if nowalk else {}),
               **({"cullonly": 1} if cullonly else {}),
               **({"stub": 1} if stub else {}),
               **({"nodots": 1} if nodots else {}),
               **({"constpb": 1} if constpb else {}),
               **({"vd2": 1} if vd2 else {}),
               **({"vd2c": 1} if vd2c else {}),
               **({"cull": 0} if not cull else {}),
               **({"mxu": 1} if mxu else {}),
               **({"cull2": int(cull2)} if cull2 is not None else {}),
               **({"fresh": int(fresh)} if fresh is not None else {}),
               **({"stress": stress_grid} if stress_grid else {}),
               **({"maxlen": maxlen} if maxlen else {}),
               **({"pay2": 1} if pay2 else {}),
               **({"payt": int(payt)} if payt is not None else {}),
               **({"prep2": 1} if prep2 else {}),
               **({"cam2": 1} if cam2 else {}),
               **({"bxdf2": 1} if bxdf2 else {}),
               **({"rng2": 1} if rng2 else {}),
               **({"bank2": 1} if bank2 else {}),
               **({"wu": wu1} if wu1 is not None else {}),
               **({"sub": sb1} if sb1 is not None else {}),
               **({"bn": bn1} if bn1 is not None else {}),
               **({"pu": pu} if pu != 1 else {}),
               "reflag": rf, "mpaths": round(n_pix * spp / dt / 1e6, 3),
               "dt": round(dt, 3), "iters": iters,
               "blocks_per_iter": round(blocks / sq / max(iters, 1), 2),
               "winners_per_iter": round(winners / max(iters, 1), 2),
               "us_per_iter": round(dt * 1e6 / max(iters, 1), 2),
               "mean": round(mean, 5), "probe_s": probe_s,
               "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
        log.write(json.dumps(rec) + "\n")
        log.flush()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
