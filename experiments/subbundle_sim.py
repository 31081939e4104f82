#!/usr/bin/env python
"""Offline: would in-kernel sub-bundle walks beat the union bound?

Finding 32 killed *inter-bundle* ray re-binning (host/XLA-side sorting is
100x too slow; even perfect binning barely moves a 1024-wide bundle's
union). This sim evaluates the remaining variant: keep the bundle FIXED
(one pallas program, one iteration loop) but sort its lanes each
iteration (in-kernel: key build + counting-sort ranks on [1, br] rows +
a one-hot MXU permutation of the ~20 state rows) into Q quarter-slices,
give every quarter its own cull-flag column, and run do_block on
[TBW, br/Q] slices only for quarters that need the block.

Decision quantity (pair-op ratio): walking block b costs width W for a
full bundle vs W/Q per flagged quarter, so

    speedup_pairs = U1 / (sum_q Uq / Q)

on the SAME production lane mix. This sim replicates the production pool
semantics faithfully on CPU: slot-striped pixel assignment (lane i
serves pixels {i, i+R, ...} in stream order), per-lane regeneration on
termination, cosine-hemisphere diffuse bounces, russian roulette from
depth 3, max path length 10 — then measures per-iteration U1 and the
quartered unions for several sort keys, plus the live-lane composition
(bounce-0 share) that motivates the idea.

Run: python experiments/subbundle_sim.py [size] [br] [iters] [scene]
     scene: cornell (default) | stressN (heightfield, grid N -> 2N^2 tris,
     block crossings over the HBM walk's member blocks)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def block_crossings(o, d, tmax, baabb):
    lo = baabb[None, :, 0:3]
    hi = baabb[None, :, 3:6]
    oc = o[:, None, :]
    dc = d[:, None, :]
    inv = 1.0 / np.where(dc == 0, 1e-30, dc)
    t0 = (lo - oc) * inv
    t1 = (hi - oc) * inv
    tin = np.minimum(t0, t1).max(axis=2)
    tout = np.maximum(t0, t1).min(axis=2)
    tin = np.maximum(tin, 0.0)
    return (tin <= tout) & (tin <= tmax[:, None])


def main():
    import jax.numpy as jnp

    from ipu_ray_lib_tpu.ops.bxdf import sample_diffuse
    from ipu_ray_lib_tpu.ops.camera import pixel_to_ray_dir
    from ipu_ray_lib_tpu.ops.traversal import scene_intersect_with_normal
    from ipu_ray_lib_tpu.render.streaming import _pixel_stream
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    br = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    which = sys.argv[4] if len(sys.argv) > 4 else "cornell"

    if which.startswith("stress"):
        from ipu_ray_lib_tpu.scene.builtin import make_stress_scene

        scene = make_stress_scene(int(which[6:] or 128))
        isect = "bvh"
    else:
        mesh = os.path.join(os.path.dirname(__file__), "..", "assets",
                            "monkey_bust.glb")
        mesh = mesh if os.path.exists(mesh) else None
        scene = make_cornell_box_scene(mesh, box_only=False)
        isect = "dense"
    arrays, params, _ = build_scene(scene, image_width=size,
                                    image_height=size, samples_per_pixel=1,
                                    intersector=isect)
    rows_np, cols_np, _ = _pixel_stream(params, 32)
    R = size * size
    tan_theta = np.tan(params.fov_radians / 2)

    baabb = np.asarray(arrays.blocked.baabb)
    real = baabb[:, 0] < 1e30
    baabb = baabb[real]
    nb = len(baabb)

    def primary(ks):
        """Camera ray for per-lane path counters ks (slot-striped)."""
        pix = (np.arange(br) + (ks % (R // br + 1)) * br) % R
        cc = cols_np[pix].astype(np.float32)
        rr = rows_np[pix].astype(np.float32)
        d = np.asarray(pixel_to_ray_dir(
            jnp.asarray(cc), jnp.asarray(rr), jnp.float32(size),
            jnp.float32(size), jnp.float32(tan_theta)))
        o = np.zeros_like(d)
        o[:, 2] = -1e-4
        return o, d

    rng = np.random.default_rng(5)
    ks = np.zeros(br, np.int64)
    o, d = primary(ks)
    bounce = np.zeros(br, np.int64)
    tp = np.ones(br, np.float32)          # scalar throughput proxy
    qs = [2, 4, 8]
    stats = {f"U{q}_{k}": [] for q in qs
             for k in ("none", "b0", "oct", "boct", "bcell")}
    stats.update(U1=[], live0=[], gates={q: [] for q in qs})

    lo_s = None
    for it in range(iters):
        hit, n1 = scene_intersect_with_normal(
            arrays, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
            jnp.zeros(br, jnp.float32), jnp.full(br, jnp.inf, jnp.float32),
            isect)
        found = np.asarray(hit.found)
        t = np.where(found, np.asarray(hit.t), 1e30)

        cross = block_crossings(o, d, t, baabb)
        stats["U1"].append(cross.any(axis=0).sum())
        stats["live0"].append((bounce == 0).mean())

        # per-iteration sort keys (what the kernel could compute):
        oct_ = ((d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2
                + (d[:, 2] < 0)).astype(np.int64)
        if lo_s is None:
            lo_s = o.min(axis=0) - 1e-3
            span = np.maximum(o.max(axis=0) - lo_s, 1e-6) + 2e-3
        qo = np.minimum((o - lo_s) / span * 4, 3.999).astype(np.int64)
        cell = (qo[:, 0] * 4 + qo[:, 1]) * 4 + qo[:, 2]
        b0 = (bounce > 0).astype(np.int64)
        keys = {
            "none": np.arange(br),     # fixed lane ranges, no sorting
            "b0": b0,                  # live/primary split only
            "oct": oct_,
            "boct": b0 * 8 + oct_,
            "bcell": (b0 * 8 + oct_) * 64 + cell,
        }
        for q in qs:
            w = br // q
            for kn, key in keys.items():
                order = np.argsort(key, kind="stable")
                cq = cross[order].reshape(q, w, nb).any(axis=1)
                stats[f"U{q}_{kn}"].append(cq.sum())
            # scalar gates for the best key (block entered if any quarter
            # flagged, then one gate per flagged quarter):
            order = np.argsort(keys["bcell"], kind="stable")
            cq = cross[order].reshape(q, br // q, nb).any(axis=1)
            stats["gates"][q].append(cq.any(axis=0).sum() + cq.sum())

        # advance paths (cosine diffuse; albedo ~0.6 proxy for roulette):
        hp = o + d * t[:, None]
        u0 = jnp.asarray(rng.random(br, np.float32))
        u1 = jnp.asarray(rng.random(br, np.float32))
        nd = np.asarray(n1)
        d_new = np.asarray(sample_diffuse(n1, u0, u1))
        o_new = hp + nd * 1e-4
        tp_new = tp * 0.6
        bounce_new = bounce + 1
        roulette = (bounce_new > 3) & (rng.random(br) > np.maximum(tp_new, 0))
        term = (~found) | roulette | (bounce_new >= 10)
        tp_new = np.where(roulette, 0.0, tp_new / np.maximum(tp_new, 1e-9)
                          * tp_new)  # proxy only
        ks = np.where(term, ks + 1, ks)
        op, dp = primary(ks)
        o = np.where(term[:, None], op, o_new)
        d = np.where(term[:, None], dp, d_new)
        bounce = np.where(term, 0, bounce_new)
        tp = np.where(term, 1.0, tp_new)

    u1 = np.mean(stats["U1"])
    print(f"{br}-lane production-mix pool, {nb} blocks, {iters} iters")
    print(f"bounce-0 share of live lanes: {np.mean(stats['live0']):.2f}")
    print(f"U1 (full-bundle union):      {u1:6.2f}")
    for q in qs:
        g = np.mean(stats["gates"][q])
        for kn in ("none", "b0", "oct", "boct", "bcell"):
            uq = np.mean(stats[f"U{q}_{kn}"])
            print(f"Q={q} key={kn:6s} sum(Uq)={uq:7.2f}  "
                  f"pair-op ratio U1/(sum/Q) = {u1 / (uq / q):.2f}x")
        print(f"Q={q} scalar gates/iter (any+per-quarter): {g:.1f} "
              f"(vs {u1:.1f} today)")


if __name__ == "__main__":
    main()
