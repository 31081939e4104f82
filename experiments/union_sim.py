#!/usr/bin/env python
"""Offline: bundle block-union vs ray grouping policy (CPU, numpy).

The oracle measurement (experiments/oracle_union.py) shows ~17/32 blocks
per 1024-ray Cornell bounce bundle is the genuine union bound — bundles
must get *coherent* to walk less. This sim takes REAL bounce-1 rays
(primary hits + cosine resamples, traced against the actual blocked
tables) and reports the mean per-bundle union for candidate groupings:

  stream   — rays in pixel-stream order (what the kernel does today)
  random   — shuffled (worst case)
  octant   — bucketed by 3-bit direction octant
  oct+cell — bucketed by octant x origin Morton cell (4/8/64 cells)
  perfect  — sorted by (octant, cell, sub-cell) lexicographic

Union counts use the oracle rule: block needed iff slab-entry < hit t.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def block_crossings(o, d, tmax, baabb, chunk=4096):
    """[R, nb] bool: slab-entry of block b < ray r's tmax (oracle rule)."""
    nb = baabb.shape[0]
    lo = baabb[:, 0:3]
    hi = baabb[:, 3:6]
    out = np.zeros((len(o), nb), bool)
    for s in range(0, len(o), chunk):
        oc = o[s:s + chunk, None, :]
        dc = d[s:s + chunk, None, :]
        inv = 1.0 / np.where(dc == 0, 1e-30, dc)
        t0 = (lo[None] - oc) * inv
        t1 = (hi[None] - oc) * inv
        tin = np.minimum(t0, t1).max(axis=2)
        tout = np.maximum(t0, t1).min(axis=2)
        tin = np.maximum(tin, 0.0)
        out[s:s + chunk] = (tin <= tout) & (tin <= tmax[s:s + chunk, None])
    return out


def mean_union(cross, order, br=1024):
    cross = cross[order]
    n = (len(cross) // br) * br
    u = cross[:n].reshape(-1, br, cross.shape[1]).any(axis=1).sum(axis=1)
    return u.mean()


def main():
    from ipu_ray_lib_tpu.ops.bxdf import sample_diffuse
    from ipu_ray_lib_tpu.ops.traversal import scene_intersect_with_normal
    from ipu_ray_lib_tpu.render.streaming import _pixel_stream
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

    import jax.numpy as jnp

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mesh = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "monkey_bust.glb")
    mesh = mesh if os.path.exists(mesh) else None
    scene = make_cornell_box_scene(mesh, box_only=False)
    arrays, params, _ = build_scene(scene, image_width=size,
                                    image_height=size, samples_per_pixel=1,
                                    intersector="dense")

    rows_np, cols_np, _ = _pixel_stream(params, 32)
    R = size * size
    from ipu_ray_lib_tpu.ops.camera import pixel_to_ray_dir

    tan_theta = np.tan(params.fov_radians / 2)
    d0 = np.asarray(pixel_to_ray_dir(
        jnp.asarray(cols_np), jnp.asarray(rows_np),
        jnp.float32(size), jnp.float32(size), jnp.float32(tan_theta)))
    o0 = np.zeros_like(d0)
    o0[:, 2] = -1e-4

    hit, n1 = scene_intersect_with_normal(
        arrays, jnp.asarray(o0), jnp.asarray(d0),
        jnp.zeros(R, jnp.float32), jnp.full(R, jnp.inf, jnp.float32),
        "dense")
    found = np.asarray(hit.found)
    hp = o0 + d0 * np.asarray(hit.t)[:, None]
    rng = np.random.default_rng(7)
    u0 = jnp.asarray(rng.random(R, np.float32))
    u1 = jnp.asarray(rng.random(R, np.float32))
    d1 = np.asarray(sample_diffuse(n1, u0, u1))
    o1 = hp + np.asarray(n1) * 1e-4

    o1, d1 = o1[found], d1[found]
    # Bounce-ray t (for the oracle crossing rule): trace them too
    hit1, _ = scene_intersect_with_normal(
        arrays, jnp.asarray(o1), jnp.asarray(d1),
        jnp.zeros(len(o1), jnp.float32),
        jnp.full(len(o1), jnp.inf, jnp.float32), "dense")
    t1 = np.asarray(hit1.t)
    t1 = np.where(np.isfinite(t1), t1, 1e30)

    baabb = np.asarray(arrays.blocked.baabb)
    real = baabb[:, 0] < 1e30
    cross = block_crossings(o1, d1, t1, baabb)[:, real]
    nb = int(real.sum())
    n = len(o1)
    print(f"{n} bounce rays, {nb} blocks")

    oct_ = ((d1[:, 0] < 0) * 4 + (d1[:, 1] < 0) * 2
            + (d1[:, 2] < 0)).astype(np.int64)
    lo = o1.min(axis=0)
    span = np.maximum(o1.max(axis=0) - lo, 1e-9)

    def cells(k):
        q = np.minimum((o1 - lo) / span * k, k - 1e-4).astype(np.int64)
        return (q[:, 0] * k + q[:, 1]) * k + q[:, 2]

    ident = np.arange(n)
    shuf = rng.permutation(n)
    print(f"{'stream order':24s} {mean_union(cross, ident):6.2f}")
    print(f"{'random':24s} {mean_union(cross, shuf):6.2f}")
    for name, key in [
        ("octant (8)", oct_),
        ("oct x cell2 (64)", oct_ * 8 + cells(2)),
        ("oct x cell4 (512)", oct_ * 64 + cells(4)),
        ("cell4 only (64)", cells(4)),
        ("perfect (oct,cell8)", oct_ * 512 + cells(8)),
    ]:
        order = np.argsort(key, kind="stable")
        print(f"{name:24s} {mean_union(cross, order):6.2f}")
    # smaller bundles for reference
    for br in (512, 256, 128):
        order = np.argsort(oct_ * 64 + cells(4), kind="stable")
        print(f"oct+cell4 @ br={br:5d}     "
              f"{mean_union(cross, order, br):6.2f}")


if __name__ == "__main__":
    main()
