"""Brute-force numpy oracle renderer.

Plays the role Embree plays in the reference's verification methodology
(ref: trace.cpp:7-113, README.md:31-34): an *algorithmically independent*
renderer the JAX/TPU pipeline is compared against. Differences from the
production path are deliberate:

* No BVH — every ray is tested against every primitive (O(R*P)).
* Classic Moller-Trumbore in float64 rather than the watertight shear
  test in float32.

Exact agreement is therefore not expected; AOVs must match within the
same cross-renderer tolerances the reference accepts for Embree-vs-IPU
(MSE checks, trace.cpp:528-540).
"""

from __future__ import annotations

import numpy as np

from ..scene.types import SceneDescription

_EPS = 1e-12


def _mesh_intersect(mesh, origins, dirs, t_best, geom, prim, normal, gid):
    """Moller-Trumbore all-triangles test in f64; updates best-hit arrays."""
    v0 = mesh.vertices[mesh.triangles[:, 0]].astype(np.float64)
    v1 = mesh.vertices[mesh.triangles[:, 1]].astype(np.float64)
    v2 = mesh.vertices[mesh.triangles[:, 2]].astype(np.float64)
    e1 = v1 - v0
    e2 = v2 - v0
    has_normals = mesh.has_normals

    # Chunk rays to bound the [R, T] temporaries:
    R = len(origins)
    chunk = max(1, int(4e6 // max(len(v0), 1)))
    for s in range(0, R, chunk):
        o = origins[s : s + chunk].astype(np.float64)[:, None, :]
        d = dirs[s : s + chunk].astype(np.float64)[:, None, :]
        p = np.cross(d, e2[None])
        det = np.sum(e1[None] * p, axis=-1)
        ok = np.abs(det) > _EPS
        inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = o - v0[None]
        u = np.sum(tv * p, axis=-1) * inv_det
        q = np.cross(tv, e1[None])
        v = np.sum(d * q, axis=-1) * inv_det
        t = np.sum(e2[None] * q, axis=-1) * inv_det
        ok &= (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-7)
        t = np.where(ok, t, np.inf)
        best_tri = np.argmin(t, axis=1)
        rows = np.arange(len(best_tri))
        tmin = t[rows, best_tri]
        upd = tmin < t_best[s : s + chunk]
        idx = np.nonzero(upd)[0]
        if len(idx) == 0:
            continue
        gsel = s + idx
        tri_sel = best_tri[idx]
        t_best[gsel] = tmin[idx]
        geom[gsel] = gid
        prim[gsel] = tri_sel
        if has_normals:
            uu = u[idx, tri_sel][:, None]
            vv = v[idx, tri_sel][:, None]
            n0 = mesh.normals[mesh.triangles[tri_sel, 0]].astype(np.float64)
            n1 = mesh.normals[mesh.triangles[tri_sel, 1]].astype(np.float64)
            n2 = mesh.normals[mesh.triangles[tri_sel, 2]].astype(np.float64)
            n = n0 * (1 - uu - vv) + n1 * uu + n2 * vv
        else:
            n = np.cross(e1[tri_sel], e2[tri_sel])
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), _EPS)
        normal[gsel] = n


def _sphere_intersect(sph, origins, dirs, t_best, geom, prim, normal, gid):
    c = sph[:3].astype(np.float64)
    r2 = float(sph[3]) ** 2
    o = origins.astype(np.float64)
    d = dirs.astype(np.float64)
    oc = o - c
    b = np.sum(oc * d, axis=-1)
    cc = np.sum(oc * oc, axis=-1) - r2
    disc = b * b - np.sum(d * d, axis=-1) * cc
    ok = disc >= 0
    sq = np.sqrt(np.maximum(disc, 0.0))
    a = np.sum(d * d, axis=-1)
    t0 = (-b - sq) / a
    t1 = (-b + sq) / a
    t = np.where(t0 > 1e-7, t0, t1)
    ok &= t > 1e-7
    upd = ok & (t < t_best)
    t_best[upd] = t[upd]
    geom[upd] = gid
    prim[upd] = 0
    hp = o[upd] + d[upd] * t[upd][:, None]
    n = hp - c
    normal[upd] = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), _EPS)


def _disc_intersect(disc, origins, dirs, t_best, geom, prim, normal, gid):
    n = disc[0:3].astype(np.float64)
    c = disc[3:6].astype(np.float64)
    r2 = float(disc[6]) ** 2
    o = origins.astype(np.float64)
    d = dirs.astype(np.float64)
    denom = d @ n
    ok = np.abs(denom) > _EPS
    t = ((c - o) @ n) / np.where(ok, denom, 1.0)
    hp = o + d * t[:, None]
    dist2 = np.sum((hp - c) ** 2, axis=-1)
    ok &= (t > 1e-7) & (dist2 < r2)
    upd = ok & (t < t_best)
    t_best[upd] = t[upd]
    geom[upd] = gid
    prim[upd] = 0
    normal[upd] = n


def oracle_intersect(scene: SceneDescription, origins: np.ndarray, dirs: np.ndarray):
    """Closest hit over all primitives. Returns (t, geom, prim, normal);
    t == inf and geom == -1 for misses."""
    R = len(origins)
    t_best = np.full(R, np.inf)
    geom = np.full(R, -1, np.int64)
    prim = np.full(R, -1, np.int64)
    normal = np.zeros((R, 3), np.float64)

    gid = 0
    for m in scene.meshes:
        _mesh_intersect(m, origins, dirs, t_best, geom, prim, normal, gid)
        gid += 1
    for s in scene.spheres:
        _sphere_intersect(s, origins, dirs, t_best, geom, prim, normal, gid)
        gid += 1
    for d in scene.discs:
        _disc_intersect(d, origins, dirs, t_best, geom, prim, normal, gid)
        gid += 1
    return t_best, geom, prim, normal


def oracle_occluded(scene: SceneDescription, origins: np.ndarray, dirs: np.ndarray, t_max: np.ndarray):
    t, geom, _, _ = oracle_intersect(scene, origins, dirs)
    return (geom >= 0) & (t < t_max)


def oracle_shadow_trace(
    scene: SceneDescription,
    origins: np.ndarray,
    dirs: np.ndarray,
    light_pos=(18.0, 257.0, -1060.0),
    ambient: float = 0.05,
    shadow_offset: float = 0.005,
):
    """Primary hit + one shadow ray to a fixed light — the reference's
    Embree shadow render (trace.cpp:44-107, same 0.005 shadow offset).

    Returns dict of AOVs: rgb, t, geom, prim, normal, hit_p.
    """
    light = np.asarray(light_pos, np.float64)
    t, geom, prim, normal = oracle_intersect(scene, origins, dirs)
    found = geom >= 0
    hit_p = origins.astype(np.float64) + dirs.astype(np.float64) * np.where(found, t, 0.0)[:, None]

    mat_ids = np.asarray(scene.mat_ids, np.int64)
    albedo = np.stack([m.albedo for m in scene.materials]).astype(np.float64)
    rgb = np.zeros((len(origins), 3), np.float64)

    lo = light[None] - hit_p
    dist = np.linalg.norm(lo, axis=-1)
    sdir = lo / np.maximum(dist[:, None], _EPS)
    sorig = hit_p + sdir * shadow_offset
    occ = oracle_occluded(scene, sorig[found], sdir[found], (dist - 2 * shadow_offset)[found])

    mat_rgb = albedo[mat_ids[np.where(found, geom, 0)]]
    lambert = np.sum(sdir * normal, axis=-1)
    lit = np.zeros(len(origins), bool)
    lit[found] = ~occ
    rgb = np.where(
        found[:, None],
        mat_rgb * ambient + np.where(lit, lambert, 0.0)[:, None] * mat_rgb,
        0.0,
    )
    return {
        "rgb": rgb.astype(np.float32),
        "t": np.where(found, t, np.inf).astype(np.float32),
        "geom": geom,
        "prim": prim,
        "normal": normal.astype(np.float32),
        "hit_p": np.where(found[:, None], hit_p, 0.0).astype(np.float32),
    }
