"""Traversal correctness: threaded-BVH closest hit vs brute-force oracle.

The TPU analogue of the reference's AOV parity methodology
(LITERATE_TEST.ipynb: compare custom BVH render vs Embree)."""

import numpy as np
import jax.numpy as jnp

from ipu_ray_lib_tpu.cpu.reference import oracle_intersect, oracle_occluded
from ipu_ray_lib_tpu.ops.camera import generate_camera_rays, pixel_grid
from ipu_ray_lib_tpu.ops.traversal import bvh_intersect, bvh_occluded, hit_normal
from ipu_ray_lib_tpu.scene.build import build_scene
from ipu_ray_lib_tpu.scene.builtin import make_primitive_scene


def _camera_rays(params, n_sub=4):
    rows, cols = pixel_grid(
        params.window_w // n_sub, params.window_h // n_sub, 0, 0
    )
    rows = rows * n_sub
    cols = cols * n_sub
    o, d = generate_camera_rays(
        rows, cols, params.image_width, params.image_height,
        params.fov_radians, 0.0, None,
    )
    return np.asarray(o), np.asarray(d)


def _check_scene(scene_desc, built, tol_t=2e-3):
    arrays, params, _ = built
    origins, dirs = _camera_rays(params)
    R = len(origins)
    t_min = jnp.zeros(R, jnp.float32)
    t_max = jnp.full(R, jnp.inf, jnp.float32)

    hit = bvh_intersect(arrays, jnp.asarray(origins), jnp.asarray(dirs), t_min, t_max)
    t_ref, geom_ref, prim_ref, n_ref = oracle_intersect(scene_desc, origins, dirs)

    found = np.asarray(hit.found)
    found_ref = geom_ref >= 0
    # Hit/miss masks agree except possibly at silhouette pixels; none
    # expected on these axis-aligned test views:
    agree = found == found_ref
    assert agree.mean() > 0.995, f"hit masks differ on {np.sum(~agree)} rays"

    both = found & found_ref
    t_err = np.abs(np.asarray(hit.t)[both] - t_ref[both]) / np.maximum(t_ref[both], 1.0)
    assert np.max(t_err) < tol_t

    same_geom = np.asarray(hit.geom_id)[both] == geom_ref[both]
    assert same_geom.mean() > 0.999

    n = np.asarray(hit_normal(arrays, jnp.asarray(origins), jnp.asarray(dirs), hit))
    # Orientation-insensitive comparison (oracle normal may be flipped
    # for double-sided geometry):
    dots = np.abs(np.sum(n[both] * n_ref[both], axis=-1))
    assert np.quantile(dots, 0.01) > 0.99


def test_cornell_intersect_matches_oracle(cornell_scene, cornell_built):
    _check_scene(cornell_scene, cornell_built)


def test_spheres_intersect_matches_oracle():
    scene = make_primitive_scene()
    built = build_scene(scene, image_width=128, image_height=128)
    _check_scene(scene, built)


def test_occlusion_matches_oracle(cornell_scene, cornell_built):
    arrays, params, _ = cornell_built
    origins, dirs = _camera_rays(params)
    hit = bvh_intersect(
        arrays, jnp.asarray(origins), jnp.asarray(dirs),
        jnp.zeros(len(origins), jnp.float32),
        jnp.full(len(origins), jnp.inf, jnp.float32),
    )
    found = np.asarray(hit.found)
    hp = origins + dirs * np.asarray(hit.t)[:, None]

    light = np.array([18.0, 257.0, -1060.0], np.float32)
    lo = light[None] - hp
    dist = np.linalg.norm(lo, axis=-1)
    sdir = (lo / np.maximum(dist[:, None], 1e-9)).astype(np.float32)
    sorig = (hp + sdir * 0.01).astype(np.float32)

    occ = np.asarray(
        bvh_occluded(
            arrays, jnp.asarray(sorig), jnp.asarray(sdir),
            jnp.zeros(len(origins), jnp.float32), jnp.asarray(dist - 0.02),
        )
    )
    occ_ref = oracle_occluded(cornell_scene, sorig[found], sdir[found], (dist - 0.02)[found])
    agree = occ[found] == occ_ref
    assert agree.mean() > 0.995
