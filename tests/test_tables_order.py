"""Scene-BVH treelet-order reuse (build_scene -> build_blocked_tables).

build_scene passes the scene BVH's depth-first triangle leaf order into
build_blocked_tables so large imports run ONE binned-SAH build instead of
two (finding 43's remaining host-build pole). The contract:

- On a triangle-only scene the reused order is bitwise-identical to the
  tables' own internal tri-only SAH build (same boxes, same input order,
  same deterministic builder), so every table field matches exactly.
- A tri_order that is not a permutation of [0, T) is rejected and the
  internal build runs (defensive fallback).
- build_scene actually passes the order (no silent second build).
"""

import numpy as np

from ipu_ray_lib_tpu.ops.pallas import tables as TBL
from ipu_ray_lib_tpu.scene.build import build_scene
from ipu_ray_lib_tpu.scene.builtin import make_stress_scene


def _tri_only_stress(grid=24):
    sc = make_stress_scene(grid)
    sc.spheres = np.zeros((0, 4), np.float32)
    sc.discs = np.zeros((0, 7), np.float32)
    return sc


def _blocked(scene, force_internal):
    orig = TBL.build_blocked_tables
    seen = {}

    def wrapped(*a, **kw):
        seen["tri_order_passed"] = kw.get("tri_order") is not None
        if force_internal:
            kw["tri_order"] = None
        return orig(*a, **kw)

    TBL.build_blocked_tables = wrapped
    try:
        arrays, _, _ = build_scene(
            scene, image_width=16, image_height=16, samples_per_pixel=1,
            intersector="pallas")
    finally:
        TBL.build_blocked_tables = orig
    return arrays.blocked, seen["tri_order_passed"]


def test_scene_bvh_order_reuse_bitwise_on_tri_only_scene(monkeypatch):
    # The RAY_TABLE_ORDER=internal escape hatch (scene/build.py) disables
    # exactly the reuse this test pins — neutralise it:
    monkeypatch.delenv("RAY_TABLE_ORDER", raising=False)
    sc = _tri_only_stress()
    a, passed = _blocked(sc, force_internal=False)
    b, _ = _blocked(sc, force_internal=True)
    assert passed, "build_scene did not pass tri_order to the tables"
    for name in ("p", "pn8", "pay8", "nrm", "baabb", "baabb32", "saabb",
                 "tri_geom", "tri_prim"):
        fa, fb = getattr(a, name), getattr(b, name)
        if fa is None or fb is None:
            assert fa is None and fb is None, name
            continue
        np.testing.assert_array_equal(
            np.asarray(fa), np.asarray(fb),
            err_msg=f"reused-order vs internal-build mismatch in {name}")


def test_invalid_tri_order_falls_back_to_internal_build():
    sc = _tri_only_stress()
    b_ref, _ = _blocked(sc, force_internal=True)

    # Rebuild the same triangle inputs directly with broken orders:
    T = int(np.asarray(b_ref.tri_geom).size)  # padded count
    m = sc.meshes[0]
    tri_v = m.triangles.astype(np.int32)
    n = len(tri_v)
    good = np.asarray(
        TBL.build_blocked_tables(tri_v, m.vertices,
                                 np.zeros(n, np.int32),
                                 np.arange(n, dtype=np.int32),
                                 tri_order=None).tri_prim)
    for bad in (
        np.zeros(n, np.int64),               # not a permutation
        np.arange(n - 1, dtype=np.int64),    # wrong length
        np.arange(n, dtype=np.int64) - 1,    # out of range
    ):
        got = np.asarray(
            TBL.build_blocked_tables(tri_v, m.vertices,
                                     np.zeros(n, np.int32),
                                     np.arange(n, dtype=np.int32),
                                     tri_order=bad).tri_prim)
        np.testing.assert_array_equal(got, good)


def test_valid_tri_order_is_honored():
    """A caller-supplied valid permutation defines the block layout."""
    sc = _tri_only_stress()
    m = sc.meshes[0]
    tri_v = m.triangles.astype(np.int32)
    n = len(tri_v)
    rng = np.random.default_rng(3)
    perm = rng.permutation(n).astype(np.int64)
    out = TBL.build_blocked_tables(tri_v, m.vertices,
                                   np.zeros(n, np.int32),
                                   np.arange(n, dtype=np.int32),
                                   tri_order=perm)
    got = np.asarray(out.tri_prim).ravel()[:n]
    np.testing.assert_array_equal(got, perm.astype(got.dtype))
