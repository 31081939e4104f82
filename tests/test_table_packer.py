"""Native table packer vs the numpy twin: bitwise parity.

The native packer (csrc/table_packer.cpp, bound via ops/pallas/cpack.py)
replaces the per-triangle f64 precompute of build_blocked_tables. Its
contract is BITWISE equality with the numpy expressions — any drift
would silently change the acceptance geometry of every kernel, so the
gate compares every field of BlockedSceneTables across real scenes
(Cornell+monkey GLB: vertex normals + materials + emissive; stress
heightfield: pad rows + multi-super; tiny scene: single-block edge).
"""

import numpy as np
import pytest


def _tables_for(scene_desc, native):
    """build_scene with the packer forced on/off; returns blocked tables."""
    from ipu_ray_lib_tpu.ops.pallas import tables as TBL
    from ipu_ray_lib_tpu.scene.build import build_scene

    orig = TBL.build_blocked_tables

    def wrapped(*a, **kw):
        kw["native_pack"] = native
        return orig(*a, **kw)

    # build_scene resolves build_blocked_tables from the tables module
    # at call time, so patching the module attribute is sufficient:
    TBL.build_blocked_tables = wrapped
    try:
        arrays, _, _ = build_scene(
            scene_desc, image_width=16, image_height=16,
            samples_per_pixel=1, intersector="pallas")
        return arrays.blocked
    finally:
        TBL.build_blocked_tables = orig


def _assert_tables_equal(a, b):
    for name in ("p", "pn8", "pay8", "nrm", "baabb", "baabb32", "saabb",
                 "tri_geom", "tri_prim"):
        fa, fb = getattr(a, name), getattr(b, name)
        if fa is None or fb is None:
            assert fa is None and fb is None, name
            continue
        np.testing.assert_array_equal(
            np.asarray(fa), np.asarray(fb),
            err_msg=f"native vs numpy mismatch in {name}")


def test_native_pack_available():
    from ipu_ray_lib_tpu.ops.pallas.cpack import _load

    assert _load() is not None, (
        "native packer failed to build — make -C csrc")


@pytest.mark.parametrize("scene_name", ["cornell_glb", "stress", "tiny"])
def test_native_pack_bitwise_matches_numpy(scene_name):
    import os

    from ipu_ray_lib_tpu.scene.builtin import (make_cornell_box_scene,
                                               make_stress_scene)

    if scene_name == "cornell_glb":
        glb = os.path.join(os.path.dirname(__file__), "..", "assets",
                           "monkey_bust.glb")
        scene = make_cornell_box_scene(
            glb if os.path.exists(glb) else None, box_only=False)
    elif scene_name == "stress":
        scene = make_stress_scene(24)   # 2402 tris: pad rows, 3 supers
    else:
        scene = make_cornell_box_scene(None, box_only=True)
    a = _tables_for(scene, native=True)
    b = _tables_for(scene, native=False)
    _assert_tables_equal(a, b)


def test_native_pack_random_soup_bitwise():
    """Randomized triangle soup incl. degenerate triangles (repeated
    vertices), mixed has-normals flags and many materials — the edge
    cases the structured scenes can't cover (degenerate n/g zeroing,
    id hi/lo split above 256, emissive payload rows)."""
    from ipu_ray_lib_tpu.ops.pallas.tables import build_blocked_tables

    rng = np.random.default_rng(7)
    T, V, M = 700, 400, 300
    tri_v = rng.integers(0, V, (T, 3)).astype(np.int32)
    tri_v[::97, 1] = tri_v[::97, 0]        # degenerate: repeated vertex
    tri_v[::131] = tri_v[::131, 0:1]       # fully collapsed
    verts = rng.normal(0, 10, (V, 3)).astype(np.float32)
    vn = rng.normal(0, 1, (V, 3)).astype(np.float32)
    hasn = rng.random(T) < 0.5
    tri_mat = rng.integers(0, M, T).astype(np.int32)
    kw = dict(
        vert_normals=vn, tri_has_normals=hasn, tri_mat=tri_mat,
        mat_albedo=rng.random((M, 3)).astype(np.float32),
        mat_ior=(1 + rng.random(M)).astype(np.float32),
        mat_type=rng.integers(0, 4, M).astype(np.int32),
        mat_emissive=rng.integers(0, 2, M).astype(np.int32),
        mat_emission=rng.random((M, 3)).astype(np.float32),
    )
    gids = np.zeros(T, np.int32)
    pids = np.arange(T, dtype=np.int32)
    a = build_blocked_tables(tri_v, verts, gids, pids, native_pack=True, **kw)
    b = build_blocked_tables(tri_v, verts, gids, pids, native_pack=False, **kw)
    _assert_tables_equal(a, b)
    # and without vertex normals at all:
    a = build_blocked_tables(tri_v, verts, gids, pids, native_pack=True,
                             **{**kw, "vert_normals": None})
    b = build_blocked_tables(tri_v, verts, gids, pids, native_pack=False,
                             **{**kw, "vert_normals": None})
    _assert_tables_equal(a, b)


def test_native_pack_p8_direct_bitwise():
    """Above the VMEM table ceiling the packer writes the p8 super layout
    directly (csrc p8_layout=1) — it must equal the transpose of the
    row-layout p bitwise, with the VMEM p skipped."""
    from ipu_ray_lib_tpu.ops.pallas.tables import build_blocked_tables

    rng = np.random.default_rng(11)
    T, V, M = 2500, 900, 40          # 20 blocks -> 3 supers, pad rows
    tri_v = rng.integers(0, V, (T, 3)).astype(np.int32)
    verts = rng.normal(0, 10, (V, 3)).astype(np.float32)
    vn = rng.normal(0, 1, (V, 3)).astype(np.float32)
    kw = dict(
        vert_normals=vn,
        tri_has_normals=rng.random(T) < 0.5,
        tri_mat=rng.integers(0, M, T).astype(np.int32),
        mat_albedo=rng.random((M, 3)).astype(np.float32),
        mat_ior=(1 + rng.random(M)).astype(np.float32),
        mat_type=rng.integers(0, 4, M).astype(np.int32),
        mat_emissive=rng.integers(0, 2, M).astype(np.int32),
        mat_emission=rng.random((M, 3)).astype(np.float32),
    )
    gids = np.zeros(T, np.int32)
    pids = np.arange(T, dtype=np.int32)
    a = build_blocked_tables(tri_v, verts, gids, pids, native_pack=True,
                             with_vmem_p=False, **kw)   # p8-direct path
    b = build_blocked_tables(tri_v, verts, gids, pids, native_pack=False,
                             with_vmem_p=False, **kw)   # numpy transpose
    c = build_blocked_tables(tri_v, verts, gids, pids, native_pack=True,
                             with_vmem_p=True, **kw)    # row-p + transpose
    assert a.p is None and b.p is None and c.p is not None
    np.testing.assert_array_equal(np.asarray(a.pn8), np.asarray(b.pn8))
    np.testing.assert_array_equal(np.asarray(a.pn8), np.asarray(c.pn8))
    _assert_tables_equal(a, b)
