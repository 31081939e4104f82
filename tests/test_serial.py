"""Scene serialisation tests — mirrors the intent of the reference's
serialiser unit suite (tests/test.cpp): alignment invariants, compact
24-byte node packing, zero-copy round trips."""

import numpy as np

from ipu_ray_lib_tpu.bvh.builder import build_bvh_python
from ipu_ray_lib_tpu.scene.serial import (
    NODE_DTYPE,
    Deserialiser,
    Serialiser,
    load_scene_bundle,
    pack_nodes,
    save_scene_bundle,
    unpack_nodes,
)


def _bvh(rng, n=64):
    lo = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    hi = lo + rng.uniform(0, 2, (n, 3)).astype(np.float32)
    return build_bvh_python(lo, hi, np.zeros(n, np.int64), np.arange(n))


def test_node_record_is_24_bytes():
    # The compactness contract of the reference node
    # (include/CompactBVH2Node.hpp: fp32 min + u32 + 3xfp16 + u16 = 24B):
    assert NODE_DTYPE.itemsize == 24


def test_node_pack_round_trip(rng):
    bvh = _bvh(rng)
    packed = pack_nodes(bvh)
    assert packed.nbytes == bvh.num_nodes * 24
    back = unpack_nodes(packed, bvh.miss, bvh.max_depth)
    np.testing.assert_array_equal(back.mins, bvh.mins)
    np.testing.assert_array_equal(back.exts, bvh.exts)
    np.testing.assert_array_equal(back.meta, bvh.meta)
    np.testing.assert_array_equal(back.geom, bvh.geom)
    np.testing.assert_array_equal(back.miss, bvh.miss)


def test_serialiser_alignment_and_round_trip(rng):
    s = Serialiser()
    arrays = {
        "a_f32": rng.normal(size=(7, 3)).astype(np.float32),
        "b_u8": rng.integers(0, 255, 13).astype(np.uint8),
        "c_f16": rng.normal(size=5).astype(np.float16),
        "d_i32": rng.integers(-5, 5, (3, 2)).astype(np.int32),
    }
    for k, v in arrays.items():
        s.add(k, v)
    blob = s.tobytes({"answer": 42})
    d = Deserialiser(blob)
    assert d.meta["answer"] == 42
    for k, v in arrays.items():
        got = d.get(k)
        np.testing.assert_array_equal(got, v)
        # Sections must be 64-byte aligned for zero-copy reinterpretation:
        e = d._toc[k]
        assert (d._body_base + e["offset"]) % 64 == 0


def test_scene_bundle_file_round_trip(rng, tmp_path):
    bvh = _bvh(rng, 33)
    arrays = {
        "verts": rng.normal(size=(10, 3)).astype(np.float32),
        "tri_v": rng.integers(0, 10, (5, 3)).astype(np.int32),
    }
    p = str(tmp_path / "scene.tprs")
    save_scene_bundle(p, bvh=bvh, arrays_host=arrays, meta={"name": "t"})
    bvh2, arrays2, meta = load_scene_bundle(p)
    assert meta["name"] == "t"
    np.testing.assert_array_equal(bvh2.mins, bvh.mins)
    np.testing.assert_array_equal(bvh2.miss, bvh.miss)
    np.testing.assert_array_equal(arrays2["verts"], arrays["verts"])
    np.testing.assert_array_equal(arrays2["tri_v"], arrays["tri_v"])


def test_compiled_scene_cache_round_trip(tmp_path, cornell_scene, cornell_built):
    """Full scene cache: saved+loaded scene must render identically —
    the analogue of the reference's on-device deserialise test
    (tests/test.cpp:246-300: the binary transport contract end to end)."""
    import dataclasses

    from ipu_ray_lib_tpu.render.renderer import render
    from ipu_ray_lib_tpu.scene.cache import load_compiled_scene, save_compiled_scene

    arrays, params, bvh = cornell_built
    p = str(tmp_path / "cornell.tprs")
    save_compiled_scene(p, arrays, params, bvh)
    arrays2, params2, bvh2 = load_compiled_scene(p)
    assert params2 == params
    assert bvh2.num_nodes == bvh.num_nodes

    small = dataclasses.replace(params, window_w=16, window_h=16,
                                window_c=40, window_r=40)
    small2 = dataclasses.replace(params2, window_w=16, window_h=16,
                                 window_c=40, window_r=40)
    a = render(arrays, small, mode="shadow-trace", chunk_size=256)
    b = render(arrays2, small2, mode="shadow-trace", chunk_size=256)
    np.testing.assert_array_equal(a.rgb, b.rgb)
    np.testing.assert_array_equal(a.geom_id, b.geom_id)
