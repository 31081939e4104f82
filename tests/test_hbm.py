"""HBM-streamed intersector (ops/pallas/intersect_hbm): equivalence with
the VMEM-resident kernel, end-to-end renders, and the stress scene.

The reference's counterpart capability is DRAM ray/scene streaming
(src/IpuScene.cpp:375-391, 583-618); here the scene tables stream instead
(rays stay resident), so the contract to test is "same image as the
VMEM kernel, any scene size".
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ipu_ray_lib_tpu.ops.camera import generate_camera_rays, pixel_grid
from ipu_ray_lib_tpu.scene.build import build_scene
from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene, make_stress_scene


@pytest.fixture(scope="module")
def cornell():
    scene = make_cornell_box_scene(None, box_only=False)
    return build_scene(scene, image_width=48, image_height=48,
                       samples_per_pixel=2, intersector="pallas-hbm")


def _rays(params, n):
    rows, cols = pixel_grid(n, n, 0, 0)
    return generate_camera_rays(rows, cols, n, n, params.fov_radians, 0.0, None)


def test_hbm_matches_vmem_kernel(cornell):
    from ipu_ray_lib_tpu.ops.pallas.intersect_hbm import pallas_intersect_hbm
    from ipu_ray_lib_tpu.ops.pallas.intersect_kernel import pallas_intersect

    arrays, params, _ = cornell
    o, d = _rays(params, 48)
    R = o.shape[0]
    t_min = jnp.zeros(R)
    t_max = jnp.full(R, jnp.inf)
    t1, i1, n1, p1 = pallas_intersect(
        arrays.blocked, o, d, t_min, t_max, interpret=True)
    t2, i2, n2, p2 = pallas_intersect_hbm(
        arrays.blocked, o, d, t_min, t_max, interpret=True, br=512)
    assert np.allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
    assert (np.asarray(i1) == np.asarray(i2)).all()
    assert np.allclose(np.asarray(n1), np.asarray(n2), atol=1e-6)
    assert np.allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


@pytest.mark.fullgate
def test_render_path_trace_hbm_matches_pallas(cornell):
    """Same RNG streams + same acceptance tests => identical images."""
    import dataclasses

    from ipu_ray_lib_tpu.render.streaming import render_streaming

    arrays, params, _ = cornell
    img_hbm, done_hbm = render_streaming(arrays, params, chunk_slots=512, spp=2)
    params_v = dataclasses.replace(params, intersector="pallas")
    img_v, done_v = render_streaming(arrays, params_v, chunk_slots=512, spp=2)
    assert done_hbm == done_v == 48 * 48 * 2
    # pallas routes to the VMEM megakernel, pallas-hbm to the HBM-streamed
    # megakernel; both share RNG streams and acceptance maths:
    assert np.allclose(img_hbm, img_v, atol=2e-3)


def test_pn8_super_packing_contract():
    """The HBM kernels depend on the fused pn8 layout contract exactly:
    one super is a dense [PN_SUPER, SB*16] slab — rows [0, TB) the p8
    block packing (pn8[s*PN + r, b*16 + c] == p[(s*SB + b)*TB + r, c]),
    rows below the members' nrm payload chunks
    (pn8[s*PN + TB + (b*3+j)*8 + r, c] == nrm[r, ((s*SB+b)*3+j)*TB + c])."""
    from ipu_ray_lib_tpu.ops.pallas.tables import PN_SUPER, SB, TB

    scene = make_stress_scene(24)
    arrays, _, _ = build_scene(scene, image_width=8, image_height=8,
                               samples_per_pixel=1)
    t = arrays.blocked
    p = np.asarray(t.p)
    nrm = np.asarray(t.nrm)
    pn8 = np.asarray(t.pn8)
    ns, nb = t.num_supers, t.num_blocks
    assert pn8.shape == (ns * PN_SUPER, SB * 16)
    sup = pn8.reshape(ns, PN_SUPER, SB * 16)
    rebuilt_p = (sup[:, :TB, :].reshape(ns, TB, SB, 16)
                 .transpose(0, 2, 1, 3).reshape(ns * SB * TB, 16))
    np.testing.assert_array_equal(rebuilt_p, p)
    rebuilt_nrm = (sup[:, TB:, :].reshape(ns * SB * 3, 8, TB)
                   .transpose(1, 0, 2).reshape(8, nb * 3 * TB))
    np.testing.assert_array_equal(rebuilt_nrm, nrm)


@pytest.mark.fullgate
def test_pay8_split_contract(monkeypatch):
    """Under the split layout (auto above HBM_SPLIT_MIN_TRIS;
    RAY_HBM_SPLIT=1 forces it) the payload moves to the bf16 pay8 table
    and pn8 carries only the p8 rows: pn8[s*TB + r, b*16 + c] ==
    p[(s*SB+b)*TB + r, c] and pay8[(s*SB+b)*24 + j*8 + r, c] ==
    bf16(nrm[r, ((s*SB+b)*3+j)*TB + c])."""
    from ipu_ray_lib_tpu.ops.pallas import tables as TBL

    monkeypatch.setattr(TBL, "VMEM_TABLE_MAX_TRIS", 100)
    monkeypatch.setenv("RAY_HBM_SPLIT", "1")
    scene = make_stress_scene(24)
    arrays, _, _ = build_scene(scene, image_width=8, image_height=8,
                               samples_per_pixel=1,
                               intersector="pallas-hbm")
    t = arrays.blocked
    assert t.p is None and t.nrm is None and t.pay8 is not None
    ns, nb = t.num_supers, t.num_blocks
    from ipu_ray_lib_tpu.ops.pallas.tables import SB, TB
    pn8 = np.asarray(t.pn8)
    pay8 = np.asarray(t.pay8.astype(np.float32))
    assert pn8.shape == (ns * TB, SB * 16)
    assert pay8.shape == (nb * 24, TB)
    # Rebuild a reference f32 build of the same scene for the source
    # p/nrm tables:
    arrays_f, _, _ = build_scene(scene, image_width=8, image_height=8,
                                 samples_per_pixel=1,
                                 intersector="pallas")
    p = np.asarray(arrays_f.blocked.p)
    nrm = np.asarray(arrays_f.blocked.nrm)
    rebuilt_p = (pn8.reshape(ns, TB, SB, 16).transpose(0, 2, 1, 3)
                 .reshape(ns * SB * TB, 16))
    np.testing.assert_array_equal(rebuilt_p, p)
    rebuilt_nrm = (pay8.reshape(nb * 3, 8, TB).transpose(1, 0, 2)
                   .reshape(8, nb * 3 * TB))
    np.testing.assert_array_equal(
        rebuilt_nrm,
        nrm.astype(np.float32).astype(
            __import__("ml_dtypes").bfloat16).astype(np.float32))
    # End-to-end: the split megakernel walk and the split standalone
    # intersect kernel must agree with the fused builds up to the bf16
    # payload rounding (geometry/t are f32 in both — only shading
    # payload rounds):
    from ipu_ray_lib_tpu.ops.pallas.intersect_hbm import pallas_intersect_hbm
    from ipu_ray_lib_tpu.render.streaming import render_streaming

    _, params, _ = build_scene(scene, image_width=32, image_height=32,
                               samples_per_pixel=1,
                               intersector="pallas-hbm")
    img_s, done = render_streaming(arrays, params, spp=1)
    assert done == 32 * 32
    # Group-unrolled member walk under the split payload layout
    # (finding 57): same decisions, same pay8 reads — bitwise:
    import functools

    from ipu_ray_lib_tpu.ops.pallas import megakernel as MK
    orig = MK.megakernel_path_trace
    MK.megakernel_path_trace = functools.partial(orig, hbm_wu=4)
    try:
        img_w, done_w = render_streaming(arrays, params, spp=1)
    finally:
        MK.megakernel_path_trace = orig
    assert done_w == 32 * 32
    np.testing.assert_array_equal(img_w, img_s)
    tf = arrays_f.blocked
    o = np.zeros((8, 3), np.float32)
    d = np.tile(np.asarray([[0.0, -0.2, 1.0]], np.float32), (8, 1))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    import jax.numpy as jnp
    hs = pallas_intersect_hbm(t, jnp.asarray(o), jnp.asarray(d),
                              jnp.zeros(8), jnp.full(8, 1e9),
                              interpret=True)
    hf = pallas_intersect_hbm(tf, jnp.asarray(o), jnp.asarray(d),
                              jnp.zeros(8), jnp.full(8, 1e9),
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(hs[0]), np.asarray(hf[0]))
    np.testing.assert_array_equal(np.asarray(hs[1]), np.asarray(hf[1]))
    np.testing.assert_allclose(np.asarray(hs[2]), np.asarray(hf[2]),
                               atol=2e-2, rtol=2e-2)


def test_stress_scene_renders():
    """The large-scene generator builds and shadow-traces (tiny grid)."""
    from ipu_ray_lib_tpu.render.renderer import render

    scene = make_stress_scene(24)          # 1058 triangles
    arrays, params, _ = build_scene(
        scene, image_width=32, image_height=32, samples_per_pixel=1,
        intersector="pallas-hbm", max_path_length=3,
    )
    out = render(arrays, params, mode="shadow-trace", chunk_size=1024)
    assert out.hit_count > 100            # terrain fills the lower frame
    pt = render(arrays, params, mode="path-trace", chunk_size=1024)
    assert np.isfinite(pt.rgb).all()
    assert pt.rgb.max() > 0


def test_vmem_p_skipped_at_scale(monkeypatch):
    """Above VMEM_TABLE_MAX_TRIS the VMEM-layout p table (a bitwise
    duplicate of p8) is not materialised — 536 MB of device HBM at 8.4M
    tris. The HBM paths must still render, and the VMEM kernels must
    raise a clear error rather than crash."""
    import dataclasses

    import jax.numpy as jnp
    import pytest

    from ipu_ray_lib_tpu.ops.pallas import tables as TBL
    from ipu_ray_lib_tpu.ops.pallas.intersect_kernel import pallas_intersect
    from ipu_ray_lib_tpu.render.streaming import render_streaming
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_stress_scene

    scene = make_stress_scene(16)   # 1058 tris
    monkeypatch.setattr(TBL, "VMEM_TABLE_MAX_TRIS", 100)
    arrays, params, _ = build_scene(
        scene, image_width=32, image_height=32, samples_per_pixel=1,
        max_path_length=3, intersector="pallas-hbm")
    assert arrays.blocked.p is None
    img, done = render_streaming(arrays, params, spp=1)
    assert done == 32 * 32

    o = jnp.zeros((4, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (4, 1))
    with pytest.raises(RuntimeError, match="skipped at build time"):
        pallas_intersect(arrays.blocked, o, d, jnp.zeros(4),
                         jnp.full(4, 1e9), interpret=True)
    pv = dataclasses.replace(params, intersector="pallas")
    with pytest.raises(RuntimeError, match="skipped at build time"):
        render_streaming(arrays, pv, spp=1)

    # An explicit pallas build keeps the table:
    arrays2, params2, _ = build_scene(
        scene, image_width=32, image_height=32, samples_per_pixel=1,
        max_path_length=3, intersector="pallas")
    assert arrays2.blocked.p is not None
