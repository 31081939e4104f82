"""Walk-variant parity for the megakernel (interpret mode).

Every intersection-walk configuration — culled (default), mid-walk
reflag counts, sub-block granularity, the dense fallback, and the
HBM-streamed super walk — must produce *bitwise-identical* images: they
all run the same acceptance maths over the same triangles, only skipping
work that provably cannot produce the winner (the conservative-cull
contract of ops/pallas/megakernel.py)."""

import functools

import numpy as np
import pytest

# Exhaustive / record-knob gates: skipped in the default run, enabled
# with --full-gates (the weekly/pre-release mode) — see conftest.py
# and VERDICT r4 #7 (suite-time bound). Every gate FAMILY keeps at
# least one representative in the default run.
FULL = pytest.mark.fullgate


def _render(arrays, params, **kw):
    from ipu_ray_lib_tpu.ops.pallas import megakernel as MK
    from ipu_ray_lib_tpu.render import streaming as S

    orig = MK.megakernel_path_trace
    MK.megakernel_path_trace = functools.partial(orig, **kw) if kw else orig
    try:
        return S.render_streaming(arrays, params, spp=1)
    finally:
        MK.megakernel_path_trace = orig


@pytest.fixture(scope="module")
def mega_scene():
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

    scene = make_cornell_box_scene(mesh_file=None, box_only=False)
    arrays, params, _ = build_scene(
        scene, image_width=48, image_height=32, samples_per_pixel=1,
        intersector="pallas",
    )
    base, done = _render(arrays, params)
    assert done == 48 * 32
    return arrays, params, base


@pytest.mark.parametrize("kw", [
    dict(use_cull=False),
    dict(reflag=0),
    dict(reflag=1),
    dict(sub=2),
    dict(sub=4),
    dict(sub=8),
    pytest.param(dict(sub=8, walk_unroll=16), marks=FULL),
    dict(sub=16),
    dict(sub=16, reflag=0),
    # Compacted walk (finding 48): branch-free index-list walk must
    # visit the same blocks in the same order — bitwise:
    dict(walk_compact=True),
    dict(walk_compact=True, reflag=1),
    dict(walk_compact=True, sub=2),
    # Fresh per-group walk gates (finding 58): re-checking stored entry
    # bounds against the CURRENT best_t only skips windows that cannot
    # improve any lane — bitwise at every granularity/refresh/cull2
    # combo, including rf=0 (scratch allocated for the gates alone):
    dict(walk_fresh=True),
    pytest.param(dict(walk_fresh=True, reflag=0), marks=FULL),
    pytest.param(dict(walk_fresh=True, sub=16, reflag=1), marks=FULL),
    pytest.param(dict(walk_fresh=True, sub=16, reflag=0, walk_cull2=True), marks=FULL),
    pytest.param(dict(walk_fresh=True, sub=8, walk_unroll=4), marks=FULL),
    # Lexicographic (t, row) winner merge (walk_near, finding 59): on
    # the ascending-index walks shipped today the equal-t clause is a
    # semantic no-op (later windows' rows are strictly larger), so it
    # must be bitwise — the gate that licenses reordered walks later:
    pytest.param(dict(walk_near=True), marks=FULL),
    pytest.param(dict(walk_near=True, sub=16, reflag=0), marks=FULL),
    pytest.param(dict(walk_near=True, walk_cull2=True, sub=8), marks=FULL),
    pytest.param(dict(walk_near=True, walk_fresh=True, sub=16), marks=FULL),
    # Two-level flag pass (walk_cull2): coarse-group slab + refinement
    # must produce the identical flags (f32 monotonicity contract) and
    # hence bitwise-identical walks at every granularity/refresh combo:
    dict(walk_cull2=True),
    dict(walk_cull2=True, sub=4),
    dict(walk_cull2=True, sub=2),
    dict(walk_cull2=True, reflag=0),
    dict(walk_cull2=True, reflag=3),
    # bf16 entry-bound scratch (tin16, default on): a conservative
    # lower bound can only keep extra blocks, which cannot beat the
    # best_t they were kept against — f32 scratch must match bitwise:
    dict(tin16=False),
    pytest.param(dict(tin16=False, reflag=3), marks=FULL),
    pytest.param(dict(tin16=False, walk_cull2=True), marks=FULL),
    # Fused deferred-payload table (pay_fused / tables.payt): one
    # [64, TB] x [TB, br] dot selects bitwise the same bf16 factors the
    # two-dot + in-kernel-split form selected (the baseline render runs
    # pay_fused auto=ON, so forcing it OFF gates fused-vs-unfused, and
    # the combos gate the fused pass under every walk regime):
    dict(pay_fused=False),
    pytest.param(dict(pay_fused=False, sub=16), marks=FULL),
    pytest.param(dict(pay_fused=False, walk_compact=False), marks=FULL),
    pytest.param(dict(pay_fused=True, walk_compact=False), marks=FULL),
    dict(pay_fused=True, walk_cull2=True, sub=8),
    dict(pay_fused=True, walk_fresh=True, sub=16),
])
def test_walk_variants_bitwise_identical(mega_scene, kw):
    arrays, params, base = mega_scene
    img, done = _render(arrays, params, **kw)
    assert done == 48 * 32
    np.testing.assert_array_equal(img, base, err_msg=f"variant {kw}")


def test_pix_group_split_bitwise_identical(mega_scene, monkeypatch):
    """Pixel-group readback overlap (round 5): render_streaming splits
    the frame into G dispatches over padded-stream row ranges so group
    g's d2h readback rides under group g+1's compute. The megakernel's
    j0/k_total contract keeps every path's (pid, pixel) mapping equal to
    the single-dispatch schedule, so the assembled image must be
    BITWISE-identical for every divisor split (ref parity: the
    reference's save/load/compute interleave never changes results
    either, src/IpuScene.cpp:583-618)."""
    from ipu_ray_lib_tpu.render import streaming as S
    arrays, params, _ = mega_scene
    monkeypatch.setenv("RAY_PIX_GROUPS", "1")
    base, done = S.render_streaming(arrays, params, spp=1, chunk_slots=256)
    assert done == 48 * 32
    # Auto schedule (unequal tail group, J=6 -> [(0, 5), (5, 1)] —
    # exercises j0/k_total with both a 5-row and a 1-row dispatch; the
    # equal-split matrix runs in --full-gates mode below):
    monkeypatch.delenv("RAY_PIX_GROUPS")
    assert S.pix_group_schedule(6) == [(0, 5), (5, 1)]
    img, dg = S.render_streaming(arrays, params, spp=1, chunk_slots=256)
    assert dg == 48 * 32
    np.testing.assert_array_equal(img, base, err_msg="auto schedule")


@FULL
@pytest.mark.parametrize("g", ["2", "3"])
def test_pix_group_equal_splits_bitwise_identical(mega_scene, monkeypatch, g):
    """Equal-split pixel-group matrix (full-gates mode; the default run
    keeps the auto unequal schedule above as the family's gate)."""
    from ipu_ray_lib_tpu.render import streaming as S
    arrays, params, _ = mega_scene
    monkeypatch.setenv("RAY_PIX_GROUPS", "1")
    base, done = S.render_streaming(arrays, params, spp=1, chunk_slots=256)
    assert done == 48 * 32
    monkeypatch.setenv("RAY_PIX_GROUPS", g)
    img, dg = S.render_streaming(arrays, params, spp=1, chunk_slots=256)
    assert dg == 48 * 32
    np.testing.assert_array_equal(img, base, err_msg=f"G={g}")


@pytest.mark.parametrize("br", [
    pytest.param(128, marks=FULL),
    pytest.param(256, marks=FULL),
    1536,
])
def test_bundle_width_invariance_bitwise(mega_scene, monkeypatch, br):
    """Bundle width (br) must not leak into radiometry: the in-kernel
    RNG is keyed on (path id, bounce) — never on the bundle/lane a path
    lands in — so at spp=1 (one sample per pixel: no cross-sample
    accumulation ordering exists) the image must be bitwise identical
    across bundle widths. Gates tail handling, per-width cull/flag
    layouts and the winner merge at 128/256 lanes and at the
    single-bundle width (1536 = all rays in one dispatch). br is forced
    by patching _pick_br directly (not via the RAY_BR env hook, which
    validates v >= 256 and would reject 128): the streaming call site's
    explicit kwarg overrides a functools.partial keyword, and the kernel
    itself only requires br % (128 * subq) == 0."""
    from ipu_ray_lib_tpu.render import streaming as S
    arrays, params, base = mega_scene
    monkeypatch.setattr(S, "_pick_br", lambda R, J: br)
    img, done = _render(arrays, params)
    assert done == 48 * 32
    np.testing.assert_array_equal(img, base, err_msg=f"br={br}")


@pytest.mark.parametrize("subq,kw", [
    (2, {}),
    (4, {}),
    (4, dict(sub=2)),
    (4, dict(reflag=0)),
])
@FULL
def test_subq_lane_quarter_walk_bitwise_identical(mega_scene, monkeypatch,
                                                  subq, kw):
    """Lane-quarter walks (RAY_SUBQ: streaming passes megakernel subq —
    env-driven here because the call site's explicit kwarg overrides a
    functools.partial keyword) slice the dense test per flagged quarter;
    a lane only ever needs blocks its own slab admits, so images must be
    bitwise-identical."""
    arrays, params, base = mega_scene
    monkeypatch.setenv("RAY_SUBQ", str(subq))
    img, done = _render(arrays, params, **kw)
    assert done == 48 * 32
    np.testing.assert_array_equal(img, base, err_msg=f"subq {subq} {kw}")
    # Garbage values fall back to the default:
    from ipu_ray_lib_tpu.render.streaming import subq_granularity
    monkeypatch.setenv("RAY_SUBQ", "3")
    assert subq_granularity() == 1
    monkeypatch.setenv("RAY_SUBQ", "junk")
    assert subq_granularity() == 1


def test_ray_br_override_bitwise_identical(mega_scene, monkeypatch):
    """RAY_BR re-blocks the slot pool into different kernel bundle widths;
    every lane still runs identical per-ray math against identical
    triangles, so images must be bitwise-identical across br."""
    arrays, params, base = mega_scene
    monkeypatch.setenv("RAY_BR", "256")
    img, done = _render(arrays, params)
    assert done == 48 * 32
    np.testing.assert_array_equal(img, base)
    # Garbage / non-dividing values fall back to the heuristic:
    from ipu_ray_lib_tpu.render.streaming import _pick_br

    monkeypatch.setenv("RAY_BR", "nonsense")
    assert _pick_br(1536, 1) == 512
    monkeypatch.setenv("RAY_BR", "1000")   # does not divide the pool
    assert _pick_br(1536, 1) == 512


def test_f16_readback_close(mega_scene, monkeypatch):
    """RAY_READBACK_F16 halves d2h bytes; the image must match the f32
    readback to half-precision tolerance (display-grade contract)."""
    arrays, params, base = mega_scene
    monkeypatch.setenv("RAY_READBACK_F16", "1")
    img, done = _render(arrays, params)
    assert done == 48 * 32
    assert img.dtype == np.float32
    np.testing.assert_allclose(img, base, rtol=2e-3, atol=1e-3)


@FULL
def test_two_level_walk_bitwise_identical(mega_scene, monkeypatch):
    """The two-level VMEM walk (super cull + per-super member refinement)
    is a pure work-skipping change: images must match the flat walk
    exactly. The production threshold is >128 blocks; monkeypatch it down
    so the Cornell fixture (32 blocks, 4 supers) exercises the path.

    TWO_LEVEL_MIN_BLOCKS is read at TRACE time and is not part of the
    jit cache key — clear the cache around the patch or the call would
    silently reuse the flat-walk executable (vacuous test)."""
    from ipu_ray_lib_tpu.ops.pallas import megakernel as MK

    arrays, params, base = mega_scene
    monkeypatch.setattr(MK, "TWO_LEVEL_MIN_BLOCKS", 1)
    MK.megakernel_path_trace.clear_cache()
    try:
        # sub=1 is required or auto-sub (2 on small scenes) silently
        # disables two_level and the test reverts to the flat walk:
        img, done = _render(arrays, params, sub=1)
    finally:
        MK.megakernel_path_trace.clear_cache()
    assert done == 48 * 32
    np.testing.assert_array_equal(img, base)


@FULL
def test_deferred_env_flush_identical(tmp_path):
    """env_every > 1 parks escaped lanes and batch-flushes the fused env
    MLP — pure scheduling, identical estimator: images must match the
    immediate-flush mode exactly."""
    import os

    import numpy as np

    from ipu_ray_lib_tpu.nif.model import load_nif_env
    from ipu_ray_lib_tpu.nif.train import save_nif_assets, train_nif
    from ipu_ray_lib_tpu.render import streaming as S
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

    img = np.full((8, 16, 3), 0.5, np.float32)
    model, meta = train_nif(img, embedding_dimension=2, layer_count=2,
                            layer_size=8, steps=150, batch_size=128, seed=2)
    out_dir = str(tmp_path / "env")
    save_nif_assets(model, meta, out_dir)
    env_fn, env_params = load_nif_env(out_dir)

    scene = make_cornell_box_scene(None, box_only=False)
    arrays, params, _ = build_scene(scene, image_width=48, image_height=32,
                                    samples_per_pixel=2, intersector="pallas")
    imgs = {}
    for ek, sq, ec in (("1", None, None), ("5", None, None),
                       ("1", "4", None), ("5", None, "64")):
        os.environ["RAY_ENV_EVERY"] = ek
        if sq is not None:
            os.environ["RAY_SUBQ"] = sq
        if ec is not None:
            os.environ["RAY_ENV_COUNT"] = ec
        try:
            imgs[ek, sq, ec], done = S.render_streaming(
                arrays, params, env_fn=env_fn, env_params=env_params, spp=2)
        finally:
            del os.environ["RAY_ENV_EVERY"]
            os.environ.pop("RAY_SUBQ", None)
            os.environ.pop("RAY_ENV_COUNT", None)
        assert done == 48 * 32 * 2
    base = imgs["1", None, None]
    np.testing.assert_array_equal(base, imgs["5", None, None])
    # Lane-quarter walks with the fused env MLP (parked lanes interact
    # with the slab pass only through `active`; quarters must not change
    # the estimator):
    np.testing.assert_array_equal(base, imgs["1", "4", None])
    # Flush-on-count (RAY_ENV_COUNT) only moves flush timing — identical:
    np.testing.assert_array_equal(base, imgs["5", None, "64"])


def test_env_flush_cadence_robust(mega_scene, monkeypatch):
    """RAY_ENV_EVERY parsing must clamp to >= 1 and survive garbage —
    a 0/negative cadence would reach the kernel's rem(it, cadence)."""
    from ipu_ray_lib_tpu.render.streaming import env_flush_cadence

    arrays, _, _ = mega_scene
    default = env_flush_cadence(arrays)
    for bad in ("", "zero", "0", "-3"):
        monkeypatch.setenv("RAY_ENV_EVERY", bad)
        assert env_flush_cadence(arrays) == default, bad
    monkeypatch.setenv("RAY_ENV_EVERY", "7")
    assert env_flush_cadence(arrays) == 7


def test_env_flush_count_robust(mega_scene, monkeypatch):
    """RAY_ENV_COUNT clamps to >= 0 and survives garbage. Default is
    br/2 since round 5 (the measured flagship optimum: every=4 +
    count=br/2 = 26.37 Mpaths/s vs 25.54 count-off); 0 disables."""
    from ipu_ray_lib_tpu.render.streaming import (env_flush_cadence,
                                                  env_flush_count)

    arrays, _, _ = mega_scene
    assert env_flush_count() == 256          # default br=512 -> br/2
    assert env_flush_count(128) == 64
    for bad in ("", "lots"):
        monkeypatch.setenv("RAY_ENV_COUNT", bad)
        assert env_flush_count() == 256, bad
    monkeypatch.setenv("RAY_ENV_COUNT", "-5")
    assert env_flush_count() == 0            # negative clamps to 0
    monkeypatch.setenv("RAY_ENV_COUNT", "96")
    assert env_flush_count() == 96
    monkeypatch.setenv("RAY_ENV_COUNT", "0")
    assert env_flush_count() == 0            # explicit disable
    # The cadence is the max-wait clock and no longer bumps when the
    # count trigger is active (the every=16 bump measured 19-22 M vs
    # 26.4 at every=4):
    monkeypatch.delenv("RAY_ENV_COUNT")
    assert env_flush_cadence(arrays) == 4
    monkeypatch.setenv("RAY_ENV_EVERY", "3")
    assert env_flush_cadence(arrays) == 3    # explicit cadence still wins


def test_slab_chunking_bitwise_identical(mega_scene, monkeypatch):
    """The cull slab pass is chunked over AABB rows purely to bound
    scoped VMEM (the 2M-tri HBM config OOMs unchunked); forcing
    multi-chunk on the 32-block Cornell fixture must be bitwise
    identical, for both the VMEM and HBM walks.

    SLAB_CHUNK_ROWS is read at TRACE time and is not part of the jit
    cache key — clear the cache around the patch or both calls would
    silently reuse the single-chunk executables (vacuous test)."""
    from ipu_ray_lib_tpu.ops.pallas import megakernel as MK

    arrays, params, base = mega_scene
    monkeypatch.setattr(MK, "SLAB_CHUNK_ROWS", 8)
    MK.megakernel_path_trace.clear_cache()
    try:
        img, done = _render(arrays, params)
    finally:
        MK.megakernel_path_trace.clear_cache()
    assert done == 48 * 32
    np.testing.assert_array_equal(img, base)


def test_slab_chunking_bitwise_identical_hbm(hbm_scene, monkeypatch):
    """Same chunking contract on the HBM walk — against an hbm-built
    scene (a partial hbm=True override is call-site-discarded)."""
    from ipu_ray_lib_tpu.ops.pallas import megakernel as MK

    arrays, params, base = hbm_scene
    monkeypatch.setattr(MK, "SLAB_CHUNK_ROWS", 8)
    MK.megakernel_path_trace.clear_cache()
    try:
        img, done = _render(arrays, params)
    finally:
        MK.megakernel_path_trace.clear_cache()
    assert done == 48 * 32
    np.testing.assert_array_equal(img, base)


def test_hbm_reflag_cadence_robust(monkeypatch):
    """RAY_HBM_REFLAG must be a power of two >= 1 (the kernel masks the
    super-stream counter); anything else falls back to the default."""
    from ipu_ray_lib_tpu.render.streaming import hbm_reflag_cadence

    default = hbm_reflag_cadence()
    for bad in ("", "x", "0", "-4", "3", "24"):
        monkeypatch.setenv("RAY_HBM_REFLAG", bad)
        assert hbm_reflag_cadence() == default, bad
    for good in ("1", "4", "64"):
        monkeypatch.setenv("RAY_HBM_REFLAG", good)
        assert hbm_reflag_cadence() == int(good)


@FULL
def test_two_level_subq_bitwise_identical(mega_scene, monkeypatch):
    """Lane-quarter member flags inside the two-level walk (subq > 1 with
    super-granularity culling) must stay bitwise-identical too."""
    from ipu_ray_lib_tpu.ops.pallas import megakernel as MK

    arrays, params, base = mega_scene
    monkeypatch.setattr(MK, "TWO_LEVEL_MIN_BLOCKS", 1)
    monkeypatch.setenv("RAY_SUBQ", "4")
    MK.megakernel_path_trace.clear_cache()
    try:
        # sub=1 required for two_level to engage (see above):
        img, done = _render(arrays, params, sub=1)
    finally:
        MK.megakernel_path_trace.clear_cache()
    assert done == 48 * 32
    np.testing.assert_array_equal(img, base)


@pytest.fixture(scope="module")
def hbm_scene():
    """A real pallas-hbm build: the streaming call site derives ``hbm``
    from params.intersector, so a functools.partial hbm=True override is
    silently discarded (call-site kwargs win) — HBM knob parity must run
    against an hbm-built scene."""
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_stress_scene

    sc = make_stress_scene(24)
    arrays, params, _ = build_scene(
        sc, image_width=48, image_height=32, samples_per_pixel=1,
        intersector="pallas-hbm")
    base, done = _render(arrays, params)
    assert done == 48 * 32
    return arrays, params, base


@FULL
def test_hbm_subq_bitwise_identical(hbm_scene, monkeypatch):
    """Quartered dense tests inside the HBM-streamed super walk (inline
    payload dots sliced per quarter) must stay bitwise-identical."""
    arrays, params, base = hbm_scene
    monkeypatch.setenv("RAY_SUBQ", "4")
    img, done = _render(arrays, params)
    assert done == 48 * 32
    np.testing.assert_array_equal(img, base)


@pytest.mark.parametrize("kw", [
    dict(hbm_wu=2),
    dict(hbm_wu=4),
    dict(hbm_wu=8),
    dict(hbm_wu=4, hbm_sub=2),
    dict(hbm_wu=4, hbm_pay_gate=False),
])
@FULL
def test_hbm_wu_bitwise_identical(hbm_scene, kw):
    """Group-unrolled streamed member walk (finding 57): each group
    computes its member windows' dense chains together, then folds the
    winners in ascending window order, every window masked by its own
    member flag — the identical decisions (hence identical payload
    writes) as the per-window gated walk, so images are bitwise."""
    arrays, params, base = hbm_scene
    img, done = _render(arrays, params, **kw)
    assert done == 48 * 32
    np.testing.assert_array_equal(img, base, err_msg=f"variant {kw}")


@pytest.mark.parametrize("kw", [
    # The base fixture runs both optimisations at their defaults (on);
    # turning each off must not change a bit — the gate only skips
    # payload work for blocks that improved no lane, and the staging
    # copy feeds identical values to identical maths:
    dict(hbm_pay_gate=False),
    dict(hbm_pb_stage=False),
    dict(hbm_pay_gate=False, hbm_pb_stage=False),
])
def test_hbm_payload_knobs_bitwise_identical(hbm_scene, kw):
    arrays, params, base = hbm_scene
    img, done = _render(arrays, params, **kw)
    assert done == 48 * 32
    np.testing.assert_array_equal(img, base, err_msg=f"variant {kw}")


def test_hbm_cull3_bitwise_identical(hbm_scene, monkeypatch):
    """Third cull level for the HBM walk (round 5, hbm_cull3): the
    coarse super-group pass + refinement must produce the flat super
    slab pass's flags exactly (monotonic containment — the walk_cull2
    argument one level up), so the image is bitwise-identical."""
    arrays, params, base = hbm_scene
    monkeypatch.setenv("RAY_HBM_CULL3", "1")
    img, done = _render(arrays, params)
    assert done == 48 * 32
    np.testing.assert_array_equal(img, base, err_msg="hbm_cull3")


def test_hbm_reflag_cadence_bitwise_identical(hbm_scene, monkeypatch):
    """Flag-refresh cadence is pure work-skipping: any RAY_HBM_REFLAG
    value must render the identical image on the HBM walk."""
    arrays, params, base = hbm_scene
    for cad in ("1", "4"):
        monkeypatch.setenv("RAY_HBM_REFLAG", cad)
        img, done = _render(arrays, params)
        assert done == 48 * 32
        np.testing.assert_array_equal(img, base, err_msg=f"cadence {cad}")


@pytest.mark.parametrize("kw", [
    dict(walk_mxu=True),
    dict(walk_mxu=True, sub=4),
    dict(walk_mxu=True, reflag=0),
])
@FULL
def test_walk_mxu_matches_vpu_walk(mega_scene, kw):
    """The MXU coefficient-dot walk (walk_mxu) computes the six dense
    per-window dots as one HIGHEST group matmul. On TPU hardware HIGHEST
    is a 6-pass bf16x3 split (not bitwise vs the VPU FMA chain), so the
    contract is tolerance parity + the 2x-widened watertight band; in
    interpret/CPU mode both paths are exact f32 and should agree to the
    last ulp, which allclose at 1e-5 comfortably covers."""
    arrays, params, base = mega_scene
    img, done = _render(arrays, params, **kw)
    assert done == 48 * 32
    np.testing.assert_allclose(img, base, rtol=1e-5, atol=1e-6,
                               err_msg=f"variant {kw}")


@pytest.mark.parametrize("bn", [2, 8])
@FULL
def test_bundle_lockstep_bitwise_identical(mega_scene, bn):
    """Bundle-lockstep (megakernel `bundles`, finding 66): B independent
    br-lane bundles advance per kernel iteration with per-lane state as
    [B, br] sublane blocks. Per-lane arithmetic, RNG streams and walk
    order are unchanged, so images must be bitwise-identical to B=1.
    Measured SLOWER at every B on TPU (B=1 10.29 / B=2 11.04 / B=4
    11.20 / B=8 11.45 us per bundle-iteration, same window): (1, br)
    vectors are already issue-dense and the fixed pool is dependency-
    bound — knob kept as the measured record, default 1."""
    import jax.numpy as jnp

    from ipu_ray_lib_tpu.ops.pallas.megakernel import megakernel_path_trace
    from ipu_ray_lib_tpu.render import streaming as S

    arrays, params, _ = mega_scene
    n_pix = 48 * 32
    R, J = 2048, 1
    rows_np, cols_np, _ = S._pixel_stream(params, 32)
    rows = jnp.asarray(np.pad(rows_np, (0, R * J - n_pix)))
    cols = jnp.asarray(np.pad(cols_np, (0, R * J - n_pix)))
    mi = J * 2 * params.max_path_length + 16

    def run(bundles):
        flat, done = megakernel_path_trace(
            arrays, rows, cols, jnp.uint32(7), jnp.int32(n_pix),
            params=params, slots=R, j_per_slot=J, spp=2, max_iters=mi,
            br=256, interpret=True, bundles=bundles)
        return np.asarray(flat), int(done)

    base, done1 = run(1)
    img, done_b = run(bn)
    assert done_b == done1 == n_pix * 2
    np.testing.assert_array_equal(img, base, err_msg=f"bundles={bn}")
