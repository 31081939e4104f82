"""Megakernel streaming path tracer: the whole bounce loop in one kernel.

TPU-native counterpart of the reference's on-tile path-trace megakernel
(ref: codelets/TraceCodelets.cpp:170-264): a single ``pallas_call``
advances a pool of ray slots through intersection, emission, BxDF
sampling, RNG, russian roulette, radiance banking and *path regeneration*
without leaving VMEM. The round-1 XLA-loop integrator paid ~3-4 ms per
iteration in pallas operand staging + shading glue through HBM; here the
entire loop carry (ray state, throughput, colour, path counters, the
radiance accumulator) lives in VMEM scratch/output blocks, so per
iteration the only cost is the dense intersection arithmetic itself.

Structure
---------
Grid: ``(R / BR,)`` slot blocks. Each grid step owns ``BR`` ray slots and
runs its own regenerating wavefront to completion (all ``K = J * spp``
paths of each slot). TPU grid steps run sequentially on the core, so this
is a tiled loop over the slot pool — per-block drain imbalance just
serialises, exactly like the XLA while_loop did.

Intersection walk (per iteration):

* **VMEM mode** (default; scenes ≤64k prims): one vectorised slab pass of
  every (sub-)block AABB against the live bundle sets per-block flags; a
  ``pl.when``-gated walk runs the dense [TB, BR] tests only for flagged
  blocks, with ``reflag`` mid-walk refreshes against the converging
  best_t (PROGRESS.md findings 24-25 — evolving per-block tests lose to
  vector→scalar serialisation; precomputed flags win).
* **HBM mode** (``hbm=True``; unbounded scenes): tables stay in HBM;
  the slab pass runs over SUPER AABBs, flagged supers stream their p/nrm
  slabs through double-buffered ``make_async_copy`` windows (a scalar
  lookahead prefetches the *next flagged* super during the current one's
  tests — the reference's 2-stage DRAM pipeline, ref IpuScene.cpp:
  583-618), and a per-super block-level slab+best_t pass gates each
  member block (findings 27/29).
* **Lane-quarter walks** (``subq`` > 1, any mode): block/member flags are
  kept per width-(BR/subq) lane slice and the dense tests run per
  flagged quarter — a random narrow slice of an incoherent bundle needs
  far fewer blocks than the full union (finding 46:
  experiments/subbundle_sim.py measures 1.86x fewer pair-ops at Q=4 on
  the Cornell production mix, 2.85x on the 522k heightfield, with NO
  ray sorting). Bitwise-identical radiometry: a lane only ever needs
  blocks its own slab interval admits. **Measured SLOWER on TPU at
  every width** (finding 47): the dense test is a dependent ~50-op
  chain, and below 512 lanes per op the VPU cannot hide its latency —
  per-element cost ~doubles per width halving, cancelling the union
  win. Default 1; the machinery stays as the measured record of this
  design point. Quarters must be REF-loaded, never sliced from loaded
  vectors (lane-offset layouts don't broadcast on hardware Mosaic).

Environment light (``env_cfg``): the NIF Fourier-feature MLP runs
in-kernel as bf16 [P, BR] MXU slabs with exact f32 biases added after
each matmul and atan2/arccos as f32 polynomials (finding 26;
pack_env_mlp below). With ``env_every > 1`` escaped lanes park in a
pending state and the MLP flushes them in batches — its [P, BR] cost is
per-call, so deferring amortises it on interior scenes (bitwise-
identical scheduling change, tested).

Layouts: lane-major everywhere — rays ride the 128-wide lane dimension,
state components are sublane rows ([rows, BR]); see PROGRESS.md finding 10
for why (a [R, .., 3] layout tile-pads 42x).

Geometry precision: the six ray/triangle dot products are full-f32 VPU
FMAs over the p-table component columns (the MXU's default-precision f32
dot rounds operands through bf16 — PROGRESS.md finding 14). Material
payload selection uses the one-hot MXU dots with the exactness contract
documented in tables.py. Analytic-primitive payload (a tiny [16, P] @
[P, BR] dot) runs at Precision.HIGHEST so sphere centres — real geometry —
come through exactly.

RNG: the same counter-based mixing as ops/rng.py (identical constants and
stream layout), expressed in int32 + logical shifts for Mosaic.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.constants import PI_BY_2, PI_BY_4, RAY_EPSILON
from .tables import PN_SUPER as PNS, SB, TB, BlockedSceneTables

BR = 1024          # ray slots per kernel block
_INF = np.float32(np.inf)
_BIG = np.float32(1e37)

# VMEM scenes with more blocks than this walk two-level (super cull +
# per-super member refinement) instead of flat per-block gates — the
# flat walk pays a scalar flag read + pl.when gate per block per
# iteration (tests monkeypatch this down to cover the path):
TWO_LEVEL_MIN_BLOCKS = 128

# Row-chunk size for the vectorised cull slab pass: bounds the pass's
# scoped-VMEM working set at ~[SLAB_CHUNK_ROWS, br] x ~8 live temporaries
# (an unchunked pass OOMs the kernel stack past ~1000 supers; tests
# monkeypatch this down to cover multi-chunk on small scenes):
SLAB_CHUNK_ROWS = 512
# Max rows per compacted-walk segment: keeps compact_indices' rank/
# extract operands bf16-exact on the DEFAULT MXU path (integers <= 256):
_COMPACT_SEG = 256
# Two-level flag pass (walk_cull2): refinement loop unroll (independent
# 8-row slab chains per while-loop iteration, same ILP rationale as
# walk_unroll):
_CULL2_UNROLL = 4



def resolve_walk_policy(nb: int, br: int,
                        walk_compact: bool = True) -> dict:
    """Joint auto policy for the VMEM walk over ``nb`` 128-tri blocks at
    bundle width ``br`` — sub-block granularity, mid-walk refresh count
    and the two-level flag pass, resolved together (they trade against
    each other). Single source of truth shared by the megakernel wrapper
    and bench.py's telemetry mirror.

    Measured (findings 52/54/56, br=512): finer dense windows keep
    paying under the compacted unrolled walk on small scenes (sub=16
    +29% over sub=4 on the 32-block bench scene), and ONE refresh edges
    none there (11.12 vs 11.38 us/iter). Past ~64 blocks the flat
    [nb*sub, br] flag pass grows with granularity — the two-level pass
    (walk_cull2) pays for it (finding 56: 64k boundary sub=8 97.6 vs
    flat-best 109.4 us/iter; 256-block sub=8 72.3 vs 77.1) while
    refreshes + per-segment rank/extract re-runs turn NET-NEGATIVE at
    fine granularity (rf1 -20% on the 128/256-block terrains), so big
    scenes run rf=0. The 16 -> 8 step at ~160 blocks: 128-block terrain
    prefers sub=16 (57.8 vs 60.0), 256+ prefer sub=8 (72.3 vs 72.3 tie,
    512-block 97.6 vs 101.6)."""
    if not walk_compact:
        # Gated-path policy (round 2): coarse windows, swept reflag=3.
        return dict(sub=2 if 1 < nb <= 128 else 1, reflag=3, cull2=False)
    if nb <= 40:
        return dict(sub=16, reflag=1, cull2=False)
    if nb <= 64:
        return dict(sub=8, reflag=1, cull2=False)
    return dict(sub=16 if nb <= 160 else 8, reflag=0, cull2=True)


def resolve_auto_sub(nb: int, br: int, walk_compact: bool = True) -> int:
    """Auto sub-block granularity (the ``sub`` field of
    resolve_walk_policy) — kept as the telemetry-mirror entry point
    (bench.py). Explicit RAY_REFLAG>0 overrides on large scenes can
    still degrade the effective sub through the wrapper's entry-bound
    scratch ladder; auto configs never hit it (big scenes run rf=0)."""
    return resolve_walk_policy(nb, br, walk_compact)["sub"]


# ---------------------------------------------------------------------------
# In-kernel counter RNG (int32 twin of ops/rng.py — same bit streams).
# ---------------------------------------------------------------------------
_M1 = np.int32(np.uint32(0x85EBCA6B).astype(np.int64) - (1 << 32))
_M2 = np.int32(np.uint32(0xC2B2AE35).astype(np.int64) - (1 << 32))
_M3 = np.int32(0x27D4EB2F)
_GOLDEN = np.int32(np.uint32(0x9E3779B9).astype(np.int64) - (1 << 32))
_FNV = np.int32(np.uint32(0x811C9DC5).astype(np.int64) - (1 << 32))

_shr = jax.lax.shift_right_logical


def _mix(h):
    h = h ^ _shr(h, 16)
    h = h * _M1
    h = h ^ _shr(h, 13)
    h = h * _M2
    h = h ^ _shr(h, 16)
    return h


def _hash(*streams):
    h = jnp.full_like(streams[0], _FNV)
    for s in streams:
        h = _mix(h ^ (s.astype(jnp.int32) * _M3 + _GOLDEN))
    return _mix(h)


def _u01(*streams):
    bits = _hash(*streams)
    return _shr(bits, 8).astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def _normal2(*streams):
    # The two draws batch as one [2*rows, br] hash chain: row block r
    # computes _hash(*streams, cr) exactly as the per-row form did
    # (bitwise identical); stacking rows turns the chain into full
    # vreg-width work when the caller's streams are [B, br] bundle
    # blocks (finding 66 layout):
    rows, br_ = streams[0].shape
    c2 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (2 * rows, br_), 0) < rows,
        np.int32(0xA5), np.int32(0x5A))
    tiled = (jnp.concatenate([jnp.broadcast_to(s, (rows, br_))] * 2,
                             axis=0) for s in streams)
    uu = _u01(*tiled, c2)
    u1 = jnp.maximum(uu[0:rows, :], np.float32(1e-12))
    u2 = uu[rows:2 * rows, :]
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    th = np.float32(2.0 * np.pi) * u2
    return r * jnp.cos(th), r * jnp.sin(th)


# ---------------------------------------------------------------------------
# Row-vector helpers (vec3 = tuple of three [1, BR] arrays).
# ---------------------------------------------------------------------------
def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _normalize3(v):
    il = jax.lax.rsqrt(jnp.maximum(_dot3(v, v), np.float32(1e-30)))
    return (v[0] * il, v[1] * il, v[2] * il)


def _where3(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]))


def _scale3(v, s):
    return (v[0] * s, v[1] * s, v[2] * s)


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sample_diffuse(n, u1, u2):
    """Cosine-weighted hemisphere sample about n (ops/bxdf.py twin)."""
    ax, ay = jnp.abs(n[0]), jnp.abs(n[1])
    use_x = ax > ay
    ilx = jax.lax.rsqrt(jnp.maximum(n[0] * n[0] + n[2] * n[2], 1e-30))
    ily = jax.lax.rsqrt(jnp.maximum(n[1] * n[1] + n[2] * n[2], 1e-30))
    zero = jnp.zeros_like(ax)
    v2 = _where3(use_x,
                 (-n[2] * ilx, zero, n[0] * ilx),
                 (zero, n[2] * ily, -n[1] * ily))
    v3 = _cross3(n, v2)
    # Concentric disc sample:
    ux = 2.0 * u1 - 1.0
    uy = 2.0 * u2 - 1.0
    use_ux = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(use_ux, ux, uy)
    sx = jnp.where(ux == 0.0, 1.0, ux)
    sy = jnp.where(uy == 0.0, 1.0, uy)
    th = jnp.where(use_ux, np.float32(PI_BY_4) * (uy / sx),
                   np.float32(PI_BY_2) - np.float32(PI_BY_4) * (ux / sy))
    z0 = (ux == 0.0) & (uy == 0.0)
    x = jnp.where(z0, 0.0, r * jnp.cos(th))
    y = jnp.where(z0, 0.0, r * jnp.sin(th))
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return _add3(_add3(_scale3(v2, x), _scale3(v3, y)), _scale3(n, z))


def _atan2(y, x):
    """f32 atan2 from a degree-11 odd minimax polynomial (Mosaic has no
    native arctan lowering). Max error ~1e-5 rad — far below one HDRI
    texel of the NIF's equirect parameterisation."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    z = mn / jnp.maximum(mx, np.float32(1e-30))
    z2 = z * z
    a = np.float32(-0.0117212)
    for c in (0.05265332, -0.11643287, 0.19354346, -0.33262347, 0.99997726):
        a = a * z2 + np.float32(c)
    a = a * z
    a = jnp.where(ay > ax, np.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0.0, np.float32(np.pi) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _acos(x):
    """arccos via atan2(sqrt(1-x^2), x); x pre-clipped to [-1, 1]."""
    s = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    return _atan2(s, x)


def _reflect(d, n):
    ct = _dot3(d, n)
    return _normalize3(_add3(d, _scale3(n, -2.0 * ct)))


def _dielectric(d, n_in, ior, u1):
    """Schlick-weighted reflect/refract (ops/bxdf.py twin).
    Returns (new_dir vec3, refracted mask)."""
    entering = _dot3(n_in, d) <= 0.0
    n = _where3(entering, n_in, _scale3(n_in, -1.0))
    ri = jnp.where(entering, 1.0 / ior, ior)
    ndotr = _dot3(n, d)
    cost1 = -ndotr
    cost2 = 1.0 - ri * ri * (1.0 - cost1 * cost1)
    r0 = (1.0 - ri) / (1.0 + ri)
    r0 = r0 * r0
    base = 1.0 - cost1
    schlick = r0 + (1.0 - r0) * base * base * base * base * base
    do_refract = (cost2 > 0.0) & (u1 > schlick)
    r_perp = _scale3(_add3(d, _scale3(n, cost1)), ri)
    par_mag = jnp.sqrt(jnp.abs(1.0 - _dot3(r_perp, r_perp)))
    d_refr = _add3(r_perp, _scale3(n, -par_mag))
    d_refl = _reflect(d, n)
    return _where3(do_refract, d_refr, d_refl), do_refract


# ---------------------------------------------------------------------------
# The kernel.
# ---------------------------------------------------------------------------
_SLAB_SCALE = np.float32(1.0 + 6e-7)  # conservative tmax widening (ops/intersect.py)
_SLAB_LO = np.float32(1.0 - 6e-7)     # conservative entry-bound shrink
# Extra shrink applied before rounding entry bounds to bf16 (tin16):
# round-to-nearest can round UP by 2^-9 relative, so shrinking by 2^-8
# first keeps the stored bound a true lower bound. Conservative-only:
# blocks kept by a (slightly) smaller bound can never contain a hit
# that beats the best_t they were kept against, so radiometry stays
# bitwise-identical while the [nbs, br] refresh scratch and its reads
# halve:
_TIN16_SHRINK = np.float32(1.0 - 2.0 ** -8)


def _mega_kernel(sc_ref, rows_ref, cols_ref, p_ref, pay_ref, nrm_ref,
                 ap_ref, apay_ref, baabb_ref, bfine_ref, wmlp_ref, ebias_ref,
                 econ_ref,
                 accum_ref, done_ref,
                 bt_ref, bn_ref, bm_ref, ray_ref, sh_ref, ki_ref,
                 cull_ref, cullq_ref, tin_ref, env_ref, p_buf, pay_buf,
                 sems,
                 bflag_ref, wf_ref, cidx_ref, pbs_ref, mxl_ref,
                 *, br, nb, n_ap, R, J, spp, K, k_total=None, bundles=1,
                 max_path_length, roulette_start_depth, max_iters,
                 tan_theta, inv_w, inv_h, aspect, aa,
                 use_cull=True, sub=1, subq=1, compact=False, reflag=0,
                 fresh=False, near=False, pay_fused=False,
                 walk_unroll=1, pay_unroll=1, walk_mxu=False,
                 walk_cull2=False, tin16=False,
                 env_cfg=None,
                 env_every=1, env_count=0,
                 hbm=False, two_level=False, hbm_reflag=64,
                 hbm_cull3=False,
                 hbm_sub=1, hbm_wu=1, hbm_split=False,
                 hbm_pay_gate=True, hbm_pb_stage=False,
                 _timing_no_dots=False, _timing_no_walk=False,
                 _timing_cull_only=False, _timing_stub_walk=False,
                 _timing_const_pb=False,
                 _timing_double_pay=False, _timing_double_prep=False,
                 _timing_double_scan=False, _timing_double_refine=False,
                 _timing_double_dense=False, _timing_double_gate=False,
                 _timing_double_dense_fixed=False,
                 _timing_double_dma=False,
                 _timing_double_vdense=False,
                 _timing_double_vdense_const=False,
                 _timing_double_camera=False, _timing_double_bxdf=False,
                 _timing_double_rng=False, _timing_double_bank=False,
                 _count_oracle=False):
    # Timing-instrumentation ladder (each synthesizes a diffuse hit at
    # t=1 for every active lane, so radiometry is meaningless but
    # path-length statistics — and hence the cull flags driving the
    # walk — stay realistic; measured 2026-08-18, finding 48):
    #   _timing_no_walk:   no cull pass, no walk        -> F(br)
    #   _timing_cull_only: cull pass, no walk           -> F + cull
    #   _timing_stub_walk: cull pass, gated walk loop with a trivial
    #                      do_block body                -> F + cull + gates
    #   (full) - (stub)                                 -> dense-test work
    # Marginal-cost probes (radiometry/stats BITWISE unchanged — the
    # doubled region is idempotent, so the wall-time delta vs the base
    # run is an exact attribution with no path-statistic drift):
    #   _timing_double_pay:  run the deferred payload pass twice
    #   _timing_double_prep: run each segment's compact rank/extract twice
    #   _timing_double_scan:   (hbm) run each find_next scalar scan twice
    #   _timing_double_refine: (hbm) run each super's member-refinement
    #                          slab pass twice (bflag writes idempotent)
    #   _timing_double_dense:  (hbm) run each gated member dense test
    #                          twice (best_t improvements are strict <,
    #                          so the re-run writes nothing)
    #   _timing_double_gate:   (hbm) add a second, trivial-body pl.when
    #                          per member flag (marginal = gate cost)
    #   _timing_double_dense_fixed: (hbm) per gated member, run a dense-
    #                          chain TWIN that reads its p block from the
    #                          static pbs_ref scratch (garbage contents;
    #                          outputs folded into a diagnostic lane via a
    #                          never-true compare) — identical op sequence
    #                          at lane offsets 0..15 with no dynamic slot
    #                          base, so (marginal) vs the double_dense
    #                          marginal isolates the DMA-window read cost
    #   _timing_double_dma:    (hbm) re-issue + re-wait each super's two
    #                          DMAs after the first wait (same source,
    #                          same destination: marginal = DMA overhead)
    #   _timing_double_vdense: (VMEM compact walk) re-run each listed
    #                          window's full dense chain (strict-< merge
    #                          writes nothing: marginal = per-window
    #                          dense cost INCLUDING the pb dynamic-slice
    #                          load + column broadcasts)
    #   _timing_double_vdense_const: (VMEM compact walk) run a dense-
    #                          chain twin per listed window with every pb
    #                          column read + lane-broadcast replaced by a
    #                          blk-dependent offset of the tri-lane iota;
    #                          folded via a never-true compare. (vdense
    #                          marginal) - (this marginal) isolates the
    #                          pb load/slice/broadcast cost a broadcast-
    #                          free table layout would buy (finding 59;
    #                          valid unlike _timing_const_pb, whose
    #                          constant columns change hit semantics and
    #                          hence iteration counts)
    # All synth variants imply the _timing_no_dots payload handling:
    #   _timing_const_pb: full walk with the dense chain's identical op
    #                     sequence, but every pb COLUMN READ + lane-
    #                     broadcast replaced by a constant offset of the
    #                     loop-invariant tri-lane iota (already [TBW, WQ]
    #                     — no loads, no relayouts). (nodots) - (constpb)
    #                     isolates the per-window column-slice/broadcast
    #                     cost a broadcast-free table layout would buy:
    if _timing_double_vdense or _timing_double_vdense_const:
        if not (compact and subq == 1) or walk_mxu:
            raise ValueError(
                "_timing_double_vdense[_const] probes instrument the "
                "compacted subq==1 non-MXU walk only")
    _timing_synth = (_timing_no_walk or _timing_cull_only
                     or _timing_stub_walk or _timing_const_pb)
    _timing_no_dots = _timing_no_dots or _timing_synth
    i = pl.program_id(0)
    f32 = jnp.float32
    i32 = jnp.int32
    seed = sc_ref[0]
    n_valid = sc_ref[1]
    # Pixel-group offset (round 5): this dispatch serves padded-stream
    # rows [j0, j0 + J) of a K_TOTAL-path global schedule. With j0=0 and
    # k_total=K (the defaults) every expression below reduces to the
    # single-dispatch form; with a group split, pid and pixel mappings
    # match the global schedule exactly, so the union of group dispatches
    # is bitwise-identical to one full dispatch (render/streaming.py
    # readback/compute overlap).
    j0 = sc_ref[2]
    K_tot = K if k_total is None else k_total
    pid0 = j0 * spp                                    # i32 scalar

    # Bundle-lockstep (finding 66): each program advances B independent
    # br-lane bundles per iteration. Per-lane state is held as [B, br]
    # blocks (bundles on sublanes), so at B=8 every elementwise
    # shading/RNG/regen op fills whole vregs instead of one sublane in
    # eight — the fixed/rest pool amortises ~B-fold — while the cull /
    # walk / payload passes run per bundle on row slices, preserving
    # the measured br-wide walk economy exactly. Per-lane arithmetic,
    # RNG streams and walk order are unchanged, so radiometry is
    # bitwise-identical to B=1 (gated in test_megakernel_variants).
    B = bundles
    lane = jax.lax.broadcasted_iota(i32, (B, br), 1)
    brow = jax.lax.broadcasted_iota(i32, (B, br), 0)
    slot = (i * B + brow) * br + lane                  # [B, br] global slot
    # Per-slot path budget: slot s serves padded-stream pixels
    # {s + j0*R, s + (j0+1)*R, ..}; rows with pixel >= n_valid are
    # padding and get no paths:
    valid_j = jnp.clip(-((slot - n_valid) // R) - j0, 0, J)
    k_cap = valid_j * spp

    j_iota = jax.lax.broadcasted_iota(i32, (J, br), 0)
    riota = jax.lax.broadcasted_iota(i32, (3 * J, br), 0)
    jsel = riota // 3
    csel = riota % 3

    def _bcols(b):
        """Lane-column slice of bundle ``b`` in a [rows, B*br] block.
        Static python slice — ``b`` is always a python int (unrolled
        bundle loops), and a static slice lowers without the
        dynamic-slice machinery a pl.ds would invoke."""
        return slice(b * br, (b + 1) * br)

    def _gather_rows(ref, rows_):
        """Stack the given ref rows into one [B, br]-style block."""
        if len(rows_) == 1:
            return ref[rows_[0]:rows_[0] + 1, :]
        return jnp.concatenate(
            [ref[r:r + 1, :] for r in rows_], axis=0)

    def camera_ray(k):
        """Fresh camera ray for path k of each slot; component tuples of
        [B, br] bundle blocks (finding 66 layout)."""
        j = k // spp                                       # [B, br]
        pid = slot * K_tot + pid0 + k
        g1, g2 = _normal2(pid, jnp.broadcast_to(seed, (B, br)),
                          jnp.full_like(pid, np.int32(0xCA3)))
        prs, pcs = [], []
        for b in range(B):
            jm = j_iota == j[b:b + 1, :]
            prs.append(jnp.sum(jnp.where(jm, rows_ref[:, _bcols(b)], 0.0),
                               axis=0, keepdims=True))
            pcs.append(jnp.sum(jnp.where(jm, cols_ref[:, _bcols(b)], 0.0),
                               axis=0, keepdims=True))
        pr = prs[0] if B == 1 else jnp.concatenate(prs, axis=0)
        pc = pcs[0] if B == 1 else jnp.concatenate(pcs, axis=0)
        pu = pr + np.float32(aa) * g1
        pv = pc + np.float32(aa) * g2
        xn = pv * np.float32(inv_w) - 0.5
        yn = pu * np.float32(inv_h) - 0.5
        dx = np.float32(2.0 * aspect * tan_theta) * xn
        dy = np.float32(-2.0 * tan_theta) * yn
        dz = jnp.full_like(dx, -1.0)
        d = _normalize3((dx, dy, dz))
        # offset_ray_origin(0, d, (0,0,1)): mag=1, sign=sign(dz)=-1 always:
        o = (jnp.zeros_like(dx), jnp.zeros_like(dx),
             jnp.full_like(dx, np.float32(-RAY_EPSILON)))
        return o, d

    # ---- init slot pool --------------------------------------------------
    accum_ref[:] = jnp.zeros((3 * J, B * br), f32)
    k0 = jnp.zeros((B, br), i32)
    o0, d0 = camera_ray(k0)
    for c in range(3):
        ray_ref[c * B:(c + 1) * B, :] = o0[c]
        ray_ref[(3 + c) * B:(4 + c) * B, :] = d0[c]
    sh_ref[0:3 * B, :] = jnp.ones((3 * B, br), f32)      # throughput
    sh_ref[3 * B:6 * B, :] = jnp.zeros((3 * B, br), f32)  # colour
    ki_ref[0:B, :] = k0                                   # k
    ki_ref[B:2 * B, :] = jnp.zeros((B, br), i32)          # bounce
    ki_ref[2 * B:3 * B, :] = (k_cap > 0).astype(i32)      # active
    ki_ref[3 * B:4 * B, :] = jnp.zeros((B, br), i32)      # done count
    ki_ref[4 * B:5 * B, :] = jnp.zeros((B, br), i32)      # blocks counter
    ki_ref[5 * B:6 * B, :] = jnp.zeros((B, br), i32)      # pending-env
    ki_ref[6 * B:7 * B, :] = jnp.zeros((B, br), i32)      # oracle diag
    ki_ref[7 * B:8 * B, :] = jnp.full((B, br), -1, i32)   # winner tri row

    def body(carry):
        it, _ = carry
        o = (ray_ref[0:B, :], ray_ref[B:2 * B, :], ray_ref[2 * B:3 * B, :])
        d = (ray_ref[3 * B:4 * B, :], ray_ref[4 * B:5 * B, :],
             ray_ref[5 * B:6 * B, :])
        # Per-lane |o|_inf for the watertight acceptance bound (see
        # utils/constants.py WATERTIGHT_EPS_SCALE):
        o_mag = jnp.maximum(jnp.maximum(jnp.abs(o[0]), jnp.abs(o[1])),
                            jnp.abs(o[2]))
        active = ki_ref[2 * B:3 * B, :] != 0
        k = ki_ref[0:B, :]
        bounce = ki_ref[B:2 * B, :]
        pid = slot * K_tot + pid0 + k

        t_max = jnp.where(active, _INF, f32(-1.0))
        bt_ref[:] = t_max
        bn_ref[:] = jnp.zeros((8 * B, br), f32)
        bm_ref[:] = jnp.zeros((8 * B, br), f32)

        # ---- block culling: slab-test every (sub-)block AABB against the
        # live bundle once, vectorised, then drive scalar-predicated skips
        # off the precomputed flags. (Evolving per-block tests against
        # best_t — sorted walks, per-lane settle checks — were tried and
        # LOSE: each data-dependent vector->scalar reduce serialises the
        # pipeline; see PROGRESS.md finding 25.) This is the SIMD-width
        # analogue of the reference's per-ray BVH culling
        # (ref: include/CompactBvh.hpp:80-139):
        nbs = nb * sub
        # Two-level flag computation (walk_cull2): the flat [nbs, br]
        # slab pass below is skipped; flags/entry bounds come from the
        # coarse-then-refine pass after compact_indices is defined
        # (deferred only in Python source order — no ref ops happen in
        # between, so trace order is identical):
        cull2 = (walk_cull2 and use_cull and compact and subq == 1
                 and B == 1 and not hbm and not _count_oracle
                 and not _timing_no_walk)
        # Third cull level for the HBM super walk (round 5): coarse
        # super-group pass + refinement replaces the flat [nbs, br]
        # super slab pass below:
        cull3 = (hbm_cull3 and hbm and use_cull and B == 1
                 and not _timing_no_walk)
        def tin_store(bhit, tin):
            v = jnp.where(bhit, tin * _SLAB_LO, _INF)
            if tin16:
                v = (v * _TIN16_SHRINK).astype(jnp.bfloat16)
            return v

        if use_cull and not _timing_no_walk:
            den = (jnp.where(d[0] == 0.0, f32(1e-30), d[0]),
                   jnp.where(d[1] == 0.0, f32(1e-30), d[1]),
                   jnp.where(d[2] == 0.0, f32(1e-30), d[2]))
            inv = (1.0 / den[0], 1.0 / den[1], 1.0 / den[2])
        for bc in range(B if use_cull and not _timing_no_walk else 0):
            o_b = tuple(c[bc:bc + 1, :] for c in o)
            inv_b = tuple(c[bc:bc + 1, :] for c in inv)
            act_b = active[bc:bc + 1, :]
            # Chunk the slab pass over AABB rows: the pass is pure
            # elementwise math, but its [rows, br] temporaries are scoped
            # VMEM — at HBM scale (2045 supers x br 512 for the 2M-tri
            # heightfield) an unchunked pass keeps ~8 live [nbs, br]
            # slabs (~33 MB) on the kernel stack and fails to compile.
            # Chunks scale with bundle width so the live working set
            # stays ~[512x512] regardless of br. Pure loop structure:
            # every row's arithmetic is unchanged, results bitwise:
            _CH = max(8, (SLAB_CHUNK_ROWS * 512) // max(br, 512))
            for c0 in range(0, 0 if (cull2 or cull3) else nbs, _CH):
                nrows = min(_CH, nbs - c0)
                rs = pl.ds(c0, nrows)
                tin = jnp.full((nrows, br), f32(0.0))
                tout = jnp.where(act_b, _BIG, f32(-1.0))
                for a in range(3):
                    lo_a = baabb_ref[rs, a:a + 1]
                    hi_a = baabb_ref[rs, a + 3:a + 4]
                    t0 = (lo_a - o_b[a]) * inv_b[a]
                    t1 = (hi_a - o_b[a]) * inv_b[a]
                    tl = jnp.minimum(t0, t1)
                    th = jnp.maximum(t0, t1) * _SLAB_SCALE
                    tin = jnp.maximum(tin, tl)
                    tout = jnp.minimum(tout, th)
                # Fully-empty padding blocks carry inverted AABBs (lo=+inf,
                # hi=-inf) whose slab interval degenerates to (-inf, +inf)
                # under this formulation — mask them out by the finite-lo
                # test so they never flag (they cannot produce hits, only
                # wasted walks):
                bhit = (tin <= tout) & (baabb_ref[rs, 0:1] < _BIG)
                bh_i = bhit.astype(i32)
                cull_ref[rs, bc:bc + 1] = jnp.max(bh_i, axis=1,
                                                  keepdims=True)
                # Sub-bundle (lane-quarter) flags: a random width-(br/subq)
                # slice of an incoherent bundle needs far fewer blocks than
                # the full union (experiments/subbundle_sim.py: Q=4 cuts
                # pair-ops 1.86x on the production lane mix with NO ray
                # sorting — the union's width effect, not coherence), so
                # the walk tests each flagged quarter separately:
                if subq > 1 and not (hbm or two_level):
                    # Only the flat walk reads cullq (two-level/HBM
                    # quarter at the dense level via bflag instead):
                    wq = br // subq
                    for qq in range(subq):
                        cullq_ref[rs, qq:qq + 1] = jnp.max(
                            bh_i[:, qq * wq:(qq + 1) * wq],
                            axis=1, keepdims=True)
                if reflag > 0 or fresh:
                    # Conservative per-lane lower bound on any hit t in
                    # each block, kept for mid-walk flag refreshes and/or
                    # the fresh per-group walk gates (bundle bc's lane
                    # columns when B > 1):
                    tin_ref[rs, _bcols(bc)] = tin_store(bhit, tin)

        TBW = TB // sub
        WQ = br // subq
        use_mxu = (walk_mxu and compact and subq == 1 and B == 1
                   and not hbm and not _timing_synth)
        if use_mxu:
            # MXU walk (walk_mxu): one [U*TBW, 16] x [16, 6*br] HIGHEST
            # matmul per unroll group replaces the 6 per-window VPU
            # coefficient-dot chains (~30 of the dense test's ~65
            # ops/pair). The RHS is built once per bounce iteration —
            # row 3+a multiplies p column 3+a (the tri normal), rows
            # 6:9 / 9:12 the two barycentric gradients; lane group g of
            # the output holds (on, dn, og1, dg1, og2, dg2)[g]. Rows
            # 0:3 and 12:16 are zero, so the p-value/eps columns
            # contribute exact zeros to every group:
            _z1 = jnp.zeros((1, br), f32)
            _z3 = jnp.zeros((3, 6 * br), f32)

            def _r6(vals):
                return jnp.concatenate(vals, axis=1)

            mxr = jnp.concatenate(
                [_z3]
                + [_r6([o[a], d[a], _z1, _z1, _z1, _z1]) for a in range(3)]
                + [_r6([_z1, _z1, o[a], d[a], _z1, _z1]) for a in range(3)]
                + [_r6([_z1, _z1, _z1, _z1, o[a], d[a]]) for a in range(3)]
                + [jnp.zeros((4, 6 * br), f32)], axis=0)   # [16, 6*br]

        def compact_indices(fl_col, base):
            """Write the row indices of the set entries of ``fl_col`` (a
            [L, 1] i32 0/1 column; indices offset by ``base``) into
            ``cidx_ref[:, 0]`` in ascending order; return the count as a
            traced i32 scalar. Ranks come from triangular-ones matmuls
            (Pallas TPU lowers no cumsum; the MXU prefix-count is exact
            under precision=HIGHEST — default f32 dots round inputs
            through bf16, finding 14). excl/incl are the exclusive /
            inclusive counts as ROW vectors so the index-extraction dot
            lands column-major: the consumers need cidx sublane-major
            because Mosaic only allows DYNAMIC scalar indexing on the
            sublane axis."""
            L = fl_col.shape[0]
            fl = fl_col.astype(f32)
            ri = jax.lax.broadcasted_iota(i32, (L, L), 0)
            ci = jax.lax.broadcasted_iota(i32, (L, L), 1)
            # Every dot operand here is exactly representable in bf16:
            # flags and comparison masks are 0/1, and the extracted row
            # index is kept RELATIVE (0..L-1; ``base`` is added back as
            # an integer AFTER the dot), so the cheap DEFAULT path
            # (inputs rounded through bf16, f32 accumulate) is EXACT
            # whenever L <= 256. Larger flag columns must be chunked by
            # the caller (the compact walk splits its segment bounds at
            # _COMPACT_SEG rows); HIGHEST (~6x the passes) covers any
            # explicit oversize call:
            _hi = (jax.lax.Precision.DEFAULT if L <= 256
                   else jax.lax.Precision.HIGHEST)
            nd0 = (((0,), (0,)), ((), ()))
            excl = jax.lax.dot_general(      # [1, L] set rows j < i
                fl, (ri < ci).astype(f32), nd0,
                precision=_hi, preferred_element_type=f32)
            incl = jax.lax.dot_general(      # [1, L] set rows j <= i
                fl, (ri <= ci).astype(f32), nd0,
                precision=_hi, preferred_element_type=f32)
            _CW = 128
            kio = jax.lax.broadcasted_iota(
                i32, (_CW, L), 0).astype(f32)    # list slot per row
            rowidx = jax.lax.broadcasted_iota(
                i32, (L, 1), 0).astype(f32)      # RELATIVE row index
            for k0 in range(0, L, _CW):
                onehot = ((excl == (kio + f32(k0)))
                          & (incl == (kio + f32(k0 + 1)))
                          ).astype(f32)          # [_CW, L]
                cidx_ref[k0:k0 + _CW, 0:1] = (jax.lax.dot_general(
                    onehot, rowidx, (((1,), (0,)), ((), ())),
                    precision=_hi,
                    preferred_element_type=f32).astype(i32) + i32(base))
            return jnp.sum(fl).astype(i32)

        if cull2:
            # ---- two-level flag pass (walk_cull2): slab-test 8-fine-row
            # COARSE groups first (bfine_ref carries their exact host-side
            # min/max union AABBs in this mode), compact the flagged group
            # ids, then recompute only those groups' fine rows. f32 slab
            # arithmetic is monotonic, so a coarse box that contains a
            # fine box yields tin_c <= tin_f and tout_c >= tout_f at
            # every rounding step — any fine row the flat pass would flag
            # belongs to a flagged group, and the refinement writes the
            # flat pass's flags/entry bounds bit-for-bit on every row it
            # visits. Rows of unflagged groups are zeroed up front (and
            # mid-walk refreshes AND with the current flags so their
            # stale tin_ref rows cannot re-flag) — the walk is therefore
            # bitwise-identical to the flat pass at a fraction of its
            # [nbs, br] slab cost when flagged groups are sparse:
            NC = bfine_ref.shape[0]
            cull_ref[:] = jnp.zeros((nbs, 1), i32)
            for c0 in range(0, NC, _COMPACT_SEG):
                Lc = min(_COMPACT_SEG, NC - c0)
                tin_c = jnp.full((Lc, br), f32(0.0))
                tout_c = jnp.where(active, _BIG, f32(-1.0))
                for a in range(3):
                    lo_a = bfine_ref[c0:c0 + Lc, a:a + 1]
                    hi_a = bfine_ref[c0:c0 + Lc, a + 3:a + 4]
                    t0 = (lo_a - o[a]) * inv[a]
                    t1 = (hi_a - o[a]) * inv[a]
                    tin_c = jnp.maximum(tin_c, jnp.minimum(t0, t1))
                    tout_c = jnp.minimum(
                        tout_c, jnp.maximum(t0, t1) * _SLAB_SCALE)
                chit = ((tin_c <= tout_c)
                        & (bfine_ref[c0:c0 + Lc, 0:1] < _BIG))
                cnt_c = compact_indices(
                    jnp.max(chit.astype(i32), axis=1, keepdims=True), c0)

                def c2body(k, cnt_c=cnt_c):
                    # Tail slots clamp to the last flagged group —
                    # re-refining a group rewrites identical values:
                    gs = [cidx_ref[k, 0]] + [
                        cidx_ref[jnp.minimum(k + u, cnt_c - 1), 0]
                        for u in range(1, _CULL2_UNROLL)]
                    for g in gs:
                        rows = pl.ds(g * 8, 8)
                        tin = jnp.full((8, br), f32(0.0))
                        tout = jnp.where(active, _BIG, f32(-1.0))
                        for a in range(3):
                            lo_a = baabb_ref[rows, a:a + 1]
                            hi_a = baabb_ref[rows, a + 3:a + 4]
                            t0 = (lo_a - o[a]) * inv[a]
                            t1 = (hi_a - o[a]) * inv[a]
                            tin = jnp.maximum(tin, jnp.minimum(t0, t1))
                            tout = jnp.minimum(
                                tout, jnp.maximum(t0, t1) * _SLAB_SCALE)
                        bhit = ((tin <= tout)
                                & (baabb_ref[rows, 0:1] < _BIG))
                        cull_ref[rows, :] = jnp.max(
                            bhit.astype(i32), axis=1, keepdims=True)
                        if reflag > 0 or fresh:
                            tin_ref[rows, :] = tin_store(bhit, tin)
                    return k + _CULL2_UNROLL

                jax.lax.while_loop(lambda k: k < cnt_c, c2body, i32(0))

        if cull3:
            # ---- third cull level (HBM walk, round 5): slab-test the
            # coarse super-GROUP union AABBs (appended to baabb_ref at
            # rows [nbs, nbs + ceil(nbs/SB))), compact the flagged group
            # ids, then recompute only those groups' supers — the
            # walk_cull2 monotonic-containment argument one level up:
            # any super the flat [nbs, br] pass would flag lives in a
            # flagged group, and refinement rewrites the flat pass's
            # flags/entry bounds bit-for-bit on every row it visits.
            # Unvisited rows hold flag 0 and an INF entry bound — exactly
            # what the flat pass writes for missed supers, so the
            # periodic mid-walk refresh (which recomputes flags from
            # tin_ref WITHOUT an and-mask) stays bitwise too:
            nsg = -(-nbs // SB)
            cull_ref[:] = jnp.zeros((nbs, 1), i32)
            if reflag > 0 or fresh:
                tin_ref[:] = jnp.full((nbs, br), _INF, tin_ref.dtype)
            for c0 in range(0, nsg, _COMPACT_SEG):
                Lc = min(_COMPACT_SEG, nsg - c0)
                tin_c = jnp.full((Lc, br), f32(0.0))
                tout_c = jnp.where(active, _BIG, f32(-1.0))
                for a in range(3):
                    lo_a = baabb_ref[nbs + c0:nbs + c0 + Lc, a:a + 1]
                    hi_a = baabb_ref[nbs + c0:nbs + c0 + Lc, a + 3:a + 4]
                    t0 = (lo_a - o[a]) * inv[a]
                    t1 = (hi_a - o[a]) * inv[a]
                    tin_c = jnp.maximum(tin_c, jnp.minimum(t0, t1))
                    tout_c = jnp.minimum(
                        tout_c, jnp.maximum(t0, t1) * _SLAB_SCALE)
                chit = ((tin_c <= tout_c)
                        & (baabb_ref[nbs + c0:nbs + c0 + Lc, 0:1] < _BIG))
                cnt_c = compact_indices(
                    jnp.max(chit.astype(i32), axis=1, keepdims=True), c0)

                def c3body(k, cnt_c=cnt_c):
                    # Tail slots clamp to the last flagged group
                    # (idempotent rewrites). nbs is padded to %SB by the
                    # wrapper, so windows are whole SB-aligned slices —
                    # Mosaic proves g*SB sublane alignment statically:
                    gs = [cidx_ref[k, 0]] + [
                        cidx_ref[jnp.minimum(k + u, cnt_c - 1), 0]
                        for u in range(1, _CULL2_UNROLL)]
                    for g in gs:
                        rows = pl.ds(g * SB, SB)
                        tin = jnp.full((SB, br), f32(0.0))
                        tout = jnp.where(active, _BIG, f32(-1.0))
                        for a in range(3):
                            lo_a = baabb_ref[rows, a:a + 1]
                            hi_a = baabb_ref[rows, a + 3:a + 4]
                            t0 = (lo_a - o[a]) * inv[a]
                            t1 = (hi_a - o[a]) * inv[a]
                            tin = jnp.maximum(tin, jnp.minimum(t0, t1))
                            tout = jnp.minimum(
                                tout, jnp.maximum(t0, t1) * _SLAB_SCALE)
                        bhit = ((tin <= tout)
                                & (baabb_ref[rows, 0:1] < _BIG))
                        cull_ref[rows, :] = jnp.max(
                            bhit.astype(i32), axis=1, keepdims=True)
                        if reflag > 0 or fresh:
                            tin_ref[rows, :] = tin_store(bhit, tin)
                    return k + _CULL2_UNROLL

                jax.lax.while_loop(lambda k: k < cnt_c, c3body, i32(0))

        # Loop-invariant across every walked window (Mosaic does not
        # hoist out of while_loop bodies; building it per window costs
        # ~2 vops/pair in the hottest loop):
        tri_lane_c = jax.lax.broadcasted_iota(i32, (TB // sub, br // subq),
                                              0)

        def do_block(blk, q=0, mx=None, b=0):
            if _timing_stub_walk:
                # Trivial body: the gate fires and the region is entered,
                # but no dense work runs — isolates per-invocation
                # overhead (scalar branch + pipeline refill):
                bt_ref[:] = bt_ref[:] + f32(1e-30)
                return
            # With subq > 1 the dense test runs on one width-WQ lane
            # quarter (static q, 128-aligned slices) — same math, same
            # merge order, bitwise-identical per-lane results; a lane
            # only ever needs blocks its own slab interval admits, so
            # quarter flags are as conservative as bundle flags:
            if subq == 1:
                best_t = bt_ref[b:b + 1, :]
                if B == 1:
                    oq, dq, omq = o, d, o_mag
                else:
                    oq = tuple(c[b:b + 1, :] for c in o)
                    dq = tuple(c[b:b + 1, :] for c in d)
                    omq = o_mag[b:b + 1, :]
            else:
                # Load the quarter straight from the refs: lane-slicing an
                # already-loaded vector gives it an offset layout Mosaic
                # cannot broadcast ("Invalid input layout" on hardware;
                # q*WQ is 128-aligned so these loads are tile-aligned and
                # canonical). omq is recomputed from the loads — same
                # maths as o_mag, bitwise-identical per lane:
                lq = slice(q * WQ, (q + 1) * WQ)
                best_t = bt_ref[:, pl.ds(q * WQ, WQ)]
                oq = (ray_ref[0:1, lq], ray_ref[1:2, lq], ray_ref[2:3, lq])
                dq = (ray_ref[3:4, lq], ray_ref[4:5, lq], ray_ref[5:6, lq])
                omq = jnp.maximum(jnp.maximum(jnp.abs(oq[0]),
                                              jnp.abs(oq[1])),
                                  jnp.abs(oq[2]))
            if mx is None:
                if _timing_const_pb:
                    # Timing probe (see the ladder note): identical op
                    # sequence, but column reads come from constant
                    # offsets of the pre-built iota — no dynamic-slice
                    # load, no [TBW, 1] -> [TBW, WQ] lane-broadcasts.
                    # Distinct offsets keep Mosaic from CSE-collapsing
                    # the chains:
                    _tlf = tri_lane_c.astype(f32)

                    def _col(c):
                        return _tlf + f32(0.01 * (c + 1))
                else:
                    pb = p_ref[pl.ds(blk * TBW, TBW), :]   # [TBW, 16]

                    def _col(c):
                        return pb[:, c:c + 1]

                def tdot(c0, rr):
                    return (_col(c0) * rr[0]
                            + _col(c0 + 1) * rr[1]
                            + _col(c0 + 2) * rr[2])

                on = tdot(3, oq)
                dn = tdot(3, dq)
                og1 = tdot(6, oq)
                dg1 = tdot(6, dq)
                og2 = tdot(9, oq)
                dg2 = tdot(9, dq)
            else:
                # MXU walk (walk_mxu): the six coefficient dots arrive
                # precomputed from one HIGHEST-precision group matmul
                # (see the cbody batching); pb is the staged scratch copy
                # of this window's p rows (lane offset 0, static sublane
                # offset). HIGHEST's 6-pass bf16x3 split error is
                # f32-comparable but NOT identical to the VPU FMA chain,
                # so the acceptance band below widens by _MXU_BAND:
                pb, on, dn, og1, dg1, og2, dg2 = mx

                def _col(c):
                    return pb[:, c:c + 1]
            tnp0 = _col(0)
            g1p0 = _col(1)
            g2p0 = _col(2)
            r = pl.reciprocal(dn, approx=True)
            r = r * (2.0 - dn * r)
            t = (tnp0 - on) * r
            b1 = og1 + t * dg1 - g1p0
            b2 = og2 + t * dg2 - g2p0
            # Watertight acceptance: widen the barycentric band by the
            # rigorous per-pair rounding bound so a true shared-edge
            # point always passes in at least one incident triangle
            # (constants.py WATERTIGHT_EPS_SCALE derivation; ref
            # src/Mesh.cpp:8-104 contract):
            et = (_col(14) + jnp.abs(on)) * jnp.abs(r)
            band = _col(12) + _col(13) * (omq + et)
            if mx is not None:
                # HIGHEST matmul error bound: each f32 operand splits
                # into 3 bf16 terms (24 mantissa bits, residuals exact),
                # 6 of the 9 cross products are accumulated in f32 and
                # the dropped terms are < 2^-24 relative — per-dot error
                # is a small-constant multiple of the VPU chain's
                # gamma_4 bound. WATERTIGHT_EPS_SCALE already carries a
                # 2x safety factor (constants.py); doubling the band
                # again strictly dominates the split error while staying
                # ~1e-5 relative (the 1e-3 grazing clamp is unchanged).
                # Gated by tests/test_watertight.py adversarial scenes
                # run with walk_mxu forced:
                band = band * np.float32(2.0)
            eps = jnp.minimum(band, np.float32(1e-3))
            ok = ((jnp.minimum(b1, b2) >= -eps) & (b1 + b2 <= 1.0 + eps)
                  & (t > 0.0))
            tm = jnp.where(ok, t, _INF)
            bt = jnp.min(tm, axis=0, keepdims=True)
            bi = jnp.min(jnp.where(tm <= bt, tri_lane_c, i32(0x7FFFFFFF)),
                         axis=0, keepdims=True)
            better = (bt < best_t) & (bt < _INF)
            if _timing_no_dots:
                if subq == 1:
                    bt_ref[b:b + 1, :] = jnp.where(better, bt, best_t)
                else:
                    bt_ref[:, pl.ds(q * WQ, WQ)] = jnp.where(
                        better, bt, best_t)
                return
            # DEFERRED payload: the walk records ONLY the winner's global
            # triangle row (one merged write); barycentrics are re-derived
            # in the post-walk pass from a one-hot extraction of the
            # winner's p-row — the same arithmetic on [1, br] vectors, so
            # the payload stays bitwise identical while the walk drops the
            # per-pair winner-extraction ops (sel + two masked sums,
            # ~6 VPU ops/pair; the normal/material MXU dots were already
            # deferred — round-2 measured them inline at ~9% of kernel
            # time):
            row_g = bi + blk * TBW                    # global tri row
            # Lexicographic (t, row) winner merge — only under reordered
            # walks (near): within a window the min-row tie-break above
            # picks the lowest tri row at the winning t; the explicit
            # equal-t clause extends that across windows, making the
            # folded result WALK-ORDER-INDEPENDENT (min over (t, row)
            # pairs). Ascending-index walks produce exactly this result
            # already (a later window's rows are strictly larger, so
            # equal-t keeps the first = lowest row) — the clause is
            # semantically a no-op there and is skipped to save its
            # ~4 [1, br] vops/window. The skip contracts stay safe
            # under reordering: stored entry bounds are STRICTLY below
            # any contained hit t (_SLAB_LO / _TIN16_SHRINK shrink), so
            # a window containing an equal-t lower-row candidate still
            # compares tin < best_t and is never dropped:
            if subq == 1:
                win_r = 7 * B + b
                upd = better
                if near:
                    upd = better | ((bt == best_t) & (bt < _INF)
                                    & (row_g < ki_ref[win_r:win_r + 1, :]))
                bt_ref[b:b + 1, :] = jnp.where(better, bt, best_t)
                ki_ref[win_r:win_r + 1, :] = jnp.where(
                    upd, row_g, ki_ref[win_r:win_r + 1, :])
            else:
                lcs = pl.ds(q * WQ, WQ)
                bt_ref[:, lcs] = jnp.where(better, bt, best_t)
                ki_ref[7:8, lcs] = jnp.where(better, row_g,
                                             ki_ref[7:8, lcs])

        def _vdense_const_probe(blk):
            # Dense-chain twin of do_block (subq==1) with every pb column
            # read + lane-broadcast replaced by a blk-dependent offset of
            # the loop-invariant tri-lane iota — no dynamic-slice window
            # load, no [TBW, 1] -> [TBW, br] relayouts; the blk term keeps
            # the unrolled group's twins CSE-distinct (the flaw that
            # invalidated running _timing_const_pb under the unrolled
            # compact walk). Results fold into the oracle-diag lane via a
            # never-true compare so radiometry and walk statistics stay
            # bitwise-identical; see the probe-ladder note (finding 59):
            base = jnp.asarray(blk).astype(f32) + tri_lane_c.astype(f32)

            def _col(c):
                return base + f32(0.01 * (c + 1))

            def tdot(c0, rr):
                return (_col(c0) * rr[0] + _col(c0 + 1) * rr[1]
                        + _col(c0 + 2) * rr[2])

            on = tdot(3, o)
            dn = tdot(3, d)
            og1 = tdot(6, o)
            dg1 = tdot(6, d)
            og2 = tdot(9, o)
            dg2 = tdot(9, d)
            r = pl.reciprocal(dn, approx=True)
            r = r * (2.0 - dn * r)
            t = (_col(0) - on) * r
            b1 = og1 + t * dg1 - _col(1)
            b2 = og2 + t * dg2 - _col(2)
            et = (_col(14) + jnp.abs(on)) * jnp.abs(r)
            band = _col(12) + _col(13) * (o_mag + et)
            eps = jnp.minimum(band, np.float32(1e-3))
            ok = ((jnp.minimum(b1, b2) >= -eps) & (b1 + b2 <= 1.0 + eps)
                  & (t > 0.0))
            tm = jnp.where(ok, t, _INF)
            bt = jnp.min(tm, axis=0, keepdims=True)
            bi = jnp.min(jnp.where(tm <= bt, tri_lane_c, i32(0x7FFFFFFF)),
                         axis=0, keepdims=True)
            better = (bt < bt_ref[:]) & (bt < _INF)
            ki_ref[6:7, :] = ki_ref[6:7, :] + (
                better & (bt == f32(12345.678e12))
                & (bi == i32(-777))).astype(i32)

        if _timing_no_dots:
            # Plausible fixed material so path statistics stay realistic:
            bn_ref[2:3, :] = jnp.ones((1, br), f32)      # normal (0,0,1)
            bn_ref[3:6, :] = jnp.full((3, br), 0.6, f32)  # albedo

        if _timing_no_walk or _timing_cull_only:
            # Synthetic hit at t=1 for every active lane; no walk at all:
            bt_ref[:] = jnp.where(active, f32(1.0), t_max)
        elif hbm:
            # ---- HBM-streamed walk: the scene lives in HBM; each flagged
            # *super* (SB blocks, tables.py) streams its p/nrm slabs through
            # a double-buffered VMEM window while the previous super's dense
            # tests run. A scalar lookahead finds the next flagged super so
            # the prefetch always targets real work. This fuses the
            # reference's 2-stage DRAM pipeline (ref: src/IpuScene.cpp:
            # 583-618) with the in-kernel bounce loop — unbounded scene
            # size at megakernel iteration cost:
            TBH = TB // hbm_sub       # dense rows per gated sub-slab
            SBH = SB * hbm_sub        # refine rows / gates per super

            def dmas(slot, sup):
                # VMEM-sized scenes: one fused pn8 super = a dense
                # [PN_SUPER, SB*16] f32 slab — rows [0, TB) the p8 block
                # columns (block b at columns [b*16, (b+1)*16)), rows
                # [TB, PN_SUPER) the members' nrm payload chunks; ONE
                # DMA per super. Above the VMEM ceiling (hbm_split) the
                # payload rides the separate bf16 pay8 table — a second,
                # HALF-size DMA per super (tables.py pay8 contract):
                if hbm_split:
                    return (
                        pltpu.make_async_copy(
                            p_ref.at[pl.ds(sup * TB, TB), :],
                            p_buf.at[slot], sems.at[slot, 0]),
                        pltpu.make_async_copy(
                            pay_ref.at[pl.ds(sup * SB * 24, SB * 24), :],
                            pay_buf.at[slot], sems.at[slot, 1]),
                    )
                return (
                    pltpu.make_async_copy(
                        p_ref.at[pl.ds(sup * PNS, PNS), :],
                        p_buf.at[slot], sems.at[slot, 0]),
                )

            def find_next(j0):
                def fc(j):
                    return ((j < nbs)
                            & (cull_ref[jnp.minimum(j, nbs - 1), 0] == 0))
                return jax.lax.while_loop(fc, lambda j: j + 1, j0)

            cur0 = find_next(i32(0))

            @pl.when(cur0 < nbs)
            def _start0():
                for dma in dmas(0, cur0):
                    dma.start()

            def wbody(c):
                cur, cnt = c
                slot = jnp.bitwise_and(cnt, 1)
                if reflag > 0:
                    # Periodic refresh of the remaining flags against the
                    # converged best_t (finding 25): supers whose customers
                    # all found nearer hits drop out of the walk. Visited
                    # supers re-flagging is harmless — cur is monotonic.
                    # Cadence is a static knob (power of two supers):
                    _m = i32(hbm_reflag - 1)

                    @pl.when(jnp.bitwise_and(cnt, _m) == _m)
                    def _refresh():
                        rem = tin_ref[:] < bt_ref[:]
                        cull_ref[:] = jnp.max(
                            rem.astype(i32), axis=1, keepdims=True)
                nxt = find_next(cur + 1)
                if _timing_double_scan:
                    # find_next is pure: the re-run's marginal wall time
                    # IS the scalar scan cost:
                    nxt = find_next(cur + 1)

                @pl.when(nxt < nbs)
                def _startn():
                    for dma in dmas(1 - slot, nxt):
                        dma.start()

                for dma in dmas(slot, cur):
                    dma.wait()
                if _timing_double_dma:
                    # Same source, same destination — marginal wall time
                    # IS the per-super DMA issue/wait overhead:
                    for dma in dmas(slot, cur):
                        dma.start()
                    for dma in dmas(slot, cur):
                        dma.wait()

                # Block-level refinement inside the flagged super: one
                # vectorised [SB, br] slab pass against the member block
                # AABBs + the *current* best_t, one lane-reduce, then
                # scalar-gated dense tests (skips blocks the bundle passes
                # beside, and blocks whose customers already settled):
                def refine(cur=cur):
                    blo = [bfine_ref[pl.ds(cur * SBH, SBH), a:a + 1]
                           for a in range(3)]
                    bhi = [bfine_ref[pl.ds(cur * SBH, SBH), a + 3:a + 4]
                           for a in range(3)]
                    tin_s = jnp.zeros((SBH, br), f32)
                    tout_s = jnp.where(active, _BIG, f32(-1.0))
                    for a in range(3):
                        t0_ = (blo[a] - o[a]) * inv[a]
                        t1_ = (bhi[a] - o[a]) * inv[a]
                        tin_s = jnp.maximum(tin_s, jnp.minimum(t0_, t1_))
                        tout_s = jnp.minimum(
                            tout_s, jnp.maximum(t0_, t1_) * _SLAB_SCALE)
                    # Same inverted-pad-box mask as the VMEM cull: member
                    # blocks past the last real triangle must never flag:
                    needed = ((tin_s <= tout_s)
                              & (tin_s * _SLAB_LO < bt_ref[:])
                              & (blo[0] < _BIG))
                    n_i = needed.astype(i32)
                    if subq == 1:
                        bflag_ref[:] = jnp.max(n_i, axis=1, keepdims=True)
                    else:
                        # Per-lane-quarter member flags (see do_block):
                        for qq in range(subq):
                            bflag_ref[:, qq:qq + 1] = jnp.max(
                                n_i[:, qq * WQ:(qq + 1) * WQ],
                                axis=1, keepdims=True)

                refine()
                if _timing_double_refine:
                    # bflag writes are idempotent (same inputs, same
                    # flags): the marginal time IS the refinement cost:
                    refine()
                if subq == 1:
                    # Member-blocks-walked diagnostic — rides the winner-
                    # blocks stats lane (the deferred winner pass never
                    # runs in hbm mode, so the lane is free):
                    ki_ref[4:5, 1:2] = ki_ref[4:5, 1:2] + jnp.sum(
                        bflag_ref[:], axis=0, keepdims=True)
                    if hbm_wu > 1 and not (_timing_double_dense
                                           or _timing_double_gate
                                           or _timing_double_dense_fixed):
                        # Group-unrolled member walk (finding 57): one
                        # gate per hbm_wu windows; the group computes
                        # every member window's independent dense chain
                        # together (the ILP the narrow-window walk loses
                        # to chain latency, finding 49) and folds the
                        # winners in ascending window order, each masked
                        # by its own member flag — bitwise-identical to
                        # the per-window gated walk:
                        for g0 in range(0, SBH, hbm_wu):
                            bs = tuple(range(g0, min(g0 + hbm_wu, SBH)))
                            gf = bflag_ref[bs[0], 0]
                            for b in bs[1:]:
                                gf = gf + bflag_ref[b, 0]
                            pl.when(gf > 0)(functools.partial(
                                _hbm_dense_group, slot, bs))
                    else:
                        for b in range(SBH):               # static unroll
                            @pl.when(bflag_ref[b, 0] > 0)
                            def _dense(b=b):
                                _hbm_dense_block(slot, b)
                                if _timing_double_dense:
                                    # Re-run writes nothing (improvement
                                    # is strict <): marginal time IS the
                                    # gated dense-test cost:
                                    _hbm_dense_block(slot, b)
                                if _timing_double_dense_fixed:
                                    _hbm_dense_fixed_probe()
                            if _timing_double_gate:
                                @pl.when(bflag_ref[b, 0] > 0)
                                def _gate2():
                                    # Trivial idempotent body: the
                                    # marginal time IS the per-member
                                    # gate cost:
                                    bt_ref[:] = bt_ref[:] + f32(0.0)
                else:
                    # subq > 1 forces hbm_sub == 1 (wrapper): b is a
                    # whole member here:
                    for b in range(SB):                    # static unroll
                        for qq in range(subq):
                            pl.when(bflag_ref[b, qq] > 0)(
                                functools.partial(_hbm_dense_block,
                                                  slot, b, qq))

                return nxt, cnt + 1

            def _hbm_dense_fixed_probe():
                # Dense-chain twin of _hbm_dense_block reading pbs_ref
                # (static [TB, 16] scratch, whatever it holds): same op
                # sequence, lane offsets 0..15, no dynamic slot base.
                # Results fold into the oracle-diag lane through a
                # never-true compare so the chain is kept but radiometry
                # and walk statistics are untouched:
                pb = pbs_ref[:]
                tnp0 = pb[:, 0:1]
                g1p0 = pb[:, 1:2]
                g2p0 = pb[:, 2:3]

                def tdot(c0_, rr, pb=pb):
                    return (pb[:, c0_:c0_ + 1] * rr[0]
                            + pb[:, c0_ + 1:c0_ + 2] * rr[1]
                            + pb[:, c0_ + 2:c0_ + 3] * rr[2])

                on = tdot(3, o)
                dn = tdot(3, d)
                og1 = tdot(6, o)
                dg1 = tdot(6, d)
                og2 = tdot(9, o)
                dg2 = tdot(9, d)
                r = pl.reciprocal(dn, approx=True)
                r = r * (2.0 - dn * r)
                t = (tnp0 - on) * r
                b1 = og1 + t * dg1 - g1p0
                b2 = og2 + t * dg2 - g2p0
                et = (pb[:, 14:15] + jnp.abs(on)) * jnp.abs(r)
                eps = jnp.minimum(
                    pb[:, 12:13] + pb[:, 13:14] * (o_mag + et),
                    np.float32(1e-3))
                ok = ((jnp.minimum(b1, b2) >= -eps)
                      & (b1 + b2 <= 1.0 + eps) & (t > 0.0))
                tm = jnp.where(ok, t, _INF)
                bt = jnp.min(tm, axis=0, keepdims=True)
                tri_lane = jax.lax.broadcasted_iota(i32, (TB, br), 0)
                bi = jnp.min(
                    jnp.where(tm <= bt, tri_lane, i32(0x7FFFFFFF)),
                    axis=0, keepdims=True)
                better = (bt < bt_ref[:]) & (bt < _INF)
                ki_ref[6:7, :] = ki_ref[6:7, :] + (
                    better & (bt == f32(12345.678e12))
                    & (bi == i32(-777))).astype(i32)

            def _hbm_dense_block(slot, b, q=0):
                    # b indexes a width-TBH row window of the super's
                    # member fb = b // hbm_sub (row window h = b %
                    # hbm_sub): the VMEM flat walk's sub-block granularity
                    # (finding 36) applied to the streamed member walk —
                    # pair-rows per iteration drop while the dense width
                    # stays br, and the sequential strict-< merge keeps
                    # the winner (and the image) bitwise identical to the
                    # full-member walk:
                    fb = b // hbm_sub
                    h = b % hbm_sub
                    r0 = h * TBH
                    if subq == 1:
                        best_t = bt_ref[:]
                        oq, dq, omq = o, d, o_mag
                    else:
                        # Ref-load the quarter (see do_block: sliced
                        # loaded vectors carry offset layouts Mosaic
                        # cannot broadcast on hardware):
                        lq = slice(q * WQ, (q + 1) * WQ)
                        best_t = bt_ref[:, pl.ds(q * WQ, WQ)]
                        oq = (ray_ref[0:1, lq], ray_ref[1:2, lq],
                              ray_ref[2:3, lq])
                        dq = (ray_ref[3:4, lq], ray_ref[4:5, lq],
                              ray_ref[5:6, lq])
                        omq = jnp.maximum(jnp.maximum(jnp.abs(oq[0]),
                                                      jnp.abs(oq[1])),
                                          jnp.abs(oq[2]))
                    if hbm_pb_stage:
                        # One relayout copy -> canonical lane-offset-0
                        # coefficient columns (see pbs_ref scratch note):
                        pbs_ref[0:TBH, :] = p_buf[slot, r0:r0 + TBH,
                                                  fb * 16:(fb + 1) * 16]
                        pb = pbs_ref[0:TBH, :]                 # [TBH, 16]
                    else:
                        pb = p_buf[slot, r0:r0 + TBH,
                                   fb * 16:(fb + 1) * 16]
                    tnp0 = pb[:, 0:1]
                    g1p0 = pb[:, 1:2]
                    g2p0 = pb[:, 2:3]

                    def tdot(c0_, rr, pb=pb):
                        return (pb[:, c0_:c0_ + 1] * rr[0]
                                + pb[:, c0_ + 1:c0_ + 2] * rr[1]
                                + pb[:, c0_ + 2:c0_ + 3] * rr[2])

                    on = tdot(3, oq)
                    dn = tdot(3, dq)
                    og1 = tdot(6, oq)
                    dg1 = tdot(6, dq)
                    og2 = tdot(9, oq)
                    dg2 = tdot(9, dq)
                    r = pl.reciprocal(dn, approx=True)
                    r = r * (2.0 - dn * r)
                    t = (tnp0 - on) * r
                    b1 = og1 + t * dg1 - g1p0
                    b2 = og2 + t * dg2 - g2p0
                    # Watertight widened acceptance (see do_block):
                    et = (pb[:, 14:15] + jnp.abs(on)) * jnp.abs(r)
                    eps = jnp.minimum(
                pb[:, 12:13] + pb[:, 13:14] * (omq + et),
                np.float32(1e-3))
                    ok = ((jnp.minimum(b1, b2) >= -eps)
                          & (b1 + b2 <= 1.0 + eps) & (t > 0.0))
                    tm = jnp.where(ok, t, _INF)
                    bt = jnp.min(tm, axis=0, keepdims=True)
                    tri_lane = jax.lax.broadcasted_iota(
                        i32, (TBH, WQ if subq > 1 else br), 0)
                    bi = jnp.min(
                        jnp.where(tm <= bt, tri_lane, i32(0x7FFFFFFF)),
                        axis=0, keepdims=True)
                    better = (bt < best_t) & (bt < _INF)
                    if subq == 1:
                        bt_ref[:] = jnp.where(better, bt, best_t)
                    else:
                        bt_ref[:, pl.ds(q * WQ, WQ)] = jnp.where(
                            better, bt, best_t)
                    if not _timing_no_dots:
                        def payload():
                            onehot = (tri_lane == bi).astype(f32)
                            # Winner barycentrics as [1, br] rows (exact:
                            # the one-hot sum adds the winner's f32 value
                            # to zeros), applied as post-dot scales — the
                            # pay_block golf (one [22, TB] dot instead of
                            # four, no [TB, br] weight builds):
                            b1w = jnp.sum(onehot * jnp.where(ok, b1, 0.0),
                                          axis=0, keepdims=True)
                            b2w = jnp.sum(onehot * jnp.where(ok, b2, 0.0),
                                          axis=0, keepdims=True)
                            # One-hot over the member's FULL TB-lane
                            # payload chunks (lane = triangle row within
                            # member fb; the dense window starts at r0):
                            tri_full = jax.lax.broadcasted_iota(
                                i32, (TB, WQ if subq > 1 else br), 0)
                            w1 = (tri_full == (bi + r0)).astype(f32)
                            nd_ = (((1,), (0,)), ((), ()))
                            # Member fb's nrm payload chunks: below the p
                            # slab in the fused super (chunk j at rows
                            # [TB + (fb*3+j)*8, +8) — tables.py pn8), or
                            # in the streamed bf16 pay slab (rows
                            # [fb*24 + j*8, +8) — tables.py pay8; the
                            # one-hot rides as bf16, exact for 0/1, and
                            # the dot's f32 accumulate matches the
                            # DEFAULT-precision bf16 rounding the fused
                            # f32 path gets on TPU anyway). Interp rows
                            # ride chunks 1/2's rows 0-2 (material rows
                            # fill the rest — do_block):
                            if hbm_split:
                                c0 = fb * 24
                                rows = jnp.concatenate(
                                    [pay_buf[slot, c0:c0 + 16, :],
                                     pay_buf[slot, c0 + 8:c0 + 11, :],
                                     pay_buf[slot, c0 + 16:c0 + 19, :]],
                                    axis=0)
                                wd = w1.astype(jnp.bfloat16)
                            else:
                                c0 = TB + fb * 3 * 8
                                rows = jnp.concatenate(
                                    [p_buf[slot, c0:c0 + 16, :],
                                     p_buf[slot, c0 + 8:c0 + 11, :],
                                     p_buf[slot, c0 + 16:c0 + 19, :]],
                                    axis=0)
                                wd = w1
                            cand = jax.lax.dot_general(
                                rows, wd, nd_,
                                preferred_element_type=f32)   # [22, br]
                            n_interp = cand[16:19] * b1w + cand[19:22] * b2w
                            n_cand2 = jnp.concatenate(
                                [cand[0:3] + n_interp, cand[3:8]],
                                axis=0)
                            m_cand = cand[8:16]
                            if subq == 1:
                                bn_ref[:] = jnp.where(
                                    better, n_cand2, bn_ref[:])
                                bm_ref[:] = jnp.where(
                                    better, m_cand, bm_ref[:])
                            else:
                                lcs = pl.ds(q * WQ, WQ)
                                bn_ref[:, lcs] = jnp.where(
                                    better, n_cand2, bn_ref[:, lcs])
                                bm_ref[:, lcs] = jnp.where(
                                    better, m_cand, bm_ref[:, lcs])

                        if hbm_pay_gate:
                            # Winner-gated payload (the VMEM walk's
                            # finding-39 deferral, expressed in-slab): a
                            # walked block that improved NO lane would
                            # write nothing through jnp.where(better, .)
                            # — skipping its one-hot + 4 MXU dots +
                            # [TB, br] w2/w3 builds is bitwise-identical,
                            # and only ~winners/iter of the walked blocks
                            # pass the gate:
                            pl.when(jnp.max(better.astype(i32)) > 0)(
                                payload)
                        else:
                            payload()

            def _hbm_dense_group(slot, bs):
                # Group-unrolled streamed member walk (finding 57; the
                # compact VMEM walk's unroll mechanism, finding 52,
                # applied to the HBM super's in-slab windows). Phase 1
                # computes every member window's dense chain together —
                # len(bs) * TBH independent tri-rows in flight restore
                # the ILP the per-window gated walk loses to chain
                # latency (finding 49). No ref writes here, so the
                # chains are freely interleavable:
                tri_lane = jax.lax.broadcasted_iota(i32, (TBH, br), 0)
                cands = []
                for b in bs:
                    fb = b // hbm_sub
                    r0 = (b % hbm_sub) * TBH
                    pb = p_buf[slot, r0:r0 + TBH,
                               fb * 16:(fb + 1) * 16]
                    tnp0 = pb[:, 0:1]
                    g1p0 = pb[:, 1:2]
                    g2p0 = pb[:, 2:3]

                    def tdot(c0_, rr, pb=pb):
                        return (pb[:, c0_:c0_ + 1] * rr[0]
                                + pb[:, c0_ + 1:c0_ + 2] * rr[1]
                                + pb[:, c0_ + 2:c0_ + 3] * rr[2])

                    on = tdot(3, o)
                    dn = tdot(3, d)
                    og1 = tdot(6, o)
                    dg1 = tdot(6, d)
                    og2 = tdot(9, o)
                    dg2 = tdot(9, d)
                    r = pl.reciprocal(dn, approx=True)
                    r = r * (2.0 - dn * r)
                    t = (tnp0 - on) * r
                    b1 = og1 + t * dg1 - g1p0
                    b2 = og2 + t * dg2 - g2p0
                    # Watertight widened acceptance (see do_block):
                    et = (pb[:, 14:15] + jnp.abs(on)) * jnp.abs(r)
                    eps = jnp.minimum(
                        pb[:, 12:13] + pb[:, 13:14] * (o_mag + et),
                        np.float32(1e-3))
                    ok = ((jnp.minimum(b1, b2) >= -eps)
                          & (b1 + b2 <= 1.0 + eps) & (t > 0.0))
                    tm = jnp.where(ok, t, _INF)
                    bt = jnp.min(tm, axis=0, keepdims=True)
                    bi = jnp.min(
                        jnp.where(tm <= bt, tri_lane, i32(0x7FFFFFFF)),
                        axis=0, keepdims=True)
                    cands.append((b, fb, r0, bt, bi, ok, b1, b2))
                # Phase 2: ascending-window strict-< fold, each window
                # masked by its own member flag — exactly the decisions
                # (hence exactly the winner-payload writes) the
                # per-window gated walk makes, so radiometry is bitwise
                # identical; only bt_ref's single final store differs
                # from its sequential stores (same value):
                best = bt_ref[:]
                for (b, fb, r0, bt, bi, ok, b1, b2) in cands:
                    better = ((bt < best) & (bt < _INF)
                              & (bflag_ref[b, 0] > 0))
                    best = jnp.where(better, bt, best)

                    def payload(fb=fb, r0=r0, bi=bi, ok=ok, b1=b1,
                                b2=b2, better=better):
                        onehot = (tri_lane == bi).astype(f32)
                        b1w = jnp.sum(onehot * jnp.where(ok, b1, 0.0),
                                      axis=0, keepdims=True)
                        b2w = jnp.sum(onehot * jnp.where(ok, b2, 0.0),
                                      axis=0, keepdims=True)
                        tri_full = jax.lax.broadcasted_iota(
                            i32, (TB, br), 0)
                        w1 = (tri_full == (bi + r0)).astype(f32)
                        nd_ = (((1,), (0,)), ((), ()))
                        # Member payload chunks: same layouts as
                        # _hbm_dense_block (fused pn8 below the p slab,
                        # or the streamed bf16 pay8 slab):
                        if hbm_split:
                            c0 = fb * 24
                            rows_ = jnp.concatenate(
                                [pay_buf[slot, c0:c0 + 16, :],
                                 pay_buf[slot, c0 + 8:c0 + 11, :],
                                 pay_buf[slot, c0 + 16:c0 + 19, :]],
                                axis=0)
                            wd = w1.astype(jnp.bfloat16)
                        else:
                            c0 = TB + fb * 3 * 8
                            rows_ = jnp.concatenate(
                                [p_buf[slot, c0:c0 + 16, :],
                                 p_buf[slot, c0 + 8:c0 + 11, :],
                                 p_buf[slot, c0 + 16:c0 + 19, :]],
                                axis=0)
                            wd = w1
                        cand = jax.lax.dot_general(
                            rows_, wd, nd_,
                            preferred_element_type=f32)   # [22, br]
                        n_interp = (cand[16:19] * b1w
                                    + cand[19:22] * b2w)
                        n_cand2 = jnp.concatenate(
                            [cand[0:3] + n_interp, cand[3:8]], axis=0)
                        m_cand = cand[8:16]
                        bn_ref[:] = jnp.where(better, n_cand2,
                                              bn_ref[:])
                        bm_ref[:] = jnp.where(better, m_cand,
                                              bm_ref[:])

                    if not _timing_no_dots:
                        if hbm_pay_gate:
                            pl.when(jnp.max(better.astype(i32)) > 0)(
                                payload)
                        else:
                            payload()
                bt_ref[:] = best

            _, n_sup = jax.lax.while_loop(
                lambda c: c[0] < nbs, wbody, (cur0, i32(0)))
            ki_ref[4:5, 0:1] = ki_ref[4:5, 0:1] + n_sup
        elif use_cull and two_level:
            # ---- two-level VMEM walk (VERDICT r2 #5): at hundreds of
            # blocks, the flat walk pays a scalar flag-read + pl.when gate
            # per block per iteration (~512 gates at the 64k-tri VMEM
            # ceiling) plus a [nb, br] slab pass. Here the cull slab pass
            # ran over SUPER AABBs (nbs == num_supers, baabb_ref == saabb);
            # flagged supers refine their SB member blocks against the
            # member AABBs *and the current best_t* in one vectorised
            # [SB, br] pass — the HBM walk's in-super refinement (finding
            # 29) without the DMA:
            def super_body(s, _):
                @pl.when(cull_ref[s, 0] > 0)
                def _sup(s=s):
                    blo = [bfine_ref[pl.ds(s * SB, SB), a:a + 1]
                           for a in range(3)]
                    bhi = [bfine_ref[pl.ds(s * SB, SB), a + 3:a + 4]
                           for a in range(3)]
                    tin_s = jnp.zeros((SB, br), f32)
                    tout_s = jnp.where(active, _BIG, f32(-1.0))
                    for a in range(3):
                        t0_ = (blo[a] - o[a]) * inv[a]
                        t1_ = (bhi[a] - o[a]) * inv[a]
                        tin_s = jnp.maximum(tin_s, jnp.minimum(t0_, t1_))
                        tout_s = jnp.minimum(
                            tout_s, jnp.maximum(t0_, t1_) * _SLAB_SCALE)
                    needed = ((tin_s <= tout_s)
                              & (tin_s * _SLAB_LO < bt_ref[:])
                              & (blo[0] < _BIG))
                    n_i = needed.astype(i32)
                    if subq == 1:
                        bflag_ref[:] = jnp.max(n_i, axis=1, keepdims=True)
                        ki_ref[4:5, 0:1] = ki_ref[4:5, 0:1] + jnp.sum(
                            bflag_ref[:], axis=0, keepdims=True)
                        for b in range(SB):                # static unroll
                            @pl.when(bflag_ref[b, 0] > 0)
                            def _dense(b=b):
                                do_block(s * SB + b)
                    else:
                        # Per-lane-quarter member flags (see do_block):
                        for qq in range(subq):
                            bflag_ref[:, qq:qq + 1] = jnp.max(
                                n_i[:, qq * WQ:(qq + 1) * WQ],
                                axis=1, keepdims=True)
                        ki_ref[4:5, 0:1] = ki_ref[4:5, 0:1] + jnp.sum(
                            jnp.sum(bflag_ref[:], axis=1, keepdims=True),
                            axis=0, keepdims=True)
                        for b in range(SB):                # static unroll
                            for qq in range(subq):
                                pl.when(bflag_ref[b, qq] > 0)(
                                    functools.partial(do_block,
                                                      s * SB + b, qq))
                return 0

            # Mid-walk refreshes of the SUPER flags against the
            # converging best_t (same segment scheme as the flat walk):
            segs = reflag + 1
            bounds = sorted({min(nbs, ((sg * nbs // segs + 7) // 8) * 8)
                             for sg in range(1, segs)} | {0, nbs})
            for sg in range(len(bounds) - 1):
                b0, b1_ = bounds[sg], bounds[sg + 1]
                if sg > 0:
                    rem = tin_ref[b0:nbs, :] < bt_ref[:]
                    cull_ref[b0:nbs, :] = jnp.max(
                        rem.astype(i32), axis=1, keepdims=True)
                jax.lax.fori_loop(b0, b1_, super_body, 0)
        elif use_cull:
            def walk_body(blk, _):
                if subq == 1:
                    pl.when(cull_ref[blk, 0] > 0)(
                        functools.partial(do_block, blk))
                else:
                    # Outer any-quarter gate keeps the scalar-read count
                    # near today's; per-quarter gates only run for the
                    # ~U1 blocks any lane needs:
                    @pl.when(cull_ref[blk, 0] > 0)
                    def _q(blk=blk):
                        for qq in range(subq):
                            pl.when(cullq_ref[blk, qq] > 0)(
                                functools.partial(do_block, blk, qq))
                return 0

            # Walk in reflag+1 segments; before each later segment, refresh
            # the remaining flags against the now partially-converged
            # best_t (one vectorised pass — cheap, unlike per-block
            # evolving tests, PROGRESS.md finding 25). Blocks whose
            # customers all found nearer hits drop out:
            segs = reflag + 1
            bounds = sorted({min(nbs, ((s * nbs // segs + 7) // 8) * 8)
                             for s in range(1, segs)} | {0, nbs})
            if compact:
                # Cap compact segments at _COMPACT_SEG rows: the
                # rank/extract dots are exact on the cheap DEFAULT
                # MXU path only up to 256-row flag columns (see
                # compact_indices), and a [512, 512] HIGHEST ranking
                # dot would eat the finer-granularity win. Extra
                # boundaries also refresh flags when reflag is on
                # (bitwise-safe by the conservative-cull contract):
                extra = set()
                for i0, i1 in zip(bounds[:-1], bounds[1:]):
                    extra.update(range(i0 + _COMPACT_SEG, i1,
                                       _COMPACT_SEG))
                bounds = sorted(set(bounds) | extra)
            # Bundle-lockstep: each bundle's segment walk runs to
            # completion against its own flag column / best_t row
            # before the next bundle's starts (ascending bundle order —
            # bundles are lane-disjoint, so order is bitwise-irrelevant;
            # B == 1 reduces to the original single loop):
            for bw, s in ((bw, s) for bw in range(B)
                          for s in range(len(bounds) - 1)):
                b0, b1_ = bounds[s], bounds[s + 1]
                if s > 0 and reflag > 0:
                    # strict <: INF entry bounds (no slab hit) must stay
                    # unflagged even against INF best_t (no hit yet):
                    rem = (tin_ref[b0:nbs, _bcols(bw)]
                           < bt_ref[bw:bw + 1, :]).astype(i32)
                    if cull2:
                        # Rows of coarse-unflagged groups carry STALE
                        # entry bounds (the refinement never visited
                        # them this iteration) — a refresh may only
                        # CLEAR flags, never set them:
                        rem = rem * cull_ref[b0:nbs, bw:bw + 1]
                    cull_ref[b0:nbs, bw:bw + 1] = jnp.max(
                        rem, axis=1, keepdims=True)
                    if subq > 1:
                        for qq in range(subq):
                            cullq_ref[b0:nbs, qq:qq + 1] = jnp.max(
                                rem[:, qq * WQ:(qq + 1) * WQ],
                                axis=1, keepdims=True)
                # walk-work counter (diagnostics; negligible cost):
                # quarter-walks when subq > 1, block-walks otherwise —
                # the host normalises by subq (streaming stats contract):
                if subq == 1:
                    if not (fresh and compact):
                        # Under the fresh per-group gates the walked
                        # counter is maintained inside cbody (groups
                        # actually entered), not from the flag list:
                        ki_ref[4 * B:4 * B + 1, 0:1] = (
                            ki_ref[4 * B:4 * B + 1, 0:1] + jnp.sum(
                                cull_ref[b0:b1_, bw:bw + 1],
                                axis=0, keepdims=True))
                else:
                    ki_ref[4:5, 0:1] = ki_ref[4:5, 0:1] + jnp.sum(
                        jnp.sum(cullq_ref[b0:b1_, :], axis=1,
                                keepdims=True),
                        axis=0, keepdims=True)
                if compact and subq == 1:
                    # ---- compacted walk (finding 48): rank the flagged
                    # blocks, extract their indices into a dense sublane-
                    # major list, and walk exactly `cnt` blocks in a
                    # branch-free while_loop with dynamic-slice indexing
                    # (do_block already supports traced block ids). Same
                    # blocks in the same ascending order — bitwise-
                    # identical radiometry:
                    cnt = compact_indices(cull_ref[b0:b1_, bw:bw + 1], b0)
                    if _timing_double_prep:
                        # Idempotent re-run: same flags, same writes —
                        # the marginal time IS the prep cost:
                        cnt = compact_indices(cull_ref[b0:b1_, bw:bw + 1],
                                              b0)

                    def walk_group(blks, bw=bw):
                        # One unroll group: len(blks) independent dense
                        # chains dispatched together (the ILP narrow
                        # windows lose to chain latency, finding 52):
                        def group(blks=blks, bw=bw):
                            if use_mxu:
                                # Stage the group's p windows (the
                                # staged copy doubles as the dense
                                # test's pb read — lane offset 0,
                                # static sublane offsets), then ONE
                                # group matmul for all 6 coefficient
                                # dots of all walk_unroll windows:
                                for u, blk in enumerate(blks):
                                    mxl_ref[u * TBW:(u + 1) * TBW, :] = (
                                        p_ref[pl.ds(blk * TBW, TBW), :])
                                dots = jax.lax.dot_general(
                                    mxl_ref[:], mxr,
                                    (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=f32)
                                for u, blk in enumerate(blks):
                                    r0 = u * TBW
                                    do_block(blk, mx=(
                                        mxl_ref[r0:r0 + TBW, :],
                                        *(dots[r0:r0 + TBW,
                                               g * br:(g + 1) * br]
                                          for g in range(6))))
                            else:
                                for blk in blks:
                                    do_block(blk, b=bw)
                                    if _timing_double_vdense:
                                        # Idempotent re-run (strict-<
                                        # merge): marginal = full
                                        # per-window dense cost:
                                        do_block(blk, b=bw)
                                    if _timing_double_vdense_const:
                                        _vdense_const_probe(blk)

                        if fresh:
                            # Fresh per-group gate (finding 58): the
                            # listed flags were computed against an
                            # EARLIER best_t (40% overshoot measured vs
                            # the converged oracle at sub=16 —
                            # experiments/oracle_union.py); re-checking
                            # the group's stored entry bounds against
                            # the CURRENT best_t skips settled groups
                            # without the bulk refresh's rank/extract
                            # re-runs. Skipping is bitwise-safe by the
                            # refresh's own contract: stored tin is a
                            # conservative lower bound on any hit t in
                            # the window, so tin >= best_t on every
                            # lane means no strict-< improvement can
                            # exist. Listed windows' tin rows are
                            # always written this iteration (flagged
                            # groups are exactly the refined ones under
                            # cull2). Dynamic sublane slices must be
                            # tile-aligned (Mosaic: bf16 tiles are 16
                            # sublanes, f32 8) — load the aligned
                            # granule containing each window's row and
                            # mask to that row:
                            GA = 16 if tin16 else 8
                            acc = None
                            for blk in blks:
                                base = pl.multiple_of(
                                    (blk // GA) * GA, GA)
                                rows_t = tin_ref[pl.ds(base, GA), :]
                                rowmask = (jax.lax.broadcasted_iota(
                                    i32, (GA, br), 0) == (blk - base))
                                hit = rowmask & (rows_t < bt_ref[:])
                                acc = hit if acc is None else (acc | hit)
                            ng = jnp.max(acc.astype(i32))
                            ki_ref[4:5, 0:1] = (
                                ki_ref[4:5, 0:1]
                                + ng * i32(len(blks)))
                            pl.when(ng > 0)(group)
                        else:
                            group()

                    # Walk exact full unroll groups, then a log-ladder
                    # tail (finding 58): the former tail-clamp re-walked
                    # the last list entry for up to walk_unroll-1 slots
                    # per segment — bitwise no-ops but REAL dense tests,
                    # ~7 wasted windows/iter at wu=8 on the bench
                    # workload (~11% of iteration time). The ladder
                    # walks the exact remainder with at most
                    # log2(walk_unroll) scalar-gated sub-groups, same
                    # windows in the same ascending order — bitwise:
                    cnt_main = (cnt // walk_unroll) * walk_unroll

                    def cbody(k):
                        walk_group([cidx_ref[k + u, 0]
                                    for u in range(walk_unroll)])
                        return k + walk_unroll

                    jax.lax.while_loop(lambda k: k < cnt_main, cbody,
                                       i32(0))
                    pos = cnt_main
                    step = walk_unroll // 2
                    while step >= 1:
                        take = (cnt - pos) >= step

                        def _tail(pos=pos, step=step):
                            walk_group([cidx_ref[pos + u, 0]
                                        for u in range(step)])

                        pl.when(take)(_tail)
                        pos = pos + jnp.where(take, i32(step), i32(0))
                        step //= 2
                elif compact:
                    # ---- compacted lane-quarter walk (finding 53): one
                    # compacted index list PER width-WQ lane quarter (the
                    # quarter id stays a static python int, so the dense
                    # test's lane slices remain tile-aligned ref-loads —
                    # the finding-47 Mosaic constraint). Quarters are
                    # lane-disjoint, so quarter-major dispatch order is
                    # bitwise-identical to the gated walk's block-major
                    # order (within a quarter both walk ascending block
                    # ids with the same strict-< merge). This is the
                    # revisit finding 52 earns: finding 47 killed
                    # sub-bundle walks because narrow dense chains are
                    # latency-bound under per-block gates, but the
                    # unrolled branch-free dispatch interleaves
                    # walk_unroll independent chains, which is exactly
                    # the ILP the narrow ops lost:
                    for qq in range(subq):
                        cntq = compact_indices(
                            cullq_ref[b0:b1_, qq:qq + 1], b0)
                        if _timing_double_prep:
                            cntq = compact_indices(
                                cullq_ref[b0:b1_, qq:qq + 1], b0)

                        def cqbody(k, qq=qq, cntq=cntq):
                            do_block(cidx_ref[k, 0], qq)
                            for u in range(1, walk_unroll):
                                do_block(
                                    cidx_ref[jnp.minimum(k + u, cntq - 1),
                                             0], qq)
                            return k + walk_unroll

                        jax.lax.while_loop(
                            lambda k: k < cntq, cqbody, i32(0))
                else:
                    jax.lax.fori_loop(b0, b1_, walk_body, 0)
        else:
            jax.lax.fori_loop(0, nbs, lambda blk, _: (do_block(blk), 0)[1], 0)

        if _timing_stub_walk:
            # Overwrite whatever the stub bodies accumulated with the
            # synthetic hit (path statistics as in _timing_no_walk):
            bt_ref[:] = jnp.where(active, f32(1.0), t_max)

        if not hbm and not _timing_no_dots:
            # ---- deferred payload pass: normal/material one-hot dots for
            # the (few) blocks holding this iteration's winners. Each
            # lane's one-hot is exact: rel leaves [0, TB) whenever the
            # lane's winner lives in a different block:
            NBLK = nrm_ref.shape[1] // (TB if pay_fused else 3 * TB)
            tri128 = jax.lax.broadcasted_iota(i32, (TB, br), 0)
            nd_ = (((1,), (0,)), ((), ()))
            # Bundle-lockstep: one payload dispatch per bundle against
            # its own winner rows / o/d rows / bank block (lane-disjoint
            # — ascending order, bitwise-irrelevant):
          # (indentation preserved below via the bp loop)
            for bp in range(B):
              row = ki_ref[7 * B + bp:7 * B + bp + 1, :]
              blkw = row // i32(TB)               # -1 for no-hit lanes
              o_p = tuple(c[bp:bp + 1, :] for c in o)
              d_p = tuple(c[bp:bp + 1, :] for c in d)
              bnlo, bnhi = bp * 8, (bp + 1) * 8

              def pay_group(bl, row=row, blkw=blkw, o=o_p, d=d_p,
                              bnlo=bnlo, bnhi=bnhi):
                  # Fused payload table (tables.payt), GROUP form: the
                  # compact winner list is duplicate-free, so each lane's
                  # winner lives in at most ONE of the group's blocks and
                  # the per-block one-hots are lane-disjoint. Stacking
                  # them as extra contraction rows merges the selections
                  # exactly: ONE [64, G*TB] x [G*TB, br] dot returns every
                  # lane its own winner's rows (rows 0:36 the host-
                  # precomputed hi/mid/lo bf16 split of the 12 p columns,
                  # each term bf16-representable and stored f32, rows
                  # 36:55 the nrm candidates — a DEFAULT-precision dot
                  # therefore selects exactly the bf16 factors the old
                  # explicit-bf16 dots selected on TPU, and exactly the
                  # stored f32 values on CPU), and the whole post-dot
                  # payload chain runs ONCE per group instead of once per
                  # block. Bitwise-identical to the per-block dispatch on
                  # both platforms (the extra blocks' zero products add
                  # bitwise-neutrally; gated across walk regimes in
                  # tests/test_megakernel_variants.py):
                  w1 = jnp.concatenate(
                      [(tri128 == (row - b * TB)) for b in bl],
                      axis=0).astype(f32)                  # [G*TB, br]
                  lhs = (nrm_ref[:, pl.ds(jnp.minimum(bl[0], i32(NBLK - 1))
                                          * TB, TB)]
                         if len(bl) == 1 else
                         jnp.concatenate(
                             [nrm_ref[:, pl.ds(jnp.minimum(b, i32(NBLK - 1))
                                               * TB, TB)] for b in bl],
                             axis=1))                      # [64, G*TB]
                  out = jax.lax.dot_general(
                      lhs, w1, nd_, preferred_element_type=f32)  # [64, br]
                  pc = (out[0:12] + out[12:24]) + out[24:36]
                  mine = blkw == bl[0]
                  for b in bl[1:]:
                      mine = mine | (blkw == b)
                  on_w = pc[3:4] * o[0] + pc[4:5] * o[1] + pc[5:6] * o[2]
                  dn_w = pc[3:4] * d[0] + pc[4:5] * d[1] + pc[5:6] * d[2]
                  og1w = pc[6:7] * o[0] + pc[7:8] * o[1] + pc[8:9] * o[2]
                  dg1w = pc[6:7] * d[0] + pc[7:8] * d[1] + pc[8:9] * d[2]
                  og2w = (pc[9:10] * o[0] + pc[10:11] * o[1]
                          + pc[11:12] * o[2])
                  dg2w = (pc[9:10] * d[0] + pc[10:11] * d[1]
                          + pc[11:12] * d[2])
                  r_w = pl.reciprocal(dn_w, approx=True)
                  r_w = r_w * (2.0 - dn_w * r_w)
                  t_w = (pc[0:1] - on_w) * r_w
                  b1w = jnp.where(mine, og1w + t_w * dg1w - pc[1:2], 0.0)
                  b2w = jnp.where(mine, og2w + t_w * dg2w - pc[2:3], 0.0)
                  b1b = b1w.astype(jnp.bfloat16).astype(f32)
                  b2b = b2w.astype(jnp.bfloat16).astype(f32)
                  n_interp = out[44:47] * b1b + out[52:55] * b2b
                  bn_ref[bnlo:bnhi, :] = bn_ref[bnlo:bnhi, :] + jnp.concatenate(
                      [out[36:39] + n_interp, out[39:44]], axis=0)
                  bm_ref[bnlo:bnhi, :] = bm_ref[bnlo:bnhi, :] + out[44:52]

              def pay_block(b, row=row, blkw=blkw, o=o_p, d=d_p,
                            bnlo=bnlo, bnhi=bnhi):
                  if pay_fused:
                      pay_group([b])
                      return
                  bs = jnp.minimum(b, i32(NBLK - 1))
                  rel = row - b * TB
                  w1 = (tri128 == rel).astype(f32)
                  # Re-derive the winner's barycentrics from its p-row,
                  # extracted by the one-hot. The extraction must be EXACT
                  # (the [1, br] recompute below repeats do_block's exact
                  # op sequence on the same scalars, so b1/b2 match the
                  # in-walk values bitwise). Precision.HIGHEST does that
                  # but costs ~6 bf16 MXU passes; a manual 3-way bf16
                  # split needs only 3: hi/mid/lo carry f32's 24 mantissa
                  # bits exactly (each residual is exactly representable),
                  # the one-hot is bf16-exact, every product is exact in
                  # the f32 accumulator, and hi+(mid+lo sums) reconstruct
                  # the original f32 bitwise (hi+mid fits 18 bits; the
                  # final add hits the exactly-representable x). Default
                  # f32 dots would round through ONE bf16 pass (finding
                  # 14) — not enough:
                  pb12 = p_ref[pl.ds(bs * TB, TB), 0:12]
                  hi_s = pb12.astype(jnp.bfloat16)
                  r1_s = pb12 - hi_s.astype(f32)
                  mid_s = r1_s.astype(jnp.bfloat16)
                  lo_s = (r1_s - mid_s.astype(f32)).astype(jnp.bfloat16)
                  w1b = w1.astype(jnp.bfloat16)
                  nd0p = (((0,), (0,)), ((), ()))
                  # ONE [TB, 36] dot instead of three [TB, 12] dots: the
                  # hi/mid/lo splits ride as extra columns (each row's
                  # contraction is element-for-element the same bf16
                  # products with the same f32 accumulate, so the exact-
                  # reconstruction argument — and the bits — are
                  # unchanged), and the MXU invocation count drops 3x:
                  pcs = jax.lax.dot_general(
                      jnp.concatenate([hi_s, mid_s, lo_s], axis=1), w1b,
                      nd0p, preferred_element_type=f32)    # [36, br]
                  pc = (pcs[0:12] + pcs[12:24]) + pcs[24:36]   # [12, br]
                  on_w = pc[3:4] * o[0] + pc[4:5] * o[1] + pc[5:6] * o[2]
                  dn_w = pc[3:4] * d[0] + pc[4:5] * d[1] + pc[5:6] * d[2]
                  og1w = pc[6:7] * o[0] + pc[7:8] * o[1] + pc[8:9] * o[2]
                  dg1w = pc[6:7] * d[0] + pc[7:8] * d[1] + pc[8:9] * d[2]
                  og2w = pc[9:10] * o[0] + pc[10:11] * o[1] + pc[11:12] * o[2]
                  dg2w = pc[9:10] * d[0] + pc[10:11] * d[1] + pc[11:12] * d[2]
                  r_w = pl.reciprocal(dn_w, approx=True)
                  r_w = r_w * (2.0 - dn_w * r_w)
                  t_w = (pc[0:1] - on_w) * r_w
                  # Lanes whose winner lives in another block extract an
                  # all-zero row (dn_w == 0 -> t_w is NaN); their one-hot
                  # column is all zero anyway — mask to keep the NaN out
                  # of the weight product:
                  mine = blkw == b
                  b1w = jnp.where(mine, og1w + t_w * dg1w - pc[1:2], 0.0)
                  b2w = jnp.where(mine, og2w + t_w * dg2w - pc[2:3], 0.0)
                  c0 = bs * 3 * TB
                  # ONE [22, TB] dot replaces four: rows 0-7 candidate
                  # normal block (n_cand), 8-15 material block (m_cand),
                  # 16-18 / 19-21 the two vertex-normal interp blocks.
                  # The old form dotted the interp blocks against
                  # w2 = w1 * b1w; since b1w is constant along the
                  # contraction axis and w1 is an exact 0/1 one-hot,
                  # N·(w1*b1w) == (N·w1) * b1w term-for-term — and the
                  # DEFAULT-precision dot rounds its inputs through bf16,
                  # so scaling AFTER the dot by bf16-rounded b1w/b2w
                  # multiplies the identical bf16 factors in the same f32
                  # arithmetic: bitwise-identical payload, two fewer MXU
                  # dispatches and no [TB, br] w2/w3 weight builds.
                  # Interp weights touch ONLY normal rows 0-2: segments
                  # 1/2's spare rows carry material data whose weighted
                  # leakage was a real radiometry bug (finding 30):
                  cand = jax.lax.dot_general(
                      jnp.concatenate(
                          [nrm_ref[:, pl.ds(c0, TB)],
                           nrm_ref[:, pl.ds(c0 + TB, TB)],
                           nrm_ref[0:3, pl.ds(c0 + TB, TB)],
                           nrm_ref[0:3, pl.ds(c0 + 2 * TB, TB)]], axis=0),
                      w1, nd_, preferred_element_type=f32)     # [22, br]
                  b1b = b1w.astype(jnp.bfloat16).astype(f32)
                  b2b = b2w.astype(jnp.bfloat16).astype(f32)
                  n_interp = cand[16:19] * b1b + cand[19:22] * b2b
                  bn_ref[bnlo:bnhi, :] = bn_ref[bnlo:bnhi, :] + jnp.concatenate(
                      [cand[0:3] + n_interp, cand[3:8]], axis=0)
                  bm_ref[bnlo:bnhi, :] = bm_ref[bnlo:bnhi, :] + cand[8:16]

              def run_payload():
                  nb_iota = jax.lax.broadcasted_iota(i32, (NBLK, br), 0)
                  wf_ref[:] = jnp.max((nb_iota == blkw).astype(i32), axis=1,
                                      keepdims=True)
                  if compact:
                      # Compacted winner-block dispatch (finding 48;
                      # cidx_ref is free again — the walk is done). Winner
                      # contributions are lane-disjoint and zero elsewhere,
                      # so dispatch order is bitwise-irrelevant; ascending
                      # order is kept anyway:
                      cntw = compact_indices(wf_ref[:], 0)

                      # Exact full unroll groups + log-ladder tail (the
                      # walk's finding-58 discipline): the former sentinel
                      # tail slots ran REAL payload dots against the
                      # zero-contribution NBLK block — ~1.5 wasted
                      # pay_blocks/iter at pu=4 (winners ~5/iter):
                      cntw_main = (cntw // pay_unroll) * pay_unroll

                      def pbody(k):
                          # Fused mode hands the WHOLE unroll group to one
                          # pay_group call (one dot + one payload chain for
                          # pay_unroll winner blocks); unfused keeps the
                          # per-block dispatch:
                          if pay_fused:
                              pay_group([cidx_ref[k + u, 0]
                                         for u in range(pay_unroll)])
                          else:
                              for u in range(pay_unroll):
                                  pay_block(cidx_ref[k + u, 0])
                          return k + pay_unroll

                      jax.lax.while_loop(lambda k: k < cntw_main, pbody,
                                         i32(0))
                      posw = cntw_main
                      stepw = pay_unroll // 2
                      while stepw >= 1:
                          takew = (cntw - posw) >= stepw

                          def _ptail(posw=posw, stepw=stepw):
                              if pay_fused:
                                  pay_group([cidx_ref[posw + u, 0]
                                             for u in range(stepw)])
                                  return
                              for u in range(stepw):
                                  pay_block(cidx_ref[posw + u, 0])

                          pl.when(takew)(_ptail)
                          posw = posw + jnp.where(takew, i32(stepw), i32(0))
                          stepw //= 2
                  else:
                      def wpay(b, _):
                          pl.when(wf_ref[b, 0] > 0)(
                              functools.partial(pay_block, b))
                          return 0

                      jax.lax.fori_loop(0, NBLK, wpay, 0)

              run_payload()
              # Winner-blocks diagnostic (stats lane 3; negligible cost):
              ki_ref[4 * B:4 * B + 1, 1:2] = (
                  ki_ref[4 * B:4 * B + 1, 1:2]) + jnp.sum(
                  wf_ref[:], axis=0, keepdims=True)
              if _timing_double_pay:
                  # bn/bm accumulate from zero (zeroed at iteration start,
                  # untouched by the non-hbm walk), so re-zero + re-run is
                  # idempotent; the marginal time IS the payload-pass cost:
                  bn_ref[bnlo:bnhi, :] = jnp.zeros((8, br), f32)
                  bm_ref[bnlo:bnhi, :] = jnp.zeros((8, br), f32)
                  run_payload()
            
            ki_ref[7 * B:8 * B, :] = jnp.full((B, br), -1, i32)

        best_t = bt_ref[:]                               # [B, br]
        # Field gather: the payload banks are bundle-major [8, br]
        # blocks (bundle bp at rows bp*8..bp*8+8); shading wants
        # field-major [B, br] blocks (bundles on sublanes — the
        # finding-66 lockstep layout). B == 1 is a plain slice:
        if B == 1:
            nxyz = (bn_ref[0:1, :], bn_ref[1:2, :], bn_ref[2:3, :])
            albedo = (bn_ref[3:4, :], bn_ref[4:5, :], bn_ref[5:6, :])
            tpk_raw = bm_ref[3:4, :]
            ior = bm_ref[4:5, :]
            emission = (bm_ref[5:6, :], bm_ref[6:7, :], bm_ref[7:8, :])
        else:
            def _gf(ref, f):
                return _gather_rows(ref, [b_ * 8 + f for b_ in range(B)])

            nxyz = (_gf(bn_ref, 0), _gf(bn_ref, 1), _gf(bn_ref, 2))
            albedo = (_gf(bn_ref, 3), _gf(bn_ref, 4), _gf(bn_ref, 5))
            tpk_raw = _gf(bm_ref, 3)
            ior = _gf(bm_ref, 4)
            emission = (_gf(bm_ref, 5), _gf(bm_ref, 6), _gf(bm_ref, 7))
        normal = _normalize3(nxyz)
        tpacked = jnp.round(tpk_raw).astype(i32)

        # ---- analytic primitives (spheres + discs, tiny tables) ----------
        if n_ap > 0:
            kind = ap_ref[:, 0:1]                       # [P, 1]
            cx, cy, cz = ap_ref[:, 1:2], ap_ref[:, 2:3], ap_ref[:, 3:4]
            nx, ny, nz = ap_ref[:, 4:5], ap_ref[:, 5:6], ap_ref[:, 6:7]
            r2 = ap_ref[:, 7:8]
            doff = ap_ref[:, 8:9]
            ap_lane = jax.lax.broadcasted_iota(i32, (n_ap, br), 0)
            nd_ = (((1,), (0,)), ((), ()))
            # Per-bundle [P, br] tests + one-hot payload dot (the [P, *]
            # grids cannot widen across bundles; ops are identical per
            # lane, so B == 1 values are unchanged bit-for-bit):
            bt_rows, pay_per_b = [], []
            for ba in range(B):
                o_a = tuple(c[ba:ba + 1, :] for c in o)
                d_a = tuple(c[ba:ba + 1, :] for c in d)
                bt_a = best_t[ba:ba + 1, :]
                ocx = cx - o_a[0]
                ocy = cy - o_a[1]
                ocz = cz - o_a[2]
                tca = ocx * d_a[0] + ocy * d_a[1] + ocz * d_a[2]  # [P, br]
                l2 = ocx * ocx + ocy * ocy + ocz * ocz - tca * tca
                td = jnp.sqrt(jnp.maximum(r2 - l2, 0.0))
                t0 = tca - td
                t1 = tca + td
                t_sph = jnp.where(t0 < 0.0, t1, t0)
                ok_sph = ((kind == 1.0) & (tca >= 0.0) & (l2 <= r2)
                          & (t_sph > 0.0))
                dn_ = nx * d_a[0] + ny * d_a[1] + nz * d_a[2]
                on_ = nx * o_a[0] + ny * o_a[1] + nz * o_a[2]
                t_dsc = -(on_ + doff) / jnp.where(dn_ == 0.0, 1.0, dn_)
                hx = o_a[0] + d_a[0] * t_dsc - cx
                hy = o_a[1] + d_a[1] * t_dsc - cy
                hz = o_a[2] + d_a[2] * t_dsc - cz
                d2 = hx * hx + hy * hy + hz * hz
                ok_dsc = ((kind == 2.0) & (dn_ != 0.0) & (t_dsc > 0.0)
                          & (d2 < r2))
                ok_ap = ok_sph | ok_dsc
                t_ap = jnp.where(
                    ok_ap, jnp.where(kind == 1.0, t_sph, t_dsc), _INF)
                t_ap = jnp.where(t_ap < bt_a, t_ap, _INF)
                bt_ap = jnp.min(t_ap, axis=0, keepdims=True)   # [1, br]
                bi_ap = jnp.min(
                    jnp.where(t_ap <= bt_ap, ap_lane, i32(0x7FFFFFFF)),
                    axis=0, keepdims=True)
                oh_ap = (ap_lane == bi_ap).astype(f32)
                pay = jax.lax.dot_general(
                    apay_ref[:], oh_ap, nd_, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)        # [16, br]
                bt_rows.append(bt_ap)
                pay_per_b.append(pay)
            bt_apw = (bt_rows[0] if B == 1
                      else jnp.concatenate(bt_rows, axis=0))    # [B, br]

            def _payf(f):
                if B == 1:
                    return pay_per_b[0][f:f + 1, :]
                return jnp.concatenate(
                    [pay_per_b[ba][f:f + 1, :] for ba in range(B)], axis=0)

            ap_better = bt_apw < best_t
            best_t = jnp.where(ap_better, bt_apw, best_t)
            albedo = _where3(ap_better, (_payf(0), _payf(1), _payf(2)),
                             albedo)
            ior = jnp.where(ap_better, _payf(3), ior)
            tpacked = jnp.where(ap_better, jnp.round(_payf(4)).astype(i32),
                                tpacked)
            emission = _where3(ap_better, (_payf(5), _payf(6), _payf(7)),
                               emission)
            c_sel = (_payf(8), _payf(9), _payf(10))
            n_dsc = (_payf(11), _payf(12), _payf(13))
            kind_sel = _payf(14)
            hp_ap = _add3(o, _scale3(d, best_t))
            n_sph = _normalize3(_add3(hp_ap, _scale3(c_sel, -1.0)))
            n_ap_v = _where3(kind_sel > 1.5, n_dsc, n_sph)
            normal = _where3(ap_better, n_ap_v, normal)

        if _count_oracle and reflag > 0 and not hbm:
            # Diagnostic: the "true-need union" — blocks a perfect cull
            # (converged best_t known up front) would still have to walk.
            # tin_ref rows hold tin * _SLAB_LO where the slab hit, INF
            # elsewhere, so one compare against the final best_t gives the
            # unavoidable per-bundle count (quarter-need when subq > 1,
            # matching the quarter-walk counter's units):
            nd_i = (tin_ref[:] < best_t).astype(i32)
            if subq == 1:
                need = jnp.max(nd_i, axis=1, keepdims=True)
            else:
                need = sum(
                    jnp.max(nd_i[:, qq * WQ:(qq + 1) * WQ], axis=1,
                            keepdims=True)
                    for qq in range(subq))
            ki_ref[6:7, 0:1] = ki_ref[6:7, 0:1] + jnp.sum(
                need, axis=0, keepdims=True)

        found = (best_t < _BIG) & (best_t > 0.0)
        live = active & found

        # ---- shading ------------------------------------------------------
        # All per-lane state is [B, br] bundle blocks (finding 66): at
        # B=8 every elementwise op below fills whole vregs. Component
        # tuples keep the original op sequence — per-lane arithmetic is
        # bitwise-identical at every B.
        tp = (sh_ref[0:B, :], sh_ref[B:2 * B, :], sh_ref[2 * B:3 * B, :])
        color = (sh_ref[3 * B:4 * B, :], sh_ref[4 * B:5 * B, :],
                 sh_ref[5 * B:6 * B, :])

        em_on = live & (tpacked >= 4)
        color = _add3(color, _where3(
            em_on, (tp[0] * emission[0], tp[1] * emission[1],
                    tp[2] * emission[2]),
            (jnp.zeros_like(tp[0]),) * 3))

        rng_b = bounce + np.int32(7) + seed
        # All four draws in one [4B, br] hash chain (row c*B+b is
        # bundle b's stream-constant-c draw — bitwise-identical to four
        # [B, br] calls; finding 65 density):
        _i4 = jax.lax.broadcasted_iota(i32, (4 * B, br), 0) // i32(B)
        u4 = _u01(jnp.concatenate([pid] * 4, axis=0),
                  jnp.concatenate([rng_b] * 4, axis=0), _i4)
        u0, u1 = u4[0:B, :], u4[B:2 * B, :]
        u2, u3 = u4[2 * B:3 * B, :], u4[3 * B:4 * B, :]
        # Never-true fold mask for the marginal-cost probes below: the
        # compiler cannot prove best_t != -1234.5e12, so probe results
        # folded through it are computed but change nothing (bitwise):
        _nvr = best_t == np.float32(-1234.5e12)
        if _timing_double_rng:
            u4b = _u01(jnp.concatenate([pid] * 4, axis=0),
                       jnp.concatenate([rng_b ^ np.int32(0x777)] * 4,
                                       axis=0), _i4)
            u3 = jnp.where(_nvr, u4b[3 * B:4 * B, :], u3)

        hit_p = _add3(o, _scale3(d, best_t))
        d_diff = _sample_diffuse(normal, u0, u1)
        d_spec = _reflect(d, normal)
        d_diel, refracted = _dielectric(d, normal, ior, u2)
        mtype = tpacked & 3
        is_diff = mtype == 0
        is_spec = mtype == 1
        new_d = _where3(is_diff, d_diff, _where3(is_spec, d_spec, d_diel))
        if _timing_double_bxdf:
            # Re-run the three BxDF samplers on permuted inputs (CSE-
            # distinct) and fold via the never-true mask — marginal =
            # the samplers' cost:
            dd2 = _sample_diffuse(normal, u1, u0)
            ds2 = _reflect(d, (normal[2], normal[0], normal[1]))
            dl2, _rf2 = _dielectric(d, normal, ior, u3)
            _s = (dd2[0] + dd2[1] + dd2[2] + ds2[0] + ds2[1] + ds2[2]
                  + dl2[0] + dl2[1] + dl2[2])
            new_d = _where3(_nvr, (_s, _s, _s), new_d)
        scale_tp = is_diff | is_spec | ((mtype == 2) & refracted)
        stp = live & scale_tp
        tp = _where3(stp, (tp[0] * albedo[0], tp[1] * albedo[1],
                           tp[2] * albedo[2]), tp)

        # Next-segment origin, pre-offset (ops/bxdf.py offset_ray_origin):
        mag = 1.0 + jnp.maximum(jnp.maximum(jnp.abs(hit_p[0]),
                                            jnp.abs(hit_p[1])),
                                jnp.abs(hit_p[2]))
        sgn = jnp.sign(_dot3(normal, new_d))
        sgn = jnp.where(sgn == 0.0, 1.0, sgn)
        m_off = mag * np.float32(RAY_EPSILON) * sgn
        o = _where3(live, _add3(hit_p, _scale3(normal, m_off)), o)
        d = _where3(live, new_d, d)

        # Roulette:
        p_r = jnp.maximum(jnp.maximum(tp[0], tp[1]), tp[2])
        stop_r = (p_r == 0.0) | (u3 > p_r)
        safe_p = jnp.where(p_r == 0.0, 1.0, p_r)
        use_roulette = bounce > roulette_start_depth
        rl = use_roulette & live & ~stop_r
        tp = _where3(rl, (tp[0] / safe_p, tp[1] / safe_p, tp[2] / safe_p),
                     tp)
        killed = live & use_roulette & stop_r

        escaped = active & ~found
        bounce = bounce + 1
        over = live & (bounce >= max_path_length)

        # ---- environment light (NIF MLP on the MXU, in-kernel) ------------
        # Escaped lanes add throughput * env(direction). The whole Fourier-
        # feature MLP runs in bf16 with f32 accumulation on [P, br] slabs —
        # the in-kernel twin of nif/model.py NifModel.apply (ref:
        # TraceCodelets.cpp:321-382 pre/post-process + IpuScene.cpp:506-537).
        # With env_every > 1, escaped lanes PARK in a pending state and the
        # MLP flushes them in batches — its [P, br] cost is per-call, not
        # per-lane, so deferring amortises it env_every-fold on interior
        # scenes where escapes trickle:
        if env_cfg is not None:
            P_, E_, layers_, log_tm = env_cfg
            env_ref[:] = jnp.zeros((8, B * br), f32)

            def _env(ba=0):
                bf16 = jnp.bfloat16
                rot = econ_ref[0:1, 0:1]
                maxv = econ_ref[0:1, 1:2]
                d_e = (d[0][ba:ba + 1, :], d[1][ba:ba + 1, :],
                       d[2][ba:ba + 1, :])
                dy = jnp.clip(d_e[1], -1.0, 1.0)
                theta = _acos(dy)
                phi = _atan2(d_e[2], d_e[0]) + rot
                two_pi = np.float32(2.0 * np.pi)
                phi = jnp.where(phi < 0.0, phi + two_pi, phi)
                phi = jnp.where(phi > two_pi, phi - two_pi, phi)
                un = 2.0 * (theta * np.float32(1.0 / np.pi) - 1.0)
                vn = 2.0 * (phi * np.float32(0.5 / np.pi) - 1.0)
                # 2^e from an int iota (pallas kernels cannot capture
                # host constants; f32 iota doesn't lower in Mosaic):
                coeff = jnp.round(jnp.exp(
                    np.float32(np.log(2.0))
                    * jax.lax.broadcasted_iota(i32, (E_, 1), 0).astype(f32)))
                pu = un * coeff                       # [E, br]
                pv = vn * coeff
                feats = jnp.concatenate(
                    [jnp.sin(pu), jnp.sin(pv), jnp.cos(pu), jnp.cos(pv)],
                    axis=0)                            # [4E, br]
                x = jnp.concatenate(
                    [feats, jnp.zeros((P_ - 4 * E_, br), f32)], axis=0)
                ndm = (((1,), (0,)), ((), ()))
                for l, (cin, cout, relu, concat) in enumerate(layers_):
                    if concat:
                        prev = cin - 4 * E_
                        x = jnp.concatenate(
                            [x[0:prev], feats,
                             jnp.zeros((P_ - cin, br), f32)], axis=0)
                    w = wmlp_ref[pl.ds(l * P_, P_), :]
                    y = jax.lax.dot_general(w, x.astype(bf16), ndm,
                                            preferred_element_type=f32)
                    y = y + ebias_ref[:, l:l + 1]
                    if relu:
                        y = jnp.maximum(y, 0.0)
                    if l + 1 < len(layers_):
                        x = jnp.concatenate(
                            [y[0:cout],
                             jnp.zeros((P_ - cout, br), f32)], axis=0)
                    else:
                        x = y
                bgr = (x[0:1] * maxv + econ_ref[0:1, 2:3],
                       x[1:2] * maxv + econ_ref[0:1, 3:4],
                       x[2:3] * maxv + econ_ref[0:1, 4:5])
                if log_tm:
                    bgr = (jnp.exp(bgr[0]), jnp.exp(bgr[1]), jnp.exp(bgr[2]))
                env_ref[0:1, _bcols(ba)] = bgr[2]      # BGR -> RGB
                env_ref[1:2, _bcols(ba)] = bgr[1]
                env_ref[2:3, _bcols(ba)] = bgr[0]

            if env_every == 1:
                for ba in range(B):
                    pl.when(jnp.max(
                        escaped[ba:ba + 1, :].astype(i32)) > 0)(
                        functools.partial(_env, ba))
                env_mask = escaped
                terminated = escaped | killed | over
            else:
                pending = (ki_ref[5 * B:6 * B, :] != 0) | escaped
                survivors = live & ~killed & ~over
                em_rows = []
                for ba in range(B):
                    pend_b = pending[ba:ba + 1, :]
                    flush = (
                        (jax.lax.rem(it, i32(env_every))
                         == i32(env_every - 1))
                        | (jnp.sum(
                            survivors[ba:ba + 1, :].astype(i32)) == 0)
                    )
                    if env_count > 0:
                        # Flush-on-count: the MLP's [P, br] cost is
                        # per-call, so fire as soon as a worthwhile
                        # batch of lanes has parked instead of waiting
                        # out the clock (the cadence above remains the
                        # max-wait bound that keeps max_iters valid).
                        # Pure scheduling — the estimator is bitwise-
                        # identical across triggers.
                        flush = flush | (
                            jnp.sum(pend_b.astype(i32))
                            >= i32(env_count))
                    pl.when(flush
                            & (jnp.max(pend_b.astype(i32)) > 0))(
                        functools.partial(_env, ba))
                    em_rows.append(pend_b & flush)
                env_mask = (em_rows[0] if B == 1
                            else jnp.concatenate(em_rows, axis=0))
                terminated = killed | over | env_mask
                pending_hold = pending & ~env_mask
                ki_ref[5 * B:6 * B, :] = pending_hold.astype(i32)
                # Parked lanes leave the tracing pool until their flush:
                active = active & ~escaped
            env_rgb = tuple(
                _gather_rows(env_ref, [c])[:, 0:br] if B == 1 else
                jnp.concatenate(
                    [env_ref[c:c + 1, _bcols(ba)] for ba in range(B)],
                    axis=0)
                for c in range(3))
            color = _add3(color, _where3(
                env_mask,
                (tp[0] * env_rgb[0], tp[1] * env_rgb[1],
                 tp[2] * env_rgb[2]),
                (jnp.zeros_like(tp[0]),) * 3))
        else:
            terminated = escaped | killed | over

        # ---- bank finished paths into the accumulator ---------------------
        # Per-bundle [3J, br] banking passes against the bundle's accum
        # columns (the [3J, *] slab cannot widen across bundles; per-lane
        # cost is unchanged):
        j_cur = k // spp
        for bb in range(B):
            colorx = jnp.where(
                csel == 0, color[0][bb:bb + 1, :],
                jnp.where(csel == 1, color[1][bb:bb + 1, :],
                          color[2][bb:bb + 1, :]))
            bank = (jsel == j_cur[bb:bb + 1, :]) & terminated[bb:bb + 1, :]
            accum_ref[:, _bcols(bb)] = (accum_ref[:, _bcols(bb)]
                                        + jnp.where(bank, colorx, 0.0))
            if _timing_double_bank:
                # Second banking pass whose mask is ANDed with the never-
                # true fold — adds +0.0 everywhere (accum holds only
                # non-negative values, so x + 0.0 is bitwise x); marginal
                # = the [3J, br] banking slab cost:
                colorx2 = jnp.where(
                    csel == 0, color[2][bb:bb + 1, :],
                    jnp.where(csel == 1, color[0][bb:bb + 1, :],
                              color[1][bb:bb + 1, :]))
                accum_ref[:, _bcols(bb)] = (
                    accum_ref[:, _bcols(bb)]
                    + jnp.where(bank & _nvr[bb:bb + 1, :], colorx2, 0.0))
        ki_ref[3 * B:4 * B, :] = (ki_ref[3 * B:4 * B, :]
                                  + terminated.astype(i32))

        k = jnp.where(terminated, jnp.minimum(k + 1, K), k)
        active = active & ~terminated
        bounce = jnp.where(terminated, 0, bounce)
        color = _where3(terminated, (jnp.zeros_like(color[0]),) * 3, color)

        # ---- regenerate idle slots ----------------------------------------
        can_spawn = ~active & (k < k_cap)
        if env_cfg is not None and env_every > 1:
            can_spawn = can_spawn & ~pending_hold
        co, cd = camera_ray(k)
        if _timing_double_camera:
            # Extra camera_ray on a CSE-distinct path index, folded via
            # the never-true mask — marginal = full regen cost:
            co2, cd2 = camera_ray(k + i32(1))
            co = _where3(_nvr, cd2, co)
            cd = _where3(_nvr, co2, cd)
        o = _where3(can_spawn, co, o)
        d = _where3(can_spawn, cd, d)
        tp = _where3(can_spawn, (jnp.ones_like(tp[0]),) * 3, tp)
        active = active | can_spawn

        for c in range(3):
            ray_ref[c * B:(c + 1) * B, :] = o[c]
            ray_ref[(3 + c) * B:(4 + c) * B, :] = d[c]
            sh_ref[c * B:(c + 1) * B, :] = tp[c]
            sh_ref[(3 + c) * B:(4 + c) * B, :] = color[c]
        ki_ref[0:B, :] = k
        ki_ref[B:2 * B, :] = bounce
        ki_ref[2 * B:3 * B, :] = active.astype(i32)

        alive = active
        if env_cfg is not None and env_every > 1:
            alive = alive | pending_hold
        return it + 1, jnp.sum(alive.astype(i32))

    def cond(carry):
        it, n_active = carry
        return (it < max_iters) & (n_active > 0)

    it_end, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.sum((k_cap > 0).astype(i32)))
    )
    for b in range(B):
        done_ref[0:1, _bcols(b)] = ki_ref[3 * B + b:3 * B + b + 1, :]
    # Stats row: lane 0 = iterations, lane 1 = quarter-walks (== block
    # walks when subq == 1; the host divides by subq for
    # block-equivalents), lane 2 = oracle true-need blocks
    # (when _count_oracle), lane 3 = deferred-payload winner blocks.
    # Counters live in the shared 4*B / 6*B rows; the stats row spans
    # the full B*br output width (host sums lane k over programs, so
    # only the first lane-block's values may be non-zero):
    lane_w = jax.lax.broadcasted_iota(i32, (1, B * br), 1)
    stats = jnp.where(lane_w == 0, it_end, 0)
    stats = jnp.where(lane_w == 1, ki_ref[4 * B:4 * B + 1, 0:1], stats)
    stats = jnp.where(lane_w == 2, ki_ref[6 * B:6 * B + 1, 0:1], stats)
    stats = jnp.where(lane_w == 3, ki_ref[4 * B:4 * B + 1, 1:2], stats)
    done_ref[1:2, :] = stats


# ---------------------------------------------------------------------------
# Host wrapper.
# ---------------------------------------------------------------------------
def pack_env_mlp(config, env_params):
    """Pack a NIF env MLP (nif/model.py contract) for in-kernel evaluation.

    Returns ``(env_cfg, (wstack, ebias, econst))``:

    * ``env_cfg`` — static, hashable: (P, E, layers, log_tone_map) where
      ``layers`` is a tuple of (cin_total, cout, relu, concat) and P is the
      128-padded feature width;
    * ``wstack`` — [L*P, P] bf16: layer l's transposed kernel at rows
      [l*P, l*P+cout), columns [0, cin);
    * ``ebias`` — [P, L] f32: layer l's bias in column l (added in f32
      after the matmul, matching NifModel.apply exactly — folding biases
      through the bf16 matmul would quantise them);
    * ``econst`` — [1, 128] f32: rotation, decode max, decode mean (BGR).

    The matmuls run in bf16 on the MXU with f32 accumulation — the same
    compute contract as the XLA path (NifModel.apply) and the reference's
    fp16 partials (ref src/IpuScene.cpp:255-262)."""
    E = config.embedding_dimension
    # The kernel reconstructs the 2^e Fourier coefficients as
    # round(exp(ln2 * iota)) — exact only while f32 exp error stays under
    # 0.5 absolute, which holds to ~2^20 (the reference's NIFs use E=12):
    if E > 20:
        raise ValueError(
            f"in-kernel env MLP supports embedding_dimension <= 20 "
            f"(f32 exp reconstruction of 2^e); got {E}")
    e4 = 4 * E
    kernels = env_params["kernels"]
    biases = env_params["biases"]
    L = len(kernels)
    layers = []
    maxdim = e4
    for i, k in enumerate(kernels):
        cin = int(k.shape[0])
        cout = int(k.shape[1])
        layers.append((cin, cout, config.activations[i] == "relu",
                       bool(config.concat_before[i])))
        maxdim = max(maxdim, cin, cout)
    P = -(-(maxdim + 1) // 128) * 128
    wstack = jnp.zeros((L * P, P), jnp.float32)
    ebias = jnp.zeros((P, L), jnp.float32)
    for l, (k, b) in enumerate(zip(kernels, biases)):
        cin, cout = int(k.shape[0]), int(k.shape[1])
        wstack = wstack.at[l * P:l * P + cout, 0:cin].set(k.T)
        ebias = ebias.at[0:cout, l].set(b)
    econst = jnp.zeros((1, 128), jnp.float32)
    econst = econst.at[0, 0].set(
        jnp.asarray(env_params.get("rotation", 0.0), jnp.float32))
    econst = econst.at[0, 1].set(env_params["max"])
    econst = econst.at[0, 2:5].set(env_params["mean"])
    env_cfg = (P, E, tuple(layers), bool(config.log_tone_map))
    return env_cfg, (wstack.astype(jnp.bfloat16), ebias, econst)


def _analytic_tables(scene):
    """Pack spheres + discs (geometry and material) into the kernel's two
    tiny tables: ap [P, 16] (per-prim rows) and apay [16, P] (transposed,
    for the one-hot payload dot). Padding rows have kind == 0."""
    sph = scene.spheres          # [S, 4] cx cy cz r (padded >= 1 row)
    dsc = scene.discs            # [D, 7] nx ny nz cx cy cz r
    S, D = sph.shape[0], dsc.shape[0]
    P = -(-(S + D) // 8) * 8

    def matp(geom_ids):
        mid = scene.mat_id[jnp.clip(geom_ids, 0, scene.mat_id.shape[0] - 1)]
        alb = scene.mat_albedo[mid]
        ior = scene.mat_ior[mid]
        tpk = (scene.mat_type[mid] + 4 * scene.mat_emissive[mid]).astype(
            jnp.float32)
        em = scene.mat_emission[mid]
        return alb, ior, tpk, em

    ap = jnp.zeros((P, 16), jnp.float32)
    apay = jnp.zeros((16, P), jnp.float32)

    s_kind = jnp.where(sph[:, 3] > 0.0, 1.0, 0.0)
    ap = ap.at[:S, 0].set(s_kind)
    ap = ap.at[:S, 1:4].set(sph[:, 0:3])
    ap = ap.at[:S, 7].set(sph[:, 3] * sph[:, 3])
    alb, ior, tpk, em = matp(scene.sphere_geom)
    apay = apay.at[0:3, :S].set(alb.T)
    apay = apay.at[3, :S].set(ior)
    apay = apay.at[4, :S].set(tpk)
    apay = apay.at[5:8, :S].set(em.T)
    apay = apay.at[8:11, :S].set(sph[:, 0:3].T)
    apay = apay.at[14, :S].set(s_kind)

    d_kind = jnp.where(dsc[:, 6] > 0.0, 2.0, 0.0)
    ap = ap.at[S:S + D, 0].set(d_kind)
    ap = ap.at[S:S + D, 1:4].set(dsc[:, 3:6])
    ap = ap.at[S:S + D, 4:7].set(dsc[:, 0:3])
    ap = ap.at[S:S + D, 7].set(dsc[:, 6] * dsc[:, 6])
    # Disc plane offset: same |c . n| convention as ops/intersect.py:
    ap = ap.at[S:S + D, 8].set(
        jnp.abs(jnp.sum(dsc[:, 0:3] * dsc[:, 3:6], axis=-1)))
    alb, ior, tpk, em = matp(scene.disc_geom)
    apay = apay.at[0:3, S:S + D].set(alb.T)
    apay = apay.at[3, S:S + D].set(ior)
    apay = apay.at[4, S:S + D].set(tpk)
    apay = apay.at[5:8, S:S + D].set(em.T)
    apay = apay.at[8:11, S:S + D].set(dsc[:, 3:6].T)
    apay = apay.at[11:14, S:S + D].set(dsc[:, 0:3].T)
    apay = apay.at[14, S:S + D].set(d_kind)
    return ap, apay, P


@functools.partial(
    jax.jit,
    static_argnames=("params", "slots", "j_per_slot", "spp", "max_iters",
                     "k_total",
                     "br", "interpret", "use_cull", "sub", "subq", "reflag",
                     "walk_fresh", "walk_near", "pay_fused",
                     "walk_compact", "walk_unroll", "pay_unroll",
                     "walk_mxu", "walk_cull2", "tin16",
                     "env_cfg", "env_every", "env_count", "hbm", "hbm_reflag",
                     "hbm_cull3",
                     "hbm_sub", "hbm_wu", "hbm_pay_gate", "hbm_pb_stage",
                     "bundles",
                     "return_stats", "_timing_no_dots", "_timing_no_walk",
                     "_timing_cull_only", "_timing_stub_walk",
                     "_timing_const_pb",
                     "_timing_double_pay", "_timing_double_prep",
                     "_timing_double_scan", "_timing_double_refine",
                     "_timing_double_dense", "_timing_double_gate",
                     "_timing_double_dense_fixed",
                     "_timing_double_dma",
                     "_timing_double_vdense", "_timing_double_vdense_const",
                     "_timing_double_camera", "_timing_double_bxdf",
                     "_timing_double_rng", "_timing_double_bank",
                     "_count_oracle"),
)
def megakernel_path_trace(
    scene,
    rows: jnp.ndarray,          # [slots * j_per_slot] f32 (padded stream)
    cols: jnp.ndarray,
    seed: jnp.ndarray,          # u32/i32 scalar
    n_valid: jnp.ndarray,       # i32 scalar: real pixel count in the stream
    *,
    params,
    slots: int,
    j_per_slot: int,
    spp: int,
    max_iters: int,
    j0: jnp.ndarray | int = 0,  # dynamic pixel-group offset: this dispatch
                                # serves padded-stream rows [j0, j0+J) of a
                                # k_total-path global schedule (pid/pixel
                                # mappings match the full dispatch exactly,
                                # so group unions are bitwise-identical —
                                # render/streaming.py readback overlap)
    k_total: int | None = None,  # static global paths-per-slot (defaults
                                 # to J*spp: no split)
    br: int = BR,
    interpret: bool = False,
    use_cull: bool = True,
    sub: int | None = None,
    subq: int = 1,     # lane-quarter walk granularity (1/2/4): each
                       # width-(br/subq) lane slice walks only ITS
                       # flagged blocks (experiments/subbundle_sim.py:
                       # Q=4 cuts pair-ops 1.86x on the production mix)
    reflag: int | None = None,
                       # mid-walk refresh count; swept per-br at the
                       # bench workload (experiments/reflag_sweep.py).
                       # None resolves per mode: 1 for the compacted
                       # flat walk (each extra segment re-runs the
                       # rank/extract prep: rf1 9.22 >= rf3 9.19 > rf5
                       # 8.64 Mpaths/s at br=512, 2026-08-18), 3 for the
                       # gated flat and two-level walks (the 64k-tri
                       # two-level scene loses 27% at rf1).
    env_cfg=None,
    env_weights=None,
    env_every: int = 1,
    env_count: int = 0,   # flush-on-count: fire the deferred env flush as
                          # soon as >= this many lanes are parked (0 = off;
                          # env_every stays the max-wait clock). Only
                          # meaningful with env_every > 1.
    hbm: bool = False,
    hbm_reflag: int = 64,
    hbm_cull3: bool | None = None,  # third cull level for the HBM walk
                                 # (round 5): coarse super-GROUP union
                                 # slab pass (tables.sgaabb, appended to
                                 # the kernel's AABB table) + refinement
                                 # of flagged groups' supers — the
                                 # walk_cull2 monotonic-containment
                                 # argument one level up, bitwise-
                                 # identical flags. Replaces the flat
                                 # [ns, br] super slab pass (~8,200 rows
                                 # per bounce iteration at 8.4M tris).
                                 # None = auto (off pending the hardware
                                 # A/B); RAY_HBM_CULL3 overrides via
                                 # streaming.
    hbm_sub: int | None = None,  # dense granularity of the HBM member
                                 # walk: each member block's dense test
                                 # runs as hbm_sub gated [TB/hbm_sub, br]
                                 # row windows against 128/hbm_sub-tri
                                 # AABBs (the flat walk's sub-block
                                 # selectivity, finding 36, on the
                                 # streamed walk). Bitwise-identical
                                 # across values (sequential strict-<
                                 # merge). MEASURED NEUTRAL 2026-08-18
                                 # (522k br512: hsub2 466.5 vs hsub1
                                 # 468.0 us/iter despite a 34% pair-row
                                 # cut; hsub4 529.3): the [64, br] chain
                                 # is latency-bound — finding 47's width
                                 # lesson holds on the SUBLANE axis too.
                                 # None resolves to 1; forced 1 under
                                 # subq > 1. Knob kept as the record.
    hbm_wu: int | None = None,   # group-unrolled streamed member walk
                                 # (finding 57): one scalar gate per
                                 # hbm_wu in-slab windows; the group
                                 # computes every member window's dense
                                 # chain together (the compact VMEM
                                 # walk's finding-52 ILP mechanism) and
                                 # folds winners in ascending window
                                 # order, each masked by its own member
                                 # flag — bitwise-identical to the
                                 # per-window gated walk. None resolves
                                 # to 1 pending the hardware A/B; forced
                                 # 1 under subq > 1 / hbm_pb_stage.
                                 # RAY_HBM_WU overrides via streaming.
    hbm_pay_gate: bool = True,   # winner-gated in-slab payload (the
                                 # finding-39 deferral for the HBM walk):
                                 # bitwise-identical by construction,
                                 # knob kept for A/B + gating tests.
    hbm_pb_stage: bool = False,  # stage each walked member block's
                                 # [TB, 16] p slab through a lane-offset-0
                                 # scratch before the coefficient-column
                                 # broadcasts (identical values/maths —
                                 # bitwise). MEASURED NEGATIVE 2026-08-18
                                 # (522k: 511.9 vs 468.8 us/iter): the
                                 # copy costs more than any mid-tile
                                 # lane-slice relayout it avoids — HBM
                                 # dense tests already run at the VMEM
                                 # walk's per-pair cost (~17.7 ps/pair).
                                 # Knob kept as the measured record.
    walk_unroll: int | None = None,
                                 # dense tests per compact-walk loop
                                 # iteration (amortises branch/refill;
                                 # tail re-walks are bitwise no-ops).
                                 # Swept 2026-08-18 at br512/rf1: wu2
                                 # 16.65 < wu1 16.9 < wu4 17.55 us/iter
                                 # (pad re-walks are real dense tests,
                                 # so wide unrolls lose).
    pay_unroll: int = 4,         # pay_blocks per payload loop iteration
                                 # (tail slots use the zero-contribution
                                 # NBLK sentinel). Swept: pu4 15.84 <
                                 # pu2 16.13 < pu1 16.9 us/iter; pu8 ==
                                 # pu4. wu2+pu4 together: 15.57 us/iter,
                                 # 10.32 Mpaths/s (from 9.51).
    walk_mxu: bool = False,      # compute the compact walk's six dense
                                 # coefficient dots on the MXU: one
                                 # [U*TBW, 16] x [16, 6*br] HIGHEST
                                 # matmul per unroll group instead of
                                 # ~30 VPU ops/pair of FMA chains. NOT
                                 # bitwise vs the VPU walk (6-pass bf16
                                 # split rounding); the acceptance band
                                 # widens 2x to keep the watertight
                                 # contract rigorous. RAY_MXU=1 in
                                 # streaming.
    tin16: bool | None = None,   # store the [nbs, br] per-lane entry-
                                 # bound scratch (mid-walk refreshes) in
                                 # bf16 with a conservative pre-round
                                 # shrink: bitwise-identical radiometry
                                 # (kept-extra blocks can't beat the
                                 # best_t they were kept against), half
                                 # the scratch VMEM + refresh read
                                 # bytes — which lets the degrade
                                 # ladder keep granularity twice as
                                 # fine near the VMEM ceiling. None =
                                 # auto (on whenever reflag is on).
                                 # RAY_TIN16=0 in streaming to A/B.
    walk_cull2: bool | None = None,  # two-level flag computation for
                                 # the compacted VMEM walk: slab-test
                                 # 8-fine-row coarse union AABBs first,
                                 # then recompute only flagged groups'
                                 # fine rows — bitwise-identical flags
                                 # (f32 slab math is monotonic under box
                                 # containment) at a fraction of the
                                 # [nbs, br] flat-pass cost when flagged
                                 # groups are sparse. None = auto
                                 # (resolve_walk_policy: on past ~64
                                 # blocks, finding 56). RAY_CULL2 in
                                 # streaming.
    walk_fresh: bool | None = None,
                                 # fresh per-group walk gates (finding
                                 # 58): before each unroll group of the
                                 # compacted walk, re-check the group
                                 # windows' stored entry bounds against
                                 # the CURRENT best_t and skip settled
                                 # groups — captures the conservative-
                                 # cull overshoot (40% of walked
                                 # windows at sub=16/rf1 vs the
                                 # converged oracle) without the bulk
                                 # refresh's rank/extract re-runs.
                                 # Bitwise-identical (the refresh's own
                                 # lower-bound contract). Needs the
                                 # [nbs, br] tin scratch (allocated
                                 # when on, subject to the same 4 MB
                                 # cap). None = auto (off pending the
                                 # hardware A/B). RAY_FRESH overrides
                                 # via streaming.
    walk_near: bool = False,     # lexicographic (t, row) winner merge
                                 # (finding 59): makes the folded
                                 # winner row walk-order-INDEPENDENT
                                 # (min over (t, row) pairs), the
                                 # contract a near-ordered/reordered
                                 # walk would need. On ascending-index
                                 # walks it is a semantic no-op (a
                                 # later window's rows are strictly
                                 # larger, equal-t keeps the first =
                                 # lowest row) — bitwise-gated as such;
                                 # costs ~4 [1, br] vops/window, so
                                 # default off until a reordered walk
                                 # ships.
    pay_fused: bool | None = None,  # fused deferred-payload table
                                 # (tables.payt): one [64, TB] x
                                 # [TB, br] one-hot dot per winner
                                 # block instead of two dots + an
                                 # in-kernel bf16 split. Bitwise-
                                 # identical (see tables.payt). None =
                                 # auto (on whenever the scene built
                                 # the table — VMEM scenes up to
                                 # tables.PAYT_MAX_TRIS); RAY_PAYT=0/1
                                 # overrides the auto at the callers.
    walk_compact: bool = True,   # compacted flat walk + winner-payload
                                 # dispatch (finding 48): branch-free
                                 # index-list walks instead of per-block
                                 # pl.when gates; bitwise-identical (same
                                 # blocks, same order). A/B 2026-08-18:
                                 # 9.22 vs 8.15 Mpaths/s at br512/rf1.
                                 # RAY_WALK_COMPACT=0 restores the gated
                                 # walk (A/B escape hatch).
    bundles: int | None = None,  # bundle-lockstep width B (finding 66):
                                 # each kernel program advances B
                                 # independent br-lane bundles per
                                 # bounce iteration with per-lane state
                                 # held as [B, br] blocks (bundles on
                                 # sublanes) — at B=8 the elementwise
                                 # shading/RNG/regen pool fills whole
                                 # vregs instead of one sublane in 8,
                                 # while each bundle's cull/walk/payload
                                 # runs on its own row/column slices
                                 # (identical per-lane work + walk
                                 # order: radiometry bitwise-identical
                                 # to B=1 at every B). VMEM compact walk
                                 # only. None = auto (RAY_BUNDLES env
                                 # override via streaming).
    return_stats: bool = False,
    _timing_no_dots: bool = False,
    _timing_no_walk: bool = False,
    _timing_cull_only: bool = False,
    _timing_stub_walk: bool = False,
    _timing_const_pb: bool = False,
    _timing_double_pay: bool = False,
    _timing_double_prep: bool = False,
    _timing_double_scan: bool = False,
    _timing_double_refine: bool = False,
    _timing_double_dense: bool = False,
    _timing_double_gate: bool = False,
    _timing_double_dense_fixed: bool = False,
    _timing_double_dma: bool = False,
    _timing_double_vdense: bool = False,
    _timing_double_vdense_const: bool = False,
    _timing_double_camera: bool = False,
    _timing_double_bxdf: bool = False,
    _timing_double_rng: bool = False,
    _timing_double_bank: bool = False,
    _count_oracle: bool = False,
):
    """In-kernel streaming path trace. Returns (rgb [R*J, 3], done): the
    spp-averaged radiance of padded-stream pixel p at rgb[p] — everything
    but the tile-order unscramble happens on device."""
    R = slots
    J = j_per_slot
    K = J * spp
    assert R % br == 0, (R, br)
    nrb = R // br
    if bundles is None:
        bundles = 1
    if bundles not in (1, 2, 4, 8):
        raise ValueError(f"bundles must be 1, 2, 4 or 8, got {bundles}")
    if nrb % bundles:
        raise ValueError(
            f"slots/br = {nrb} ray bundles must divide by bundles="
            f"{bundles}")

    tables: BlockedSceneTables = scene.blocked
    ap, apay, n_ap = _analytic_tables(scene)
    rows2 = rows.reshape(J, R)
    cols2 = cols.reshape(J, R)
    sc = jnp.stack([
        jnp.asarray(seed).astype(jnp.uint32).astype(jnp.int32),
        jnp.asarray(n_valid).astype(jnp.int32),
        jnp.asarray(j0).astype(jnp.int32),
    ])

    tan_theta = float(np.tan(params.fov_radians / 2.0))
    if hbm:
        # HBM-streamed walk: the cull slab pass runs over SUPER AABBs and
        # the walk streams flagged supers' slabs (see kernel). Periodic
        # flag refreshes need a [ns, br] entry-bound scratch — enable
        # while it fits comfortably in VMEM:
        cull_on, sub, two_level = True, 1, False
        if not (hbm_reflag >= 1 and hbm_reflag & (hbm_reflag - 1) == 0):
            # ValueError (not assert): the kernel masks the stream
            # counter with hbm_reflag-1, so 0/non-powers silently
            # mis-time or disable the refresh under python -O:
            raise ValueError(
                f"hbm_reflag must be a power of two >= 1, got {hbm_reflag}")
        if tin16 is None:
            tin16 = True
        reflag = (1 if tables.num_supers * br * (2 if tin16 else 4)
                  <= (4 << 20) else 0)
        nb_kern = tables.num_supers
        # Third cull level (hbm_cull3): the coarse super-group union
        # AABBs ride APPENDED to the kernel's VMEM AABB table at rows
        # [ns_pad, ns_pad + ns_pad/SB) — no new kernel input needed.
        # The super rows pad to a multiple of SB with inverted boxes
        # (flags stay 0, the walk never visits them) so the refinement
        # windows are whole SB-row slices at SB-aligned dynamic offsets
        # — Mosaic requires static proof of sublane alignment, and
        # ``g * SB`` provides it where a clamped form does not:
        cull3_on = bool(hbm_cull3) and tables.sgaabb is not None
        baabb = tables.saabb
        if cull3_on:
            ns_pad = (-tables.num_supers) % SB
            if ns_pad:
                inv = jnp.concatenate([
                    jnp.full((ns_pad, 3), jnp.inf, jnp.float32),
                    jnp.full((ns_pad, 3), -jnp.inf, jnp.float32),
                    jnp.zeros((ns_pad, 2), jnp.float32)], axis=1)
                baabb = jnp.concatenate([baabb, inv])
                nb_kern = nb_kern + ns_pad
            baabb = jnp.concatenate([baabb, tables.sgaabb])
        # VMEM-sized scenes: the fused pn8 slab carries both the p
        # coefficients and the nrm payload chunks (one DMA per super).
        # Bigger scenes split the payload into the bf16 pay8 table
        # (tables.py; ~32% less HBM + DMA). The VMEM nrm table is unused
        # here (and not built at all above the VMEM ceiling):
        p_in = tables.pn8
        nrm_in = jnp.zeros((8, 128), jnp.float32)
        pay_fused = False      # HBM payload rides pn8/pay8, not nrm
        hbm_split = tables.pay8 is not None
        pay_in = (tables.pay8 if hbm_split
                  else jnp.zeros((8, 128), jnp.bfloat16))
    else:
        cull3_on = False
        cull_on = use_cull and tables.num_blocks > 1
        if tin16 is None:
            # Auto: always on — bitwise-identical radiometry, half the
            # refresh-scratch VMEM and read bytes (and hence a 2x-finer
            # degrade-ladder ceiling). RAY_TIN16=0 is the A/B hatch.
            tin16 = True
        tin_bytes = 2 if tin16 else 4
        pol = resolve_walk_policy(tables.num_blocks, br,
                                  walk_compact and use_cull)
        if sub is None:
            # Joint auto policy (resolve_walk_policy — the measured
            # sub/reflag/cull2 trade table; findings 36/48/52/54/56).
            # The gated fallback (RAY_WALK_COMPACT=0 / subq > 1) keeps
            # the round-2 policy (sub=2 small, two-level past 128
            # blocks):
            sub = pol["sub"] if cull_on else 1
        sub = sub if cull_on else 1
        assert sub in (1, 2, 4, 8, 16), sub
        # Two-level walk for big VMEM scenes: the flat walk's per-block
        # scalar gate + [nb, br] slab pass dominate iterations at
        # hundreds of blocks; cull at SUPER granularity and refine member
        # blocks per flagged super instead (VERDICT r2 #5):
        two_level = (cull_on and sub == 1
                     and tables.num_blocks > TWO_LEVEL_MIN_BLOCKS
                     and tables.num_supers > 1)
        nb_kern = tables.num_supers if two_level else tables.num_blocks
        if reflag is None:
            # Mode default from the same joint policy: ONE refresh on
            # small compacted scenes, NONE past ~64 blocks (refresh +
            # per-segment prep re-runs measure -20% at fine granularity
            # on the stress terrains, finding 56); the gated flat and
            # two-level walks keep the swept 3 (the 64k-tri two-level
            # scene loses 27% at rf1):
            reflag = pol["reflag"] if not two_level else 3
        if walk_cull2 is None:
            # Auto from the joint policy (off below ~64 blocks — forced
            # on at the 512-row bench scene it measures 13.39 vs 11.14
            # us/iter; on everywhere the flat pass is big, finding 56):
            walk_cull2 = pol["cull2"]
        if (cull_on and not two_level and reflag > 0
                and nb_kern * sub * br * tin_bytes >= (4 << 20)):
            # The reflag entry-bound scratch is [nb*sub, br] (bf16 under
            # tin16); near the 64k-tri VMEM ceiling with sub > 1 and a
            # FORCED reflag > 0 it can reach 8 MB on top of the resident
            # tables and fail to compile (auto configs never get here —
            # big scenes run rf=0). Degrade gracefully (cap 4 MB): halve
            # the sub-block granularity first, then drop reflag itself:
            while sub > 1 and nb_kern * sub * br * tin_bytes >= (4 << 20):
                sub //= 2
            if nb_kern * sub * br * tin_bytes >= (4 << 20):
                reflag = 0
        if tables.p is None:
            raise RuntimeError(
                "VMEM-layout p table was skipped at build time (scene "
                "exceeds tables.VMEM_TABLE_MAX_TRIS); use the "
                "pallas-hbm intersector, or rebuild with "
                "build_scene(..., intersector='pallas') to force it")
        p_in = tables.p
        if pay_fused is None:
            # Auto: bind the fused payload table whenever the build made
            # one (small VMEM scenes; tables.PAYT_MAX_TRIS):
            pay_fused = tables.payt is not None
        if pay_fused and tables.payt is None:
            raise RuntimeError(
                "pay_fused=True but the scene has no fused payload table "
                "(tables.payt is only built for VMEM scenes up to "
                "tables.PAYT_MAX_TRIS)")
        # The fused table rides the nrm kernel slot (the deferred payload
        # pass is that slot's only consumer; shapes differ, the static
        # pay_fused flag selects the read layout):
        nrm_in = tables.payt if pay_fused else tables.nrm
        hbm_split = False
        pay_in = jnp.zeros((8, 128), jnp.bfloat16)
        if two_level:
            baabb = tables.saabb
        elif sub == 1:
            baabb = tables.baabb
        elif sub in (8, 16):
            fine = tables.baabb16 if sub == 8 else tables.baabb8
            if fine is None:
                raise RuntimeError(
                    f"sub={sub} needs the {TB // sub}-tri AABB table, "
                    "which is only built for VMEM-sized scenes "
                    "(tables.baabb16/baabb8)")
            baabb = fine
        elif sub == 4:
            baabb = tables.baabb32
        else:
            b32 = tables.baabb32
            baabb = jnp.concatenate([
                jnp.minimum(b32[0::2, 0:3], b32[1::2, 0:3]),
                jnp.maximum(b32[0::2, 3:6], b32[1::2, 3:6]),
                jnp.zeros((b32.shape[0] // 2, 2), jnp.float32),
            ], axis=1)
    if tin16 is None:      # hbm / cull-off paths fall through here
        tin16 = True
    if walk_cull2 is None:   # hbm path (supers already walk two-level)
        walk_cull2 = False
    nbs_c = nb_kern * sub if cull_on else 1
    reflag = reflag if cull_on else 0
    reflag_on = reflag > 0
    # Lane-quarter walks (flat, two-level and HBM dense tests): slices
    # must be whole (8, 128) vregs:
    if subq not in (1, 2, 4, 8):
        raise ValueError(f"subq must be 1, 2, 4 or 8, got {subq}")
    if not cull_on or br % (128 * subq):
        subq = 1
    # HBM member-walk dense granularity (see the hbm_sub param note):
    if hbm_sub is None:
        hbm_sub = 1
    if not hbm or subq > 1:
        hbm_sub = 1
    assert hbm_sub in (1, 2, 4), hbm_sub
    # Group-unrolled streamed member walk (see the hbm_wu param note):
    if hbm_wu is None:
        hbm_wu = 1
    if not hbm or subq > 1 or hbm_pb_stage:
        hbm_wu = 1
    assert hbm_wu in (1, 2, 4, 8), hbm_wu
    # Compacted flat walk (finding 48): only the flat VMEM walk uses it.
    # subq > 1 compacts one index list per lane quarter (finding 53):
    compact_on = (walk_compact and cull_on
                  and not (hbm or two_level))
    if bundles > 1 and not (compact_on and subq == 1 and not hbm
                            and not two_level):
        raise ValueError(
            "bundles > 1 requires the compacted VMEM walk "
            "(walk_compact, subq == 1, non-HBM, non-two-level)")
    if bundles > 1 and (walk_mxu or walk_fresh or _count_oracle
                        or _timing_double_vdense
                        or _timing_double_vdense_const):
        raise ValueError(
            "bundles > 1 does not support walk_mxu / walk_fresh / "
            "_count_oracle / vdense probes")
    mxu_on = walk_mxu and compact_on and subq == 1
    cull2_on = bool(walk_cull2) and compact_on and subq == 1
    # Fresh per-group walk gates (see the walk_fresh param note):
    fresh_on = bool(walk_fresh) and compact_on and subq == 1
    if (fresh_on and not reflag_on
            and nbs_c * br * (2 if tin16 else 4) >= (4 << 20)):
        # The gates need the [nbs, br] entry-bound scratch; past the
        # reflag ladder's VMEM cap (with no reflag already paying for
        # it) drop the gates rather than risk a compile OOM:
        fresh_on = False
    tin_on = reflag_on or fresh_on
    if walk_unroll is None:
        # Keep enough independent dense chains in flight per loop
        # iteration: wu=8 at 32/16-tri windows (finding 52: beats wu=4
        # on both Cornell 9.40 vs 9.28 and the 252-block terrain 1.114
        # vs 0.900, same-window), wu=2 at 64/128-row windows (deeper
        # unroll there doubles the live set and measurably loses — 64k
        # boundary 0.740 vs 1.016 at wu=4, sub=1 bench 6.08 vs 6.67).
        # At 8-tri windows (sub=16) the finding-58 exact-tail ladder
        # removed the tail-clamp waste that made deep unrolls lose, and
        # wu=32 now wins (finding 67, same-window ladders: Cornell
        # 15.63/16.09/16.16/16.19 M at wu 8/16/32/64; 16k-tri stress
        # +6.3% at wu32; the sub=8 regime still loses at wu32 — 5.96 vs
        # 4.86 on the 32k stress — so the bump is sub16-only):
        walk_unroll = {4: 8, 8: 8, 16: 32}.get(sub, 2) if not hbm else 2
    ms_scene = pltpu.ANY if hbm else pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // bundles,),
        in_specs=[
            pl.BlockSpec((J, br * bundles), lambda i, sc_: (0, i)),
            pl.BlockSpec((J, br * bundles), lambda i, sc_: (0, i)),
            pl.BlockSpec(memory_space=ms_scene),     # p (HBM when hbm)
            pl.BlockSpec(memory_space=ms_scene),     # pay8 (HBM, split)
            pl.BlockSpec(memory_space=ms_scene),     # nrm
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ap
            pl.BlockSpec(memory_space=pltpu.VMEM),   # apay
            pl.BlockSpec(memory_space=pltpu.VMEM),   # baabb (supers when hbm)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bfine (hbm block AABBs)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wmlp (env MLP)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ebias
            pl.BlockSpec(memory_space=pltpu.VMEM),   # econst
        ],
        out_specs=[
            pl.BlockSpec((3 * J, br * bundles), lambda i, sc_: (0, i)),
            pl.BlockSpec((2, br * bundles), lambda i, sc_: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bundles, br), jnp.float32),      # best_t
            pltpu.VMEM((8 * bundles, br), jnp.float32),  # payload bank 1
            pltpu.VMEM((8 * bundles, br), jnp.float32),  # payload bank 2
            pltpu.VMEM((6 * bundles, br), jnp.float32),  # ray o/d
            pltpu.VMEM((6 * bundles, br), jnp.float32),  # tp + colour
            pltpu.VMEM((8 * bundles, br), jnp.int32),    # k/bounce/...
            pltpu.VMEM((nbs_c, bundles), jnp.int32),  # cull flags
            # per-lane-quarter cull flags (flat walk with subq > 1 only):
            pltpu.VMEM((nbs_c, subq)
                       if subq > 1 and not (hbm or two_level) else (1, 1),
                       jnp.int32),
            # per-lane entry bounds for mid-walk flag refreshes
            # (bf16 when tin16 — see the param note):
            pltpu.VMEM((nbs_c if tin_on else 1,
                        br * bundles if tin_on else 1),
                       jnp.bfloat16 if tin16 else jnp.float32),
            # env radiance staging (when an env MLP is fused in):
            pltpu.VMEM((8, br * bundles) if env_cfg is not None
                       else (1, 1), jnp.float32),
            # HBM-streaming slab window(s) + DMA semaphores. Fused pn8
            # (VMEM-sized scenes): one super = [PN_SUPER, SB*16] f32 —
            # 160 KB per slot, ONE DMA. Split (hbm_split, big scenes):
            # [TB, SB*16] f32 p slab (64 KB) + [SB*24, TB] bf16 payload
            # slab (48 KB), two DMAs:
            pltpu.VMEM((2, TB if hbm_split else PNS, SB * 16)
                       if hbm else (1, 8, 128), jnp.float32),
            pltpu.VMEM((2, SB * 24, TB) if hbm_split else (1, 8, 128),
                       jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2 if hbm_split else 1)),
            # in-super (sub-)block flags (SB * hbm_sub rows in hbm mode):
            pltpu.VMEM((SB * (hbm_sub if hbm else 1), subq), jnp.int32),
            # Deferred-payload winner-block flags (VMEM walks only):
            pltpu.VMEM((max(nrm_in.shape[1] // (TB if pay_fused else 3 * TB),
                            1), 1)
                       if not hbm else (1, 1), jnp.int32),
            # Compacted-walk index list (flat VMEM walk, finding 48;
            # sublane-major: dynamic scalar reads only work on sublanes;
            # the HBM third cull level compacts flagged super-group ids
            # through the same scratch):
            pltpu.VMEM((-(-nbs_c // 128) * 128, 1)
                       if (compact_on or cull3_on) else (1, 1), jnp.int32),
            # HBM member-block p staging: one relayout copy per walked
            # block so the 16 coefficient-column broadcasts read from
            # lane offset 0 (mid-tile lane slices at offsets 16..112
            # force a Mosaic relayout per use — measured at ~2x the
            # VMEM walk's per-block dense cost):
            pltpu.VMEM((TB, 16) if hbm else (1, 1), jnp.float32),
            # MXU-walk group LHS staging (walk_mxu): walk_unroll windows'
            # p slabs, stacked sublane-major for the group matmul:
            pltpu.VMEM((max(1, walk_unroll) * (TB // max(1, sub)), 16)
                       if mxu_on else (1, 1), jnp.float32),
        ],
    )
    if env_cfg is not None and env_every > 1:
        # Parked lanes wait up to env_every-1 iterations per escape:
        max_iters = max_iters + K * env_every + env_every
    kern = functools.partial(
        _mega_kernel, br=br, nb=nb_kern, n_ap=n_ap,
        R=R, J=J, spp=spp, K=K, k_total=k_total, bundles=bundles,
        max_path_length=params.max_path_length,
        roulette_start_depth=params.roulette_start_depth,
        max_iters=max_iters,
        tan_theta=tan_theta,
        inv_w=1.0 / params.image_width,
        inv_h=1.0 / params.image_height,
        aspect=params.image_width / params.image_height,
        aa=params.anti_alias_scale,
        use_cull=cull_on, sub=sub, subq=subq, compact=compact_on,
        walk_unroll=max(1, walk_unroll), pay_unroll=max(1, pay_unroll),
        walk_mxu=mxu_on, walk_cull2=cull2_on, tin16=bool(tin16),
        reflag=reflag, fresh=fresh_on, near=bool(walk_near),
        pay_fused=bool(pay_fused),
        env_cfg=env_cfg,
        env_every=env_every if env_cfg is not None else 1,
        env_count=env_count if env_cfg is not None else 0, hbm=hbm,
        two_level=(not hbm and two_level), hbm_reflag=hbm_reflag,
        hbm_cull3=cull3_on,
        hbm_sub=hbm_sub, hbm_wu=hbm_wu, hbm_split=hbm_split,
        hbm_pay_gate=hbm_pay_gate, hbm_pb_stage=hbm_pb_stage,
        _timing_no_dots=_timing_no_dots,
        _timing_no_walk=_timing_no_walk,
        _timing_cull_only=_timing_cull_only,
        _timing_stub_walk=_timing_stub_walk,
        _timing_const_pb=_timing_const_pb,
        _timing_double_pay=_timing_double_pay,
        _timing_double_prep=_timing_double_prep,
        _timing_double_scan=_timing_double_scan,
        _timing_double_refine=_timing_double_refine,
        _timing_double_dense=_timing_double_dense,
        _timing_double_gate=_timing_double_gate,
        _timing_double_dense_fixed=_timing_double_dense_fixed,
        _timing_double_dma=_timing_double_dma,
        _timing_double_vdense=_timing_double_vdense,
        _timing_double_vdense_const=_timing_double_vdense_const,
        _timing_double_camera=_timing_double_camera,
        _timing_double_bxdf=_timing_double_bxdf,
        _timing_double_rng=_timing_double_rng,
        _timing_double_bank=_timing_double_bank,
        _count_oracle=_count_oracle,
    )
    if env_cfg is not None:
        wmlp, ebias, econst = env_weights
    else:
        wmlp = jnp.zeros((16, 128), jnp.bfloat16)
        ebias = jnp.zeros((8, 1), jnp.float32)
        econst = jnp.zeros((1, 128), jnp.float32)
    if hbm and hbm_sub == 4:
        bfine = tables.baabb32
    elif hbm and hbm_sub == 2:
        # 64-tri half-member AABBs, derived from adjacent 32-tri pairs
        # (rows land member-major, half-major — the kernel's
        # fb = b // hbm_sub, h = b % hbm_sub decode):
        b32 = tables.baabb32
        bfine = jnp.concatenate([
            jnp.minimum(b32[0::2, 0:3], b32[1::2, 0:3]),
            jnp.maximum(b32[0::2, 3:6], b32[1::2, 3:6]),
            jnp.zeros((b32.shape[0] // 2, 2), jnp.float32),
        ], axis=1)
    elif cull2_on:
        # Coarse union AABBs for the two-level flag pass: one row per 8
        # fine rows of the selected ``baabb`` (exact host min/max, so
        # coarse-contains-fine holds exactly); pad rows are inverted so
        # they can never flag:
        nc = nbs_c // 8
        clo = jnp.min(jnp.reshape(baabb[:nbs_c, 0:3], (nc, 8, 3)), axis=1)
        chi = jnp.max(jnp.reshape(baabb[:nbs_c, 3:6], (nc, 8, 3)), axis=1)
        bfine = jnp.concatenate(
            [clo, chi, jnp.zeros((nc, 2), jnp.float32)], axis=1)
        pad = (-nc) % 8
        if pad:
            bfine = jnp.concatenate([bfine, jnp.concatenate([
                jnp.full((pad, 3), np.float32(3e38)),
                jnp.full((pad, 3), np.float32(-3e38)),
                jnp.zeros((pad, 2), jnp.float32)], axis=1)], axis=0)
    else:
        bfine = (tables.baabb if (hbm or two_level)
                 else jnp.zeros((8, 8), jnp.float32))
    accum, done = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3 * J, R), jnp.float32),
            jax.ShapeDtypeStruct((2, R), jnp.int32),
        ],
        interpret=interpret,
    )(sc, rows2, cols2, p_in, pay_in, nrm_in, ap, apay, baabb, bfine, wmlp,
      ebias,
      econst)
    # [3J, R] rows are (j, channel)-major -> per-pixel [R*J, 3], averaged,
    # on device (multi-second numpy work on slow hosts otherwise):
    flat = accum.reshape(J, 3, R).transpose(0, 2, 1).reshape(R * J, 3)
    flat = flat * np.float32(1.0 / spp)
    n_done = jnp.sum(done[0]).astype(jnp.uint32)
    if return_stats:
        # Per grid step: lane 0 = iterations, lane 1 = blocks walked,
        # lane 2 = oracle true-need blocks (when _count_oracle), lane 3 =
        # deferred-payload winner blocks (always last element).
        steps = done[1].reshape(nrb // bundles, br * bundles)
        if _count_oracle:
            return (flat, n_done, jnp.sum(steps[:, 0]),
                    jnp.sum(steps[:, 1]), jnp.sum(steps[:, 2]),
                    jnp.sum(steps[:, 3]))
        return (flat, n_done, jnp.sum(steps[:, 0]), jnp.sum(steps[:, 1]),
                jnp.sum(steps[:, 3]))
    return flat, n_done
