"""Streaming wavefront path tracer with path regeneration.

The highest-throughput integrator: a fixed pool of R ray slots advances
one segment per iteration; the moment a path terminates (escape, roulette,
bounce limit) its radiance is banked and the slot immediately
*regenerates* the next (pixel, sample) camera path. Slot utilisation
stays ~100%, versus ~40% for the per-sample wavefront whose loop drags
every lane to the longest path's length (render/path.py keeps that mode
for per-sample parity testing).

TPU-specific design points (from profiling on hardware):

* **No scatters** — XLA scatter-add costs ~17 ms/op here. Each slot owns
  a private strided pixel set (slot s serves pixels {s, s+R, ...} of the
  tile-ordered stream), so banking is dense.
* **Lane-major accumulator layout** — a [R, J, 3] accumulator gets a
  42x-padded XLA tile layout (minor dims (16, 3) pad to (16, 128)!) and
  its one-hot FMA alone cost ~3.4 ms/iteration. Shaped [J, 3, R] (rays on
  the lane dimension) the same dense banking costs ~0.3 ms.
* The self-intersection offset is folded into the end of the iteration,
  so the surface normal never enters the loop carry.

Radiometry is identical to the reference's megakernel: emissive
accumulation on hit, diffuse/specular/dielectric sampling, roulette
after the configured depth, env light (NIF) on escape
(codelets/TraceCodelets.cpp:170-264, 321-382). RNG is counter-based per
(path_id, bounce) (ops/rng.py) — matching the reference's per-worker HW
RNG contract in distribution.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.bxdf import (
    dielectric,
    evaluate_roulette,
    offset_ray_origin,
    reflect,
    sample_diffuse,
)
from ..ops.camera import pixel_to_ray_dir
from ..ops.rng import normal2, uniform01
from ..ops.traversal import pallas_path_intersect, scene_intersect_with_normal
from ..scene.build import SceneArrays, SceneParams

MAT_DIFFUSE = 0
MAT_SPECULAR = 1
MAT_REFRACTIVE = 2


def _camera_ray(scene_params, rows, cols, pix, path_id, aa_scale, seed):
    """Fresh camera rays for the given slot pixel indices (vectorised).
    Origins come back pre-offset along the initial normal (0, 0, 1),
    matching the reference's first offsetRay on camera rays."""
    g1, g2 = normal2(path_id, seed, jnp.uint32(0xCA3))
    pu = rows[pix] + aa_scale * g1
    pv = cols[pix] + aa_scale * g2
    tan_theta = jnp.tan(jnp.float32(scene_params.fov_radians) / 2.0)
    d = pixel_to_ray_dir(
        pv, pu,
        jnp.float32(scene_params.image_width),
        jnp.float32(scene_params.image_height),
        tan_theta,
    )
    o = offset_ray_origin(
        jnp.zeros_like(d), d,
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), d.shape),
    )
    return o, d


@functools.partial(
    jax.jit,
    static_argnames=("params", "slots", "j_per_slot", "spp", "max_iters",
                     "has_env", "env_fn"),
)
def streaming_path_trace(
    scene: SceneArrays,
    rows: jnp.ndarray,          # [slots * j_per_slot] f32 pixel rows (padded)
    cols: jnp.ndarray,          # [slots * j_per_slot] f32 pixel cols
    seed: jnp.ndarray,          # u32 scalar
    env_params,
    n_valid: jnp.ndarray | None = None,  # i32 scalar: real (unpadded) pixel count
    *,
    params: SceneParams,
    slots: int,
    j_per_slot: int,
    spp: int,
    max_iters: int,
    has_env: bool,
    env_fn=None,
):
    """Returns (accum [J, 3, slots] radiance sums, paths_done, iters).
    Pixel p of the padded stream lives at accum[p // slots, :, p % slots].

    ``n_valid`` marks the tail of the pixel stream as padding: slots never
    spawn paths for pixels >= n_valid, so no work is wasted tracing pixel
    (0, 0) stand-ins and ``paths_done`` counts real paths only."""
    R = slots
    J = j_per_slot
    K = J * spp  # paths per slot
    f32 = jnp.float32
    aa = f32(params.anti_alias_scale)
    slot_ids = jnp.arange(R, dtype=jnp.uint32)

    def slot_pix(k):
        j = k // spp
        return slot_ids.astype(jnp.int32) + j * R, j

    def slot_pid(k):
        return slot_ids * jnp.uint32(K) + k.astype(jnp.uint32)

    # Per-slot path budget: slot s serves pixels {s, s+R, ...}; rows with
    # pixel index >= n_valid are padding and get no paths at all:
    if n_valid is None:
        n_valid = jnp.int32(R * J)
    valid_j = jnp.clip(
        -(-(n_valid - slot_ids.astype(jnp.int32)) // R), 0, J
    )
    k_cap = valid_j * spp                        # [R] i32, per-slot K

    k0 = jnp.zeros(R, jnp.int32)
    o0, d0 = _camera_ray(params, rows, cols, slot_pix(k0)[0], slot_pid(k0), aa, seed)

    state = dict(
        it=jnp.int32(0),
        k=k0,
        bounce=jnp.zeros(R, jnp.int32),
        o=o0,
        d=d0,
        tp=jnp.ones((R, 3), f32),
        color=jnp.zeros((R, 3), f32),
        active=k_cap > 0,
        accum=jnp.zeros((J, 3, R), f32),
        done=jnp.uint32(0),
    )

    t_min = jnp.zeros(R, f32)

    j_iota = jax.lax.broadcasted_iota(jnp.int32, (J, 1, 1), 0)

    def cond(s):
        return (s["it"] < max_iters) & jnp.any(s["active"])

    def body(s):
        active = s["active"]
        pid = slot_pid(s["k"])
        rng_b = s["bounce"].astype(jnp.uint32) + jnp.uint32(7) + seed

        o = s["o"]
        d = s["d"]
        t_max = jnp.where(active, f32(jnp.inf), f32(-1.0))
        if params.intersector in ("pallas", "pallas-hbm"):
            res = pallas_path_intersect(scene, o, d, t_min, t_max,
                                        hbm=params.intersector == "pallas-hbm")
            found = res["found"]
            hit_t = res["t"]
            hit_n = res["normal"]
            albedo = res["albedo"]
            ior = res["ior"]
            mtype = res["mat_type"]
            emission = res["emission"]
            emissive = res["emissive"]
        else:
            hit, hit_n = scene_intersect_with_normal(
                scene, o, d, t_min, t_max, params.intersector
            )
            found = hit.found
            hit_t = hit.t
            g_safe = jnp.clip(hit.geom_id, 0, scene.mat_id.shape[0] - 1)
            mid = scene.mat_id[g_safe]
            albedo = scene.mat_albedo[mid]
            ior = scene.mat_ior[mid]
            mtype = scene.mat_type[mid]
            mid_safe = jnp.clip(mid, 0, scene.mat_emission.shape[0] - 1)
            emission = scene.mat_emission[mid_safe]
            emissive = scene.mat_emissive[mid_safe] != 0

        live = active & found
        hit_p = o + d * hit_t[..., None]

        color = s["color"] + jnp.where(
            (live & emissive)[..., None], s["tp"] * emission, 0.0
        )

        u0 = uniform01(pid, rng_b, jnp.uint32(0))
        u1 = uniform01(pid, rng_b, jnp.uint32(1))
        u2 = uniform01(pid, rng_b, jnp.uint32(2))
        u3 = uniform01(pid, rng_b, jnp.uint32(3))

        d_diffuse = sample_diffuse(hit_n, u0, u1)
        d_specular = reflect(d, hit_n)
        d_dielec, refracted = dielectric(d, hit_n, ior, u2)
        is_diff = mtype == MAT_DIFFUSE
        is_spec = mtype == MAT_SPECULAR
        new_d = jnp.where(
            is_diff[..., None], d_diffuse,
            jnp.where(is_spec[..., None], d_specular, d_dielec),
        )
        scale_tp = is_diff | is_spec | ((mtype == MAT_REFRACTIVE) & refracted)
        tp = s["tp"] * jnp.where((live & scale_tp)[..., None], albedo, 1.0)

        # Next segment origin, pre-offset (normal leaves the loop here):
        o = jnp.where(
            live[..., None],
            offset_ray_origin(hit_p, new_d, hit_n),
            o,
        )
        d = jnp.where(live[..., None], new_d, d)

        # Roulette (after the configured depth):
        stop_r, tp_r = evaluate_roulette(u3, tp)
        use_roulette = s["bounce"] > params.roulette_start_depth
        tp = jnp.where((use_roulette & live)[..., None], tp_r, tp)
        killed = live & use_roulette & stop_r

        # Escape contribution (env light / NIF). Escaped lanes kept their
        # traced direction (not live, so the resample didn't touch them):
        escaped = active & ~found
        if has_env:
            env_rgb = env_fn(env_params, d)
            color = color + jnp.where(escaped[..., None], s["tp"] * env_rgb, 0.0)

        bounce = s["bounce"] + 1
        over = live & (bounce >= params.max_path_length)
        terminated = escaped | killed | over

        # Bank finished paths: dense lane-major one-hot FMA:
        _, j_cur = slot_pix(s["k"])
        sel = (j_iota == j_cur[None, None, :]) & terminated[None, None, :]
        accum = s["accum"] + jnp.where(sel, color.T[None], 0.0)
        done = s["done"] + terminated.sum().astype(jnp.uint32)

        k = jnp.where(terminated, jnp.minimum(s["k"] + 1, K), s["k"])
        active = active & ~terminated
        bounce = jnp.where(terminated, 0, bounce)
        color = jnp.where(terminated[..., None], 0.0, color)

        # Regenerate idle slots with their next path (k_cap excludes
        # padding rows, so dead-pixel paths are never spawned or counted):
        can_spawn = (~active) & (k < k_cap)
        pix, _ = slot_pix(k)
        co, cd = _camera_ray(params, rows, cols, pix, slot_pid(k), aa, seed)
        o = jnp.where(can_spawn[..., None], co, o)
        d = jnp.where(can_spawn[..., None], cd, d)
        tp = jnp.where(can_spawn[..., None], 1.0, tp)
        active = active | can_spawn

        return dict(
            it=s["it"] + 1,
            k=k, bounce=bounce,
            o=o, d=d, tp=tp, color=color,
            active=active, accum=accum, done=done,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["accum"], out["done"], out["it"]


_STREAM_CACHE: dict = {}


def _pixel_stream(params, tile):
    """Tile-ordered pixel stream (coherent slot neighbourhoods). Cached —
    the lexsort over megapixel windows costs hundreds of ms per call
    otherwise (host time the TPU spends idle)."""
    w, h = params.window_w, params.window_h
    key = (w, h, params.window_c, params.window_r, tile)
    hit = _STREAM_CACHE.get(key)
    if hit is not None:
        return hit
    rr, cc = np.meshgrid(
        np.arange(params.window_r, params.window_r + h),
        np.arange(params.window_c, params.window_c + w),
        indexing="ij",
    )
    rel_r, rel_c = rr - params.window_r, cc - params.window_c
    order = np.lexsort(
        (rel_c.ravel() % tile, rel_r.ravel() % tile,
         rel_c.ravel() // tile, rel_r.ravel() // tile)
    )
    rows_np = rr.ravel()[order].astype(np.float32)
    cols_np = cc.ravel()[order].astype(np.float32)
    if len(_STREAM_CACHE) > 8:
        _STREAM_CACHE.clear()
    _STREAM_CACHE[key] = (rows_np, cols_np, order)
    return rows_np, cols_np, order


_DEV_STREAM_CACHE: dict = {}


def _device_stream(rows_np, cols_np, pad, key):
    """Padded device-resident pixel stream, cached per window config (the
    host->device upload of multi-MB coordinate arrays is per-window
    constant work)."""
    hit = _DEV_STREAM_CACHE.get(key)
    if hit is not None:
        return hit
    rows = jnp.asarray(np.pad(rows_np, (0, pad)))
    cols = jnp.asarray(np.pad(cols_np, (0, pad)))
    if len(_DEV_STREAM_CACHE) > 8:
        _DEV_STREAM_CACHE.clear()
    _DEV_STREAM_CACHE[key] = (rows, cols)
    return rows, cols


def _pick_br(R: int, J: int) -> int:
    """Kernel ray-block size that tiles the slot pool. Post-watertight
    (round 3), 512 wins at both 720² and 1440² (5.85-5.96 vs 5.68-5.69
    M at 1024): the widened test raised the per-pair cost, so the
    tighter 512-lane bundle unions (16-17 vs 19-21 blocks/iter) now pay
    for their extra grid steps. ``RAY_BR`` overrides (sweep knob; must
    divide the slot pool — falls back to the heuristic otherwise)."""
    try:
        v = int(os.environ.get("RAY_BR", 0))
    except (TypeError, ValueError):
        v = 0
    if v >= 256 and R % v == 0:
        return v
    for br in (512, 1024, 2048, 256):
        if R % br == 0:
            return br
    raise ValueError(f"slot pool {R} not a multiple of 256")


def env_flush_cadence(scene) -> int:
    """Deferred env-flush cadence for the fused NIF MLP (megakernel
    ``env_every``). Deferring the fixed-cost [P, br] MLP flush amortises
    it; cadence 4 is the default everywhere since round 5 — the r2-era
    "sky scenes prefer immediate flushes" heuristic no longer holds
    under the compacted walk (same-window A/B on the spheres flagship,
    2026-08-21, probe 0.125: every=4 22.27 vs every=1 21.25 Mpaths/s,
    +4.8%; scheduling is bitwise-neutral, gated by
    test_deferred_env_flush_identical). ``RAY_ENV_EVERY`` overrides;
    garbage or non-positive values fall back to the default (the
    kernel's deferred branch divides by the cadence, so values < 1 must
    never reach it)."""
    default = 4
    try:
        v = int(os.environ.get("RAY_ENV_EVERY", default))
    except (TypeError, ValueError):
        return default
    return max(1, v) if v > 0 else default


def env_flush_count(br: int = 512) -> int:
    """Flush-on-count threshold for the deferred env flush (megakernel
    ``env_count``): fire the fused MLP as soon as this many of the
    bundle's ``br`` lanes are parked instead of waiting out the cadence
    clock (which remains the max-wait bound). Default br/2 since round
    5 — same-window flagship sweep (probe 0.136, reps 3): every=4 +
    count=256 at br=512 gives 26.37 Mpaths/s vs 25.54 count-off and
    19-23 at wider cadences, so the count trigger + short max-wait is
    the measured optimum. ``RAY_ENV_COUNT`` overrides (0 disables —
    cadence-only flushing). Pure scheduling — the estimator is
    identical across triggers (tests/test_megakernel_variants.py)."""
    try:
        v = int(os.environ.get("RAY_ENV_COUNT", br // 2))
    except (TypeError, ValueError):
        return br // 2
    return max(0, v)


# Watchdog discipline for megakernel dispatches: device time scales with
# J * spp_b (paths per lane over a fixed slot pool). One ~160 s dispatch
# (J*spp = 4096 at 1440² spp 256) crashes the TPU worker; known-good
# production dispatches are 1024 (~40 s). Cap the product at 2048.
# Shared by render_streaming, compile_only, and the sharded path
# (parallel/mesh.py):
SPP_BATCH = 64
MAX_K_PER_DISPATCH = 2048


def hbm_reflag_cadence() -> int:
    """Flag-refresh cadence for the HBM-streamed walk (refresh the super
    flags against the converging best_t every N streamed supers).
    ``RAY_HBM_REFLAG`` overrides; must be a power of two >= 1 (the kernel
    masks the stream counter) — anything else falls back to the default.
    Swept on the 522k-tri heightfield (experiments/hbm_sweep.py): 4 is
    3x slower (the [ns, br] refresh dominates), 16 -> 64 is +4%, and the
    curve is flat 64-256 — 64 is the plateau edge."""
    default = 64
    try:
        v = int(os.environ.get("RAY_HBM_REFLAG", default))
    except (TypeError, ValueError):
        return default
    return v if (v >= 1 and v & (v - 1) == 0) else default


def hbm_cull3_override() -> bool | None:
    """Third cull level for the HBM-streamed walk (megakernel
    ``hbm_cull3``, round 5): coarse super-group union slab pass +
    refinement of flagged groups replaces the flat [ns, br] super slab
    pass — bitwise-identical flags (the walk_cull2 monotonic-containment
    argument one level up). ``RAY_HBM_CULL3=1`` forces on, ``=0`` forces
    off; unset/garbage = auto (off pending the hardware A/B at the top
    of the scene-size ladder)."""
    v = os.environ.get("RAY_HBM_CULL3", "")
    if v == "1":
        return True
    if v == "0":
        return False
    return None


def walk_compact_enabled() -> bool:
    """Compacted flat walk + winner-payload dispatch (megakernel
    ``walk_compact``, finding 48): branch-free index-list walks instead
    of per-block scalar gates — bitwise-identical, measured 9.22 vs 8.15
    Mpaths/s on the bench workload. ``RAY_WALK_COMPACT=0`` restores the
    gated walk (A/B escape hatch)."""
    return os.environ.get("RAY_WALK_COMPACT", "1") != "0"


def walk_mxu_enabled() -> bool:
    """MXU coefficient dots for the compacted VMEM walk (megakernel
    ``walk_mxu``): one [U*TBW, 16] x [16, 6*br] HIGHEST matmul per
    unroll group replaces the six per-window VPU FMA chains. NOT bitwise
    vs the VPU walk on TPU (the 6-pass bf16x3 split rounds differently);
    the watertight acceptance band widens 2x to keep the contract
    rigorous. ``RAY_MXU=1`` enables (A/B knob; default off pending the
    hardware sweep)."""
    return os.environ.get("RAY_MXU", "0") == "1"


def payt_override() -> bool | None:
    """Fused deferred-payload table for the VMEM megakernel walks
    (megakernel ``pay_fused``, tables.payt): one [64, TB] x [TB, br]
    one-hot dot per winner block instead of two dots + an in-kernel
    bf16 split — bitwise-identical radiometry on CPU and TPU.
    ``RAY_PAYT=1`` forces on (errors if the scene has no payt table),
    ``RAY_PAYT=0`` forces off; unset/garbage = auto (on whenever the
    build made the table — VMEM scenes up to tables.PAYT_MAX_TRIS)."""
    v = os.environ.get("RAY_PAYT", "")
    if v == "1":
        return True
    if v == "0":
        return False
    return None


def cull2_override() -> bool | None:
    """Two-level flag computation for the compacted VMEM walk
    (megakernel ``walk_cull2``): coarse 8-row union slab pass + flagged-
    group refinement — bitwise-identical flags at a fraction of the
    flat [nbs, br] pass on big scenes. ``RAY_CULL2=1`` forces on,
    ``RAY_CULL2=0`` forces off; unset/garbage = auto (the megakernel's
    row-count threshold)."""
    v = os.environ.get("RAY_CULL2", "")
    if v == "1":
        return True
    if v == "0":
        return False
    return None


def fresh_override() -> bool | None:
    """Fresh per-group walk gates for the compacted VMEM walk
    (megakernel ``walk_fresh``, finding 58): before each unroll group,
    re-check the group windows' stored entry bounds against the CURRENT
    best_t and skip settled groups — captures conservative-cull
    overshoot without the bulk refresh's rank/extract re-runs;
    bitwise-identical. ``RAY_FRESH=1`` forces on, ``RAY_FRESH=0`` forces
    off; unset/garbage = auto."""
    v = os.environ.get("RAY_FRESH", "")
    if v == "1":
        return True
    if v == "0":
        return False
    return None


def subq_granularity() -> int:
    """Lane-quarter walk granularity for the flat VMEM megakernel walk
    (megakernel ``subq``): each width-(br/subq) lane slice walks only its
    own flagged blocks. experiments/subbundle_sim.py (production lane
    mix, Cornell+monkey): Q=4 cuts dense pair-ops 1.86x with NO ray
    sorting — the union's width effect. ``RAY_SUBQ`` overrides (1/2/4/8,
    8 needs br=1024 — slices must be whole 128-lane vregs);
    anything else falls back to the default."""
    default = 1   # pending TPU A/B (sim says 4; gates cost is the risk)
    try:
        v = int(os.environ.get("RAY_SUBQ", default))
    except (TypeError, ValueError):
        return default
    return v if v in (1, 2, 4, 8) else default


def bundles_override(nrb: int) -> int:
    """Bundle-lockstep width for the compacted VMEM walk (megakernel
    ``bundles``, finding 66): B bundles advance per kernel program with
    [B, br] sublane-major per-lane state. Measured SLOWER at every B on
    TPU (record knob); ``RAY_BUNDLES`` in {1, 2, 4, 8} forces it for
    A/Bs when it divides the bundle count ``nrb``; anything else falls
    back to 1."""
    try:
        v = int(os.environ.get("RAY_BUNDLES", "1"))
    except (TypeError, ValueError):
        return 1
    return v if v in (1, 2, 4, 8) and nrb % v == 0 else 1


def sub_granularity() -> int | None:
    """Sub-block walk granularity override for the VMEM megakernel walks
    (megakernel ``sub``: dense windows of 128/sub triangle rows against
    128/sub-tri AABBs). ``RAY_SUB`` in {1, 2, 4, 8, 16} forces it; the
    default None lets the megakernel auto-resolve (findings 36/50/52/54
    — finer granularity wins under the compacted unrolled walk until the
    cull-slab pass dominates; the reflag-scratch VMEM degrade ladder
    still applies). Garbage values fall back to auto."""
    try:
        v = int(os.environ.get("RAY_SUB", "0"))
    except (TypeError, ValueError):
        return None
    return v if v in (1, 2, 4, 8, 16) else None


def reflag_override() -> int | None:
    """Mid-walk flag-refresh count override for the VMEM megakernel
    walks (megakernel ``reflag``). ``RAY_REFLAG`` >= 0 forces it; the
    default None lets the megakernel resolve per walk mode. Note the
    reflag-scratch VMEM degrade ladder halves ``sub`` while the
    [nb*sub, br] entry-bound scratch would exceed its cap — force
    ``RAY_REFLAG=0`` to A/B fine granularities on big VMEM scenes
    without the scratch."""
    try:
        v = int(os.environ.get("RAY_REFLAG", "-1"))
    except (TypeError, ValueError):
        return None
    return v if v >= 0 else None


def pix_group_schedule(J: int) -> list:
    """Pixel-group schedule for readback/compute overlap (round 5): the
    megakernel render is split into dispatches over padded-stream row
    ranges [(j0, Jg), ...]; group g's accumulator rides the d2h link
    while group g+1 computes (the axon tunnel overlaps d2h copies with
    compute — experiments/e2e_gap_probe.py), so only the LAST group's
    readback is exposed. The group union is bitwise-identical to the
    single dispatch (megakernel j0/k_total contract). ``RAY_PIX_GROUPS``
    forces an equal split of that count (1 disables); auto keeps ~4
    dispatches (each extra dispatch measured ~0.1 s of tunnel+drain
    overhead) but makes the FINAL group a single row so the exposed
    readback is 1/J of the frame, e.g. J=16 -> [5, 5, 5, 1]."""
    try:
        v = int(os.environ.get("RAY_PIX_GROUPS", "0"))
    except (TypeError, ValueError):
        v = 0
    if v == 1 or (v > 1 and J % v) or (v == 0 and J < 4):
        return [(0, J)]
    if v > 1:
        Jg = J // v
        return [(g * Jg, Jg) for g in range(v)]
    if J < 8:
        sizes = [J - 1, 1]
    else:
        q, r = divmod(J - 1, 3)
        sizes = [q + 1] * r + [q] * (3 - r) + [1]
    out, j0 = [], 0
    for s in sizes:
        out.append((j0, s))
        j0 += s
    return out


def _use_megakernel(params, env_fn) -> bool:
    """The in-kernel bounce loop covers the pallas intersector; NIF
    environment lights are fused into the kernel as an MXU MLP when the
    env_fn exposes its structure (load_nif_env does). Opaque custom
    env_fns fall back to the XLA-loop integrator."""
    return params.intersector in ("pallas", "pallas-hbm") and (
        env_fn is None or getattr(env_fn, "nif_config", None) is not None)


def render_streaming(
    scene: SceneArrays,
    params: SceneParams,
    chunk_slots: int = 1 << 17,
    env_fn: Optional[Callable] = None,
    env_params=None,
    spp: int | None = None,
    tile: int = 32,
    seed: int | None = None,
    stats_out: dict | None = None,
    compile_only: bool = False,
    _mega_kwargs: dict | None = None,
):
    """Full-window streaming render; returns (rgb [H, W, 3] numpy, done).

    ``compile_only``: AOT-compile the exact production batch program for
    this scene/config without executing it (ref compileOnly,
    ipu_utils.hpp:581-584), under a heartbeat logger. The executable
    lands in the persistent compilation cache, so a later real run loads
    it. Returns (None, 0).

    ``stats_out``: pass a dict to collect kernel walk telemetry (megakernel
    paths only): total bundle-iterations and blocks walked, summed over all
    spp batches — the falsifiable counters behind any throughput claim.

    Dispatches to the Pallas megakernel (ops/pallas/megakernel.py — the
    whole bounce loop in one kernel, with NIF env lights fused in and an
    HBM-streamed walk for >VMEM scenes) for the pallas/pallas-hbm
    intersectors; opaque custom env_fns and other intersectors run the
    XLA-loop integrator above."""
    spp = spp if spp is not None else params.samples_per_pixel
    seed = params.rng_seed if seed is None else seed

    w, h = params.window_w, params.window_h
    n_pix = w * h
    rows_np, cols_np, order = _pixel_stream(params, tile)

    use_mega = _use_megakernel(params, env_fn)
    R = min(chunk_slots, n_pix)
    if use_mega:
        # Slot pool must tile into kernel ray blocks; surplus slots are
        # marked dead through n_valid and cost nothing:
        R = min(-(-R // 256) * 256, -(-n_pix // 256) * 256)
    J = -(-n_pix // R)
    pad = R * J - n_pix
    rows_d, cols_d = _device_stream(
        rows_np, cols_np, pad,
        (params.window_w, params.window_h, params.window_c, params.window_r,
         tile, R, J),
    )

    env_cfg = env_weights = None
    env_every = 1
    env_count = 0
    if use_mega and env_fn is not None:
        from ..ops.pallas.megakernel import pack_env_mlp

        env_cfg, env_weights = pack_env_mlp(env_fn.nif_config, env_params)
        env_every = env_flush_cadence(scene)
        env_count = (env_flush_count(_pick_br(R, J))
                     if env_every > 1 else 0)

    # Pixel-group split (readback/compute overlap, see pix_group_schedule):
    schedule = pix_group_schedule(J) if use_mega else [(0, J)]
    Jg = schedule[0][1]

    if compile_only:
        from ..runtime.config import CompileProgress

        # First production batch size — the same Jg*spp-capped pick the
        # render loop below makes, so the AOT-compiled program is the
        # one the real run executes:
        b = min(SPP_BATCH, max(1, MAX_K_PER_DISPATCH // Jg), spp)
        max_iters = Jg * b * params.max_path_length + 16
        cseed = jnp.uint32((seed or 0) & 0xFFFFFFFF)
        if use_mega:
            from ..ops.pallas.megakernel import megakernel_path_trace

            hbm = params.intersector == "pallas-hbm"
            name = "megakernel_path_trace"
            with CompileProgress(name):
                compiled = megakernel_path_trace.lower(
                    scene, rows_d[:R * Jg], cols_d[:R * Jg], cseed,
                    jnp.int32(n_pix),
                    params=params, slots=R, j_per_slot=Jg, spp=b,
                    j0=jnp.int32(0), k_total=J * b,
                    max_iters=max_iters, br=_pick_br(R, J),
                    env_cfg=env_cfg, env_weights=env_weights,
                    env_every=env_every, env_count=env_count,
                    hbm=hbm,
                    sub=sub_granularity(),
                    reflag=reflag_override(),
                    subq=subq_granularity(),
                    walk_compact=walk_compact_enabled(),
                walk_mxu=walk_mxu_enabled(),
                walk_cull2=cull2_override(),
                walk_fresh=fresh_override(),
                pay_fused=payt_override(),
                    **({"hbm_reflag": hbm_reflag_cadence(),
                        "hbm_cull3": hbm_cull3_override()}
                       if hbm else {}),
                    return_stats=stats_out is not None,
                    interpret=jax.default_backend() != "tpu",
                ).compile()
        else:
            name = "streaming_path_trace"
            with CompileProgress(name):
                compiled = streaming_path_trace.lower(
                    scene, rows_d, cols_d, cseed, env_params,
                    jnp.int32(n_pix),
                    params=params, slots=R, j_per_slot=J, spp=b,
                    max_iters=max_iters, has_env=env_fn is not None,
                    env_fn=env_fn,
                ).compile()
        try:
            mem = compiled.memory_analysis()
        except Exception:   # backend-dependent; informational only
            mem = "n/a"
        from ..utils.log import logger

        logger().info("Compile-only: %s ready (memory: %s)", name, mem)
        return None, 0

    def run_batch(batch_seed, spp_b, j0=0, jg=None):
        """One bounded-spp render of padded-stream rows [j0, j0+jg);
        returns (flat [R*jg, 3] spp-averaged radiance, device-resident;
        done). Device scalars stay device-side (stats too) so callers
        can keep dispatching without blocking."""
        jg = J if jg is None else jg
        max_iters = jg * spp_b * params.max_path_length + 16
        if use_mega:
            from ..ops.pallas.megakernel import megakernel_path_trace

            lo = j0 * R
            out = megakernel_path_trace(
                scene, rows_d[lo:lo + R * jg], cols_d[lo:lo + R * jg],
                jnp.uint32(batch_seed & 0xFFFFFFFF), jnp.int32(n_pix),
                params=params, slots=R, j_per_slot=jg, spp=spp_b,
                j0=jnp.int32(j0), k_total=J * spp_b,
                max_iters=max_iters, br=_pick_br(R, J),
                bundles=(bundles_override(R // _pick_br(R, J))
                         if params.intersector != "pallas-hbm" else 1),
                env_cfg=env_cfg, env_weights=env_weights,
                env_every=env_every, env_count=env_count,
                hbm=params.intersector == "pallas-hbm",
                sub=sub_granularity(),
                reflag=reflag_override(),
                subq=subq_granularity(),
                walk_compact=walk_compact_enabled(),
                walk_mxu=walk_mxu_enabled(),
                walk_cull2=cull2_override(),
                walk_fresh=fresh_override(),
                pay_fused=payt_override(),
                # hbm_reflag is a static cache-key arg read only by the
                # HBM walk — pass it conditionally so sweeping
                # RAY_HBM_REFLAG can't force VMEM-mode recompiles:
                **({"hbm_reflag": hbm_reflag_cadence(),
                    "hbm_cull3": hbm_cull3_override()}
                   if params.intersector == "pallas-hbm" else {}),
                # Timing-probe plumbing for experiments/ (the megakernel's
                # _timing_double_* marginal-cost knobs); never set in
                # production paths:
                **(_mega_kwargs or {}),
                return_stats=stats_out is not None,
                interpret=jax.default_backend() != "tpu",
            )
            if stats_out is not None:
                flat_d, done, iters, blocks, winners = out
                # Device scalars are accumulated as futures and summed
                # at the end of the render — an int() here would block
                # the dispatch pipeline on this batch's completion and
                # forfeit the group-overlap win:
                stat_futures.append((iters, blocks, winners))
                stats_out["br"] = _pick_br(R, J)
                stats_out["subq"] = subq_granularity()
                return flat_d, done
            return out
        accum, done, _iters = streaming_path_trace(
            scene, rows_d, cols_d,
            jnp.uint32(batch_seed & 0xFFFFFFFF), env_params,
            jnp.int32(n_pix),
            params=params, slots=R, j_per_slot=J, spp=spp_b,
            max_iters=max_iters, has_env=env_fn is not None, env_fn=env_fn,
        )
        # accum[j, :, s] holds padded-stream pixel s + j*R:
        flat_d = accum.transpose(0, 2, 1).reshape(R * J, 3) / spp_b
        return flat_d, done

    stat_futures: list = []
    fetch_f16 = os.environ.get("RAY_READBACK_F16", "0") == "1"
    img = np.empty((n_pix, 3), np.float32)

    def fetch_into(flat_dev, j0, jg):
        """Copy a group's settled accumulator to the host and scatter it
        into the image. Called AFTER the next group's dispatches are
        enqueued, so the d2h copy (and the host scatter) overlap that
        group's device compute. Optional half-precision readback: large
        frames are host-link bound (a 4k² f32 image is 201 MB; the dev
        tunnel moves ~20 MB/s); f16 holds ~3 significant digits —
        plenty for display/preview (``RAY_READBACK_F16=1``). The f16
        cast happens at accumulation time, in the producing group's
        dispatch window — casting here would enqueue it behind the NEXT
        group's kernels and serialise the pipeline."""
        try:
            flat_dev.copy_to_host_async()
        except Exception:   # backend-dependent; np.asarray still works
            pass
        flat = np.asarray(flat_dev)
        if fetch_f16:
            flat = flat.astype(np.float32)
        lo, hi = j0 * R, min((j0 + jg) * R, n_pix)
        if hi > lo:
            img[order[lo:hi]] = flat[:hi - lo]

    # Bound single-dispatch device time: one megakernel call at very high
    # spp runs minutes inside one XLA program and trips the TPU worker
    # watchdog (observed crash at 1440^2 spp 256, ~160 s/call). Render in
    # decorrelated batches — identical estimator, bounded calls — and
    # accumulate ON DEVICE so each group's image crosses the (slow) host
    # link exactly once (see SPP_BATCH / MAX_K_PER_DISPATCH above):
    done_d: list = []
    prev = None
    for j0, jg in schedule:
        b_cap = max(1, MAX_K_PER_DISPATCH // jg)
        flat_acc = None
        s = bi = 0
        while s < spp:
            b = min(SPP_BATCH, b_cap, spp - s)
            flat_b, done_b = run_batch(
                (seed + 0x9E3779B9 * bi) & 0xFFFFFFFF, b, j0, jg)
            wgt = np.float32(b / spp)
            flat_acc = (flat_b * wgt if flat_acc is None
                        else flat_acc + flat_b * wgt)
            done_d.append(done_b)
            s += b
            bi += 1
        if fetch_f16:
            flat_acc = flat_acc.astype(jnp.float16)
        if prev is not None:
            fetch_into(*prev)
        prev = (flat_acc, j0, jg)
    fetch_into(*prev)
    # One stacked transfer for the scalar futures: each separate int()
    # costs a ~7 ms tunnel round trip (done counts + 3 stats per batch
    # add up to ~0.1 s of pure latency at 4 groups):
    done = int(np.asarray(jnp.stack([jnp.asarray(x) for x in done_d]))
               .astype(np.int64).sum())
    if stats_out is not None and stat_futures:
        flatf = [jnp.asarray(v) for f in stat_futures for v in f]
        sums = (np.asarray(jnp.stack(flatf)).astype(np.int64)
                .reshape(len(stat_futures), 3))
        stats_out["iters"] = (stats_out.get("iters", 0)
                              + int(sums[:, 0].sum()))
        stats_out["blocks_walked"] = (stats_out.get("blocks_walked", 0)
                                      + int(sums[:, 1].sum()))
        stats_out["winner_blocks"] = (stats_out.get("winner_blocks", 0)
                                      + int(sums[:, 2].sum()))
    return img.reshape(h, w, 3), done
