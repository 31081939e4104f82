#!/usr/bin/env python
"""Benchmark: path-trace throughput on the built-in Cornell scene.

Headline metric matches the reference's own (BASELINE.md): path samples
per second per chip at 1440x1440. The reference achieves ~26 Mpaths/s per
IPU Mk2 (~100M over 4 IPUs); the north star is >=100 Mpaths/s per TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_SIZE (1440), BENCH_SPP (64), BENCH_CHUNK (131072),
BENCH_INTERSECTOR (auto), BENCH_REPS (3). The reference headline is
1000 spp; spp-scaling is flat from 16 to 256 (PROGRESS.md bench table),
so the default 64 keeps the run under a few minutes through the flaky
device tunnel without flattering the number.
"""

import json
import os
import sys
import time

BASELINE_MPATHS_PER_CHIP = 100.0  # north-star target (BASELINE.md)

# Healthy-band threshold for the tunnel probe (finding 64 discipline,
# VERDICT r4 #8): identical compiled programs measure up to ~1.8x slower
# in degraded axon-tunnel windows. The probe (experiments/_health.py: 20
# chained 1024^2 matmuls + readback) measures ~0.12-0.25 s in healthy
# windows and >= 0.4 s when throttled. A BENCH row with
# probe_band_ok=false is a degraded-window measurement and must not
# replace an in-band headline row in the bench history.
HEALTHY_PROBE_S = 0.25


def probe_band_ok(probe_s: float | None) -> bool | None:
    """Whether a tunnel-probe reading is inside the documented healthy
    band (None = probe unavailable; the row is unstamped, not ok)."""
    if probe_s is None:
        return None
    return bool(probe_s < HEALTHY_PROBE_S)


def main() -> int:
    size = int(os.environ.get("BENCH_SIZE", 1440))
    spp = int(os.environ.get("BENCH_SPP", 64))
    chunk = int(os.environ.get("BENCH_CHUNK", 1 << 17))
    intersector = os.environ.get("BENCH_INTERSECTOR", "auto")

    from ipu_ray_lib_tpu.render.renderer import render
    from ipu_ray_lib_tpu.render.streaming import render_streaming
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

    mesh_file = os.path.join(os.path.dirname(__file__), "assets", "monkey_bust.glb")
    if not os.path.exists(mesh_file):
        mesh_file = None
    scene = make_cornell_box_scene(mesh_file, box_only=False)
    arrays, params, _ = build_scene(
        scene, image_width=size, image_height=size, samples_per_pixel=spp,
        intersector=intersector,
    )

    # Warm-up/compile with identical static shapes, then time reruns.
    # Best-of-N: the TPU tunnel adds multi-second transient stalls
    # (PROGRESS.md), so a single sample under-reports device throughput.
    reps = int(os.environ.get("BENCH_REPS", 3))
    use_stream = params.intersector in ("pallas", "pallas-hbm")

    def one_run(stats=None):
        if use_stream:
            rgb, _done = render_streaming(arrays, params, chunk_slots=chunk,
                                          stats_out=stats)
            return rgb
        return render(arrays, params, mode="path-trace",
                      chunk_size=chunk).rgb

    one_run({} if use_stream else None)  # warm-up / compile

    dt = float("inf")
    stats: dict = {}
    for _ in range(reps):
        s: dict = {}
        t0 = time.time()
        rgb = one_run(s if use_stream else None)
        rep_dt = time.time() - t0
        if rep_dt < dt:
            dt, stats = rep_dt, s

    paths = size * size * spp
    mpaths_s = paths / dt / 1e6
    sys.stderr.write(f"# {dt:.2f}s, image mean {float(rgb.mean()):.4f}, "
                     f"intersector {params.intersector}\n")
    record = {
        "metric": "path_samples_per_second_per_chip_cornell1440",
        "value": round(mpaths_s * 1e6, 1),
        "unit": "paths/s",
        "vs_baseline": round(mpaths_s / BASELINE_MPATHS_PER_CHIP, 4),
    }
    # Tunnel-health stamp (finding 64 discipline): identical compiled
    # programs measure differently across tunnel windows; the probe
    # (~0.12-0.25 s healthy) makes the window a recorded fact:
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "experiments"))
        from _health import tunnel_probe_s

        record["probe_s"] = tunnel_probe_s()
        record["probe_band_ok"] = probe_band_ok(record["probe_s"])
    except Exception:
        pass
    # Walk telemetry (VERDICT r2 #8): the falsifiable counters behind the
    # headline — bundle-iterations, dense blocks walked per iteration, and
    # the implied pair-test rate (128-tri x br-ray blocks):
    if stats.get("iters"):
        it, bw, br = stats["iters"], stats["blocks_walked"], stats["br"]
        # bw counts quarter-walks when subq > 1 (kernel stats contract);
        # block-equivalents and pair tests normalise by subq. Under the
        # default compacted flat walk the units are 64-tri SUB-blocks
        # (auto sub=2, megakernel.py) — pair tests scale by the dense
        # row width, not a hardcoded 128 (a 2x inflation pre-fix):
        sq = stats.get("subq", 1)
        from ipu_ray_lib_tpu.ops.pallas.megakernel import resolve_auto_sub
        from ipu_ray_lib_tpu.render.streaming import (sub_granularity,
                                                      walk_compact_enabled)
        rows = 128
        if walk_compact_enabled() and sq == 1:
            # Mirror the megakernel sub resolution (shared helper incl.
            # the reflag-scratch degrade ladder; RAY_SUB override wins):
            sub_eff = (sub_granularity()
                       or resolve_auto_sub(arrays.blocked.num_blocks, br))
            rows = 128 // sub_eff
        record["telemetry"] = {
            "bundle_iters": it,
            "blocks_per_iter": round(bw / sq / max(it, 1), 2),
            "dense_rows_per_block": rows,
            "pair_tests_per_s": round(bw * float(rows) * (br // sq) / dt, 1),
            "winner_blocks_per_iter": round(
                stats.get("winner_blocks", 0) / max(it, 1), 2),
            "subq": sq,
        }
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
