"""Round-5 phase decomposition of the bench end-to-end loop.

bench spp64 in-band: ~8.8 s e2e vs 8.30 s device-only for the same
4-dispatch schedule — ~0.5 s driver-visible residue. This probe
timestamps each phase of a render_streaming-equivalent loop:

  t_dispatch[g]  when group g's dispatches returned (host enqueue time)
  t_fetch[g]     when group g's np.asarray completed
  t_scatter[g]   when group g's host scatter completed
  t_total

Run: python experiments/e2e_phase_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from experiments._health import tunnel_probe_s  # noqa: E402
from experiments.kernel_sweep import log_result  # noqa: E402


def main():
    size, spp, chunk = 1440, 64, 1 << 17
    from ipu_ray_lib_tpu.ops.pallas.megakernel import megakernel_path_trace
    from ipu_ray_lib_tpu.render import streaming as S
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

    scene = make_cornell_box_scene(
        os.path.join(os.path.dirname(__file__), "..", "assets",
                     "monkey_bust.glb"), box_only=False)
    arrays, params, _ = build_scene(
        scene, image_width=size, image_height=size, samples_per_pixel=spp,
        intersector="pallas")
    probe = tunnel_probe_s()
    w, h = params.window_w, params.window_h
    n_pix = w * h
    rows_np, cols_np, order = S._pixel_stream(params, 32)
    R = min(chunk, n_pix)
    R = min(-(-R // 256) * 256, -(-n_pix // 256) * 256)
    J = -(-n_pix // R)
    rows_d, cols_d = S._device_stream(
        rows_np, cols_np, R * J - n_pix,
        (w, h, params.window_c, params.window_r, 32, R, J))
    sched = S.pix_group_schedule(J)

    def dispatch(j0, jg, seed):
        lo = j0 * R
        return megakernel_path_trace(
            arrays, rows_d[lo:lo + R * jg], cols_d[lo:lo + R * jg],
            jnp.uint32(seed), jnp.int32(n_pix),
            params=params, slots=R, j_per_slot=jg, spp=spp,
            j0=jnp.int32(j0), k_total=J * spp,
            max_iters=jg * spp * params.max_path_length + 16,
            br=S._pick_br(R, J),
            interpret=jax.default_backend() != "tpu")

    # warm
    for j0, jg in sched:
        f, _ = dispatch(j0, jg, 1)
    np.asarray(f)

    img = np.empty((n_pix, 3), np.float32)
    t0 = time.time()
    stamps = []
    prev = None
    outs = []
    for j0, jg in sched:
        f, d = dispatch(j0, jg, 2)
        outs.append(d)
        stamps.append(("dispatch", j0, round(time.time() - t0, 4)))
        if prev is not None:
            pf, pj0, pjg = prev
            try:
                pf.copy_to_host_async()
            except Exception:
                pass
            flat = np.asarray(pf)
            stamps.append(("fetch", pj0, round(time.time() - t0, 4)))
            lo, hi = pj0 * R, min((pj0 + pjg) * R, n_pix)
            img[order[lo:hi]] = flat[:hi - lo]
            stamps.append(("scatter", pj0, round(time.time() - t0, 4)))
        prev = (f, j0, jg)
    pf, pj0, pjg = prev
    try:
        pf.copy_to_host_async()
    except Exception:
        pass
    flat = np.asarray(pf)
    stamps.append(("fetch", pj0, round(time.time() - t0, 4)))
    lo, hi = pj0 * R, min((pj0 + pjg) * R, n_pix)
    img[order[lo:hi]] = flat[:hi - lo]
    stamps.append(("scatter", pj0, round(time.time() - t0, 4)))
    done = int(np.asarray(jnp.stack(outs)).astype(np.int64).sum())
    total = time.time() - t0
    log_result(exp="e2e_phase", sched=str(sched), total_s=round(total, 3),
               mpaths=round(size * size * spp / total / 1e6, 2),
               stamps=stamps, done=done, probe_s=probe)


if __name__ == "__main__":
    main()
