"""Round-5 probe: decompose the driver-visible end-to-end gap.

BENCH_r04 records 14.67 Mpaths/s end-to-end while the kernel-side
harness measures 16.17 M (VERDICT r4 weak #2, roadmap #1). This probe
measures, in one tunnel window, at the bench workload (Cornell+monkey
1440x1440 spp 64, chunk 131072):

  1. tunnel probe_s (window health stamp)
  2. full render_streaming wall time (the bench number)
  3. device-only time: same dispatch chain, block via a 1-element
     reduction readback instead of the 25 MB image
  4. d2h readback time of the [R*J, 3] f32 accumulator alone, and its
     f16 twin
  5. host prep: the order-scatter + reshape on a host copy
  6. async-overlap check: does arr.copy_to_host_async() of a 25 MB
     array overlap a concurrently dispatched kernel chain, or
     serialise? (decides whether pixel-group pipelining can hide
     readback at all on the axon tunnel)

Run: python experiments/e2e_gap_probe.py
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
    size = int(os.environ.get("BENCH_SIZE", 1440))
    spp = int(os.environ.get("BENCH_SPP", 64))
    chunk = int(os.environ.get("BENCH_CHUNK", 1 << 17))

    from ipu_ray_lib_tpu.render.streaming import render_streaming
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

    mesh_file = os.path.join(os.path.dirname(__file__), "..", "assets",
                             "monkey_bust.glb")
    scene = make_cornell_box_scene(mesh_file, box_only=False)
    arrays, params, _ = build_scene(
        scene, image_width=size, image_height=size, samples_per_pixel=spp,
        intersector="pallas",
    )

    probe = tunnel_probe_s()
    log_result(exp="e2e_gap", variant="probe", probe_s=probe)

    # --- 2: full end-to-end (the bench number) ----------------------
    render_streaming(arrays, params, chunk_slots=chunk)  # warm
    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        render_streaming(arrays, params, chunk_slots=chunk)
        best = min(best, time.time() - t0)
    paths = size * size * spp
    log_result(exp="e2e_gap", variant="end_to_end", s=round(best, 3),
               mpaths=round(paths / best / 1e6, 2), probe_s=probe)

    # --- 3/4/5: split the render into dispatch+compute vs readback ---
    # Reproduce render_streaming's internals for the bench config:
    from ipu_ray_lib_tpu.ops.pallas.megakernel import megakernel_path_trace
    from ipu_ray_lib_tpu.render import streaming as S

    w, h = params.window_w, params.window_h
    n_pix = w * h
    rows_np, cols_np, order = S._pixel_stream(params, 32)
    R = min(chunk, n_pix)
    R = min(-(-R // 256) * 256, -(-n_pix // 256) * 256)
    J = -(-n_pix // R)
    pad = R * J - n_pix
    rows_d, cols_d = S._device_stream(
        rows_np, cols_np, pad, (w, h, params.window_c, params.window_r,
                                32, R, J))
    max_iters = J * spp * params.max_path_length + 16

    def dispatch(seed):
        return megakernel_path_trace(
            arrays, rows_d, cols_d, jnp.uint32(seed), jnp.int32(n_pix),
            params=params, slots=R, j_per_slot=J, spp=spp,
            max_iters=max_iters, br=S._pick_br(R, J),
            interpret=jax.default_backend() != "tpu")

    flat, done = dispatch(1)
    np.asarray(flat)  # warm

    # device-only: block on a scalar reduction, not the 25 MB image
    red = jax.jit(lambda x: x.sum())
    float(np.asarray(red(flat)))  # warm the reduction
    best_dev = float("inf")
    for _ in range(reps):
        t0 = time.time()
        f2, _ = dispatch(2)
        float(np.asarray(red(f2)))
        best_dev = min(best_dev, time.time() - t0)
    log_result(exp="e2e_gap", variant="device_only", s=round(best_dev, 3),
               mpaths=round(paths / best_dev / 1e6, 2), probe_s=probe)

    # d2h of the settled accumulator (f32 and f16):
    nbytes = int(np.prod(flat.shape)) * 4
    for name, arr_fn in (
        ("readback_f32", lambda: flat),
        ("readback_f16", lambda: flat.astype(jnp.float16)),
    ):
        a = arr_fn()
        a.block_until_ready()
        best_rb = float("inf")
        for _ in range(reps):
            t0 = time.time()
            np.asarray(a)
            best_rb = min(best_rb, time.time() - t0)
        log_result(exp="e2e_gap", variant=name, s=round(best_rb, 4),
                   mb=round(nbytes / 1e6, 1), probe_s=probe)

    # host prep (scatter by order):
    flat_np = np.asarray(flat)
    t0 = time.time()
    img = np.empty((n_pix, 3), np.float32)
    img[order] = flat_np[:n_pix]
    img = img.reshape(h, w, 3)
    log_result(exp="e2e_gap", variant="host_prep", s=round(time.time() - t0, 4))

    # --- 6: does async d2h overlap compute? -------------------------
    # Chain of matmuls sized ~1s; start copy_to_host_async of a 25 MB
    # array right after dispatching the chain. If overlap works,
    # t(total) ~= max(chain, copy); if serialised, ~= chain + copy.
    big = jnp.zeros((R * J, 3), jnp.float32) + 0.5
    big.block_until_ready()
    x = jnp.full((2048, 2048), 0.5, jnp.float32)

    def chain(a):
        for _ in range(120):
            a = jnp.tanh(a @ a * 1e-6)
        return a

    f = jax.jit(chain)
    np.asarray(f(x))
    t0 = time.time()
    y = f(x)
    float(np.asarray(red(y)))
    t_chain = time.time() - t0
    t0 = time.time()
    np.asarray(big)
    t_copy = time.time() - t0

    t0 = time.time()
    y = f(x)
    try:
        big.copy_to_host_async()
        api = "copy_to_host_async"
    except Exception as e:  # pragma: no cover
        api = f"unavailable: {e!r}"
    b_np = np.asarray(big)
    float(np.asarray(red(y)))
    t_both = time.time() - t0
    log_result(exp="e2e_gap", variant="overlap_check", api=api,
               chain_s=round(t_chain, 3), copy_s=round(t_copy, 3),
               both_s=round(t_both, 3),
               overlap=bool(t_both < t_chain + 0.5 * t_copy),
               probe_s=probe)
    del b_np, img


if __name__ == "__main__":
    main()
