#!/usr/bin/env python
"""Benchmark: path-trace throughput on the built-in Cornell scene.

Headline metric matches the reference's own (BASELINE.md): path samples
per second per chip at 1440x1440. The reference achieves ~26 Mpaths/s per
IPU (~100M over 4 IPUs); the north star is >=100 Mpaths/s per TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

BASELINE_MPATHS_PER_CHIP = 100.0  # north-star target (BASELINE.md)


def main() -> int:
    size = int(os.environ.get("BENCH_SIZE", 1440))
    spp = int(os.environ.get("BENCH_SPP", 16))
    chunk = int(os.environ.get("BENCH_CHUNK", 1 << 17))

    import jax
    import jax.numpy as jnp

    from ipu_ray_lib_tpu.ops.camera import pixel_grid
    from ipu_ray_lib_tpu.render.renderer import _path_chunk
    from ipu_ray_lib_tpu.scene.build import build_scene
    from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

    mesh_file = os.path.join(os.path.dirname(__file__), "assets", "monkey_bust.glb")
    if not os.path.exists(mesh_file):
        mesh_file = None
    scene = make_cornell_box_scene(mesh_file, box_only=False)
    arrays, params, _ = build_scene(
        scene, image_width=size, image_height=size, samples_per_pixel=spp
    )

    rows_np, cols_np = pixel_grid(size, size, 0, 0)
    total = size * size
    n_chunks = -(-total // chunk)

    kw = dict(
        fov=params.fov_radians,
        width=params.image_width,
        height=params.image_height,
        aa_scale=params.anti_alias_scale,
        spp=spp,
        max_path_length=params.max_path_length,
        roulette_start_depth=params.roulette_start_depth,
        has_env=False,
        env_fn=None,
    )
    key = jax.random.PRNGKey(1442)

    # Warm-up / compile on the first chunk:
    r0 = jnp.asarray(rows_np[:chunk])
    c0 = jnp.asarray(cols_np[:chunk])
    _path_chunk(arrays, r0, c0, key, None, **kw)[0].block_until_ready()

    t0 = time.time()
    done = 0
    for ci in range(n_chunks):
        sl = slice(ci * chunk, min((ci + 1) * chunk, total))
        n = sl.stop - sl.start
        if n < chunk:  # pad the tail chunk to the static shape
            import numpy as np

            rr = np.pad(np.asarray(rows_np[sl]), (0, chunk - n))
            cc = np.pad(np.asarray(cols_np[sl]), (0, chunk - n))
        else:
            rr, cc = rows_np[sl], cols_np[sl]
        acc, _err = _path_chunk(
            arrays, jnp.asarray(rr), jnp.asarray(cc),
            jax.random.fold_in(key, ci), None, **kw
        )
        done += n
    import numpy as _np

    _np.asarray(acc)  # force completion (block_until_ready is advisory on axon)
    dt = time.time() - t0

    paths = done * spp
    mpaths_s = paths / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "path_samples_per_second_per_chip_cornell1440",
                "value": round(mpaths_s * 1e6, 1),
                "unit": "paths/s",
                "vs_baseline": round(mpaths_s / BASELINE_MPATHS_PER_CHIP, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
