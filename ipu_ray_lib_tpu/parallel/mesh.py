"""Data-parallel scale-out over a TPU device mesh.

The reference scales by replicating the whole Poplar graph per IPU and
round-robining ray batches to each replica's DRAM, with per-replica RNG
seeds and no cross-replica collectives (ref: trace.cpp:296-307,
src/IpuScene.cpp:648-684, ipu_utils.hpp:332-341). The TPU-native
equivalent implemented here:

* one ``jax.sharding.Mesh`` with a single ``rays`` axis;
* scene arrays replicated, ray batches sharded on ``rays`` via
  ``shard_map`` — XLA moves the data over ICI;
* per-shard RNG derived with ``jax.random.fold_in(key, axis_index)``
  (the analogue of per-replica xoshiro jump seeds);
* results gathered back to the host for image assembly — like the
  reference, no collectives are needed during rendering.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.camera import generate_camera_rays
from ..render.path import path_trace_sample
from ..render.shadow import shadow_trace
from ..scene.build import SceneArrays, SceneParams

RAY_AXIS = "rays"


def make_ray_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def shard_rays(n: int, mesh: Mesh) -> int:
    """Round n up so it divides evenly across the mesh (the analogue of the
    reference's equal-batches-per-replica padding, IpuScene.cpp:93-95)."""
    d = mesh.devices.size
    return -(-n // d) * d


def render_path_sharded(
    scene: SceneArrays,
    params: SceneParams,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    key: jax.Array,
    mesh: Mesh,
    env_fn=None,
    env_params=None,
    spp: int | None = None,
):
    """Path-trace a ray batch sharded over the mesh; returns rgb [R,3].

    ``rows``/``cols`` length must be divisible by the mesh size (use
    :func:`shard_rays` to pad).
    """
    spp = spp if spp is not None else params.samples_per_pixel
    has_env = env_fn is not None

    def per_shard(scene_rep, rows_s, cols_s, env_p):
        shard_key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
        R = rows_s.shape[0]

        def one_sample(s, acc):
            skey = jax.random.fold_in(shard_key, s)
            o, d = generate_camera_rays(
                rows_s, cols_s, params.image_width, params.image_height,
                params.fov_radians, params.anti_alias_scale,
                jax.random.fold_in(skey, 0xC0FFEE),
            )
            res = path_trace_sample(
                scene_rep, o, d, skey,
                params.max_path_length, params.roulette_start_depth,
                intersector=params.intersector,
            )
            rgb = res.rgb
            if has_env:
                env_rgb = env_fn(env_p, res.esc_dir)
                rgb = rgb + jnp.where(
                    res.escaped[..., None], res.esc_throughput * env_rgb, 0.0
                )
            return acc + rgb

        acc = jax.lax.fori_loop(0, spp, one_sample, jnp.zeros((R, 3), jnp.float32))
        return acc * (1.0 / spp)

    shard_fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )
    return jax.jit(shard_fn)(scene, rows, cols, env_params)


def render_shadow_sharded(
    scene: SceneArrays,
    params: SceneParams,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    mesh: Mesh,
):
    """Shadow-trace a ray batch sharded over the mesh; returns TraceResultSoA."""

    def per_shard(scene_rep, rows_s, cols_s):
        o, d = generate_camera_rays(
            rows_s, cols_s, params.image_width, params.image_height,
            params.fov_radians, 0.0, None,
        )
        return shadow_trace(scene_rep, o, d, intersector=params.intersector)

    shard_fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )
    return jax.jit(shard_fn)(scene, rows, cols)
