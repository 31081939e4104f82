"""Profiling and throughput observability.

Role of the reference's PVTI tracepoints, cycle counters, and rate logs
(ref: ipu_utils.hpp:533-571 trace channels, NifModel.cpp:341-348
cycleCount, trace.cpp:105-110/259-265/324-333 rays-and-paths-per-second
logs, IpuScene.cpp:685-713 bandwidth logs) — mapped to JAX:

* :func:`trace` — context manager around ``jax.profiler`` trace capture
  (view with xprof/TensorBoard);
* :class:`RateMeter` — wall-clock throughput measurement with proper
  device synchronisation;
* :func:`device_memory_stats` — HBM usage introspection.
"""

from __future__ import annotations

import contextlib
import time

from .log import logger


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ipu_ray_lib_tpu_trace"):
    """Capture a device profile around a code region (PVTI analogue)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger().info("Profile trace written to %s", log_dir)


class RateMeter:
    """Times a region and reports units/second after device sync."""

    def __init__(self, unit: str = "rays"):
        self.unit = unit
        self.elapsed = 0.0
        self.count = 0

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.time() - self._t0
        return False

    def add(self, n: int) -> None:
        self.count += n

    @property
    def rate(self) -> float:
        return self.count / self.elapsed if self.elapsed > 0 else 0.0

    def log(self, label: str = "") -> None:
        logger().info(
            "%s%.4g %s/sec (%d in %.2fs)",
            f"{label}: " if label else "", self.rate, self.unit,
            self.count, self.elapsed,
        )


def block_on(tree):
    """Block until every array in a pytree is computed (timing barrier)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree


def device_memory_stats() -> dict:
    import jax

    try:
        return dict(jax.devices()[0].memory_stats() or {})
    except Exception:
        return {}


def analyse_model(params: dict, name: str = "nif", sample_count: int = 1) -> dict:
    """FLOPs/parameter report for an MLP params dict
    (role of ref NifModel::analyseModel, NifModel.cpp:123-145)."""
    import numpy as np

    flops = 0
    param_bytes = 0
    for k, b in zip(params.get("kernels", ()), params.get("biases", ())):
        flops += 2 * int(np.prod(k.shape)) + int(b.shape[0])
        param_bytes += k.size * k.dtype.itemsize + b.size * b.dtype.itemsize
    report = {
        "layers": len(params.get("kernels", ())),
        "flops_per_sample": flops,
        "flops": flops * sample_count,
        "parameter_kib": param_bytes / 1024.0,
    }
    log = logger()
    log.info("%s layers: %d", name, report["layers"])
    log.info("%s model FLOPS: %d", name, report["flops"])
    log.info("%s parameter size: %.1f KiB", name, report["parameter_kib"])
    return report
