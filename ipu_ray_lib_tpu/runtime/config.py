"""Runtime configuration and device/session management.

The TPU equivalent of the reference's runtime framework
(ref: include/ipu_utils.hpp — RuntimeConfig:174-183, DeferredDevice:79-172,
GraphManager:523-610, executable caching:51-76):

* device acquisition: enumerate devices, select TPU chips (or fall back
  to CPU — the reference's IPUModel-simulator analogue);
* executable caching: the JAX persistent compilation cache replaces
  saveExe/loadExe + the program-name registry (compiled executables are
  keyed by HLO, so "re-run by name" is automatic);
* compile-only mode: AOT lowering/compilation without execution.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from ..utils.log import logger


@dataclass
class RuntimeConfig:
    """Run-level knobs (role of ref RuntimeConfig, ipu_utils.hpp:174-183)."""

    num_devices: int = 0          # 0 = all available (ref: numIpus)
    use_cpu: bool = False         # CPU backend (ref: useIpuModel simulator)
    cache_dir: str = ""           # persistent compile cache (ref: saveExe/loadExe)
    compile_only: bool = False    # AOT compile without running


def setup_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (ref saveExe/loadExe role)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ipu_ray_lib_tpu_xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    logger().debug("Compilation cache at %s", cache_dir)


def acquire_devices(config: RuntimeConfig):
    """Device acquisition with fallback (role of ref DeferredDevice).

    Returns the list of devices to use. Raises if a TPU was requested and
    none is usable (the reference exhausts attach attempts similarly,
    ipu_utils.hpp:143-159).
    """
    import jax

    log = logger()
    if config.use_cpu:
        jax.config.update("jax_platforms", "cpu")
        devices = jax.devices("cpu")
        log.info("Using CPU backend with %d device(s) (simulator role)", len(devices))
    else:
        t0 = time.time()
        devices = jax.devices()
        log.info(
            "Acquired %d device(s) on platform '%s' in %.1fs",
            len(devices), devices[0].platform, time.time() - t0,
        )
    if config.num_devices > 0:
        if len(devices) < config.num_devices:
            log.warning(
                "Requested %d devices, only %d available",
                config.num_devices, len(devices),
            )
        devices = devices[: config.num_devices]
    return devices


def compile_only(fn, *example_args, **jit_kwargs):
    """AOT-compile a jittable function without executing it
    (ref compileOnly, ipu_utils.hpp:581-584). Returns the compiled object."""
    import jax

    lowered = jax.jit(fn, **jit_kwargs).lower(*example_args)
    compiled = lowered.compile()
    logger().info(
        "Compiled %s: %s", getattr(fn, "__name__", "fn"),
        compiled.memory_analysis(),
    )
    return compiled
