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
import threading
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


class CompileProgress:
    """Compile-progress observability (role of the reference's
    CallbackFilter, ipu_utils.hpp:476-518).

    The reference intercepts poplar's compile-progress callbacks and
    throttles them into readable log lines. XLA exposes no percentage
    callback, so the TPU analogue has two halves:

    * this context manager — a heartbeat thread that logs elapsed time
      at a throttled cadence while a (possibly multi-minute) lowering/
      compilation runs, so long compiles show liveness instead of
      silence; and
    * :func:`install_compile_event_logging` — a ``jax.monitoring``
      listener that reports each finished backend compilation with its
      duration (filtered: slow compiles at info, the rest at debug —
      the same noise-throttling job CallbackFilter does).
    """

    def __init__(self, name: str, interval: float = 15.0):
        self.name = name
        self.interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.t0 = 0.0

    def __enter__(self):
        self.t0 = time.time()
        self._thread = threading.Thread(target=self._beat, daemon=True)
        self._thread.start()
        return self

    def _beat(self):
        while not self._stop.wait(self.interval):
            logger().info(
                "Compiling %s ... %.0fs elapsed", self.name, time.time() - self.t0
            )

    def __exit__(self, exc_type, exc, tb):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=1.0)
        if exc_type is None:
            logger().info(
                "Compiled %s in %.1fs", self.name, time.time() - self.t0
            )
        return False


_compile_listener_installed = False


def install_compile_event_logging(info_threshold_secs: float = 5.0) -> None:
    """Log XLA backend compilations as they finish (CallbackFilter role,
    ref ipu_utils.hpp:476-518). Compiles longer than
    ``info_threshold_secs`` log at info, the rest at debug — the filter
    half of the contract (poplar fires thousands of progress callbacks;
    jax.monitoring fires one duration event per compile stage, so
    throttling here is by significance rather than cadence).

    Idempotent; safe to call from the CLI and library entry points.
    """
    global _compile_listener_installed
    if _compile_listener_installed:
        return
    import jax.monitoring

    def _on_duration(event: str, duration: float, **kwargs) -> None:
        if "compile" not in event:
            return
        log = logger()
        msg = "XLA %s: %.1fs"
        if duration >= info_threshold_secs:
            log.info(msg, event.strip("/"), duration)
        else:
            log.debug(msg, event.strip("/"), duration)

    jax.monitoring.register_event_duration_secs_listener(_on_duration)
    _compile_listener_installed = True


def compile_only(fn, *example_args, _name: str | None = None, **jit_kwargs):
    """AOT-compile a jittable function without executing it
    (ref compileOnly, ipu_utils.hpp:581-584). Returns the compiled object.

    The compile runs under a :class:`CompileProgress` heartbeat and lands
    in the persistent compilation cache (when enabled), so a later real
    run loads the executable instead of recompiling — the reference's
    compile-then-saveExe workflow."""
    import jax

    name = _name or getattr(fn, "__name__", "fn")
    with CompileProgress(name):
        lowered = jax.jit(fn, **jit_kwargs).lower(*example_args)
        compiled = lowered.compile()
    logger().info("Compiled %s: %s", name, compiled.memory_analysis())
    return compiled
