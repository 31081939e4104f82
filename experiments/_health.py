"""Tunnel-health probe for experiment rows (ADVICE r3 #2).

Degraded axon-tunnel windows run identical compiled programs up to
~1.8x slower (PROGRESS.md finding 63), so cross-session A/Bs must be
able to filter rows by the window they were measured in. Every sweep
row stamps ``probe_s``: the wall time of 20 chained [1024,1024] f32
matmuls plus one readback, measured immediately before the sweep.
Healthy windows measure ~0.14 s; throttled windows have measured 0.5 s
and above. Consumers filter with ``probe_s < 0.25`` (or compare rows
only within a probe band).
"""

import time

import numpy as np


def tunnel_probe_s() -> float:
    """Seconds for 20 chained 1024^2 matmuls + readback (see module doc)."""
    import jax
    import jax.numpy as jnp

    x = jnp.full((1024, 1024), 0.5, jnp.float32)

    def chain(a):
        for _ in range(20):
            a = jnp.tanh(a @ a * 1e-6)
        return a

    f = jax.jit(chain)
    np.asarray(f(x))  # compile + warm
    t0 = time.time()
    np.asarray(f(x))
    return round(time.time() - t0, 4)
