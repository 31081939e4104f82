"""Statistical tests for the counter-based RNG (ops/rng.py) and its
in-kernel int32 twin (ops/pallas/megakernel.py).

The reference leans on the IPU's hardware RNG whose contract is
"independent uniforms per worker"; these tests pin the same contract for
the hash generator: uniformity (moments + chi-square), independence
across the (path, bounce, dim) counter axes, Box-Muller normality, and
bit balance. Methodology follows the reference's distribution-parity
approach (LITERATE_TEST histogram cells) with 4-sigma acceptance bands.
"""

import numpy as np

import jax.numpy as jnp

from ipu_ray_lib_tpu.ops.rng import hash_u32, normal2, uniform01

N = 1 << 20


def _u(pids, bounce=7, dim=0):
    return np.asarray(
        uniform01(jnp.asarray(pids, jnp.uint32), jnp.uint32(bounce),
                  jnp.uint32(dim))
    )


def test_uniform_moments():
    u = _u(np.arange(N))
    se_mean = 4.0 / np.sqrt(12 * N)          # 4 sigma
    assert abs(u.mean() - 0.5) < se_mean
    assert abs(u.var() - 1.0 / 12.0) < 4.0 * (1.0 / 12.0) / np.sqrt(N) * 2
    assert u.min() >= 0.0 and u.max() < 1.0


def test_uniform_chi_square():
    u = _u(np.arange(N))
    bins = 256
    counts, _ = np.histogram(u, bins=bins, range=(0.0, 1.0))
    expected = N / bins
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # dof = 255: mean 255, sd ~22.6; accept within ~5 sigma:
    assert chi2 < 255 + 5 * np.sqrt(2 * 255), chi2


def test_stream_independence():
    """Correlations across counter axes: same pid different dim, same pid
    consecutive bounce, consecutive pids."""
    pids = np.arange(N)
    u0 = _u(pids, dim=0)
    u1 = _u(pids, dim=1)
    ub = _u(pids, bounce=8, dim=0)
    thresh = 4.0 / np.sqrt(N)
    assert abs(np.corrcoef(u0, u1)[0, 1]) < thresh
    assert abs(np.corrcoef(u0, ub)[0, 1]) < thresh
    assert abs(np.corrcoef(u0[:-1], u0[1:])[0, 1]) < thresh


def test_bit_balance():
    bits = np.asarray(hash_u32(jnp.arange(N, dtype=jnp.uint32)))
    for b in range(32):
        frac = ((bits >> np.uint32(b)) & 1).mean()
        assert abs(frac - 0.5) < 4.0 / (2 * np.sqrt(N)), (b, frac)


def test_box_muller_normality():
    g1, g2 = normal2(jnp.arange(N, dtype=jnp.uint32), jnp.uint32(3))
    for g in (np.asarray(g1), np.asarray(g2)):
        assert abs(g.mean()) < 4.0 / np.sqrt(N)
        assert abs(g.var() - 1.0) < 4.0 * np.sqrt(2.0 / N)
        skew = (g ** 3).mean()
        kurt = (g ** 4).mean()
        assert abs(skew) < 4.0 * np.sqrt(15.0 / N)
        assert abs(kurt - 3.0) < 4.0 * np.sqrt(96.0 / N)
        # Tail quantiles vs the normal distribution:
        q = np.quantile(g, [0.025, 0.975])
        assert abs(q[0] + 1.9600) < 0.02
        assert abs(q[1] - 1.9600) < 0.02


def test_megakernel_rng_matches_ops_rng():
    """The in-kernel int32 hash (logical shifts + wrapping int32 muls)
    must produce bit-identical streams to ops/rng.py's uint32 version —
    the megakernel and the XLA-loop integrator share path statistics."""
    from ipu_ray_lib_tpu.ops.pallas.megakernel import _normal2, _u01

    pids_u = jnp.arange(4096, dtype=jnp.uint32)
    pids_i = jnp.arange(4096, dtype=jnp.int32).reshape(1, -1)
    for bounce in (0, 7, 123456):
        for dim in (0, 1, 2, 3):
            a = np.asarray(uniform01(pids_u, jnp.uint32(bounce),
                                     jnp.uint32(dim)))
            b = np.asarray(_u01(pids_i, jnp.full_like(pids_i, bounce),
                                jnp.full_like(pids_i, dim)))[0]
            assert (a == b).all(), (bounce, dim)
    a1, a2 = normal2(pids_u, jnp.uint32(0xCA3))
    b1, b2 = _normal2(pids_i, jnp.full_like(pids_i, 0xCA3))
    assert np.allclose(np.asarray(a1), np.asarray(b1)[0], atol=1e-6)
    assert np.allclose(np.asarray(a2), np.asarray(b2)[0], atol=1e-6)


def test_kernel_atan2_acos_polynomials():
    """The megakernel's polynomial atan2/arccos (used for equirect env
    UVs) must be accurate to ~1e-5 rad over the full circle."""
    import jax.numpy as jnp

    from ipu_ray_lib_tpu.ops.pallas.megakernel import _acos, _atan2

    rng = np.random.default_rng(7)
    ang = rng.uniform(-np.pi, np.pi, 4096).astype(np.float32)
    r = rng.uniform(0.1, 10.0, 4096).astype(np.float32)
    y, x = r * np.sin(ang), r * np.cos(ang)
    got = np.asarray(_atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    assert np.abs(got - want).max() < 3e-5

    c = rng.uniform(-1.0, 1.0, 4096).astype(np.float32)
    got = np.asarray(_acos(jnp.asarray(c)))
    assert np.abs(got - np.arccos(c)).max() < 5e-5
