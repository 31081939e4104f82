"""BxDF / sampling unit tests: distribution and invariant checks for the
portable compute core (role of the reference's L0 unit coverage)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ipu_ray_lib_tpu.ops.bxdf import (
    cosine_sample_hemisphere,
    dielectric,
    evaluate_roulette,
    offset_ray_origin,
    orthonormal_system,
    reflect,
    sample_diffuse,
    sample_disc_concentric,
    schlick,
)


@pytest.fixture(scope="module")
def uniforms():
    key = jax.random.PRNGKey(0)
    return jax.random.uniform(key, (2, 20000), dtype=jnp.float32)


def test_orthonormal_system(uniforms):
    n = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (1000, 3)))
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    v2, v3 = orthonormal_system(jnp.asarray(n))
    v2, v3 = np.asarray(v2), np.asarray(v3)
    assert np.abs(np.sum(v2 * n, axis=-1)).max() < 1e-5
    assert np.abs(np.sum(v3 * n, axis=-1)).max() < 1e-5
    assert np.abs(np.sum(v2 * v3, axis=-1)).max() < 1e-5
    assert np.abs(np.linalg.norm(v2, axis=-1) - 1).max() < 1e-5


def test_concentric_disc_uniform(uniforms):
    x, y = sample_disc_concentric(uniforms[0], uniforms[1])
    x, y = np.asarray(x), np.asarray(y)
    r2 = x * x + y * y
    assert r2.max() <= 1.0 + 1e-6
    # Uniform on disc => r^2 uniform on [0,1]:
    assert abs(r2.mean() - 0.5) < 0.02
    assert abs(x.mean()) < 0.02 and abs(y.mean()) < 0.02


def test_cosine_hemisphere(uniforms):
    w = np.asarray(cosine_sample_hemisphere(uniforms[0], uniforms[1]))
    assert np.all(w[:, 2] >= 0)
    assert np.abs(np.linalg.norm(w, axis=-1) - 1).max() < 1e-5
    # E[cos theta] = 2/3 for cosine-weighted hemisphere:
    assert abs(w[:, 2].mean() - 2 / 3) < 0.01


def test_sample_diffuse_is_in_normal_hemisphere(uniforms):
    n = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (20000, 3)))
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    d = np.asarray(sample_diffuse(jnp.asarray(n), uniforms[0], uniforms[1]))
    cos = np.sum(d * n, axis=-1)
    assert np.all(cos >= -1e-5)
    assert abs(cos.mean() - 2 / 3) < 0.01


def test_reflect():
    d = jnp.asarray([[0.70710678, 0.0, -0.70710678]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    r = np.asarray(reflect(d, n))[0]
    np.testing.assert_allclose(r, [0.70710678, 0, 0.70710678], atol=1e-6)


def test_schlick_limits():
    # Normal incidence equals base reflectance; grazing tends to 1:
    r0 = np.asarray(schlick(jnp.float32(1.0), jnp.float32(1.5)))
    assert r0 == pytest.approx(((1 - 1.5) / (1 + 1.5)) ** 2, rel=1e-5)
    rg = np.asarray(schlick(jnp.float32(0.0), jnp.float32(1.5)))
    assert rg == pytest.approx(1.0, rel=1e-5)


def test_dielectric_snell(uniforms):
    """Refraction must satisfy Snell's law when it happens; total internal
    reflection must reflect."""
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (20000, 1)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    d = np.array(jax.random.normal(key, (20000, 3)))
    d[:, 2] = -np.abs(d[:, 2]) - 0.1  # entering from above
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    new_d, refracted = dielectric(jnp.asarray(d.astype(np.float32)), n, jnp.float32(1.52), uniforms[0])
    new_d, refracted = np.asarray(new_d), np.asarray(refracted)
    # Snell: sin_t = sin_i / ior for entering rays:
    sin_i = np.linalg.norm(d[:, :2], axis=-1)
    sin_t = np.linalg.norm(new_d[:, :2] / np.maximum(np.linalg.norm(new_d, axis=-1, keepdims=True), 1e-9), axis=-1)
    sel = refracted
    np.testing.assert_allclose(sin_t[sel], sin_i[sel] / 1.52, atol=1e-3)
    # Reflected rays bounce back up:
    assert np.all(new_d[~sel][:, 2] > 0)
    assert np.all(new_d[sel][:, 2] < 0)


def test_roulette_unbiased(uniforms):
    tp = jnp.asarray(np.tile([[0.5, 0.25, 0.1]], (20000, 1)).astype(np.float32))
    stop, tp2 = evaluate_roulette(uniforms[0], tp)
    stop, tp2 = np.asarray(stop), np.asarray(tp2)
    # Survival probability = max component (0.5):
    assert abs((~stop).mean() - 0.5) < 0.02
    # Survivors reweighted by 1/p: expectation preserved:
    est = np.where(~stop[:, None], tp2, 0.0).mean(axis=0)
    np.testing.assert_allclose(est, [0.5, 0.25, 0.1], atol=0.02)


def test_offset_ray_origin_direction_sign():
    o = jnp.asarray([[100.0, 0.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    d_along = jnp.asarray([[0.0, 1.0, 0.0]])
    d_against = jnp.asarray([[0.0, -1.0, 0.0]])
    up = np.asarray(offset_ray_origin(o, d_along, n))[0]
    dn = np.asarray(offset_ray_origin(o, d_against, n))[0]
    assert up[1] > 0 and dn[1] < 0
    # Offset scales with position magnitude:
    far = np.asarray(offset_ray_origin(o * 100, d_along, n))[0]
    assert far[1] > up[1]
