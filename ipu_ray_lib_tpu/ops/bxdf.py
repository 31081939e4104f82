"""BxDF sampling, geometric sampling, and path utilities (jnp, batched).

The vectorised equivalents of ref include/BxDF.hpp,
include/geometric_sampling.hpp and include/Render.hpp:16-33. All functions
operate on [R,3]/[R] arrays with uniform control flow; material branching
happens by masked select in the integrators.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.constants import PI_BY_2, PI_BY_4, RAY_EPSILON


def orthonormal_system(n: jnp.ndarray):
    """Tangent basis (v2, v3) for unit vectors n — branchless version of
    ref geometry.hpp:147-159 (same Hughes-Moller style construction)."""
    ax = jnp.abs(n[..., 0])
    ay = jnp.abs(n[..., 1])
    use_x = ax > ay
    inv_len_x = 1.0 / jnp.sqrt(n[..., 0] ** 2 + n[..., 2] ** 2)
    v2x = jnp.stack(
        [-n[..., 2] * inv_len_x, jnp.zeros_like(ax), n[..., 0] * inv_len_x], axis=-1
    )
    inv_len_y = 1.0 / jnp.sqrt(n[..., 1] ** 2 + n[..., 2] ** 2)
    v2y = jnp.stack(
        [jnp.zeros_like(ax), n[..., 2] * inv_len_y, -n[..., 1] * inv_len_y], axis=-1
    )
    v2 = jnp.where(use_x[..., None], v2x, v2y)
    v3 = jnp.cross(n, v2)
    return v2, v3


def sample_disc_concentric(u1: jnp.ndarray, u2: jnp.ndarray):
    """Concentric unit-disc sampling (ref geometric_sampling.hpp:8-29)."""
    ux = 2.0 * u1 - 1.0
    uy = 2.0 * u2 - 1.0
    use_x = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(use_x, ux, uy)
    safe_ux = jnp.where(ux == 0.0, 1.0, ux)
    safe_uy = jnp.where(uy == 0.0, 1.0, uy)
    th = jnp.where(
        use_x,
        PI_BY_4 * (uy / safe_ux),
        PI_BY_2 - PI_BY_4 * (ux / safe_uy),
    )
    zero = (ux == 0.0) & (uy == 0.0)
    x = jnp.where(zero, 0.0, r * jnp.cos(th))
    y = jnp.where(zero, 0.0, r * jnp.sin(th))
    return x, y


def cosine_sample_hemisphere(u1: jnp.ndarray, u2: jnp.ndarray):
    """Cosine-weighted hemisphere sample in tangent space (z up)."""
    x, y = sample_disc_concentric(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return jnp.stack([x, y, z], axis=-1)


def sample_diffuse(normal: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray):
    """Sample an outgoing direction from a diffuse surface
    (ref BxDF.hpp:12-30): tangent-space cosine sample rotated to world."""
    x_basis, y_basis = orthonormal_system(normal)
    wi = cosine_sample_hemisphere(u1, u2)
    return (
        x_basis * wi[..., 0:1] + y_basis * wi[..., 1:2] + normal * wi[..., 2:3]
    )


def reflect(ray_dir: jnp.ndarray, normal: jnp.ndarray):
    """Mirror reflection, re-normalised (ref BxDF.hpp:33-37)."""
    cos_theta = jnp.sum(ray_dir * normal, axis=-1, keepdims=True)
    r = ray_dir - normal * (2.0 * cos_theta)
    return r / jnp.linalg.norm(r, axis=-1, keepdims=True)


def schlick(cos_theta: jnp.ndarray, ri: jnp.ndarray):
    r0 = (1.0 - ri) / (1.0 + ri)
    r0 = r0 * r0
    base = 1.0 - cos_theta
    return r0 + (1.0 - r0) * base ** 5


def refract(direction: jnp.ndarray, normal: jnp.ndarray, ndotr: jnp.ndarray, ri: jnp.ndarray):
    cos_theta = -ndotr
    r_perp = (direction + normal * cos_theta[..., None]) * ri[..., None]
    par_mag = jnp.sqrt(jnp.abs(1.0 - jnp.sum(r_perp * r_perp, axis=-1)))
    r_par = normal * (-par_mag[..., None])
    return r_perp + r_par


def dielectric(direction: jnp.ndarray, normal: jnp.ndarray, ior: jnp.ndarray, u1: jnp.ndarray):
    """Dielectric interaction: Schlick-weighted reflect/refract choice
    (ref BxDF.hpp:57-75). Returns (new_dir, refracted_mask)."""
    entering = jnp.sum(normal * direction, axis=-1) <= 0.0
    n = jnp.where(entering[..., None], normal, -normal)
    ri = jnp.where(entering, 1.0 / ior, ior)
    ndotr = jnp.sum(n * direction, axis=-1)
    cost1 = -ndotr
    cost2 = 1.0 - ri * ri * (1.0 - cost1 * cost1)
    do_refract = (cost2 > 0.0) & (u1 > schlick(cost1, ri))
    d_refract = refract(direction, n, ndotr, ri)
    d_reflect = reflect(direction, n)
    return jnp.where(do_refract[..., None], d_refract, d_reflect), do_refract


def evaluate_roulette(u1: jnp.ndarray, throughput: jnp.ndarray):
    """Russian roulette (ref geometric_sampling.hpp:56-63).

    Returns (stop_mask, reweighted_throughput); survivors are scaled by
    1/p with p = max throughput component.
    """
    p = jnp.max(throughput, axis=-1)
    stop = (p == 0.0) | (u1 > p)
    safe_p = jnp.where(p == 0.0, 1.0, p)
    tp = jnp.where(stop[..., None], throughput, throughput / safe_p[..., None])
    return stop, tp


def offset_ray_origin(origin: jnp.ndarray, direction: jnp.ndarray, normal: jnp.ndarray):
    """Scale-aware self-intersection offset (ref Render.hpp:29-33):
    push the origin along +-normal depending on ray direction."""
    mag = 1.0 + jnp.max(jnp.abs(origin), axis=-1)
    sign = jnp.sign(jnp.sum(normal * direction, axis=-1))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    m = mag * RAY_EPSILON * sign
    return origin + normal * m[..., None]
