"""Pinhole camera ray generation (jnp, batched).

Role of ref include/Render.hpp:74-85 (pixelToRayDir) and
src/app_utils.cpp:19-47 (initPerspectiveRayStream) /
codelets/TraceCodelets.cpp:145-167 (sampleCameraRays): camera sits at the
origin looking down -z; pixel coordinates get optional gaussian
anti-alias jitter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_to_ray_dir(x, y, w, h, tan_theta):
    """Normalised ray direction for (possibly fractional) pixel coords.

    ``tan_theta`` is tan(horizontal_fov / 2). x is the column coordinate,
    y the row coordinate; image plane spans the full width FOV.
    """
    aspect = w / h
    xn = (x / w) - 0.5
    yn = (y / h) - 0.5
    d = jnp.stack(
        [
            2.0 * xn * aspect * tan_theta,
            -2.0 * yn * tan_theta,
            -jnp.ones_like(xn),
        ],
        axis=-1,
    )
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def pixel_grid(window_w, window_h, window_c, window_r):
    """Row/col coordinates [R] for a crop window, scanline order."""
    rows = jnp.arange(window_r, window_r + window_h, dtype=jnp.float32)
    cols = jnp.arange(window_c, window_c + window_w, dtype=jnp.float32)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    return rr.reshape(-1), cc.reshape(-1)


def generate_camera_rays(
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    image_width: float,
    image_height: float,
    fov_radians: float,
    anti_alias_scale: float,
    key: jax.Array | None,
):
    """Origins (zeros) + jittered directions for a batch of pixel coords."""
    tan_theta = jnp.tan(jnp.float32(fov_radians) / 2.0)
    pu = rows
    pv = cols
    if key is not None and anti_alias_scale > 0.0:
        g = jax.random.normal(key, (2,) + rows.shape, dtype=jnp.float32)
        pu = pu + anti_alias_scale * g[0]
        pv = pv + anti_alias_scale * g[1]
    dirs = pixel_to_ray_dir(pv, pu, jnp.float32(image_width), jnp.float32(image_height), tan_theta)
    origins = jnp.zeros_like(dirs)
    return origins, dirs
