"""Numeric constants shared by all renderers.

Mirrors the semantics of the reference's constants
(ref: include/embree_utils/geometry.hpp:14-20 and
include/precision_utils.hpp:19-29) without sharing any code: these are the
standard PBRT-style floating-point error-bound helpers.
"""

import numpy as np

_DOUBLE_PI = 3.14159265358979323846264338327950288

PI = np.float32(_DOUBLE_PI)
TWO_PI = np.float32(2.0 * _DOUBLE_PI)
INV_PI = np.float32(1.0 / _DOUBLE_PI)
INV_2PI = np.float32(1.0 / (2.0 * _DOUBLE_PI))
PI_BY_2 = np.float32(_DOUBLE_PI / 2.0)
PI_BY_4 = np.float32(_DOUBLE_PI / 4.0)

# Half of float32 epsilon: the classic PBRT "machine epsilon" (2^-24).
MACHINE_EPSILON = np.float32(np.finfo(np.float32).eps * 0.5)


def gamma(n: int) -> np.float32:
    """PBRT floating-point error bound helper: n*eps / (1 - n*eps)."""
    ni = MACHINE_EPSILON * n
    return np.float32(ni / (1.0 - ni))


# Scale-aware self-intersection epsilon (ref: include/precision_utils.hpp:29).
RAY_EPSILON = np.float32(MACHINE_EPSILON * 1500.0)
