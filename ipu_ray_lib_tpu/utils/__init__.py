from .constants import (
    PI,
    TWO_PI,
    INV_PI,
    INV_2PI,
    PI_BY_2,
    PI_BY_4,
    MACHINE_EPSILON,
    RAY_EPSILON,
    gamma,
)
from .half import round_to_half_not_smaller
