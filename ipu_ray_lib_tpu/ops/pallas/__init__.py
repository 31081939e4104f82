from .tables import BlockedSceneTables, build_blocked_tables
from .intersect_kernel import pallas_intersect
