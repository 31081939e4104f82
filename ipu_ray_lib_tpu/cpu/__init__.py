from .reference import oracle_intersect, oracle_occluded, oracle_shadow_trace
