from .builder import CompactBvh, build_bvh
