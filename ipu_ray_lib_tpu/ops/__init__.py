from .intersect import (
    intersect_box_slab,
    intersect_triangle_watertight,
    intersect_sphere,
    intersect_disc,
    RayShear,
    make_ray_shear,
)
from .traversal import bvh_intersect, bvh_occluded, Hit
from .camera import pixel_to_ray_dir, generate_camera_rays
