from .mesh import (
    make_ray_mesh,
    render_path_sharded,
    render_shadow_sharded,
    render_streaming_sharded,
    shard_rays,
)
