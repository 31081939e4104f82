from .mesh import make_ray_mesh, render_path_sharded, shard_rays
