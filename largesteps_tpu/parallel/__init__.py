from .sharding import make_mesh, shard_renderer, camera_sharding
