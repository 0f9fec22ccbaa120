from .sharding import make_mesh, shard_renderer, build_sharded_step, camera_sharding
