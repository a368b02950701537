from .sharding import make_device_mesh, pad_level_for_sharding, shard_level_arrays
