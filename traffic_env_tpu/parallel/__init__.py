from .mesh import (batch_sharding, distributed_init, make_mesh, replicated,
                   shard_env_state, shard_params)

__all__ = ["batch_sharding", "distributed_init", "make_mesh", "replicated",
           "shard_env_state", "shard_params"]
