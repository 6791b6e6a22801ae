from .mesh import (batch_sharding, distributed_init, make_mesh, replicated,
                   row_sharding, shard_env_state, shard_params, shard_rows,
                   shard_train_state)

__all__ = ["batch_sharding", "distributed_init", "make_mesh", "replicated",
           "row_sharding", "shard_env_state", "shard_params", "shard_rows",
           "shard_train_state"]
