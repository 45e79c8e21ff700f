from .mesh import build_mesh
from .sharding import (
    batch_sharding,
    make_sequence_sharded_tower_fn,
    make_sharded_e2e_train_step,
    make_sharded_joint_train_step,
    make_sharded_tower_train_step,
    replicated,
    shard_news_table,
    shard_token_store_states,
    store_sharding,
    table_sharding,
)

__all__ = [
    "batch_sharding",
    "build_mesh",
    "make_sequence_sharded_tower_fn",
    "make_sharded_e2e_train_step",
    "make_sharded_joint_train_step",
    "make_sharded_tower_train_step",
    "replicated",
    "shard_news_table",
    "shard_token_store_states",
    "store_sharding",
    "table_sharding",
]
