"""Mesh construction, sharding specs, and job-array execution."""

from stofnet_tpu.parallel.mesh import (
    init_distributed,
    make_mesh,
    batch_sharding,
    batch_seq_sharding,
    replicate,
    shard_batch,
)
from stofnet_tpu.parallel.array import (
    stack_trees,
    unstack_tree,
    n_members,
    shard_members,
    init_array_state,
    make_array_train_step,
    make_array_eval_step,
    make_threshold_sweep_step,
    stack_checkpoint_variables,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "batch_seq_sharding",
    "replicate",
    "shard_batch",
    "stack_trees",
    "unstack_tree",
    "n_members",
    "shard_members",
    "init_array_state",
    "make_array_train_step",
    "make_array_eval_step",
    "make_threshold_sweep_step",
    "stack_checkpoint_variables",
]
