"""Mesh construction and sharding specs for multi-device execution."""

from stofnet_tpu.parallel.mesh import (
    init_distributed,
    make_mesh,
    batch_sharding,
    batch_seq_sharding,
    replicate,
    shard_batch,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "batch_seq_sharding",
    "replicate",
    "shard_batch",
]
