"""Device meshes and shardings.

The reference has no distributed story at all (SURVEY.md §2.31: single GPU +
SLURM job arrays). The TPU-native replacement:

- **dp** — data parallelism over the batch axis: the workload is
  embarrassingly parallel per waveform, so this is the throughput axis.
- **sp** — sequence/context parallelism over the RF sample axis: the conv
  stack's spatial dimension is sharded and XLA's GSPMD partitioner inserts
  the halo exchanges (max kernel 9 -> 4-sample halos over ICI) and the tiny
  all-gathers for the SemiGlobalBlock's pooled pathway automatically. This
  gives headroom for very long waveforms; for typical L=8-80k it is a
  demonstration axis.
- tp/pp/ep are deliberate non-goals for a 646k-parameter CNN with no
  attention/MoE; params are replicated (they are ~2.5 MB).

Multi-host: call :func:`init_distributed` before mesh creation; the same
mesh code then spans all processes' devices with collectives riding
ICI (intra-slice) / DCN (multi-slice).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (jax.distributed); no-op for single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def make_mesh(dp: Optional[int] = None, sp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp, sp) mesh. ``dp`` defaults to n_devices // sp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % sp:
            raise ValueError(f"{n} devices not divisible by sp={sp}")
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp * sp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def batch_seq_sharding(mesh: Mesh, ndim: int, seq_axis: int = -1) -> NamedSharding:
    """Shard axis 0 over dp and the sample axis over sp."""
    seq_axis = seq_axis % ndim
    spec = [None] * ndim
    spec[0] = "dp"
    spec[seq_axis] = "sp"
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, seq_axis: Optional[int] = None):
    """Device-put a pytree of batch-major arrays with dp(+sp) sharding."""
    def put(x):
        if x.ndim == 0:  # scalar leaves replicate (P('dp') would be rank-1)
            sh = replicate(mesh)
        elif seq_axis is not None and x.ndim >= 2:
            sh = batch_seq_sharding(mesh, x.ndim, seq_axis)
        else:
            sh = batch_sharding(mesh, x.ndim)
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)
