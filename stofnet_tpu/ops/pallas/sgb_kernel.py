"""Fused SemiGlobalBlock contract path: conv1d(k5, 64->512) + 80x max-pool.

Why a kernel: XLA materializes the (B, L, 512) conv output in HBM before the
max-pool reduces it 80x — at B=1024, L=8000 that is ~16 GB of round-trip
traffic per batch (and an OOM at B=2048, bf16[2048,8000,512] = 15.6 GB).
This kernel computes the conv in VMEM tiles and pools in-register, so HBM
only sees the (B, L/80, 512) pooled result — a ~160x traffic reduction on
the block.

Numerics: identical to pool(leaky(conv(x))) because leaky-ReLU is strictly
increasing, so it commutes with max-pooling; we pool first and activate the
80x smaller tensor. The conv itself is an im2col matmul
(TILE, 5*64) @ (5*64, 512) on the MXU with f32 accumulation.

Grid: (B, L/TILE). Conv windows overlap by the SAME halo (2 samples), which
a BlockSpec cannot express (blocks stride by their shape). Halo handling
therefore happens on the XLA side: the K tap-shifted views are stacked into
a (B, K, L, 128) array and every kernel block is a plain non-overlapping
BlockSpec.

Status note (v5e via axon relay, 2026-08): the HBM-frugal variant — reading
each halo window straight from HBM with pltpu.make_async_copy — reliably
faults the TPU worker on this backend and was removed; and the stacked-view
materialization costs enough HBM itself (~10 MB/wf) that the measured
end-to-end fused model runs SLOWER than XLA's conv+pool (46 vs 17 ms per
128-batch). The kernel is therefore OPT-IN: its value today is eliminating
the (B, L, 512) HBM intermediate that OOMs XLA at B>=2048, L=8k. Exactness
is tested in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:  # pallas requires a TPU-capable jaxlib; import lazily and degrade
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

K = 5  # contract conv kernel size
PAD = K // 2
POOL = 80  # sample_scale


def pallas_available() -> bool:
    """True when running on a TPU backend (kernels are TPU-only)."""
    if not _PALLAS_OK:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pick_tile(length: int) -> Optional[int]:
    for tile in (2000, 1600, 800, 400, 240, 160, 80):
        if length % tile == 0:
            return tile
    return None


def _kernel(x_ref, w_ref, b_ref, o_ref, *, tile: int, negative_slope: float):
    # x_ref: (1, K, tile, 128) the K tap-shifted views of this tile
    # w_ref: (K, 128, 512) per-tap weights; b_ref: (1, 512) bias
    # o_ref: (1, 1, rows_pad, 512) pooled+activated output block, rows
    #        padded to the 8-sublane tile (wrapper slices the pad off)
    y = b_ref[0][None, :].astype(jnp.float32) * jnp.ones((tile, 1), jnp.float32)
    # conv as K accumulated tap matmuls on the MXU (f32 accumulation)
    for k in range(K):
        y = y + jnp.dot(x_ref[0, k], w_ref[k],
                        preferred_element_type=jnp.float32)
    rows = tile // POOL
    y = jnp.max(y.reshape(rows, POOL, y.shape[-1]), axis=1)
    y = jnp.where(y >= 0, y, negative_slope * y)  # leaky after pool (exact)
    rows_pad = o_ref.shape[2]
    if rows_pad != rows:
        y = jnp.concatenate(
            [y, jnp.zeros((rows_pad - rows, y.shape[-1]), y.dtype)], axis=0)
    o_ref[0, 0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("negative_slope", "interpret"))
def sgb_contract_pool(
    h: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    negative_slope: float = 0.01,
    interpret: bool = False,
) -> jnp.ndarray:
    """leaky(maxpool80(conv1d_same(h, kernel) + bias)) fused in VMEM.

    Args:
        h: (B, L, C=64) features; L must be divisible by 80.
        kernel: (5, 64, F=512) conv weights (flax layout).
        bias: (F,).
    Returns: (B, L//80, F) in h.dtype.
    """
    b, length, c = h.shape
    kk, ck, f = kernel.shape
    assert kk == K and ck == c and length % POOL == 0
    tile = _pick_tile(length)
    assert tile is not None, f"no VMEM tile divides L={length}"

    # Halo handling happens on the XLA side: stack the K tap-shifted views
    # so every kernel block is a plain non-overlapping BlockSpec (Mosaic
    # cannot express overlapping halo blocks, and lane-slicing DMAs of
    # 64-channel arrays trip its 128-lane tiling). Channels pad to the
    # 128-lane tile; the zero half is free (the MXU pads K to 128 anyway).
    c_pad = 128
    hp = jnp.pad(h, ((0, 0), (PAD, PAD), (0, c_pad - c)))
    xs = jnp.stack([hp[:, k: k + length, :] for k in range(K)], axis=1)
    w2 = jnp.pad(kernel.astype(h.dtype), ((0, 0), (0, c_pad - c), (0, 0)))
    b2 = bias.reshape(1, f).astype(h.dtype)

    n_tiles = length // tile
    rows = tile // POOL
    rows_pad = -(-rows // 8) * 8  # 8-sublane alignment for the out block
    grid = (b, n_tiles)
    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, negative_slope=negative_slope),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K, tile, c_pad), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows_pad, f),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, rows_pad, f), h.dtype),
        interpret=interpret,
    )(xs, w2, b2)
    return out[:, :, :rows, :].reshape(b, length // POOL, f)
