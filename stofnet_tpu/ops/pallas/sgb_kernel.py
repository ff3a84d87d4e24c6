"""Fused SemiGlobalBlock contract path: conv1d(k5, 64->512) + 80x max-pool.

Why a kernel: XLA materializes the (B, L, 512) conv output in HBM before the
max-pool reduces it 80x — at B=1024, L=8000 that is ~16 GB of round-trip
traffic per batch (and an OOM at B=2048, bf16[2048,8000,512] = 15.6 GB).
This kernel computes the conv in VMEM tiles and pools in-register, so HBM
only sees the (B, L/80, 512) pooled result — a ~160x traffic reduction on
the block.

Numerics: identical to pool(leaky(conv(x))) because leaky-ReLU is strictly
increasing, so it commutes with max-pooling; we pool first and activate the
80x smaller tensor. The conv is K accumulated tap matmuls
(TILE, 128) @ (128, 512) on the MXU with f32 accumulation (channels
lane-padded 64->128; the MXU pads contractions to 128 anyway).

Halo handling: BlockSpec blocks cannot overlap, so each grid step gets its
non-overlapping (1, tile, 128) slab plus a tiny per-tile halo side-array
(1, 8, 128) carrying the 2 boundary rows from each neighbor; the kernel
stitches (halo_l ++ tile ++ halo_r) with a sublane concat (the Mosaic-safe
pattern proven in conv_stack_kernel's repad). This keeps the XLA-side
preparation at ~1.0x input traffic — the earlier 5x stacked-tap-view
formulation cost (B, K, L, 128) HBM, made the fused model slower than XLA
at B=128 AND re-introduced the very OOM the kernel exists to avoid.

Mosaic notes for this backend (hard-won): no overlapping BlockSpecs, no
lane-concat of sublane-shifted views, dynamic sublane starts must be
provably 8-aligned, DMA slices of 64-lane arrays trip 128-lane tiling.

Measured (v5e via axon relay, 2026-08, B=128 L=8000, device-side stream):
this kernel 12.3 ms/batch vs XLA conv+pool 7.1 ms — XLA wins at default
batch because the MXU is already well-fed there and the kernel pays lane
padding (64->128 contraction) plus misaligned tap shifts. Its proven value
is the memory cliff: at B=2048 the XLA path is a hard compile-time OOM
("Used 17.58G of 15.75G hbm") while this kernel runs and decodes — see
bench.py --oom-demo. bench.py measures both paths and serves the faster.
Exactness is tested in tests/test_pallas_kernels.py.
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
CPAD = 128  # lane-padded channel count


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


def _kernel(x_ref, halo_ref, w_ref, b_ref, o_ref, *, tile: int,
            negative_slope: float):
    # x_ref: (1, tile, 128) this tile's features (no halo)
    # halo_ref: (1, 1, 8, 128): rows 0:2 left-neighbor edge, 2:4 right edge
    # w_ref: (K, 128, 512) per-tap weights; b_ref: (1, 512) bias
    # o_ref: (1, 1, rows_pad, 512) pooled+activated output block
    halo = halo_ref[0, 0]
    x = jnp.concatenate(
        [halo[0:2], x_ref[0], halo[2:4]], axis=0)  # (tile+4, 128)

    y = b_ref[0][None, :].astype(jnp.float32) * jnp.ones((tile, 1),
                                                         jnp.float32)
    for k in range(K):
        y = y + jnp.dot(x[k: k + tile], w_ref[k],
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
    n_tiles = length // tile

    hp = jnp.pad(h, ((0, 0), (0, 0), (0, CPAD - c)))  # (B, L, 128)
    # per-tile halo rows: h[j*tile-2 : j*tile] and h[(j+1)*tile : +2],
    # zeros at the sequence ends (SAME padding)
    hz = jnp.pad(hp, ((0, 0), (PAD, PAD), (0, 0)))  # (B, L+4, 128)
    lefts = hz[:, :length].reshape(b, n_tiles, tile, CPAD)[:, :, :PAD]
    rights = hz[:, 2 * PAD:].reshape(b, n_tiles, tile, CPAD)[:, :, -PAD:]
    halo = jnp.concatenate([lefts, rights], axis=2)  # (B, n_tiles, 4, 128)
    halo = jnp.pad(halo, ((0, 0), (0, 0), (0, 8 - 2 * PAD), (0, 0)))

    w2 = jnp.pad(kernel.astype(h.dtype), ((0, 0), (0, CPAD - c), (0, 0)))
    b2 = bias.reshape(1, f).astype(h.dtype)

    rows = tile // POOL
    rows_pad = -(-rows // 8) * 8  # 8-sublane alignment for the out block
    grid = (b, n_tiles)
    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, negative_slope=negative_slope),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, CPAD), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, CPAD), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows_pad, f),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, rows_pad, f), h.dtype),
        interpret=interpret,
    )(hp, halo, w2, b2)
    return out[:, :, :rows, :].reshape(b, length // POOL, f)
