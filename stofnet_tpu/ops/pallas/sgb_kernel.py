"""Fused SemiGlobalBlock contract path: conv1d(k5, 64->512) + 80x max-pool.

Parity target: /root/reference/models/stofnet.py:88-91 (the
SemiGlobalBlock's contract conv -> LeakyReLU -> MaxPool1d(80) pathway).

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

Measured (v5e via axon relay; r3 per-iteration streams — see CLAUDE.md
TIMING TRAP for why earlier figures were optimistic): this kernel loses
to XLA's conv+pool at B=128 (11.5 vs 8.1 ms standalone) because
kernel-side input consumption on this backend runs at only ~12-34 GB/s
effective however the data arrives — the manual-DMA rebuild
(sgb_dma_kernel.py) hits the same cap, closing the question: no kernel of
this shape can beat XLA here irrespective of its design. On a
directly-attached TPU with a standard toolchain the fusion arithmetic
favors these kernels (they delete ~2.1 GB of HBM round-trip per batch);
re-measure before dismissing them elsewhere. The proven value is the
memory cliff: at B=2048 the XLA path is a hard compile-time OOM
("Used 17.58G of 15.75G hbm") while this kernel runs and decodes — see
bench.py --oom-demo — and large-batch TRAINING:
``sgb_contract_pool_trainable`` carries a custom VJP whose backward
routes cotangents through per-window argmax offsets, so the dense
(B, L, F) conv output is never materialized in either pass. The full
train step with it runs at B=512 where plain-XLA training compile-OOMs
(16.12 G > 15.75 G hbm; OOMDEMO.json r3 train keys); the op's own
gradients were hardware-run at B=2048 and are exact vs jax.grad of the
XLA expression in tests. bench.py measures both paths and serves the
faster. Exactness is tested in tests/test_pallas_kernels.py.
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


def _kernel(x_ref, halo_ref, w_ref, b_ref, o_ref, off_ref=None, *, tile: int,
            negative_slope: float, with_argmax: bool = False):
    # x_ref: (1, tile, 128) this tile's features (no halo)
    # halo_ref: (1, 1, 8, 128): rows 0:2 left-neighbor edge, 2:4 right edge
    # w_ref: (K, 128, 512) per-tap weights; b_ref: (1, 512) bias
    # o_ref: (1, 1, rows_pad, 512) pooled+activated output block
    # off_ref: (1, 1, rows_pad, 512) int32 within-window argmax offsets
    #          (only when with_argmax; needed by the custom VJP)
    halo = halo_ref[0, 0]
    x = jnp.concatenate(
        [halo[0:2], x_ref[0], halo[2:4]], axis=0)  # (tile+4, 128)

    y = b_ref[0][None, :].astype(jnp.float32) * jnp.ones((tile, 1),
                                                         jnp.float32)
    for k in range(K):
        y = y + jnp.dot(x[k: k + tile], w_ref[k],
                        preferred_element_type=jnp.float32)
    rows = tile // POOL
    f = y.shape[-1]
    y3 = y.reshape(rows, POOL, f)
    m = jnp.max(y3, axis=1)
    rows_pad = o_ref.shape[2]
    if with_argmax:
        iota = jax.lax.broadcasted_iota(jnp.int32, (rows, POOL, f), 1)
        off = jnp.min(jnp.where(y3 == m[:, None, :], iota, POOL), axis=1)
        if rows_pad != rows:
            off = jnp.concatenate(
                [off, jnp.zeros((rows_pad - rows, f), off.dtype)], axis=0)
        off_ref[0, 0] = off
    out = jnp.where(m >= 0, m, negative_slope * m)  # leaky after pool (exact)
    if rows_pad != rows:
        out = jnp.concatenate(
            [out, jnp.zeros((rows_pad - rows, f), out.dtype)], axis=0)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _run(h, kernel, bias, negative_slope, interpret, with_argmax):
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
    out_spec = pl.BlockSpec((1, 1, rows_pad, f), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n_tiles, rows_pad, f), h.dtype)
    if with_argmax:
        out_specs = (out_spec, out_spec)
        out_shapes = (out_shape,
                      jax.ShapeDtypeStruct((b, n_tiles, rows_pad, f),
                                           jnp.int32))
    else:
        out_specs, out_shapes = out_spec, out_shape
    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, negative_slope=negative_slope,
                          with_argmax=with_argmax),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, CPAD), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, CPAD), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(hp, halo, w2, b2)

    def crop(o):
        return o[:, :, :rows, :].reshape(b, length // POOL, f)

    if with_argmax:
        return crop(out[0]), crop(out[1])
    return crop(out)


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
    return _run(h, kernel, bias, negative_slope, interpret,
                with_argmax=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sgb_contract_pool_trainable(h, kernel, bias, negative_slope=0.01,
                                interpret=False):
    """Differentiable fused SGB contract+pool (enables B>=2048 TRAINING
    where the XLA path compile-OOMs on the (B, L, 512) intermediate).

    The forward kernel additionally emits per-window argmax offsets; the
    backward routes cotangents through the sparse pool selection, so
    neither pass ever materializes the dense (B, L, F) conv output:

    - d(bias): sum of (leaky-adjusted) pooled cotangents.
    - d(kernel), d(h): a lax.scan over output channels in chunks of FC=8
      (one-at-a-time measured ~6 s/step at B=512; chunking gives the
      einsums real MXU shapes and runs 5.5x faster — OOMDEMO.json r3);
      each step scatters the chunk's cotangents to a (B, L, FC) f32
      plane, contracts it with the K tap-shifted inputs for d(kernel),
      and expands it through a (B, L, K, FC) tap stack for d(h). Peak
      extra memory per step is those two planes + the (B, L, C) d(h)
      accumulator (~0.9 GB at B=512, L=8000) — independent of F.

    Gradients match jax.grad of the XLA expression exactly away from
    pooling ties (both route a tie to one window element); the op's
    gradients are exactness-tested in tests/test_pallas_kernels.py and
    the full train step with this op runs on hardware at B=512 where
    plain-XLA training compile-OOMs (OOMDEMO.json).
    """
    return _run(h, kernel, bias, negative_slope, interpret,
                with_argmax=False)


def _trainable_fwd(h, kernel, bias, negative_slope, interpret):
    pooled, off = _run(h, kernel, bias, negative_slope, interpret,
                       with_argmax=True)
    return pooled, (h, kernel, bias, pooled, off)


def _trainable_bwd(negative_slope, interpret, res, g):
    from jax import lax

    h, kernel, bias, pooled, off = res
    b, length, c = h.shape
    kk, _, f = kernel.shape
    rows = length // POOL

    # undo the (monotone) leaky activation: pooled sign == pre-pool sign
    g_pre = jnp.where(pooled >= 0, g, negative_slope * g).astype(jnp.float32)
    dbias = jnp.sum(g_pre, axis=(0, 1)).astype(bias.dtype)

    # absolute conv-output positions selected by the pool, per (b, r, f)
    abs_pos = off + (jnp.arange(rows, dtype=jnp.int32) * POOL)[None, :, None]

    # keep the (large) padded input in its storage dtype; contractions
    # accumulate in f32 (an f32 copy would add 2x(B, L, C)x4 bytes and
    # re-create the OOM this path exists to avoid)
    hz = jnp.pad(h, ((0, 0), (PAD, PAD), (0, 0)))  # (B, L+4, C)
    wf = kernel.astype(jnp.float32)

    # scan output channels in chunks of FC (not one at a time: 512
    # sequential single-channel iterations measured ~6 s/step at B=512;
    # chunking gives the einsums real MXU shapes and cuts the trip count
    # 8x). Peak extra memory per step is the (B, L, FC) f32 cotangent
    # plane + (B, L, K, FC) tap stack — still independent of F.
    FC = 8 if f % 8 == 0 else 1
    n_chunks = f // FC
    batch_ix = jnp.arange(b)[:, None, None]
    chan_ix = jnp.arange(FC)[None, None, :]

    def per_chunk(dh_acc, ci):
        sl = ci * FC
        gf = lax.dynamic_slice_in_dim(g_pre, sl, FC, axis=2)  # (B, R, FC)
        posf = lax.dynamic_slice_in_dim(abs_pos, sl, FC, axis=2)
        # dense cotangent planes for this chunk (windows are disjoint, so
        # positions within a row are unique per channel -> plain scatter)
        dyc = jnp.zeros((b, length, FC), jnp.float32).at[
            batch_ix, posf, chan_ix].add(gf)
        # d(kernel)[t, :, sl:sl+FC] = sum_{b,p} dyc[b,p,fc] * h[b, p+t-2, :]
        dych = dyc.astype(h.dtype)
        dw_c = jnp.stack([
            jnp.einsum("bpf,bpi->if", dych, hz[:, t: t + length, :],
                       preferred_element_type=jnp.float32)
            for t in range(K)
        ])  # (K, C, FC)
        # d(h)[b, q, :] += sum_{t, fc} dyc[b, q - t + 2, fc] * kernel[t, :, fc]
        # (y[p] reads h[p + t - 2], so h[q] feeds y at p = q - t + 2)
        dyc_pad = jnp.pad(dyc, ((0, 0), (PAD, PAD), (0, 0)))
        dyc_taps = jnp.stack([
            dyc_pad[:, 2 * PAD - t: 2 * PAD - t + length, :]
            for t in range(K)
        ], axis=2)  # (B, L, K, FC)
        w_c = lax.dynamic_slice_in_dim(wf, sl, FC, axis=2)  # (K, C, FC)
        dh_c = jnp.einsum("blkf,kif->bli", dyc_taps, w_c,
                          preferred_element_type=jnp.float32)
        return dh_acc + dh_c, dw_c

    dh, dws = jax.lax.scan(per_chunk, jnp.zeros((b, length, c),
                                                jnp.float32),
                           jnp.arange(n_chunks))
    # (n_chunks, K, C, FC) -> (K, C, n_chunks*FC) in channel order
    dkernel = jnp.transpose(dws, (1, 2, 0, 3)).reshape(kk, c, f)
    return (dh.astype(h.dtype), dkernel.astype(kernel.dtype), dbias)


sgb_contract_pool_trainable.defvjp(_trainable_fwd, _trainable_bwd)
