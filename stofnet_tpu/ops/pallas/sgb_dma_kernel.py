"""Manual-DMA fused SemiGlobalBlock contract+pool.

Parity target: /root/reference/models/stofnet.py:88-91 (contract conv k5,
64->512, LeakyReLU, MaxPool1d(80)) — same math as ops/pallas/sgb_kernel.py,
rebuilt to settle VERDICT r2 #5 (is the Pallas input-bandwidth cap an
auto-pipeliner artifact?) with two changes:

1. Explicit double-buffered ``pltpu.make_async_copy`` from an HBM-resident
   (memory_space=ANY) ref instead of auto-pipelined BlockSpec inputs.
2. The input is only 64 channels; the auto-pipelined kernel had to pad the
   lane dim to 128 (Mosaic: no DMA slices of 64-lane arrays), DOUBLING its
   read bytes. Here two consecutive samples are packed into one 128-lane
   row on the XLA side ((B, L, 64) -> (B, L/2, 128), a contiguous
   reshape), so the kernel reads the true 131 MB, not 262 MB.

VERDICT (measured r3, per-iteration-data streams — see the TIMING TRAP in
CLAUDE.md; the first measurements were loop-hoisting artifacts): manual
DMA hits the same backend cap as the auto-pipeliner. At B=128 L=8k this
kernel runs 10.8 ms standalone vs the tile kernel's 11.5 ms and XLA
contract+pool's 8.1 ms; composed into the model it is 15.0 ms/batch vs
plain XLA's 12.3 ms. Effective kernel-side input consumption is ~12-23
GB/s however the data arrives, so no same-shape kernel beats XLA on this
relay backend — the question is CLOSED, and the Pallas kernels' proven
value remains the B>=2048 memory cliff (sgb_kernel.py). This kernel is
kept as the faster of the two Pallas compositions (the bench's
pallas-fused path) and as the manual-DMA evidence.

The packed conv: output pair t = (y[2t], y[2t+1]) needs packed input rows
t..t+2 (k=5 taps with SAME pad 2 span 6 sample slots = 3 rows), so
    Y[t, s*512+f] = sum_{d=0..2} X[t+d] @ Wp[d]
with Wp[d][j*64+c, s*512+f] = w[k=2d+j-s, c, f] (0 <= k < 5, else 0) —
three (T, 128) @ (128, 1024) MXU matmuls per chunk, f32 accumulation.
20% more MACs than the direct conv (5 taps spread over 6 packed slots)
for half the input bytes.

Per grid step (one batch element) a fori_loop walks T=400-row chunks
(800 samples = 10 pool windows), double-buffering the next chunk's DMA
behind the current chunk's matmuls. Pool windows never straddle chunks.
Outputs land in (chunks, 16, 512) blocks (10 valid rows, padded to 16 for
the 8-sublane rule) and are cropped/reshaped on the XLA side.

Mosaic constraints honored: DMA chunk starts c*400 are provably 8-aligned;
lane dim is 128 everywhere; output rows are written per 8-aligned block;
the 3 tap slices are VALUE-level slices of one loaded chunk (allowed),
not ref views.

Numerics: identical to pool(leaky(conv(x))) (leaky-ReLU commutes with max;
pool first, activate the 80x smaller tensor). Exactness vs the XLA
expression is tested in tests/test_pallas_kernels.py (interpret mode) and
was verified on hardware (bf16 rel diff <= 0.8%, decoded-coord agreement
0.9961 in the bench parity gate) before this path went into the bench.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stofnet_tpu.ops.pallas.sgb_kernel import pallas_available  # noqa: F401

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

K = 5
PAD = K // 2
POOL = 80
T_PAIRS = 400           # packed rows per chunk -> 800 samples
WIN_PER_CHUNK = 2 * T_PAIRS // POOL  # 10 pool windows per chunk
ROWS_PAD = 16           # output block rows (10 valid, 8-sublane aligned)
HALO_ROWS = 8           # rows read past the chunk (2 needed, 8 for alignment)


def dma_supported(length: int, channels: int) -> bool:
    """This kernel handles L % (2*T_PAIRS) == 0, C == 64."""
    return length % (2 * T_PAIRS) == 0 and length >= 2 * T_PAIRS \
        and channels == 64


def _pack_weights(kernel: jnp.ndarray, dtype) -> jnp.ndarray:
    """(K, 64, F) conv taps -> (3, 128, 2F) packed-pair matmul weights."""
    kk, c, f = kernel.shape
    assert kk == K
    w = jnp.zeros((3, 2 * c, 2 * f), dtype)
    for d in range(3):
        for j in range(2):
            for s in range(2):
                k = 2 * d + j - s
                if 0 <= k < K:
                    w = w.at[d, j * c:(j + 1) * c,
                             s * f:(s + 1) * f].set(
                                 kernel[k].astype(dtype))
    return w


def _kernel(x_hbm, w_ref, b_ref, o_ref, *, n_chunks: int, f: int,
            negative_slope: float):
    # x_hbm: (B, n_chunks*T_PAIRS + HALO_ROWS, 128) packed input,
    #        HBM-resident (memory_space=ANY takes the WHOLE array; the
    #        batch element is picked by program_id-indexed DMA slices).
    # w_ref: (3, 128, 2f) packed weights; b_ref: (8, 2f) bias (row 0 valid)
    # o_ref: (1, n_chunks, ROWS_PAD, f) pooled+activated output
    i = pl.program_id(0)

    def body(scratch, sem):
        n_buf = 2
        rows = T_PAIRS + HALO_ROWS

        def get_dma(slot, c):
            return pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(c * T_PAIRS, rows)],
                scratch.at[slot],
                sem.at[slot],
            )

        get_dma(0, 0).start()

        def loop(c, _):
            slot = c % n_buf

            @pl.when(c + 1 < n_chunks)
            def _():
                get_dma((c + 1) % n_buf, c + 1).start()

            get_dma(slot, c).wait()
            x = scratch[slot]  # (rows, 128) value
            y = jnp.broadcast_to(b_ref[0][None, :].astype(jnp.float32),
                                 (T_PAIRS, 2 * f))
            for d in range(3):
                y = y + jnp.dot(x[d: d + T_PAIRS], w_ref[d],
                                preferred_element_type=jnp.float32)
            # (T, 2f) pairs -> (windows, 40, 2, f) -> max over the window
            y4 = y.reshape(WIN_PER_CHUNK, POOL // 2, 2, f)
            m = jnp.max(y4, axis=(1, 2))
            out = jnp.where(m >= 0, m, negative_slope * m)
            out = jnp.concatenate(
                [out, jnp.zeros((ROWS_PAD - WIN_PER_CHUNK, f), out.dtype)],
                axis=0)
            o_ref[0, c] = out.astype(o_ref.dtype)
            return ()

        jax.lax.fori_loop(0, n_chunks, loop, (), unroll=False)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, T_PAIRS + HALO_ROWS, 128), x_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("negative_slope", "interpret"))
def sgb_contract_pool_dma(
    h: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    negative_slope: float = 0.01,
    interpret: bool = False,
) -> jnp.ndarray:
    """leaky(maxpool80(conv1d_same(h, kernel) + bias)) via manual-DMA tiles.

    Args:
        h: (B, L, C=64) features; L % 800 == 0.
        kernel: (5, 64, F) conv weights (flax layout).
        bias: (F,).
    Returns: (B, L//80, F) in h.dtype.
    """
    b, length, c = h.shape
    kk, ck, f = kernel.shape
    assert kk == K and ck == c and dma_supported(length, c), (
        f"sgb_contract_pool_dma: unsupported shape L={length} C={c}")
    n_chunks = length // (2 * T_PAIRS)

    # SAME pad + pack sample pairs into lanes: (B, L+4+12, 64) zeros-padded
    # so every chunk's (T_PAIRS + HALO_ROWS)-row read stays in bounds
    total_rows = n_chunks * T_PAIRS + HALO_ROWS
    hz = jnp.pad(h, ((0, 0), (PAD, 2 * total_rows - length - PAD), (0, 0)))
    hp = hz.reshape(b, total_rows, 2 * c)

    wp = _pack_weights(kernel, h.dtype)
    bp = jnp.tile(bias.astype(h.dtype).reshape(1, f), (1, 2))
    bp = jnp.pad(bp, ((0, 7), (0, 0)))  # (8, 2f): 8-sublane-aligned operand

    out = pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks, f=f,
                          negative_slope=negative_slope),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_chunks, ROWS_PAD, f),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks, ROWS_PAD, f), h.dtype),
        interpret=interpret,
    )(hp, wp, bp)

    return out[:, :, :WIN_PER_CHUNK, :].reshape(b, length // POOL, f)
