"""Fused StofNet conv stack: conv2..conv12 + conv_last in one VMEM pass.

Why: the 11 k7 convs dominate StofNet's runtime and are HBM-bound under
XLA — every layer round-trips a (B, L, 64) activation through HBM
(~22 GB/batch at B=1024, L=8k in bf16). This kernel holds the activation,
both residual taps and all weights in VMEM for the whole stack; HBM sees
only the (B, L, 128) input once and the (B, L, 8) conv_last output once.

Layout: one waveform(-window) per grid step, activations as
(W+2*EDGE, 128) tiles — samples on sublanes, channels on the 128-lane tile
(64 real + 64 zero; the MXU pads contractions to 128 anyway, so the zero
lanes are free). Each conv is K accumulated sublane-shifted matmuls (the
Mosaic-safe pattern on this backend; lane-concat im2col, HBM window DMAs,
and 4-D chunk grids all fail to compile). Zero margins at the buffer ends
give SAME-conv semantics across all layers.

Long sequences split into uniform windows of W = chunk + 2*OVERLAP samples,
stitched on the XLA side. A window computed as a standalone zero-padded
sequence agrees with the full computation everywhere further than the
stack's receptive half-width (11*3+1 = 34 < OVERLAP = 40) from a window
edge; edge windows extend inward so their outer edge IS the true sequence
boundary. The kept centers are therefore bit-identical to the unchunked
result (verified in tests at multiple lengths).

Residual schedule mirrors models/stofnet.py: leaky-ReLU layers interleaved
with residual adds at i in {3,5,...,11}, global skip res1 into conv12,
then conv_last (k3) producing upsample_factor channels.

Measured (v5e via axon relay, 2026-08, B=128 L=8000, device-side stream):
32.8 ms/batch vs XLA's 13.9 ms for the same subgraph. The gap is
structural: 64-channel convs on the 128x128 MXU waste 4x FLOPs once both
contraction and output lanes are zero-padded to 128, and the per-tap
sublane-shifted loads relayout the activation. XLA's conv lowering packs
the same work tighter. The kernel is kept exact and compiling (bench.py
gates on measured speed and serves the faster path); its design notes
document the Mosaic constraints for future models with >=128 channels,
where the padding waste vanishes.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KMID = 7  # conv2..conv12 kernel size
KLAST = 3  # conv_last kernel size
EDGE = KMID // 2  # zero margin kept at both sequence ends
CPAD = 128  # lane-padded channel count
NB = 13  # num_blocks
OVERLAP = 40  # > receptive half-width of the stack (11*3 + 1 = 34)
MAX_WINDOW = 2200  # VMEM budget: working set is ~4 KB/row (bf16 x/res/res1
# + f32 conv accumulator at 128 lanes); 2.2k rows keeps the scoped
# allocation under the 16 MB limit with headroom


def _kernel(x_ref, wmid_ref, bmid_ref, wlast_ref, blast_ref, o_ref,
            *, length: int):
    # x_ref: (1, L+6, 128) conv1+SGB features, zero edge margins
    # wmid_ref: (11, 7, 128, 128); bmid_ref: (11, 8, 128) — each layer's
    #   bias lives in row 0 of an 8-sublane-aligned block so the dynamic
    #   layer index provably lands on a multiple of 8 (Mosaic requirement
    #   for dynamic sublane starts)
    # wlast_ref: (3, 128, 8); blast_ref: (1, 8)
    # o_ref: (1, L, 8)
    L = length

    def conv(xbuf, w, bias_row, k):
        y = bias_row.astype(jnp.float32) * jnp.ones((L, 1), jnp.float32)
        off = EDGE - k // 2
        for t in range(k):
            y = y + jnp.dot(xbuf[off + t: off + t + L, :], w[t],
                            preferred_element_type=jnp.float32)
        return y  # (L, N) f32

    def repad(center):
        z = jnp.zeros((EDGE, CPAD), center.dtype)
        return jnp.concatenate([z, center, z], axis=0)

    x = x_ref[:].reshape(x_ref.shape[-2], x_ref.shape[-1])  # (L+6, 128)
    res = x[EDGE: EDGE + L, :]
    res1 = res

    # conv2..conv11 as a fori_loop (a fully unrolled stack produces MLIR too
    # large for this harness's compile helper); the residual schedule
    # {3,5,7,9,11} is exactly the odd layers in [2, 11]
    def layer_body(i, carry):
        x, res = carry
        li = i - 2
        y = conv(x, wmid_ref[li], bmid_ref[li][0:1, :], KMID)
        is_res = (i % 2) == 1
        h_res = (res.astype(jnp.float32) + y).astype(x.dtype)
        h_act = jnp.where(y >= 0, y, 0.01 * y).astype(x.dtype)
        h = jnp.where(is_res, h_res, h_act)
        res = jnp.where(is_res, h, res)
        return repad(h), res

    x, res = jax.lax.fori_loop(2, NB - 1, layer_body, (x, res))

    # conv12 + global residual res1
    y = conv(x, wmid_ref[NB - 3], bmid_ref[NB - 3][0:1, :], KMID)
    x = repad((res1.astype(jnp.float32) + y).astype(x.dtype))

    # conv_last (k3): taps sit at margin offsets EDGE-1..EDGE+1
    z = blast_ref[0][None, :].astype(jnp.float32) * jnp.ones((L, 1),
                                                             jnp.float32)
    for t in range(KLAST):
        z = z + jnp.dot(x[EDGE - 1 + t: EDGE - 1 + t + L, :], wlast_ref[t],
                        preferred_element_type=jnp.float32)
    o_ref[...] = z.astype(o_ref.dtype).reshape(o_ref.shape)


def _run_window(hw: jnp.ndarray, weights, interpret: bool) -> jnp.ndarray:
    """Single zero-padded window through the stack. hw: (B, W, 128)."""
    b, w, _ = hw.shape
    hp = jnp.pad(hw, ((0, 0), (EDGE, EDGE), (0, 0)))
    return pl.pallas_call(
        functools.partial(_kernel, length=w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, w + 2 * EDGE, CPAD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, w, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, w, 8), jnp.float32),
        interpret=interpret,
    )(hp, *weights)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv_stack_fused(h0: jnp.ndarray, params: Dict[str, Any],
                     interpret: bool = False) -> jnp.ndarray:
    """Run conv2..conv_last on conv1+SGB features.

    Args:
        h0: (B, L, 64) features after conv1 + SemiGlobalBlock.
        params: the StofNet flax params dict (conv2..conv12, conv_last).
    Returns: (B, L, upsample_factor) pre-shuffle heatmap channels, f32.
    """
    b, length, c = h0.shape
    assert c == 64

    dtype = h0.dtype
    wmid = jnp.stack([
        jnp.pad(jnp.asarray(params[f"conv{i}"]["kernel"], dtype),
                ((0, 0), (0, CPAD - 64), (0, CPAD - 64)))
        for i in range(2, NB)
    ])  # (11, 7, 128, 128)
    bmid = jnp.stack([
        jnp.pad(jnp.asarray(params[f"conv{i}"]["bias"], dtype),
                (0, CPAD - 64))
        for i in range(2, NB)
    ])  # (11, 128) -> (11, 8, 128): 8-row blocks, bias in row 0
    bmid = jnp.pad(bmid[:, None, :], ((0, 0), (0, 7), (0, 0)))

    wl = jnp.asarray(params["conv_last"]["kernel"], dtype)  # (3, 64, r)
    out_ch = wl.shape[-1]
    out_pad = 8  # minimal aligned lane count for the output block
    wlast = jnp.pad(wl, ((0, 0), (0, CPAD - 64), (0, out_pad - out_ch)))
    blast = jnp.pad(jnp.asarray(params["conv_last"]["bias"], dtype),
                    (0, out_pad - out_ch)).reshape(1, out_pad)
    weights = (wmid, bmid, wlast, blast)

    hpad = jnp.pad(h0, ((0, 0), (0, 0), (0, CPAD - 64)))

    if length + 2 * EDGE <= MAX_WINDOW:
        out = _run_window(hpad, weights, interpret)
        return out[..., :out_ch]

    # window stitching for long sequences (see module docstring)
    n = -(-length // (MAX_WINDOW - 2 * OVERLAP - 2 * EDGE))
    chunk = -(-length // n)
    while length % chunk:
        n += 1
        chunk = -(-length // n)
    window = chunk + 2 * OVERLAP
    if chunk < OVERLAP or window > MAX_WINDOW:
        # the divisor search can only land on chunks that divide L; awkward
        # lengths (primes, or L whose divisors skip the valid band) have no
        # safe chunking — a negative k*chunk-OVERLAP start would wrap and
        # silently corrupt the first samples. Callers fall back to XLA.
        raise ValueError(
            f"fused conv stack: L={length} has no chunk divisor in "
            f"[{OVERLAP}, {MAX_WINDOW - 2 * OVERLAP}]; use the XLA path")
    assert length >= window, "sequence too short to chunk"

    pieces = []
    for k in range(n):
        if k == 0:
            start, keep = 0, 0
        elif k == n - 1:
            start, keep = length - window, 2 * OVERLAP
        else:
            start, keep = k * chunk - OVERLAP, OVERLAP
        piece = _run_window(hpad[:, start: start + window, :], weights,
                            interpret)
        pieces.append(piece[:, keep: keep + chunk, :out_ch])
    return jnp.concatenate(pieces, axis=1)
