"""Position-packed 1-D convolution: fill the MXU's 128 output lanes.

StofNet's hot convs (reference models/stofnet.py:46-58: ten k=7 convs at 64
channels, plus conv_last at 4 output channels) contract K*Cin=448 inputs to
only 64 (or 4) outputs per position. On the 128x128 MXU, output channels
occupy lanes, so Cout=64 runs at <=50% utilization and Cout=4 at ~3% —
the measured 46% MFU ceiling of the XLA pipeline.

The rewrite: process P consecutive output positions as ONE matmul row
("space-to-depth" on the length axis).  With blocks
``X'[t] = concat(x[Pt+r] for r<P)`` and ``Y'[t] = concat(y[Pt+j] for j<P)``,
the SAME conv ``y[n] = sum_d W[d] x[n+d-pad]`` becomes a block conv

    Y'[t] = sum_q  Wp[q - q_min]^T  X'[t + q]

with ``Wp[qi][r*Cin+ci, j*Cout+co] = W[P*q + r - j + pad][ci, co]`` (zero
where the tap index falls outside [0, K)).  For P=2, K=7, Cout=64 this is a
(5, 128, 128) conv over L/2 positions: ~1.43x more MACs (zero padding) but
2x lane utilization — a ~1.6x cycle win on the MXU.  The zeros contribute
exactly 0, so the math is the reference's, only the accumulation order
changes (bf16/f32 rounding-level differences, parity-gated by callers).

Pure XLA — no Pallas; this beats the backend's measured Pallas input-
bandwidth cap (CLAUDE.md) by staying on the XLA conv path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax


def conv1d_same(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                dtype=None) -> jnp.ndarray:
    """flax nn.Conv(padding='SAME') equivalence: (B, L, Cin) x (K, Cin, Cout).

    The shared plain-XLA SAME-conv lowering used by the functional forward
    paths (models/fused.py, models/int8.py); SAME pads (k-1)//2 left, k//2
    right like flax.
    """
    if dtype is not None:
        x, kernel, bias = (x.astype(dtype), kernel.astype(dtype),
                           bias.astype(dtype))
    k = kernel.shape[0]
    y = lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[((k - 1) // 2, k // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + bias


def pack_kernel(kernel: jnp.ndarray, pack: int
                ) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Build the block-conv kernel for P packed positions.

    Args:
        kernel: (K, Cin, Cout) SAME-conv kernel (flax HIO layout).
        pack: P, number of consecutive output positions per block.

    Returns:
        (Wp, (pad_lo, pad_hi)): Wp is (Kp, P*Cin, P*Cout); the padding is in
        BLOCK units for the packed conv.
    """
    K, Cin, Cout = kernel.shape
    pad = (K - 1) // 2
    P = int(pack)
    q_min = -((pad + P - 1) // P)                 # floor(-pad / P)
    q_max = (P - 1 + K - 1 - pad) // P
    qs = np.arange(q_min, q_max + 1)
    # tap index d = P*q + r - j + pad for (block tap q, in-pos r, out-pos j)
    d = (P * qs[:, None, None] + np.arange(P)[None, :, None]
         - np.arange(P)[None, None, :] + pad)     # (Kp, P_r, P_j)
    dc = np.where((d >= 0) & (d < K), d, K)       # K = the zero row
    w_ext = jnp.concatenate(
        [kernel, jnp.zeros((1, Cin, Cout), kernel.dtype)], axis=0)
    wp = w_ext[dc]                                # (Kp, P_r, P_j, Cin, Cout)
    wp = jnp.transpose(wp, (0, 1, 3, 2, 4))       # (Kp, P_r, Cin, P_j, Cout)
    return wp.reshape(len(qs), P * Cin, P * Cout), (-q_min, q_max)


def conv1d_blocked(xb: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                   pack: int) -> jnp.ndarray:
    """SAME conv in the BLOCKED domain: (B, L/P, P*Cin) -> (B, L/P, P*Cout).

    Input/output stay packed, so a chain of blocked convs (+ elementwise
    ops, which are layout-agnostic) pays zero repacking between layers —
    repacking moves data across the TPU lane dimension and costs real
    bandwidth if done per conv.
    """
    wp, (lo, hi) = pack_kernel(kernel, pack)
    y = lax.conv_general_dilated(
        xb, wp, window_strides=(1,), padding=[(lo, hi)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + jnp.tile(bias, int(pack))


def conv1d_same_packed(x: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray, pack: int = 2) -> jnp.ndarray:
    """SAME 1-D conv, identical math to flax nn.Conv(padding='SAME'),
    computed P positions per MXU row. (B, L, Cin) -> (B, L, Cout).

    Falls back to the plain conv when L % pack != 0 or pack == 1.
    """
    B, L, Cin = x.shape
    K, _, Cout = kernel.shape
    P = int(pack)
    if P <= 1 or L % P:
        y = lax.conv_general_dilated(
            x, kernel, window_strides=(1,),
            padding=[((K - 1) // 2, K // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"))
        return y + bias
    y = conv1d_blocked(x.reshape(B, L // P, P * Cin), kernel, bias, P)
    return y.reshape(B, L, Cout)
