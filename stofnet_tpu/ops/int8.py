"""Symmetric int8 helpers for the quantized StofNet serving path.

Parity target: the reference serves f32 torch (main.py:313-315 times the
forward); it ships no quantized path. This module is the TPU-native
performance extension behind ``models/int8.py``: v5e's MXU runs s8xs8->s32
at 2x the bf16 FLOP rate, and int8 activations halve the HBM bytes of the
model's dominant tensor (the SemiGlobalBlock's (B, L, 512) pre-pool
materialization, models/stofnet.py:44-54). Quantization is symmetric
(zero-point 0), so SAME zero-padding is exact in the quantized domain.

Serving safety: callers gate the whole path on decoded-coordinate
agreement with the f32 pipeline (bench.py), same as the bf16 and packed
paths — a quantized path that moves ToA estimates is measured but never
served.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

INT8_MAX = 127.0


def absmax_scale(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Symmetric scale s such that x/s spans ~[-127, 127].

    ``axis=None`` gives a per-tensor scalar; an axis tuple reduces over it
    (e.g. per-output-channel weight scales). Guarded against all-zero
    slices (scale 1 keeps quantization a no-op there).
    """
    m = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    return jnp.where(m > 0, m, INT8_MAX) / INT8_MAX


def quantize(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest symmetric int8 quantization (monotone in x)."""
    return jnp.clip(jnp.round(x / scale), -INT8_MAX, INT8_MAX).astype(
        jnp.int8)


def quantize_weight(w: jnp.ndarray):
    """Per-output-channel int8 weights for a (K, Cin, Cout) conv kernel.

    Returns ``(wq int8, scale (1, 1, Cout) f32)``; per-channel scales cost
    nothing at inference (they fold into the output epilogue) and keep the
    quantization error of heterogeneous filters independent.
    """
    scale = absmax_scale(w, axis=(0, 1))
    return quantize(w, scale), scale.astype(jnp.float32)


def conv1d_same_int8(xq: jnp.ndarray, wq: jnp.ndarray,
                     impl: str = "conv") -> jnp.ndarray:
    """SAME 1-D convolution on int8 operands with int32 accumulation.

    (B, L, Cin) s8 x (K, Cin, Cout) s8 -> (B, L, Cout) s32. Two
    lowerings, parity-tested against each other and an integer reference:

    - ``"conv"``: one integer ``conv_general_dilated`` (XLA decomposes it
      onto the MXU's s8 path itself).
    - ``"dots"``: K shifted s8 ``dot_general`` matmuls summed in s32 — a
      fallback in case the relay backend rejects integer convolutions
      (integer dots are the better-trodden TPU path, e.g. AQT serving).

    SAME padding pads zeros, which symmetric quantization maps to real
    0.0 — no zero-point correction term is needed anywhere.
    """
    k = wq.shape[0]
    pl, pr = (k - 1) // 2, k // 2
    if impl == "conv":
        return lax.conv_general_dilated(
            xq, wq, window_strides=(1,), padding=[(pl, pr)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.int32)
    if impl != "dots":
        raise ValueError(f"unknown int8 conv impl {impl!r}")
    b, length, _ = xq.shape
    xp = jnp.pad(xq, ((0, 0), (pl, pr), (0, 0)))
    acc = jnp.zeros((b, length, wq.shape[2]), jnp.int32)
    for t in range(k):
        acc = acc + lax.dot_general(
            lax.dynamic_slice_in_dim(xp, t, length, axis=1), wq[t],
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return acc
