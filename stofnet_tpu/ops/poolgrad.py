"""Residual-lean max-pool+leaky with a custom VJP (pure XLA).

Parity target: /root/reference/models/stofnet.py:89-91 — the
SemiGlobalBlock's LeakyReLU -> MaxPool1d(80) tail over the contract conv's
(B, L, F=512) output.

Why: the r3 train ablation (scripts/profile_train.py) shows the
SemiGlobalBlock costs ~20 of the 45 ms/step at B=128, and the OOM walk
(OOMDEMO.json) shows plain-XLA training dying at B=512 on HBM. The root
cause is the same in both: standard AD keeps the dense (B, L, F) conv
output alive as a BACKWARD RESIDUAL (1 GB bf16 at B=128, 4.2 GB at B=512)
because both the leaky and the max-pool gradients consult it. But the
pool's gradient only needs, per pooled output, WHICH window element won —
an int32 offset array 80x smaller. This op computes
``leaky(maxpool(y))`` (== ``maxpool(leaky(y))``, monotonicity) with a
custom VJP whose residuals are (int32 argmax offsets, pooled>=0 bool
mask, y.shape) — each 80x smaller than the dense plane, and the dense y
dies at the end of the forward; the backward rebuilds the cotangent
plane by scattering through the offsets. XLA-only — no Pallas — so it
runs at full conv-pipeline speed anywhere.

Tie semantics: the backward routes a tied window to its FIRST maximal
element (argmax) — the same convention as torch's MaxPool1d backward —
where jax's reduce-max gradient splits evenly among ties. In f32, exact
conv-output ties are measure-zero and the train-zoo/parallel exactness
tests pass unchanged. In the bf16 recipes (dtype=bfloat16 / amp=True)
ties are REAL (~1.7% of 80-wide windows measured at B=128), so bf16
gradients differ from the old reshape+jnp.max lowering there by design —
matching torch, not the split-tie behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pool_windows(y, scale):
    """Crop L to a multiple of ``scale`` (MaxPool1d floor semantics) and
    expose the windows: (B, L, F) -> (B, rows, scale, F). Shared by the
    primal and the VJP forward so the no-grad and grad paths can never
    drift apart."""
    rows = y.shape[1] // scale
    return y[:, : rows * scale].reshape(y.shape[0], rows, scale,
                                        y.shape[2])


def _leaky(m, negative_slope):
    return jnp.where(m >= 0, m, negative_slope * m)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def maxpool_leaky(y: jnp.ndarray, scale: int,
                  negative_slope: float = 0.01) -> jnp.ndarray:
    """leaky(max-pool) over axis 1 windows of ``scale`` (VALID, k=s).

    Args:
        y: (B, L, F) pre-activation features; L is cropped to a multiple
           of ``scale`` (MaxPool1d floor semantics).
    Returns: (B, L//scale, F).
    """
    return _leaky(jnp.max(_pool_windows(y, scale), axis=2), negative_slope)


def _fwd(y, scale, negative_slope):
    y4 = _pool_windows(y, scale)
    m = jnp.max(y4, axis=2)
    off = jnp.argmax(y4, axis=2).astype(jnp.int32)  # (B, rows, F)
    return _leaky(m, negative_slope), (off, m >= 0, y.shape)


def _bwd(scale, negative_slope, res, g):
    off, pos, y_shape = res
    b, length, f = y_shape
    rows = off.shape[1]
    # undo the (monotone) leaky: pooled sign == winning element's sign
    g_pre = jnp.where(pos, g, negative_slope * g)
    # scatter each pooled cotangent to its window's argmax slot; the
    # one-hot multiply IS the scatter (windows are disjoint) and fuses
    # into one elementwise pass over the (B, rows, scale, F) plane
    onehot = jax.nn.one_hot(off, scale, axis=2, dtype=g_pre.dtype)
    dy4 = onehot * g_pre[:, :, None, :]
    dy = dy4.reshape(b, rows * scale, f)
    if rows * scale != length:  # cropped tail got zero gradient
        dy = jnp.pad(dy, ((0, 0), (0, length - rows * scale), (0, 0)))
    return (dy,)


maxpool_leaky.defvjp(_fwd, _bwd)
