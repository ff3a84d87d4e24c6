"""1-D sample (pixel) shuffle: depth-to-length rearrangement.

Parity target: /root/reference/utils/sample_shuffle.py:19-27 — the
sub-sample upsampler shared by StofNet / EDSR-1D / ESPCN-1D. On TPU this is
a pure reshape+transpose that XLA folds into neighbouring ops (free at the
HBM level when fused with the producing conv).
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_shuffle(x: jnp.ndarray, upsample_factor: int) -> jnp.ndarray:
    """(B, r*C, W) -> (B, C, r*W); interleaves r channel groups along length."""
    b, rc, w = x.shape
    r = upsample_factor
    c = rc // r
    x = x.reshape(b, r, c, w)
    x = jnp.transpose(x, (0, 2, 3, 1))  # (B, C, W, r)
    return x.reshape(b, c, w * r)


def sample_unshuffle(x: jnp.ndarray, upsample_factor: int) -> jnp.ndarray:
    """Inverse of :func:`sample_shuffle`: (B, C, r*W) -> (B, r*C, W)."""
    b, c, wr = x.shape
    r = upsample_factor
    w = wr // r
    x = x.reshape(b, c, w, r)
    x = jnp.transpose(x, (0, 3, 1, 2))  # (B, r, C, W)
    return x.reshape(b, r * c, w)
