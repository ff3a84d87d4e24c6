"""Gaussian kernels and 1-D blur (used to soften ground-truth spike masks).

Parity targets: /root/reference/utils/gaussian.py:4-7 (kernel) and the
training-loss blur at /root/reference/main.py:229-231 (conv1d, pad size//2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def gaussian_kernel(size: int, sigma: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized Gaussian window; support matches the reference's
    ``linspace(-size//2 + 1, size//2, size)`` (numpy floor-division)."""
    lo = (-size) // 2 + 1  # numpy-style floor division of -size
    x = jnp.linspace(lo, size // 2, size, dtype=dtype)
    k = jnp.exp(-jnp.square(x / sigma) / 2.0)
    return k / jnp.sum(k)


def gaussian_blur1d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Cross-correlate (B, C, L) with a shared 1-D kernel, pad = size//2.

    Matches ``F.conv1d(x, k[None,None], padding=size//2)`` for C==1.
    """
    size = kernel.shape[0]
    pad = size // 2
    k = kernel.reshape(1, 1, size).astype(x.dtype)
    b, c, l = x.shape
    y = lax.conv_general_dilated(
        x.reshape(b * c, 1, l),
        k,
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y.reshape(b, c, -1)
