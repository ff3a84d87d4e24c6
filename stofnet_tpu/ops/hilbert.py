"""Analytic signal / Hilbert envelope on TPU via rFFT.

Parity target: the reference's FFT-mask-IFFT construction
(/root/reference/utils/hilbert.py:5-21), which keeps bin 0 and bin n//2 at
unit weight and doubles bins 1..n//2-1 for BOTH even and odd n (this differs
from scipy.signal.hilbert at bin (n-1)//2 for odd n — we replicate the
reference exactly).

TPU notes: we use rfft (real input) so XLA only materializes n//2+1 complex
bins for the forward transform; the weighted spectrum is zero-padded to n and
inverse-transformed once. The whole op is one fused XLA region.
"""

from __future__ import annotations

import jax.numpy as jnp


def analytic_signal(y: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Complex analytic signal of a real waveform along ``axis``."""
    y = jnp.asarray(y)
    moved = axis not in (-1, y.ndim - 1)
    if moved:
        y = jnp.moveaxis(y, axis, -1)
    n = y.shape[-1]
    half = n // 2

    r = jnp.fft.rfft(y, axis=-1)  # bins 0..n//2
    k = jnp.arange(half + 1)
    w = jnp.where((k == 0) | (k == half), 1.0, 2.0).astype(r.real.dtype)
    f = r * w
    tail = jnp.zeros(y.shape[:-1] + (n - half - 1,), dtype=f.dtype)
    v = jnp.fft.ifft(jnp.concatenate([f, tail], axis=-1), axis=-1)

    if moved:
        v = jnp.moveaxis(v, -1, axis)
    return v


def hilbert_envelope(y: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Magnitude of the analytic signal (instantaneous envelope)."""
    return jnp.abs(analytic_signal(y, axis=axis))


def hilbert_transform_features(x: jnp.ndarray, concat_oscil: bool = False,
                               channel_axis: int = 1) -> jnp.ndarray:
    """Envelope features for (B, C, L) frames; with ``concat_oscil`` the raw
    oscillation is concatenated along the channel axis (the reference's
    HilbertTransform module, utils/hilbert.py:24-34)."""
    env = hilbert_envelope(x, axis=-1)
    if concat_oscil:
        return jnp.concatenate([env, x], axis=channel_axis)
    return env
