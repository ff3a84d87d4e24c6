"""On-device linear resampling and IQ->RF conversion.

Parity targets: /root/reference/datasets/chirp_dataset.py:10-17 (upscale_1d)
and :79-91 (iq2rf). The reference resamples with scipy.interp1d on the host
per data item; here resampling is a static gather+lerp that jits and fuses,
so rf_scale_factor upscaling can run on-chip as part of the input pipeline.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def linear_resample(data: jnp.ndarray, num_out: int, axis: int = -1) -> jnp.ndarray:
    """Linear interpolation onto ``num_out`` points spanning the same support
    (endpoints inclusive, matching linspace/interp1d semantics)."""
    data = jnp.asarray(data)
    moved = axis not in (-1, data.ndim - 1)
    if moved:
        data = jnp.moveaxis(data, axis, -1)
    n = data.shape[-1]
    # target positions in source-index units: t_j = j*(n-1)/(num_out-1).
    # n and num_out are static, so indices/fractions are trace-time f64
    # constants — full host precision with zero runtime cost.
    t = np.linspace(0.0, n - 1.0, num_out)
    i0 = np.clip(np.floor(t).astype(np.int32), 0, n - 2)
    real_dtype = data.real.dtype if jnp.iscomplexobj(data) else data.dtype
    frac = jnp.asarray((t - i0).astype(np.float32), dtype=real_dtype)
    i0 = jnp.asarray(i0)
    lo = jnp.take(data, i0, axis=-1)
    hi = jnp.take(data, i0 + 1, axis=-1)
    out = lo + (hi - lo) * frac
    if moved:
        out = jnp.moveaxis(out, -1, axis)
    return out


def upscale_1d(data: jnp.ndarray, rescale_factor: float, axis: int = -1) -> jnp.ndarray:
    """Resample to ``int(n * rescale_factor)`` points (reference upscale_1d)."""
    n = data.shape[axis]
    return linear_resample(data, int(n * rescale_factor), axis=axis)


def iq2rf(
    iq_data: jnp.ndarray, fc: float, fs: float, rescale_factor: float = 1
) -> jnp.ndarray:
    """Upscale complex IQ by ``rescale_factor`` and remodulate onto carrier fc.

    Returns the real RF waveform (last axis is time).
    """
    n = iq_data.shape[-1]
    num_out = int(n * rescale_factor)
    y = linear_resample(iq_data, num_out, axis=-1)
    # carrier is a static constant: compute in f64 on host at trace time
    t = np.linspace(0.0, n / fs, num_out)
    carrier = jnp.asarray(np.exp(2j * np.pi * fc * t).astype(np.complex64))
    return (y * carrier).real
