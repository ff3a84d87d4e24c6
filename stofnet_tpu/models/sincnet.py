"""SincNet: learned band-pass filterbank front-end + conv stack.

Parity target: /root/reference/models/sincnet.py — ``SincConv_fast``
(:58-188) computes mel-initialized band-pass FIR filters from two small
parameter vectors every forward; the driver configures a 4-layer stack
(main.py:145-157): filters [128,128,128,1], lengths [1023,11,9,7], batchnorm
(momentum .05), leaky-relu(0.2) x3 + linear, outputting a (B, 1, L) heatmap
at 1x resolution. 330,633 params (ckpts pretty-brook / noble-monkey).

TPU notes: the filterbank construction is a tiny (128, 511) elementwise
computation XLA folds into the conv's producer; the k=1023 SAME conv itself
is the dominant cost and lowers to MXU matmuls.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from stofnet_tpu.models.init import torch_default


class SincConv(nn.Module):
    """Parameterized sinc band-pass conv; in_channels must be 1."""

    out_channels: int = 128
    kernel_size: int = 1023  # forced odd like the reference
    sample_rate: float = 16000.0
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    dtype: Any = None
    pad: bool = True  # False = valid conv (SincNetFull pads manually)

    def _mel_init(self):
        low_hz, high_hz = 30.0, self.sample_rate / 2 - (self.min_low_hz +
                                                        self.min_band_hz)
        to_mel = lambda hz: 2595 * np.log10(1 + hz / 700)
        to_hz = lambda mel: 700 * (10 ** (mel / 2595) - 1)
        hz = to_hz(np.linspace(to_mel(low_hz), to_mel(high_hz),
                               self.out_channels + 1))
        return (hz[:-1].reshape(-1, 1).astype(np.float32),
                np.diff(hz).reshape(-1, 1).astype(np.float32))

    @nn.compact
    def __call__(self, x):  # (B, 1, L) channel-first -> (B, F, L)
        k = self.kernel_size if self.kernel_size % 2 else self.kernel_size + 1
        init_low, init_band = self._mel_init()
        low_hz_ = self.param("low_hz_", lambda rng: jnp.asarray(init_low))
        band_hz_ = self.param("band_hz_", lambda rng: jnp.asarray(init_band))

        low = self.min_low_hz + jnp.abs(low_hz_)
        high = jnp.clip(low + self.min_band_hz + jnp.abs(band_hz_),
                        self.min_low_hz, self.sample_rate / 2)
        band = (high - low)[:, 0]

        half = k // 2
        n_lin = jnp.linspace(0.0, k / 2 - 1, half)
        window = 0.54 - 0.46 * jnp.cos(2 * math.pi * n_lin / k)
        n_ = (2 * math.pi * jnp.arange(-(k - 1) / 2.0, 0.0) /
              self.sample_rate)[None, :]  # (1, half)

        f_lo = low @ n_
        f_hi = high @ n_
        left = ((jnp.sin(f_hi) - jnp.sin(f_lo)) / (n_ / 2)) * window
        center = 2 * band[:, None]
        right = jnp.flip(left, axis=1)
        bp = jnp.concatenate([left, center, right], axis=1) / (2 * band[:, None])

        filters = bp.reshape(self.out_channels, 1, k)
        if self.dtype is not None:
            filters = filters.astype(self.dtype)
            x = x.astype(self.dtype)
        padding = [(half, half)] if self.pad else [(0, 0)]
        return lax.conv_general_dilated(
            x, filters, window_strides=(1,), padding=padding,
            dimension_numbers=("NCH", "OIH", "NCH"),
        )


class SincNet(nn.Module):
    """4-layer SincNet heatmap model matching the driver's config."""

    sample_rate: float = 16000.0
    use_sinc: bool = True
    dtype: Any = None

    # driver config (main.py:145-157)
    n_filt: tuple = (128, 128, 128, 1)
    len_filt: tuple = (1023, 11, 9, 7)

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, 1, L) -> (B, 1, L)
        if self.use_sinc:
            h = SincConv(self.n_filt[0], self.len_filt[0], self.sample_rate,
                         dtype=self.dtype, name="sinc_conv")(x)
            h = jnp.transpose(h, (0, 2, 1))  # (B, L, F)
        else:
            h = jnp.transpose(x, (0, 2, 1))
            if self.dtype is not None:
                h = h.astype(self.dtype)
            h = nn.Conv(self.n_filt[0], (self.len_filt[0],), padding="SAME",
                        dtype=self.dtype, name="conv0",
                        **torch_default(self.len_filt[0], 1))(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.95,
                         dtype=self.dtype, name="bn0")(h)
        h = nn.leaky_relu(h, 0.2)

        for i in range(1, 4):
            h = nn.Conv(self.n_filt[i], (self.len_filt[i],), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}",
                        **torch_default(self.len_filt[i],
                                        self.n_filt[i - 1]))(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.95,
                             dtype=self.dtype, name=f"bn{i}")(h)
            if i < 3:
                h = nn.leaky_relu(h, 0.2)  # last layer: linear activation

        return jnp.transpose(h, (0, 2, 1)).astype(jnp.float32)  # (B, 1, L)


def rewrite_torch_key(key: str) -> str:
    """torch 'conv.0.low_hz_' -> 'sinc_conv.low_hz_'; 'conv.{i}' -> 'conv{i}';
    'bn.{i}' -> 'bn{i}'."""
    parts = key.split(".")
    if parts[0] == "conv":
        if parts[2] in ("low_hz_", "band_hz_"):
            return "sinc_conv." + parts[2]
        return f"conv{parts[1]}." + ".".join(parts[2:])
    if parts[0] == "bn":
        return f"bn{parts[1]}." + ".".join(parts[2:])
    return key


def rewrite_flax_key(key: str) -> str:
    """Inverse of :func:`rewrite_torch_key` (for .pth export)."""
    head, rest = key.split(".", 1)
    if head == "sinc_conv":
        return "conv.0." + rest
    if head.startswith("conv") and head[4:].isdigit():
        return f"conv.{head[4:]}." + rest
    if head.startswith("bn") and head[2:].isdigit():
        return f"bn.{head[2:]}." + rest
    return key


BATCHNORM_MODULES = ("bn0", "bn1", "bn2", "bn3")
