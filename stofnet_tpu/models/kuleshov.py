"""Kuleshov audio-super-resolution U-net baseline.

Parity target: /root/reference/models/kuleshov.py — 4 stride-2 down convs
(VALID), a stride-2 bottleneck, and 4 up stages of
(conv -> BN -> dropout -> 2x pixel-shuffle -> skip-CONCAT ALONG TIME),
closed by a k9 conv, channel interleave (SubPixel1D) and a Linear head onto
``output_length``. Faithfully reproduces the reference's quirks: the down
path applies leaky_relu(0.01) after the conv and leaky_relu(0.2) after the
BN; skips concatenate along the time axis (not channels).

No trained checkpoint ships for this model (the PALA zonzini ckpt is also
listed missing), so parity is verified against the torch reference with
randomly initialized imported weights.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from stofnet_tpu.models.init import torch_default

N_FILTERS = (128, 256, 512, 512)
N_FILTERSIZES = (65, 33, 17, 9)
BOTTLENECK_K = 9


def conv_out_len(w: int, k: int, s: int) -> int:
    return int((w - k) / s + 1.0)


def fc_dimensions(input_length: int, num_layers: int = 4) -> int:
    """Analytic output width of the final conv (reference :63-112)."""
    w = input_length
    down_widths = []
    for k in N_FILTERSIZES[:num_layers]:
        w = conv_out_len(w, k, 2)
        down_widths.append(w)
    w = conv_out_len(w, BOTTLENECK_K, 2)  # bottleneck
    for k, cd in zip(reversed(N_FILTERSIZES[:num_layers]),
                     reversed(down_widths)):
        w = conv_out_len(w, k, 1)  # up conv
        w = w * 2  # pixel shuffle doubles time
        w = w + cd  # concat skip along time
    w = conv_out_len(w, 9, 1)  # final conv
    return w * 2  # SubPixel1D interleaves the 2 channels


def _pixel_shuffle_time(h: jnp.ndarray) -> jnp.ndarray:
    """torch unsqueeze(2) + PixelShuffle(2) + view: (B, W, C) -> (B, 2W, C/2)
    with out[b, 2w+j, 2c+i] = h[b, w, 4c + 2i + j]."""
    b, w, c = h.shape
    h = h.reshape(b, w, c // 4, 2, 2)          # (b, w, c2, i, j)
    h = jnp.transpose(h, (0, 1, 4, 2, 3))      # (b, w, j, c2, i)
    return h.reshape(b, w * 2, c // 2)


class Kuleshov(nn.Module):
    input_length: int
    output_length: int
    num_layers: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, 1, L) -> (B, 1, out_len)
        h = jnp.transpose(x[:, :, : self.input_length], (0, 2, 1))
        if self.dtype is not None:
            h = h.astype(self.dtype)

        skips = [h]
        for i in range(self.num_layers):
            h = nn.Conv(N_FILTERS[i], (N_FILTERSIZES[i],), strides=(2,),
                        padding="VALID", dtype=self.dtype,
                        name=f"down_conv{i}",
                        **torch_default(N_FILTERSIZES[i], h.shape[-1]))(h)
            h = nn.leaky_relu(h, 0.01)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"down_bn{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            skips.append(h)

        h = nn.Conv(N_FILTERS[-1], (BOTTLENECK_K,), strides=(2,),
                    padding="VALID", dtype=self.dtype, name="bottleneck",
                    **torch_default(BOTTLENECK_K, h.shape[-1]))(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.leaky_relu(h, 0.2)

        up_cfg = list(reversed(list(zip(N_FILTERS[: self.num_layers],
                                        N_FILTERSIZES[: self.num_layers]))))
        for i, (nf, fs) in enumerate(up_cfg):
            h = nn.Conv(2 * nf, (fs,), padding="VALID", dtype=self.dtype,
                        name=f"up_conv{i}",
                        **torch_default(fs, h.shape[-1]))(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"up_bn{i}")(h)
            h = nn.Dropout(0.5, deterministic=not train)(h)
            h = _pixel_shuffle_time(h)
            skip = skips[len(skips) - 1 - i]
            h = jnp.concatenate([h, skip], axis=1)  # along TIME (reference)

        h = nn.Conv(2, (9,), padding="VALID", dtype=self.dtype,
                    name="final_conv", **torch_default(9, h.shape[-1]))(h)
        h = h.reshape(h.shape[0], -1)  # SubPixel1D channel interleave
        h = nn.Dense(self.output_length, dtype=self.dtype, name="output_fc",
                     **torch_default(1, h.shape[-1]))(h)
        return h[:, None, :].astype(jnp.float32)


BATCHNORM_MODULES = tuple(
    [f"down_bn{i}" for i in range(4)] + [f"up_bn{i}" for i in range(4)]
)
