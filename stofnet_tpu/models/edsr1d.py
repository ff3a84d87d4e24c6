"""EDSR-1D: residual super-resolution CNN baseline.

Parity target: /root/reference/models/edsr_1d.py (210,289 params at the
default config; verified against ckpts proud-cherry / snowy-dragon).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from stofnet_tpu.models.init import torch_default
from stofnet_tpu.ops.shuffle import sample_shuffle


class _ResBlock(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):  # (B, L, C)
        y = nn.relu(nn.Conv(self.features, (3,), padding="SAME",
                            dtype=self.dtype, name="conv1",
                            **torch_default(3, x.shape[-1]))(x))
        y = nn.Conv(self.features, (3,), padding="SAME", dtype=self.dtype,
                    name="conv2", **torch_default(3, self.features))(y)
        return x + y


class EDSR1D(nn.Module):
    num_channels: int = 1
    num_features: int = 64
    num_blocks: int = 8
    upscale_factor: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, 1, L) -> (B, 1, L*r)
        h = jnp.transpose(x, (0, 2, 1))
        if self.dtype is not None:
            h = h.astype(self.dtype)
        h = nn.relu(nn.Conv(self.num_features, (3,), padding="SAME",
                            dtype=self.dtype, name="conv_input",
                            **torch_default(3, self.num_channels))(h))
        res = h
        for i in range(self.num_blocks):
            h = _ResBlock(self.num_features, dtype=self.dtype,
                          name=f"residual_blocks_{i}")(h)
        h = nn.Conv(self.num_features, (3,), padding="SAME", dtype=self.dtype,
                    name="conv_mid", **torch_default(3, self.num_features))(h)
        h = h + res
        h = jnp.transpose(h, (0, 2, 1))  # (B, C, L)
        h = sample_shuffle(h, self.upscale_factor)  # (B, C/r, L*r)
        h = jnp.transpose(h, (0, 2, 1))
        h = nn.Conv(self.num_channels, (3,), padding="SAME", dtype=self.dtype,
                    name="conv_output",
                    **torch_default(3, self.num_features //
                                    self.upscale_factor))(h)
        return jnp.transpose(h, (0, 2, 1)).astype(jnp.float32)


def rewrite_torch_key(key: str) -> str:
    """torch 'residual_blocks.{i}.conv{j}' -> flax 'residual_blocks_{i}.conv{j}'."""
    if key.startswith("residual_blocks."):
        parts = key.split(".")
        return f"residual_blocks_{parts[1]}." + ".".join(parts[2:])
    return key


def rewrite_flax_key(key: str) -> str:
    """Inverse of :func:`rewrite_torch_key` (for .pth export)."""
    if key.startswith("residual_blocks_"):
        head, rest = key.split(".", 1)
        return f"residual_blocks.{head[len('residual_blocks_'):]}." + rest
    return key
