"""Zonzini single-echo regression CNNs.

Parity target: /root/reference/models/zonzini.py — stacks of
(conv k10 stride2 VALID -> ReLU -> maxpool k2) followed by global average
pooling and a 1024-wide MLP head emitting one scalar ToA per frame.
Small (134,481 params, chirp / ckpt graceful-wave) vs Large (PALA).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from stofnet_tpu.models.init import torch_default


class _ZonziniNet(nn.Module):
    channels: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, 1, L) -> (B, 1)
        h = jnp.transpose(x, (0, 2, 1))
        if self.dtype is not None:
            h = h.astype(self.dtype)
        for i, ch in enumerate(self.channels):
            # conv(k10, s2, VALID) emits (L-10)//2+1; maxpool(k2, s2, VALID)
            # then needs >= 2 of those, so each stage needs L >= 12 or the
            # empty global pool turns the output into NaN
            if h.shape[1] < 12:
                raise ValueError(
                    f"ZonziniNet stage {i}: length {h.shape[1]} < 12 "
                    f"(input L={x.shape[-1]} too short for "
                    f"{len(self.channels)} stride-4 stages; conv+pool "
                    f"would emit width 0 and the global pool NaN)")
            h = nn.Conv(ch, (10,), strides=(2,), padding="VALID",
                        dtype=self.dtype, name=f"conv{i}",
                        **torch_default(10, h.shape[-1]))(h)
            h = nn.relu(h)
            h = nn.max_pool(h, (2,), strides=(2,), padding="VALID")
        h = jnp.mean(h, axis=1)  # global average pool over length
        h = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc1",
                             **torch_default(1, h.shape[-1]))(h))
        h = nn.Dense(1, dtype=self.dtype, name="fc2",
                     **torch_default(1, 1024))(h)
        return h.astype(jnp.float32)


class ZonziniNetSmall(_ZonziniNet):
    channels: Sequence[int] = (16, 32, 64, 64)


class ZonziniNetLarge(_ZonziniNet):
    channels: Sequence[int] = (50, 100, 150, 200, 250)


def rewrite_torch_key(key: str) -> str:
    """torch 'conv_layers.{i}' -> flax 'conv{i}'."""
    if key.startswith("conv_layers."):
        parts = key.split(".")
        return f"conv{parts[1]}." + ".".join(parts[2:])
    return key


def rewrite_flax_key(key: str) -> str:
    """Inverse of :func:`rewrite_torch_key` (for .pth export)."""
    head, rest = key.split(".", 1)
    if head.startswith("conv") and head[4:].isdigit():
        return f"conv_layers.{head[4:]}." + rest
    return key
