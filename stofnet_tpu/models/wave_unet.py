"""Wave-U-Net: denoising U-net operating at input rate.

Parity target: /root/reference/models/wave_unet.py — encoder of
(conv k15 SAME -> BN -> leaky 0.1) with stride-2-by-slicing downsampling,
a middle block, and a decoder of (linear x2 upsample, align_corners=True ->
skip concat -> conv k5 SAME -> BN -> leaky 0.1), closed by a k1 conv + tanh
over [features, input]. The driver runs it with n_layers=2 (chirp) / 10 and
channels_interval=16, folding the upsample factor into rf_scale
(main.py:44-46,160).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from stofnet_tpu.models.init import torch_default
from stofnet_tpu.ops.resample import linear_resample


class WaveUnet(nn.Module):
    n_layers: int = 2
    channels_interval: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, 1, L) -> (B, 1, L)
        h = jnp.transpose(x, (0, 2, 1))  # (B, L, 1)
        if self.dtype is not None:
            h = h.astype(self.dtype)
        inp = h

        def block(h, feats, ksize, name):
            h = nn.Conv(feats, (ksize,), padding="SAME", dtype=self.dtype,
                        name=f"{name}_conv",
                        **torch_default(ksize, h.shape[-1]))(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"{name}_bn")(h)
            return nn.leaky_relu(h, 0.1)

        skips = []
        for i in range(self.n_layers):
            h = block(h, (i + 1) * self.channels_interval, 15, f"enc{i}")
            skips.append(h)
            h = h[:, ::2, :]  # stride-2 by slicing (reference :89)

        h = block(h, self.n_layers * self.channels_interval, 15, "middle")

        for i in range(self.n_layers):
            h = linear_resample(h, h.shape[1] * 2, axis=1)  # align_corners=True
            h = jnp.concatenate([h, skips[self.n_layers - i - 1]], axis=-1)
            h = block(h, (self.n_layers - i) * self.channels_interval, 5,
                      f"dec{i}")

        h = jnp.concatenate([h, inp], axis=-1)
        h = nn.Conv(1, (1,), padding="VALID", dtype=self.dtype,
                    name="out_conv", **torch_default(1, h.shape[-1]))(h)
        h = jnp.tanh(h)
        return jnp.transpose(h, (0, 2, 1)).astype(jnp.float32)


def rewrite_torch_key(key: str) -> str:
    """torch 'encoder.{i}.main.{0|1}' -> 'enc{i}_{conv|bn}', middle/decoder/out
    likewise."""
    parts = key.split(".")
    sub = {"0": "conv", "1": "bn"}
    if parts[0] == "encoder":
        return f"enc{parts[1]}_{sub[parts[3]]}." + ".".join(parts[4:])
    if parts[0] == "decoder":
        return f"dec{parts[1]}_{sub[parts[3]]}." + ".".join(parts[4:])
    if parts[0] == "middle":
        return f"middle_{sub[parts[1]]}." + ".".join(parts[2:])
    if parts[0] == "out":
        return "out_conv." + ".".join(parts[2:])
    return key


def rewrite_flax_key(key: str) -> str:
    """Inverse of :func:`rewrite_torch_key` (for .pth export)."""
    head, rest = key.split(".", 1)
    sub = {"conv": "0", "bn": "1"}
    if head == "out_conv":
        return "out.0." + rest
    if "_" in head:
        mod, kind = head.rsplit("_", 1)
        if kind in sub:
            if mod == "middle":
                return f"middle.{sub[kind]}." + rest
            if mod.startswith("enc"):
                return f"encoder.{mod[3:]}.main.{sub[kind]}." + rest
            if mod.startswith("dec"):
                return f"decoder.{mod[3:]}.main.{sub[kind]}." + rest
    return key


def batchnorm_modules(n_layers: int):
    return tuple([f"enc{i}_bn" for i in range(n_layers)] + ["middle_bn"]
                 + [f"dec{i}_bn" for i in range(n_layers)])
