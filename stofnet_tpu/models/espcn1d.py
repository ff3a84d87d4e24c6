"""ESPCN-1D: tiny sub-pixel SR CNN baseline (6,948 params).

Parity target: /root/reference/models/espcn_1d.py (ckpts vital-puddle /
wobbly-sponge). tanh -> tanh -> conv -> shuffle -> sigmoid, with the
reference's bespoke init (espcn_1d.py:17-29): normal(0, sqrt(2/(out*k)))
and zero bias, except the 32-in output conv at normal(0, 0.001).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from stofnet_tpu.ops.shuffle import sample_shuffle


def _espcn_init(out_ch: int, k: int):
    return {"kernel_init": nn.initializers.normal((2.0 / (out_ch * k)) ** 0.5),
            "bias_init": nn.initializers.zeros_init()}


class ESPCN1D(nn.Module):
    upscale_factor: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, 1, L) -> (B, 1, L*r)
        h = jnp.transpose(x, (0, 2, 1))
        if self.dtype is not None:
            h = h.astype(self.dtype)
        h = jnp.tanh(nn.Conv(64, (5,), padding="SAME", dtype=self.dtype,
                             name="conv1", **_espcn_init(64, 5))(h))
        h = jnp.tanh(nn.Conv(32, (3,), padding="SAME", dtype=self.dtype,
                             name="conv2", **_espcn_init(32, 3))(h))
        h = nn.Conv(self.upscale_factor, (3,), padding="SAME",
                    dtype=self.dtype, name="conv3",
                    kernel_init=nn.initializers.normal(0.001),
                    bias_init=nn.initializers.zeros_init())(h)
        h = jnp.transpose(h, (0, 2, 1))  # (B, r, L)
        h = sample_shuffle(h, self.upscale_factor)
        return nn.sigmoid(h).astype(jnp.float32)
