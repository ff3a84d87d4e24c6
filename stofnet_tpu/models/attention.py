"""1-D self-attention block (optional long-range context module).

The reference ships ``utils/attention_block.py`` as dead code — referenced
only in a comment at models/stofnet.py:27,90 and broken (``F`` never
imported). This is the working TPU-native equivalent: scaled-dot-product
attention over (possibly pooled) sample positions, usable as a drop-in
alternative to the SemiGlobalBlock's pooled pathway.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


class AttentionBlock1D(nn.Module):
    """SDPA over the length axis of (B, L, C) features."""

    features: int
    num_heads: int = 4
    pool: int = 1  # attend over pool-downsampled positions for long L
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        if self.pool > 1:
            h = nn.max_pool(h, (self.pool,), strides=(self.pool,),
                            padding="VALID")
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.features,
            out_features=self.features, dtype=self.dtype, name="sdpa")(h, h)
        if self.pool > 1:
            y = jnp.repeat(y, self.pool, axis=1)
            pad = max(0, x.shape[1] - y.shape[1])
            y = jnp.pad(y, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)))
        return x + y
