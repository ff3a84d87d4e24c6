"""Weight initialization parity with the reference's torch defaults.

The reference trains every model from torch's default module init
(StofNet's orthogonal init is OFF by default, models/stofnet.py:69-77;
only ESPCN overrides it, models/espcn_1d.py:17-29). torch Conv1d/Linear
default to kaiming_uniform(a=sqrt(5)) — U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
i.e. variance 1/(3*fan_in) — on weights AND the same uniform bound on
biases. flax's defaults (lecun_normal, zero bias) carry 3x the weight
variance, which measurably changes from-scratch training dynamics on the
13-layer StofNet stack (see TRAINPARITY.md history), so from-scratch
parity requires matching the torch scheme.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax.linen import initializers
from jax import random

# kaiming_uniform(a=sqrt(5)) == variance_scaling(1/3, fan_in, uniform):
# bound = sqrt(3 * scale / fan_in) = sqrt(1 / fan_in). flax computes conv
# fan_in as prod(kernel_size) * in_features, matching torch.
torch_kernel_init = initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                  "uniform")


def torch_bias_init(fan_in: int):
    """torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = float(fan_in) ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_default(kernel_size: int, in_features: int) -> dict:
    """kwargs for nn.Conv/nn.Dense matching torch's default init.

    For Dense pass kernel_size=1.
    """
    return {"kernel_init": torch_kernel_init,
            "bias_init": torch_bias_init(kernel_size * in_features)}
