"""StofNet: 1-D super-resolution CNN for sub-sample echo localization.

Architecture parity target: /root/reference/models/stofnet.py:11-117 —
conv1(k9)+ReLU -> SemiGlobalBlock (80x pooled context pathway) ->
conv2..conv11 (k7, leaky-ReLU, residual add every 2nd) -> conv12 + global
residual -> conv_last(k3, features=upsample_factor) -> sample shuffle.

TPU design notes: the network runs in (B, L, C) layout so the length axis
tiles onto VPU lanes and every KxCinxCout conv lowers to MXU matmuls. All
activations for L=8k fit VMEM many times over; XLA fuses the elementwise
leaky-ReLU/residual chains into the convs. ``dtype`` selects the compute
precision (bfloat16 recommended for inference; params stay f32).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from stofnet_tpu.models.init import torch_default
from stofnet_tpu.ops.poolgrad import maxpool_leaky
from stofnet_tpu.ops.shuffle import sample_shuffle


class SemiGlobalBlock(nn.Module):
    """Cheap long-range context: an 80x max-pooled, channel-expanded pathway
    added back onto the features (reference models/stofnet.py:80-117).

    For the HBM-optimal inference path of this block (contract conv + pool
    fused in VMEM via Pallas) see models/fused.py:stofnet_apply_fused.
    """

    features: int
    sample_scale: int = 80
    kernel_size: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, L, C)
        feat = max(1, self.sample_scale // 10) * self.features
        s = nn.Conv(feat, (self.kernel_size,), padding="SAME", dtype=self.dtype,
                    name="contract_conv",
                    **torch_default(self.kernel_size, x.shape[-1]))(x)
        # leaky -> MaxPool1d(k=s=80, VALID) as ONE op with a residual-lean
        # custom VJP (ops/poolgrad.py): identical values (leaky commutes
        # with max; floor division == the crop), but the backward saves
        # 80x-smaller argmax offsets instead of keeping the dense
        # (B, L, feat) conv output alive — the tensor the r3 train
        # ablation (scripts/profile_train.py) and OOM walk (OOMDEMO.json)
        # identified as training's dominant residual.
        s = maxpool_leaky(s, self.sample_scale, 0.01)
        s = nn.Conv(self.features, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="expand_conv",
                    **torch_default(self.kernel_size, feat))(s)
        s = jax.nn.leaky_relu(s, 0.01)
        s = jnp.repeat(s, self.sample_scale, axis=1)  # nearest upsample

        pad = max(0, x.shape[1] - s.shape[1])
        s = jnp.pad(s, ((0, 0), (pad // 2, pad // 2), (0, 0)))
        if s.shape[1] != x.shape[1]:
            raise ValueError(
                f"SemiGlobalBlock length mismatch {s.shape[1]} vs {x.shape[1]}: "
                f"input length minus pooled-upsampled length must be even "
                f"(reference pads pad//2 on each side)."
            )
        return x + s


class StofNet(nn.Module):
    """Heatmap super-resolution network; input (B, 1, L), output (B, 1, L*r)."""

    upsample_factor: int = 4
    num_features: int = 64
    num_blocks: int = 13
    kernel_sizes: Sequence[int] = (9, 7, 3)
    semi_global_scale: int = 80
    # reference stofnet.py:40,69-77: optional (semi-)orthogonal conv init —
    # relu gain sqrt(2) on activation layers, gain 1 on residual-schedule
    # layers and conv_last; biases and the SemiGlobalBlock keep torch
    # defaults (the reference's _initialize_weights never touches them).
    # Distributional parity (orthogonality + gain), not bitwise: the rngs
    # differ. OFF by default, like the reference (never set by its driver).
    weights_init: bool = False
    dtype: Any = None

    def _conv_kwargs(self, layer_idx, kernel, fan_in):
        kw = torch_default(kernel, fan_in)
        if self.weights_init:
            # the reference's residual list includes num_blocks-1 and
            # num_blocks (stofnet.py:37), so conv{nb-1} gets gain 1
            residual = set(range(3, self.num_blocks - 1, 2)) | {
                self.num_blocks - 1, self.num_blocks}
            gain = 1.0 if layer_idx in residual else 2.0 ** 0.5
            kw = dict(kw, kernel_init=nn.initializers.orthogonal(scale=gain))
        return kw

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # ``train`` is the uniform model contract (BN/dropout models branch
        # on it); StofNet itself is deterministic.
        h = jnp.transpose(x, (0, 2, 1))  # (B, L, 1): length-major for the MXU
        if self.dtype is not None:
            h = h.astype(self.dtype)

        # reference quirk (models/stofnet.py:23-24): conv1/conv_last paddings
        # are HARD-CODED to 4 and 1 — "SAME" only for the default kernel
        # sizes (9, ., 3). Non-default kernels change the sequence length
        # asymmetrically through these two layers (e.g. k1=5 -> L+4); the
        # config-space fuzz (tests/test_model_stofnet.py) pins this parity.
        h = nn.relu(
            nn.Conv(self.num_features, (self.kernel_sizes[0],),
                    padding=((4, 4),),
                    dtype=self.dtype, name="conv1",
                    # fan_in from the actual input channels (in_channels>1
                    # is part of the reference option space) so torch
                    # from-scratch init parity holds for multi-channel too
                    **self._conv_kwargs(1, self.kernel_sizes[0],
                                        h.shape[-1]))(h)
        )

        if self.semi_global_scale != 1:
            h = SemiGlobalBlock(self.num_features, self.semi_global_scale,
                                dtype=self.dtype, name="semi_global_block")(h)

        # residual schedule: adds at layers {3,5,...,num_blocks-2} plus the
        # global skip into conv{num_blocks-1} (reference stofnet.py:37,51-62)
        residual_layers = set(range(3, self.num_blocks - 1, 2))
        res = res1 = h
        for i in range(2, self.num_blocks - 1):
            y = nn.Conv(self.num_features, (self.kernel_sizes[1],),
                        padding="SAME", dtype=self.dtype, name=f"conv{i}",
                        **self._conv_kwargs(i, self.kernel_sizes[1],
                                            self.num_features))(h)
            if i in residual_layers:
                h = res + y
                res = h
            else:
                h = jax.nn.leaky_relu(y, 0.01)

        y = nn.Conv(self.num_features, (self.kernel_sizes[1],), padding="SAME",
                    dtype=self.dtype, name=f"conv{self.num_blocks - 1}",
                    **self._conv_kwargs(self.num_blocks - 1,
                                        self.kernel_sizes[1],
                                        self.num_features))(h)
        h = res1 + y

        h = nn.Conv(self.upsample_factor, (self.kernel_sizes[2],),
                    padding=((1, 1),), dtype=self.dtype, name="conv_last",
                    **self._conv_kwargs(self.num_blocks,  # plain orthogonal
                                        self.kernel_sizes[2],
                                        self.num_features))(h)

        h = jnp.transpose(h, (0, 2, 1))  # (B, r, L)
        out = sample_shuffle(h, self.upsample_factor)  # (B, 1, L*r)
        return out.astype(jnp.float32)
