"""Training objectives.

Parity targets: /root/reference/main.py:183-188,224-241 — heatmap models
train on MSE against a Gaussian-blurred GT spike mask plus an L1 sparsity
pull to zero; Zonzini-style regressors train on plain MSE to the first valid
GT ToA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from stofnet_tpu.ops.gaussian import gaussian_blur1d, gaussian_kernel
from stofnet_tpu.ops.peaks import coords2mask


def heatmap_loss(
    masks_pred: jnp.ndarray,
    gt_true: jnp.ndarray,
    kernel: Optional[jnp.ndarray] = None,
    kernel_size: int = 7,
    sigma: float = 1.0,
    mask_amplitude: float = 20.0,
    lambda_value: float = 1e-2,
    norm_max: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blurred-spike MSE + lambda * L1-to-zero.

    Args:
        masks_pred: (B, 1, L_out) model heatmap.
        gt_true: (B, 1, K) integer GT positions in upsampled units
            (already rounded * upsample_factor; invalid slots <= 0).
        kernel: precomputed Gaussian kernel (else built from size/sigma).
        norm_max: precomputed normalization (the blurred mask's max).
            Gradient accumulation passes the FULL batch's max here so each
            micro-batch normalizes like the full-batch step would — the
            normalizer depends only on GT, and without it a micro-batch
            whose rows all lack GT spikes would divide 0/0 (train/steps.py
            accum path).

    Returns:
        (scalar loss, (B, 1, L_out) unblurred GT spike mask).
    """
    length = masks_pred.shape[-1]
    masks_true = coords2mask(gt_true, length)
    if kernel is None:
        kernel = gaussian_kernel(kernel_size, sigma)
    blur = gaussian_blur1d(masks_true, kernel)
    # normalize by the GLOBAL max over the batch, then scale (main.py:230-231)
    blur = blur / (jnp.max(blur) if norm_max is None else norm_max
                   ) * mask_amplitude
    mse = jnp.mean(jnp.square(masks_pred - blur))
    l1 = jnp.mean(jnp.abs(masks_pred))
    return mse + lambda_value * l1, masks_true


def first_valid_toa(gt_sample: jnp.ndarray, gt_true: jnp.ndarray) -> jnp.ndarray:
    """Pick the earliest valid GT ToA per row (main.py:235-240: zeros are
    parked at 1e12 and argmin selects the smallest remaining index)."""
    zf = gt_true.astype(jnp.float32)
    z = jnp.where(gt_true == 0, jnp.asarray(1e12, jnp.float32), zf)
    idx = jnp.argmin(z, axis=-1, keepdims=True)
    return jnp.take_along_axis(gt_sample, idx, axis=-1).astype(jnp.float32)


def regression_loss(pred: jnp.ndarray, gt_sample: jnp.ndarray,
                    gt_true: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-echo regression MSE (Zonzini path). Returns (loss, target)."""
    target = first_valid_toa(gt_sample, gt_true)
    return jnp.mean(jnp.square(pred - target)), target
