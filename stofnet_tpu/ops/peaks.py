"""Heatmap <-> sparse echo-coordinate decoding with static shapes.

Parity targets: /root/reference/utils/mask2samples.py —
``nms_1d`` (:5-11), ``thresholding`` (:14-23), ``mask2coords`` (:81-114),
``coords2mask`` (:139-148), ``get_amplitudes`` (:135-136),
``reduce_echoes`` (:117-132).

TPU redesign: the reference builds ragged per-channel detection lists with a
Python loop (mask2samples.py:95) which forces a device->host sync every step.
Here detections live in a fixed ``(B, MAX_ECHOES)`` tensor: after NMS +
thresholding we take ``top_k`` survivors per row (ranked by score so that any
overflow beyond MAX_ECHOES drops the weakest detections — the same rule as
the reference's ``reduce_echoes`` amplitude pruning), then re-sort them by
sample position. Invalid slots are 0, the reference's own padding value
(mask2coords pads with zeros; metrics.py:6 treats 0 as invalid). Results are
bit-identical to the reference whenever the true detection count per row is
<= MAX_ECHOES.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def nms1d(scores: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """Non-maximum suppression over the last axis.

    ``window_size`` is rounded up to odd. A score survives iff it equals the
    sliding-window max (ties all survive, like the reference's equality test).
    """
    w = window_size // 2 * 2 + 1
    pad = (w - 1) // 2
    window = (1,) * (scores.ndim - 1) + (w,)
    strides = (1,) * scores.ndim
    padding = [(0, 0)] * (scores.ndim - 1) + [(pad, pad)]
    mx = lax.reduce_window(scores, -jnp.inf, lax.max, window, strides, padding)
    return jnp.where(scores == mx, scores, jnp.zeros_like(scores))


def threshold_scores(
    scores: jnp.ndarray, threshold: Optional[float] = None
) -> jnp.ndarray:
    """Zero out sub-threshold scores; with no/zero threshold keep only each
    row's maximum (the reference's ``if threshold:`` falsy semantics).

    ``threshold`` may also be a traced 0-d array (so decode vmaps over a
    threshold vector — parallel/array.py's one-program threshold sweep).
    The falsy per-row-max mode is a structural branch, so it applies only
    to concrete values; a traced threshold must be a real (> 0) value.
    """
    from jax.core import Tracer

    if threshold is None or (not isinstance(threshold, Tracer)
                             and not threshold):
        mx = jnp.max(scores, axis=-1, keepdims=True)
        return jnp.where(scores < mx, jnp.zeros_like(scores), scores)
    return jnp.where(scores < threshold, jnp.zeros_like(scores), scores)


def mask2coords(
    scores: jnp.ndarray,
    window_size: int,
    threshold: Optional[float] = None,
    upsample_factor: int = 1,
    max_echoes: int = 64,
) -> jnp.ndarray:
    """Decode a heatmap into per-row echo sample positions.

    Args:
        scores: (B, L) or (B, 1, L) heatmap.
        window_size: NMS window (rounded up to odd).
        threshold: fixed threshold, or falsy for per-row-max-only mode.
        upsample_factor: positions are divided by this at the end.
        max_echoes: static detection budget per row.

    Returns:
        (B, max_echoes) float positions (/= upsample_factor), ascending per
        row, zero-padded. Slot value 0 means "no detection" (reference
        convention).
    """
    if scores.ndim == 3:
        scores = scores.squeeze(1)
    sup = threshold_scores(nms1d(scores, window_size), threshold)

    # Rank nonzero survivors above empty slots regardless of sign: a genuine
    # (possibly negative) detection must beat the zero background.
    neg_inf = jnp.asarray(-jnp.inf, dtype=sup.dtype)
    key = jnp.where(sup != 0, sup, neg_inf)
    vals, idx = lax.top_k(key, max_echoes)
    valid = vals > neg_inf

    # re-sort selected detections by sample position, invalid slots last
    big = jnp.asarray(scores.shape[-1] + 1, dtype=jnp.int32)
    pos = jnp.where(valid, idx.astype(jnp.int32), big)
    pos = jnp.sort(pos, axis=-1)
    coords = jnp.where(pos >= big, 0, pos).astype(jnp.float32)
    return coords / upsample_factor


def batch_mask2coords(
    scores: jnp.ndarray,
    window_size: int,
    threshold: Optional[float] = None,
    upsample_factor: int = 1,
    max_echoes: int = 64,
) -> jnp.ndarray:
    """3-D variant (reference mask2samples.py:54-78): (B, C, L) heatmaps ->
    (B, C, max_echoes) per-channel coordinates."""
    b, c, l = scores.shape
    flat = mask2coords(scores.reshape(b * c, l), window_size, threshold,
                       upsample_factor, max_echoes)
    return flat.reshape(b, c, max_echoes)


def coords_to_nested_list(coords) -> list:
    """Ragged python lists of valid detections per row (the reference's slow
    mask2nested_list output shape; debugging/reporting convenience)."""
    import numpy as np

    coords = np.asarray(coords)
    if coords.ndim == 2:
        coords = coords[:, None, :]
    return [[row[row != 0].tolist() for row in frame] for frame in coords]


def coords2mask(samples: jnp.ndarray, length: int) -> jnp.ndarray:
    """Scatter 1s at integer sample positions -> (..., length) spike mask.

    Index 0 is the reference's NaN/invalid parking slot and is forced to 0
    (mask2samples.py:139-148); negative positions are clamped to it.
    Positions >= length are DROPPED (no spike): the reference raises an
    index error there, which a jitted static-shape op cannot, and a
    clamped phantom spike at length-1 would silently corrupt the training
    mask — dropping is the loss-neutral equivalent of "don't do that".
    """
    s = jnp.where(samples.astype(jnp.int32) < 0, 0,
                  samples.astype(jnp.int32))
    onehot = (s[..., None] == jnp.arange(length, dtype=jnp.int32)).any(axis=-2)
    mask = onehot.astype(jnp.float32)
    return mask.at[..., 0].set(0.0)


def get_amplitudes(frames: jnp.ndarray, samples: jnp.ndarray) -> jnp.ndarray:
    """Gather frame values at (rounded) sample positions along the last axis."""
    idx = jnp.clip(jnp.round(samples).astype(jnp.int32), 0, frames.shape[-1] - 1)
    return jnp.take_along_axis(frames, idx, axis=-1)
