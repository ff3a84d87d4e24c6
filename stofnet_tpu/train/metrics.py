"""Tolerance-matched ToA metrics, fully vectorized.

Parity target: /root/reference/utils/metrics.py:9-41 (``toa_rmse``). The
reference loops over batch rows because its detection lists are ragged; here
both GT and estimates are fixed-width tensors with 0/NaN/Inf marking invalid
slots, so the all-pairs match runs as one (B, G, E) broadcast on device —
no host sync inside the eval step.

NaN semantics are preserved exactly: rows where either side has no valid
entries produce mes=tp=fp=fn=0 (hence jaccard/precision/recall = 0/0 = NaN),
and a valid row with no match within tolerance has mes = NaN (mean of an
empty set).
"""

from __future__ import annotations

import jax.numpy as jnp


def _valid(x: jnp.ndarray) -> jnp.ndarray:
    return (x != 0) & jnp.isfinite(x)


def toa_rmse(gt_samples: jnp.ndarray, es_samples: jnp.ndarray, tol: float = 1.0):
    """Match GT ToAs to nearest estimates; returns (B, 7) float32 of
    [rmse, precision, recall, jaccard, tp, fp, fn] per row."""
    gt = jnp.asarray(gt_samples, jnp.float32)
    es = jnp.asarray(es_samples, jnp.float32)
    if gt.ndim == 1:
        gt = gt[:, None]
    if es.ndim == 1:
        es = es[:, None]

    gt_ok = _valid(gt)
    es_ok = _valid(es)
    row_ok = gt_ok.any(-1) & es_ok.any(-1)

    gtc = jnp.where(gt_ok, gt, 0.0)
    esc = jnp.where(es_ok, es, jnp.inf)

    d = jnp.square(gtc[:, :, None] - esc[:, None, :])  # (B, G, E)
    mins = jnp.min(d, axis=-1)  # inf where no valid estimate

    matched = (mins <= tol) & gt_ok
    unmatched = (mins > tol) & gt_ok

    tp = jnp.where(row_ok, matched.sum(-1), 0).astype(jnp.float32)
    fn = jnp.where(row_ok, unmatched.sum(-1), 0).astype(jnp.float32)
    fp = jnp.where(row_ok, es_ok.sum(-1).astype(jnp.float32) - tp, 0.0)

    msum = jnp.sum(jnp.where(matched, mins, 0.0), axis=-1)
    mes = jnp.sqrt(msum / tp)  # tp==0 -> NaN (torch mean of empty set)
    mes = jnp.where(row_ok, mes, 0.0)

    jaccard = tp / (fn + tp + fp) * 100.0
    precision = tp / (fp + tp) * 100.0
    recall = tp / (fn + tp) * 100.0

    return jnp.stack([mes, precision, recall, jaccard, tp, fp, fn], axis=-1)
