"""Ideal-threshold search via ROC g-mean.

Parity target: /root/reference/utils/threshold.py:6-28, which runs sklearn's
``roc_curve`` on the first batch element and maximizes sqrt(tpr * (1-fpr)).
This is a logging-only diagnostic, so it runs host-side in numpy (no sklearn
dependency): thresholds walk the descending unique scores, with the
conventional leading (fpr=0, tpr=0) point at threshold max+1.
"""

from __future__ import annotations

import numpy as np


def roc_curve(y_true: np.ndarray, y_score: np.ndarray):
    """Minimal ROC matching sklearn's defaults: distinct score cuts with
    collinear intermediate points dropped (drop_intermediate=True), plus the
    conventional leading (0, 0) point."""
    order = np.argsort(-y_score, kind="stable")
    y = y_true[order].astype(np.float64)
    s = y_score[order].astype(np.float64)

    tps = np.cumsum(y)
    fps = np.cumsum(1.0 - y)
    # keep the last index of each distinct score (threshold boundary)
    distinct = np.r_[np.nonzero(np.diff(s))[0], s.size - 1]
    tps, fps, thr = tps[distinct], fps[distinct], s[distinct]

    if tps.size > 2:  # drop points collinear in the (fps, tps) staircase
        keep = np.r_[True,
                     np.logical_or(np.diff(fps, 2), np.diff(tps, 2)) != 0,
                     True]
        tps, fps, thr = tps[keep], fps[keep], thr[keep]

    p = tps[-1] if tps[-1] > 0 else 1.0
    n = fps[-1] if fps[-1] > 0 else 1.0
    tpr = np.r_[0.0, tps / p]
    fpr = np.r_[0.0, fps / n]
    thresholds = np.r_[thr[0] + 1.0, thr]
    return fpr, tpr, thresholds


def find_threshold(masks_pred, masks_true, window_size: int = 0,
                   norm_opt: bool = False) -> float:
    """G-mean-optimal threshold on the first batch element.

    NB: with norm_opt the reference normalizes by the min/max of the WHOLE
    batch tensor, then evaluates the ROC on element 0 (threshold.py:12-14).
    """
    full = np.asarray(masks_pred, dtype=np.float64)
    scores = full[0].ravel().copy()
    if norm_opt:
        scores -= full.min()
        mx = (full - full.min()).max()
        if mx != 0:
            scores /= mx
    else:
        scores[scores < 0] = 0.0

    truth = np.asarray(masks_true[0], dtype=np.float64).ravel()
    max_val = truth.max() if truth.max() != 0 else 1.0
    labels = (truth == max_val).astype(np.float64)

    fpr, tpr, thresholds = roc_curve(labels, scores)
    gmeans = np.sqrt(tpr * (1.0 - fpr))
    return float(thresholds[int(np.argmax(gmeans))])
