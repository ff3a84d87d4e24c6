"""Gradient-based echo detection (classical GradPeak pipeline), vectorized.

Parity target: /root/reference/models/gradpeak.py — Hilbert envelope ->
``torch.gradient`` (spacing = 5*rescale//6... actually rescale//6*5) ->
Gaussian smoothing -> hysteresis thresholding (auto threshold
``std**16 * 1.2e13``, negative = -th/4) -> pairing of rising(+)/rising(-)
edges under interval + uniqueness constraints -> per-echo
(onset, peak, amplitude).

TPU redesign: the reference pairs edges with a Python loop per batch row
(gradpeak.py:35-63). Here every stage is a static-shape tensor op:
edge positions live in fixed (B, MAX_EDGES) slots (invalid = sentinel),
pairing is an all-pairs (MAX_EDGES, MAX_EDGES) argmin, and the uniqueness
constraint is an O(K^2) masked comparison — all fused by XLA, no host sync.
Validity envelope: results match the reference exactly while per-row edge
counts stay <= max_edges AND kept pairs stay <= max_echoes; beyond
max_echoes the WEAKEST-amplitude pairs are dropped (the reference returns
a ragged row; since its echo_max pruning selects by amplitude,
strongest-first truncation preserves the reference's picks — verified
end-to-end in tests/test_eval_protocol_parity.py where the tiny
auto-threshold yields ~90 pairs/row). toa_detect sizes max_edges
adaptively with the waveform length (capped at 2048).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from jax import lax

from stofnet_tpu.ops.hilbert import hilbert_envelope

_BIG = jnp.int32(2 ** 30)


def gradient1d(y: jnp.ndarray, spacing: float = 1.0) -> jnp.ndarray:
    """torch.gradient semantics: central differences over 2*spacing inside,
    one-sided over spacing at the edges."""
    interior = (y[..., 2:] - y[..., :-2]) / (2.0 * spacing)
    left = (y[..., 1:2] - y[..., 0:1]) / spacing
    right = (y[..., -1:] - y[..., -2:-1]) / spacing
    return jnp.concatenate([left, interior, right], axis=-1)


def gaussian_smooth(y: jnp.ndarray, sigma: float, num_sigmas: float = 3.0):
    """Gaussian filter with radius int(num_sigmas*sigma)+1 (reference
    gaussian_kernel_1d ceil convention); kernel built host-side in f64."""
    radius = int(num_sigmas * sigma) + 1
    support = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (support / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    kern = jnp.asarray(k).reshape(1, 1, -1)
    b = y.shape[0]
    out = lax.conv_general_dilated(
        y.reshape(b, 1, -1), kern, window_strides=(1,),
        padding=[(radius, radius)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(y.shape)


def _first_indices(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """First k True positions per row, ascending; invalid slots = _BIG."""
    n = mask.shape[-1]
    pos = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), _BIG)
    return lax.top_k(-pos, k)[0] * -1  # k smallest, ascending


def grad_peak_detect(
    data: jnp.ndarray,
    grad_step: int = 2,
    threshold: Optional[float] = None,
    ival_smin: Optional[int] = None,
    ival_smax: Optional[int] = None,
    max_echoes: int = 64,
    max_edges: int = 128,
) -> jnp.ndarray:
    """Detect echoes in envelopes ``data`` (B, L).

    Returns (B, max_echoes, 3) of (onset, peak, amplitude); empty slots are
    all-zero rows (the reference's padding value).
    """
    grad = gradient1d(data, float(grad_step))
    grad = gaussian_smooth(grad, sigma=(grad_step * 2 - 1) / 6.0)

    if threshold is not None:
        thres_pos = jnp.asarray(threshold, grad.dtype)
    else:
        # global batch statistic, unbiased std like torch.Tensor.std()
        thres_pos = (jnp.std(grad, ddof=1) ** 16) * 1.2e13
    thres_neg = -thres_pos / 4.0

    # reference uses the heuristic fallback unless BOTH bounds are given
    # (gradpeak.py:20: `if ival_smin is not None and ival_smax is not None`)
    if ival_smin is not None and ival_smax is not None:
        ival_lo, ival_hi = ival_smin, ival_smax
    else:
        ival_lo, ival_hi = grad_step // 2, grad_step * 3

    plus = grad > thres_pos
    minu = grad < thres_neg
    # rising edges of each region: False->True transitions at diff index i
    rise_p = (~plus[..., :-1]) & plus[..., 1:]
    rise_m = (~minu[..., :-1]) & minu[..., 1:]

    ap = _first_indices(rise_p, max_edges)  # (B, K) ascending, _BIG invalid
    am = _first_indices(rise_m, max_edges)
    ap_ok = ap < _BIG
    am_ok = am < _BIG

    # for each negative edge, nearest preceding positive edge
    dmat = am[:, None, :] - ap[:, :, None]  # (B, Kap, Kam)
    dmat = jnp.where(dmat < 0, _BIG, dmat)
    dmat = jnp.where(ap_ok[:, :, None], dmat, _BIG)
    sel = jnp.argmin(jnp.abs(dmat), axis=1)  # (B, Kam)
    ap_sel = jnp.take_along_axis(ap, sel, axis=-1)

    gaps = am - ap_sel
    valid = am_ok & (gaps > ival_lo) & (gaps < ival_hi)

    # uniqueness: first (earliest-am) pair per distinct onset
    eq = ap_sel[:, :, None] == ap_sel[:, None, :]  # (B, Kam, Kam)
    k = ap_sel.shape[-1]
    earlier = jnp.tril(jnp.ones((k, k), bool), k=-1)
    dup = (eq & earlier[None] & valid[:, None, :]).any(-1)
    keep = valid & ~dup

    # compact kept pairs into max_echoes slots. When a row has MORE kept
    # pairs than slots (tiny auto-thresholds on noisy data), keep the
    # STRONGEST-amplitude pairs — the reference keeps all pairs (ragged)
    # and its echo_max pruning then picks by amplitude (gradpeak.py:107-114),
    # so truncating by arrival time instead would silently drop strong deep
    # echoes that the reference finds. Slots are then ordered by ascending
    # peak time with empty slots last (the unpruned reference layout).
    amp_all = jnp.take_along_axis(
        data, jnp.clip(am, 0, data.shape[-1] - 1), axis=-1)
    strength = jnp.where(keep, amp_all, -jnp.inf)
    top = lax.top_k(strength, max_echoes)[1]  # strongest kept pairs
    kept_t = jnp.take_along_axis(keep, top, axis=-1)
    am_t = jnp.take_along_axis(am, top, axis=-1)
    tkey = jnp.where(kept_t, am_t, _BIG)
    order = jnp.take_along_axis(top, jnp.argsort(tkey, axis=-1), axis=-1)

    onset = jnp.take_along_axis(ap_sel, order, axis=-1)
    peak = jnp.take_along_axis(am, order, axis=-1)
    kept = jnp.take_along_axis(keep, order, axis=-1)

    peak_c = jnp.clip(peak, 0, data.shape[-1] - 1)
    amp = jnp.take_along_axis(data, peak_c, axis=-1)

    onset = jnp.where(kept, onset, 0).astype(jnp.float32)
    peak = jnp.where(kept, peak, 0).astype(jnp.float32)
    amp = jnp.where(kept, amp, 0.0)
    return jnp.stack([onset, peak, amp], axis=-1)


def reduce_echoes(echoes: jnp.ndarray, echo_max: int,
                  time_col: int = 1, amp_col: int = -1) -> jnp.ndarray:
    """Keep the echo_max strongest echoes, re-sorted by arrival time
    (reference gradpeak.py:107-114 / mask2samples.py:117-132)."""
    if echo_max >= echoes.shape[1]:
        return echoes
    valid = echoes[..., time_col] > 0
    amp_key = jnp.where(valid, echoes[..., amp_col], -jnp.inf)
    top = lax.top_k(amp_key, echo_max)[1]  # strongest echo_max
    picked = jnp.take_along_axis(echoes, top[..., None], axis=1)
    pvalid = jnp.take_along_axis(valid, top, axis=1)
    # re-sort by raw ToA ascending: zero-padded (invalid) rows sort FIRST,
    # exactly like the reference's argsort over zero-padded echoes
    # (gradpeak.py:112-114)
    tkey = jnp.where(pvalid, picked[..., time_col], 0.0)
    order = jnp.argsort(tkey, axis=-1)
    out = jnp.take_along_axis(picked, order[..., None], axis=1)
    ovalid = jnp.take_along_axis(pvalid, order, axis=1)
    return jnp.where(ovalid[..., None], out, 0.0)


def toa_detect(
    frame: jnp.ndarray,
    threshold: Optional[float] = None,
    rescale_factor: int = 1,
    echo_max: Optional[int] = None,
    max_echoes: int = 64,
    max_edges: Optional[int] = None,
) -> jnp.ndarray:
    """Full classical pipeline on raw RF frames (B, L): envelope ->
    grad_peak_detect -> optional strongest-echo pruning."""
    env = hilbert_envelope(frame)
    # reference computes grad_step = rescale_factor//6*5 (gradpeak.py:103),
    # which is 0 for rescale_factor < 6 and makes torch.gradient(spacing=0)
    # crash — i.e. the reference's GradPeak DEFAULT (rescale_factor=1) is
    # unrunnable upstream. Substitute grad_peak_detect's documented default
    # spacing (2, gradpeak.py:13) so the default config works here; for
    # rescale_factor >= 6 the spacing matches the reference exactly.
    if max_edges is None:
        # the reference's edge lists are ragged/unbounded; size the static
        # slots to the waveform so deep echoes survive even when the tiny
        # auto-threshold (std**16*1.2e13 on normalized data) admits noise
        # edges all along the record. O(max_edges^2) pairing: capped at 2048.
        max_edges = int(min(2048, max(128, -(-frame.shape[-1] // 8) )))
    echoes = grad_peak_detect(
        env,
        grad_step=rescale_factor // 6 * 5 if rescale_factor // 6 * 5 > 0 else 2,
        ival_smin=rescale_factor,
        ival_smax=50 * rescale_factor,
        threshold=threshold,
        max_echoes=max_echoes,
        max_edges=max_edges,
    )
    if echo_max is not None and echo_max < max_echoes:
        echoes = reduce_echoes(echoes, echo_max)
    return echoes
