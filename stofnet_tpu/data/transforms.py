"""Host-side data augmentation.

Parity targets: /root/reference/utils/transforms.py — NormalizeVol (:7-18),
AddNoise (:21-38, SNR-scaled uniform noise), CropChannelData (:41-100,
random crop window around the GT ToA with shift, zero-pad or resize). These
run in the numpy input pipeline (per worker / per item), matching the
reference's distributions; bitwise RNG parity with torch workers is a
non-goal (SURVEY.md "hard parts").

Every transform is ``(waveform, gt, rng=None) -> (waveform, gt)``; gt may
be None. Randomized transforms draw from the per-call ``rng`` when given —
datasets pass a generator derived from (seed, item index), which makes
augmentation (a) thread-safe under the thread-pool DataLoader (a shared
Generator is not) and (b) reproducible independent of loading order — or
fall back to their constructor-time generator.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class NormalizeVol:
    """Scale to unit peak amplitude."""

    def __call__(self, waveform: np.ndarray, gt=None, rng=None):
        return waveform / np.abs(waveform).max(), gt


class AddNoise:
    """Add uniform noise at the given SNR [dB]; zero-mean for bipolar
    signals, positive-mean for envelopes (the reference's (.5,2)/(0,1)).

    SNR normalizer semantics (utils/transforms.py:33): the reference uses
    python's builtin ``sum`` — identical to our global ``np.sum`` for the
    1-D items every chirp transform actually receives
    (chirp_dataset.py:126 feeds (L,) waveforms; exact same-noise golden in
    tests/test_data.py). On a RANK-2 input builtin sum collapses axis 0
    only, making the reference normalizer per-sample-position — a quirk
    reachable only through the lost PALA submodule's unknown item rank;
    we keep the global-sum (true SNR) semantics there."""

    def __init__(self, snr: float = 40, rng: Optional[np.random.Generator] = None):
        self.snr = snr
        self.rng = rng or np.random.default_rng()

    def __call__(self, waveform: np.ndarray, gt=None, rng=None):
        rng = rng or self.rng
        mean, spread = (0.5, 2.0) if (waveform < 0).any() else (0.0, 1.0)
        noise = spread * (rng.random(waveform.shape) - mean)
        scale = (10 ** (-self.snr / 10)
                 * (np.sum(waveform ** 2) / np.sum(noise ** 2))) ** 0.5
        return waveform + noise * scale, gt


class CropChannelData:
    """Randomly crop a ``ratio`` window around the GT ToA (shifted within
    bounds), then zero-pad (or resize) back to the original length; the GT
    sample index shifts accordingly."""

    def __init__(self, ratio: Optional[float] = None, resize: bool = False,
                 rng: Optional[np.random.Generator] = None):
        self.resize = resize
        self.rng = rng or np.random.default_rng()
        # reference semantics (utils/transforms.py:62): with ratio=None the
        # first draw STICKS — every later item crops with the same width.
        # Drawn HERE (not lazily in __call__) so the run-wide width is a
        # deterministic function of the construction rng: under the
        # threaded loader a lazy first draw races on which item's per-item
        # rng gets there first, making ratio=None runs irreproducible.
        self.ratio = float(self.rng.random()) if ratio is None else ratio

    def __call__(self, waveform: np.ndarray, gt: float, rng=None):
        if gt is None:  # no ToA to anchor the crop on (e.g. PALA items)
            return waveform, gt
        rng = rng or self.rng
        ratio = self.ratio
        if not (0 < ratio < 1):
            return waveform, gt

        size = waveform.shape[0]
        width = int(round(size * ratio))
        ref = int(round(float(gt)))

        start = max(0, ref - width // 2)
        end = min(ref + width // 2, size)
        if end == size:
            start = end - width
        if start == 0:
            end = width

        # random shift keeping the window around the reference index
        max_dist = min(ref - start, end - ref)
        lo = -min(start, max_dist // 2)
        hi = min(size - end, max_dist // 2)
        shift = int(rng.integers(lo, hi)) if hi > lo else lo
        start += shift
        end += shift

        cropped = waveform[start:end]
        gt = gt - start

        if self.resize:
            factor = size / cropped.shape[0]
            x = np.linspace(0, cropped.shape[0], cropped.shape[0])
            t = np.linspace(0, cropped.shape[0], size)
            cropped = np.interp(t, x, cropped)
            gt = gt * factor
        else:
            cropped = np.pad(cropped, (0, size - cropped.shape[0]))
        return cropped, gt


class Compose:
    """Apply transforms in order, threading (waveform, gt[, rng])."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, waveform, gt=None, rng=None):
        for t in self.transforms:
            waveform, gt = t(waveform, gt, rng=rng)
        return waveform, gt
