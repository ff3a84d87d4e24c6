"""GradPeak: non-trainable classical detector behind the model switch.

Parity target: /root/reference/models/gradpeak.py:119-133. Returns per-echo
peak positions (or onsets with ``onset_opt``) as a (B, max_echoes) tensor;
zero slots mean "no echo" (the shared invalid convention).

Note: where the reference aborts the whole batch when one row has no
candidate pairs (gradpeak.py:56-57 returns an empty tensor), we emit an
all-zero row for that frame — the vectorized pipeline has no failure mode.
"""

from __future__ import annotations

from typing import Optional

from stofnet_tpu.ops.gradpeak import toa_detect


class GradPeak:
    """Callable matching the flax-model apply signature (no parameters)."""

    def __init__(self, threshold: Optional[float] = None,
                 rescale_factor: int = 1, echo_max: Optional[int] = None,
                 onset_opt: bool = False, max_echoes: int = 64):
        self.threshold = threshold
        self.rescale_factor = rescale_factor
        self.echo_max = echo_max
        self.onset_opt = onset_opt
        self.max_echoes = max_echoes

    def init(self, *_args, **_kw):
        return {"params": {}}

    def apply(self, _variables, x, **_kw):
        frame = x.squeeze(1) if x.ndim == 3 else x
        echoes = toa_detect(
            frame, threshold=self.threshold,
            rescale_factor=self.rescale_factor, echo_max=self.echo_max,
            max_echoes=self.max_echoes,
        )
        col = 0 if self.onset_opt else 1
        return echoes[..., col]

    def __call__(self, x):
        return self.apply({}, x)
