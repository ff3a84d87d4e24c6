"""Pure-function signal ops (jnp / Pallas). All ops are jit-compatible with
static shapes and operate batched on the trailing (sample) axis."""

from stofnet_tpu.ops.hilbert import analytic_signal, hilbert_envelope
from stofnet_tpu.ops.shuffle import sample_shuffle, sample_unshuffle
from stofnet_tpu.ops.gaussian import gaussian_kernel, gaussian_blur1d
from stofnet_tpu.ops.peaks import (
    nms1d,
    threshold_scores,
    mask2coords,
    coords2mask,
    get_amplitudes,
)
from stofnet_tpu.ops.resample import linear_resample, upscale_1d, iq2rf

__all__ = [
    "analytic_signal",
    "hilbert_envelope",
    "sample_shuffle",
    "sample_unshuffle",
    "gaussian_kernel",
    "gaussian_blur1d",
    "nms1d",
    "threshold_scores",
    "mask2coords",
    "coords2mask",
    "get_amplitudes",
    "linear_resample",
    "upscale_1d",
    "iq2rf",
]
