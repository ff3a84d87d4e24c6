"""Delay-and-sum (DAS) beamforming for plane/diverging-wave ultrasound.

Parity target: /root/reference/utils/beamform.py — per TX angle, a virtual
source models the emission; per RX channel, travel distances map to
fractional sample indices which are linearly resampled, phase-rotated back
to RF (IQ inputs), masked by an F-number aperture, and summed. Angles are
compounded and log-compressed to a normalized B-mode.

TPU redesign: the reference loops channels in Python with host gathers
(beamform.py:52-93). Two observations drive this implementation:

1. Delays are pure geometry — static given (grid, elements, angle). They are
   precomputed host-side in float64 (the virtual-source construction
   subtracts two ~1e5 m distances, which catastrophically cancels in f32)
   and baked into the compiled program as constant tables.
2. The signal-dependent work is then just gather + lerp + phase rotate +
   masked channel-sum over a (P, K) tensor: one fused XLA program per
   angle, vmappable over frames.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp


class BeamformParams(NamedTuple):
    """Acquisition geometry (the reference's ``param`` object)."""

    xe: np.ndarray  # (K,) element x-positions [m]
    c: float  # speed of sound [m/s]
    fs: float  # sample rate [Hz]
    t0: float  # acquisition start time [s]
    f0: float  # demodulation frequency [Hz] (0 for RF input)
    angles_list: Sequence[float]  # TX steering angles [rad]


class DelayTable(NamedTuple):
    """Host-precomputed per-(pixel, channel) resampling constants."""

    idxf: np.ndarray  # (P, K) int32 floor sample index
    frac: np.ndarray  # (P, K) f32 fractional part
    invalid: np.ndarray  # (P, K) bool out-of-range mask
    phase: np.ndarray  # (P, K) complex64 IQ->RF rotation (or None)
    aperture: np.ndarray  # (P, K) bool F-number mask


def make_delay_table(
    params: BeamformParams,
    theta: float,
    x: np.ndarray,
    z: np.ndarray,
    n_samples: int,
    fnumber: float = 1.9,
    iq: bool = True,
) -> DelayTable:
    """Compute delays in f64 for one TX angle over flattened pixels x/z."""
    xe = np.asarray(params.xe, np.float64)
    x = np.asarray(x, np.float64)
    z = np.asarray(z, np.float64)

    # virtual source behind the array (non-planar wave assumption)
    beta = 1e-8
    width = xe[-1] - xe[0]
    vs_x = -width * np.cos(theta) * np.sin(theta) / beta
    vs_z = -width * np.cos(theta) ** 2 / beta

    dtx = np.hypot(x - vs_x, z - vs_z) - np.hypot(
        (abs(vs_x) - width / 2) * (abs(vs_x) > width / 2), vs_z
    )  # (P,)
    drx = np.hypot(x[:, None] - xe[None, :], z[:, None])  # (P, K)
    tau = (dtx[:, None] + drx) / params.c

    idxt = (tau - params.t0) * params.fs
    invalid = (idxt < 1) | (idxt > n_samples - 1)
    idx = np.where(invalid, 1.0, idxt)
    idxf = np.floor(idx).astype(np.int32)
    frac = (idx - idxf).astype(np.float32)

    phase = (np.exp(2j * np.pi * params.f0 * tau).astype(np.complex64)
             if iq else None)
    aperture = np.abs(x[:, None] - xe[None, :]) < (z[:, None] / fnumber / 2)
    return DelayTable(idxf, frac, invalid, phase, aperture)


def das_rx_apply(sig: jnp.ndarray, table: DelayTable) -> jnp.ndarray:
    """Beamform one TX event with precomputed delays. sig: (n_samples, K).

    The resample is a flattened 1-D gather (index = sample * K + channel),
    which measures ~25-35% faster on TPU than take_along_axis over the
    sample axis; the op remains gather-bound (TPU gathers don't vectorize
    like matmuls — a banded-interpolation-matmul Pallas kernel is the next
    step if beamforming ever dominates a pipeline).
    """
    k = sig.shape[1]
    flat = sig.ravel()
    base = jnp.asarray(table.idxf.astype(np.int32) * k
                       + np.arange(k, dtype=np.int32)[None, :])
    lo = jnp.take(flat, base)
    hi = jnp.take(flat, base + k)
    frac = jnp.asarray(table.frac)
    temp = lo * (1.0 - frac) + hi * frac
    temp = jnp.where(jnp.asarray(table.invalid), 0.0, temp)
    if jnp.iscomplexobj(sig) and table.phase is not None:
        temp = temp * jnp.asarray(table.phase)
    return jnp.sum(temp * jnp.asarray(table.aperture), axis=-1)  # (P,)


def das_rx_batch(sigs: jnp.ndarray, table: DelayTable) -> jnp.ndarray:
    """Beamform a BATCH of frames for one TX event: (F, N, K) -> (F, P).

    TPU-native reformulation of the per-pixel gather: per channel, linear
    resampling is a 2-band sparse (P, N) matrix (1-frac at idxf, frac at
    idxf+1, masked by validity*aperture) generated on the fly from an iota
    comparison; applying it to all frames at once is an (F, N) @ (N, P)
    MXU matmul. A lax.scan over channels accumulates the phase-rotated
    partial sums, so HBM never holds more than one channel's band matrix.

    Measured (v5e, P=15.8k px, K=128, N=1280, 3 angles, F=64): 1.27
    ms/frame vs 1.84 ms/frame for the frame-vmapped gather and ~270
    ms/frame for per-frame dispatch — use this whenever frames batch
    (PALA sequences always do). Exact vs :func:`das_rx_apply` to ~3e-6.

    Args:
        sigs: (F, N, K) real RF or complex IQ frames (device arrays).
        table: delay table from :func:`make_delay_table`.
    Returns: (F, P) beamformed pixels (complex when input/phase complex).
    """
    is_complex = jnp.iscomplexobj(sigs)
    sr = jnp.real(sigs).astype(jnp.float32)
    si = jnp.imag(sigs).astype(jnp.float32) if is_complex else None

    P, K = table.idxf.shape
    n = sigs.shape[1]
    f_frames = sigs.shape[0]
    idxf = jnp.asarray(table.idxf.astype(np.int32))
    frac = jnp.asarray(table.frac)
    mask = jnp.asarray((~table.invalid) & table.aperture)
    # phase rotation applies to IQ data only, matching das_rx_apply's
    # `iscomplexobj(sig) and phase is not None` guard (real RF through an
    # iq=True table must not be complexified)
    has_phase = table.phase is not None and is_complex
    if has_phase:
        ph_r = jnp.asarray(np.real(table.phase).astype(np.float32))
        ph_i = jnp.asarray(np.imag(table.phase).astype(np.float32))
    n_iota = jnp.arange(n, dtype=jnp.int32)

    def per_channel(acc, c):
        acc_r, acc_i = acc
        i0 = idxf[:, c][:, None]
        f = frac[:, c][:, None]
        m = mask[:, c][:, None].astype(jnp.float32)
        band = ((n_iota[None, :] == i0).astype(jnp.float32) * (1.0 - f)
                + (n_iota[None, :] == (i0 + 1)).astype(jnp.float32) * f) * m
        gr = sr[:, :, c] @ band.T  # (F, P)
        gi = si[:, :, c] @ band.T if is_complex else None
        if has_phase:
            pr, pi = ph_r[None, :, c], ph_i[None, :, c]
            rr = gr * pr - gi * pi
            ii = gr * pi + gi * pr
            return (acc_r + rr, acc_i + ii), None
        if is_complex:
            return (acc_r + gr, acc_i + gi), None
        return (acc_r + gr, acc_i), None

    zero = jnp.zeros((f_frames, P), jnp.float32)
    (out_r, out_i), _ = jax.lax.scan(per_channel, (zero, zero),
                                     jnp.arange(K))
    if is_complex:
        return out_r + 1j * out_i
    return out_r


def das_rx(
    sig: jnp.ndarray,
    params: BeamformParams,
    theta: float,
    x: np.ndarray,
    z: np.ndarray,
    fnumber: float = 1.9,
) -> jnp.ndarray:
    """Convenience: delay-table + apply for one TX angle (reference
    bf_das_rx signature, flattened pixels)."""
    table = make_delay_table(params, theta, np.asarray(x), np.asarray(z),
                             sig.shape[0], fnumber,
                             iq=jnp.iscomplexobj(sig))
    return das_rx_apply(sig, table)


def bf_das_batch(
    rf_iq: jnp.ndarray,
    params: BeamformParams,
    grid_x: np.ndarray,
    grid_z: np.ndarray,
    fnumber: float = 1.9,
) -> jnp.ndarray:
    """Batched B-mode beamforming: (F, n_angles, N, K) -> (F, Z, X) dB.

    Compounds angles with the banded-matmul path (:func:`das_rx_batch`);
    the per-frame normalization matches :func:`bf_das`.
    """
    xg, zg = np.meshgrid(np.asarray(grid_x), np.asarray(grid_z))
    xf, zf = xg.ravel(), zg.ravel()
    n_angles = rf_iq.shape[1]
    n = rf_iq.shape[2]

    acc = 0
    for a in range(n_angles):
        table = make_delay_table(params, float(params.angles_list[a]),
                                 xf, zf, n, fnumber,
                                 iq=jnp.iscomplexobj(rf_iq))
        acc = acc + das_rx_batch(rf_iq[:, a], table)  # (F, P)

    mag = jnp.abs(acc)
    bmode = 20.0 * jnp.log10(jnp.where(mag > 0, mag, 1.0))
    bmode = jnp.where(mag > 0, bmode, -jnp.inf)
    finite_min = jnp.min(jnp.where(jnp.isfinite(bmode), bmode, jnp.inf),
                         axis=1, keepdims=True)
    bmode = jnp.where(jnp.isfinite(bmode), bmode, finite_min)
    bmode = bmode - jnp.max(bmode, axis=1, keepdims=True)
    return bmode.reshape((rf_iq.shape[0],) + xg.shape)


def bf_das(
    rf_iq: jnp.ndarray,
    params: BeamformParams,
    grid_x: np.ndarray,
    grid_z: np.ndarray,
    compound: bool = True,
    fnumber: float = 1.9,
) -> jnp.ndarray:
    """Beamform a multi-angle acquisition to a normalized B-mode image.

    Args:
        rf_iq: (n_angles, n_samples, K).
        grid_x / grid_z: 1-D image axes (the reference meshgrids param_x/z).
    Returns (Z, X) dB image, or (n_angles, Z, X) when not compounding.
    """
    xg, zg = np.meshgrid(np.asarray(grid_x), np.asarray(grid_z))
    shape = xg.shape
    xf, zf = xg.ravel(), zg.ravel()

    frames = jnp.stack([
        das_rx(rf_iq[k], params, float(params.angles_list[k]), xf, zf,
               fnumber=fnumber)
        for k in range(len(params.angles_list))
    ])  # (n_angles, P)

    iq_frame = jnp.sum(frames, axis=0) if compound else frames

    mag = jnp.abs(iq_frame)
    bmode = 20.0 * jnp.log10(jnp.where(mag > 0, mag, 1.0))
    bmode = jnp.where(mag > 0, bmode, -jnp.inf)
    finite_min = jnp.min(jnp.where(jnp.isfinite(bmode), bmode, jnp.inf))
    bmode = jnp.where(jnp.isfinite(bmode), bmode, finite_min)
    bmode = bmode - jnp.max(bmode)
    return bmode.reshape(shape if compound else (len(params.angles_list),) + shape)
