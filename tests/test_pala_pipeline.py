"""End-to-end PALA ultrasound-localization pipeline (BASELINE config #4):
synthetic RF ensemble -> SVD clutter filter -> DAS beamform -> B-mode with
bright spots at scatterer positions; plus per-channel ToF estimation on the
same frames (GradPeak path)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stofnet_tpu.data.pala import PalaDatasetRf, generate_pala_dataset
from stofnet_tpu.ops.beamform import BeamformParams, bf_das
from stofnet_tpu.ops.svd_filter import svd_filter
from stofnet_tpu.ops.gradpeak import toa_detect
from stofnet_tpu.train.metrics import toa_rmse


@pytest.fixture(scope="module")
def pala(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe") / "pala_synth"
    generate_pala_dataset(root, n_sequences=1, n_frames=6, n_targets=2,
                          n_channels=32, n_samples=512)
    ds = PalaDatasetRf(root, sequences=[0], rescale_factor=1, ch_gap=1)
    return ds


def test_beamform_localizes_scatterers(pala):
    ds = pala
    frame, _, gt, _, _, _ = ds[0]  # (angles, C, L)

    xe = np.asarray(ds.get_key("xe"))
    params = BeamformParams(
        xe=xe, c=float(ds.get_key("c")), fs=float(ds.get_key("fs")),
        t0=float(ds.get_key("t0")), f0=float(ds.get_key("f0")),
        angles_list=np.asarray(ds.get_key("angles_list")),
    )
    gx = np.linspace(xe[0], xe[-1], 48)
    c, fs = params.c, params.fs
    zmax = 0.5 * frame.shape[-1] / fs * c
    gz = np.linspace(0.05 * zmax, zmax, 64)

    rf = jnp.asarray(np.transpose(frame, (0, 2, 1)))  # (angles, L, C)
    bmode = np.asarray(bf_das(rf, params, gx, gz))
    assert bmode.shape == (64, 48)
    assert bmode.max() == 0.0  # normalized to 0 dB peak

    # the true scatterers were planted by the generator at known (x, z);
    # recover them from the per-channel GT delays via the mid channel
    pos = ds.positions[0]
    pts = pos[~np.isnan(pos[:, 0])]
    for px, pz in pts:
        xi = np.abs(gx - px).argmin()
        zi = np.abs(gz - pz).argmin()
        region = bmode[max(0, zi - 4): zi + 5, max(0, xi - 4): xi + 5]
        assert region.max() > -12.0, (
            f"no bright spot near scatterer ({px:.4f},{pz:.4f}): "
            f"{region.max():.1f} dB")


def test_svd_filter_removes_static_clutter(pala):
    ds = pala
    frames = np.stack([ds[i][0][1] for i in range(len(ds))])  # (F, C, L) wave1
    clutter = 25.0 * np.sin(np.linspace(0, 20, frames.shape[-1]))[None, None]
    noisy = frames + clutter  # static across frames = rank-1 slow-time

    ens = jnp.asarray(np.transpose(noisy, (1, 2, 0)))  # (C, L, F)
    filt = np.asarray(svd_filter(ens, lo_cut=1, hi_cut=None))
    resid = np.transpose(filt, (2, 0, 1))

    # static clutter must be strongly suppressed while echoes survive
    clutter_power_before = np.mean((noisy - frames) ** 2)
    clutter_leak = np.mean((resid - frames) ** 2)
    assert clutter_leak < 0.05 * clutter_power_before


def test_gradpeak_toa_on_pala_channels(pala):
    ds = pala
    frame, _, gt, _, _, _ = ds[0]
    wv = 1
    x = jnp.asarray(frame[wv])  # (C, L)
    echoes = toa_detect(x, threshold=0.01, rescale_factor=6, max_echoes=16)
    peaks = np.asarray(echoes[..., 1])  # (C, max_echoes)

    m = np.asarray(toa_rmse(jnp.asarray(gt[wv]), jnp.asarray(peaks),
                            tol=36.0))  # within 6 samples
    recall = np.nanmean(m[:, 2])
    assert recall > 60.0, f"GradPeak recall too low: {recall}"
