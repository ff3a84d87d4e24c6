"""Golden tests: SVD clutter filter + DAS beamformer vs the reference
(pure-numpy modules, imported directly)."""

import numpy as np
import pytest
import jax.numpy as jnp

from stofnet_tpu.ops.svd_filter import svd_filter
from stofnet_tpu.ops.beamform import BeamformParams, bf_das, das_rx

from tests import reference

reference.add_to_path()


class AttrDict(dict):
    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__


def _bparams(param) -> BeamformParams:
    return BeamformParams(xe=param.xe, c=param.c, fs=param.fs, t0=param.t0,
                          f0=param.f0, angles_list=param.angles_list)


@pytest.mark.parametrize("lo,hi", [(4, -1), (2, 10)])
def test_svd_filter_matches_reference(rng, lo, hi):
    from utils.svd_filter import svd_filter as ref_svd

    z, x, t = 10, 8, 24
    iq = (rng.standard_normal((z, x, t)) +
          1j * rng.standard_normal((z, x, t))).astype(np.complex64)
    # add a strong static clutter component for a realistic spectrum
    clutter = (rng.standard_normal((z, x, 1)) * np.ones((1, 1, t))) * 10
    iq = iq + clutter.astype(np.complex64)

    ref = ref_svd(iq.astype(np.complex128), lo_cut=lo, hi_cut=hi)
    ours = np.asarray(svd_filter(jnp.asarray(iq), lo_cut=lo, hi_cut=hi))
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


def test_svd_filter_db_matches_numpy_svd(rng):
    """dB-threshold variant (PALA clutter_db knob) == plain numpy SVD with
    the same keep-mask; and it must actually remove static clutter."""
    from stofnet_tpu.ops.svd_filter import svd_filter_db

    f, cch, L = 12, 6, 48
    sig = rng.standard_normal((cch, L, f)).astype(np.float32)
    clutter = (rng.standard_normal((cch, L, 1)) *
               np.ones((1, 1, f))).astype(np.float32) * 30
    ens = sig + clutter

    x = np.reshape(ens.astype(np.float64), (-1, f), order="F")
    u, s, vh = np.linalg.svd(x, full_matrices=False)
    level = 20 * np.log10(s / s[0] + 1e-12)
    keep = level < -10.0
    expect = ((u[:, keep] * s[keep]) @ vh[keep]).reshape(ens.shape, order="F")

    got = np.asarray(svd_filter_db(jnp.asarray(ens), clutter_db=-10.0))
    np.testing.assert_allclose(got, expect, rtol=5e-3, atol=5e-3)

    # the dominant static component is >30x the signal; filtering must cut
    # the ensemble's energy by at least an order of magnitude
    assert np.linalg.norm(got) < 0.1 * np.linalg.norm(ens)


def test_das_rx_batch_matches_per_frame(rng):
    """Banded-matmul frame-batched beamforming == per-frame gather path."""
    from stofnet_tpu.ops.beamform import das_rx_batch, make_delay_table
    from stofnet_tpu.ops.beamform import das_rx_apply

    k, n, f = 16, 256, 5
    params = _make_acq(rng, n_angles=1, n_samples=n, k=k)[1]
    xg, zg = np.meshgrid(params.param_x, params.param_z)
    table = make_delay_table(
        _bparams(params), 0.05, xg.ravel(), zg.ravel(), n, iq=True)

    sigs = (rng.standard_normal((f, n, k)) +
            1j * rng.standard_normal((f, n, k))).astype(np.complex64)
    batched = np.asarray(das_rx_batch(jnp.asarray(sigs), table))
    for i in range(f):
        ref = np.asarray(das_rx_apply(jnp.asarray(sigs[i]), table))
        np.testing.assert_allclose(batched[i], ref, rtol=2e-4, atol=2e-4)


def test_das_rx_batch_real_rf(rng):
    """Real RF through an iq=True table: NO phase rotation, exactly like
    das_rx_apply and the reference's `np.any(~np.isreal(temp))` guard
    (utils/beamform.py:86-87) — real in, real out, both paths agree."""
    from stofnet_tpu.ops.beamform import (
        das_rx_apply, das_rx_batch, make_delay_table,
    )

    k, n, f = 8, 128, 3
    params = _make_acq(rng, n_angles=1, n_samples=n, k=k)[1]
    xg, zg = np.meshgrid(params.param_x, params.param_z)
    table = make_delay_table(
        _bparams(params), 0.0, xg.ravel(), zg.ravel(), n, iq=True)
    sigs = rng.standard_normal((f, n, k)).astype(np.float32)
    batched = np.asarray(das_rx_batch(jnp.asarray(sigs), table))
    assert not np.iscomplexobj(batched)
    for i in range(f):
        ref = np.asarray(das_rx_apply(jnp.asarray(sigs[i]), table))
        assert not np.iscomplexobj(ref)
        np.testing.assert_allclose(batched[i], ref, rtol=2e-4, atol=2e-4)


def test_bf_das_batch_matches_single(rng):
    from stofnet_tpu.ops.beamform import bf_das, bf_das_batch

    sig, params = _make_acq(rng, n_angles=2, n_samples=256, k=16)
    bp = _bparams(params)
    one = np.asarray(bf_das(jnp.asarray(sig), bp, params.param_x,
                            params.param_z))
    frames = jnp.asarray(np.stack([sig, sig * 0.5]))
    batch = np.asarray(bf_das_batch(frames, bp, params.param_x,
                                    params.param_z))
    np.testing.assert_allclose(batch[0], one, rtol=2e-3, atol=2e-3)
    # dB image is scale-invariant after per-frame normalization
    np.testing.assert_allclose(batch[1], one, rtol=2e-3, atol=2e-3)


def test_pala_clutter_filter_uses_ops(rng):
    """data/pala delegates to ops.svd_filter_db (one implementation)."""
    from stofnet_tpu.data.pala import PalaDatasetRf
    from stofnet_tpu.ops.svd_filter import svd_filter_db

    rf = rng.standard_normal((8, 2, 4, 32)).astype(np.float32)
    got = PalaDatasetRf._svd_clutter(rf, -6.0)
    expect = np.moveaxis(
        np.asarray(svd_filter_db(jnp.asarray(np.moveaxis(rf, 0, -1)), -6.0)),
        -1, 0)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def _make_acq(rng, n_angles=3, n_samples=256, k=16):
    c, fs = 1540.0, 5e6
    pitch = 3e-4
    xe = (np.arange(k) - (k - 1) / 2) * pitch
    angles = np.deg2rad([-5.0, 0.0, 5.0])[:n_angles]
    sig = (rng.standard_normal((n_angles, n_samples, k)) +
           1j * rng.standard_normal((n_angles, n_samples, k))).astype(np.complex128)
    param = AttrDict(
        param_x=np.linspace(xe[0], xe[-1], 20),
        param_z=np.linspace(1e-3, 8e-3, 25),
        xe=xe, c=c, fs=fs, t0=0.0, f0=fs / 4,
        Nelements=k, angles_list=angles,
    )
    return sig, param


def test_das_rx_matches_reference(rng):
    from utils.beamform import bf_das_rx

    sig, param = _make_acq(rng)
    x, z = np.meshgrid(param["param_x"], param["param_z"])
    param.theta = param.angles_list[1]
    ref = bf_das_rx(sig[1], param, x, z).reshape(x.shape, order="F")

    p = BeamformParams(xe=param.xe, c=param.c, fs=param.fs,
                       t0=param.t0, f0=param.f0,
                       angles_list=param.angles_list)
    ours = np.asarray(
        das_rx(jnp.asarray(sig[1].astype(np.complex64)), p,
               float(param.theta), x.ravel(), z.ravel())
    ).reshape(x.shape)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3 * np.abs(ref).max())


def test_bf_das_matches_reference(rng):
    from utils.beamform import bf_das as ref_bf_das

    sig, param = _make_acq(rng)
    ref = ref_bf_das(sig, param, compound_opt=True)

    p = BeamformParams(xe=param.xe, c=param.c, fs=param.fs,
                       t0=param.t0, f0=param.f0,
                       angles_list=param.angles_list)
    ours = np.asarray(bf_das(jnp.asarray(sig.astype(np.complex64)), p,
                             param["param_x"], param["param_z"]))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-3)
