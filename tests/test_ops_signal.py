"""Golden tests: hilbert / shuffle / gaussian / resample vs the reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from stofnet_tpu.ops import (
    analytic_signal,
    hilbert_envelope,
    sample_shuffle,
    sample_unshuffle,
    gaussian_kernel,
    gaussian_blur1d,
    linear_resample,
    upscale_1d,
    iq2rf,
)

from tests import reference

torch = pytest.importorskip("torch")
reference.add_to_path()


@pytest.mark.parametrize("n", [64, 127, 1000, 8000])
def test_analytic_signal_matches_reference(rng, n):
    from utils.hilbert import hilbert_transform

    y = rng.standard_normal((3, n)).astype(np.float32)
    ours = np.asarray(analytic_signal(jnp.asarray(y)))
    ref = hilbert_transform(torch.from_numpy(y)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_envelope_is_abs_analytic(rng):
    y = rng.standard_normal((2, 256)).astype(np.float32)
    env = np.asarray(hilbert_envelope(jnp.asarray(y)))
    np.testing.assert_allclose(env, np.abs(np.asarray(analytic_signal(y))), rtol=1e-6)


@pytest.mark.parametrize("r,c,w", [(4, 1, 100), (2, 3, 64), (4, 16, 128)])
def test_sample_shuffle_matches_reference(rng, r, c, w):
    from utils.sample_shuffle import SampleShuffle1D

    x = rng.standard_normal((2, r * c, w)).astype(np.float32)
    ours = np.asarray(sample_shuffle(jnp.asarray(x), r))
    ref = SampleShuffle1D(r)(torch.from_numpy(x)).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_sample_shuffle_roundtrip(rng):
    x = rng.standard_normal((2, 8, 50)).astype(np.float32)
    y = sample_unshuffle(sample_shuffle(jnp.asarray(x), 4), 4)
    np.testing.assert_array_equal(np.asarray(y), x)


@pytest.mark.parametrize("size,sigma", [(7, 1.0), (5, 2.0), (9, 0.5), (6, 1.0)])
def test_gaussian_kernel_matches_reference(size, sigma):
    from utils.gaussian import gaussian_kernel as ref_kernel

    ours = np.asarray(gaussian_kernel(size, sigma))
    ref = ref_kernel(size, sigma)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_gaussian_blur_matches_torch_conv1d(rng):
    import torch.nn.functional as F

    x = rng.standard_normal((2, 1, 200)).astype(np.float32)
    k = np.asarray(gaussian_kernel(7, 1.0))
    ours = np.asarray(gaussian_blur1d(jnp.asarray(x), jnp.asarray(k)))
    ref = F.conv1d(
        torch.from_numpy(x), torch.from_numpy(k[None, None].astype(np.float32)),
        padding=7 // 2,
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n,factor", [(100, 10), (801, 4), (64, 2.5)])
def test_linear_resample_matches_scipy(rng, n, factor):
    from scipy.interpolate import interp1d

    data = rng.standard_normal(n)
    x = np.linspace(0, n, num=n, endpoint=True)
    t = np.linspace(0, n, num=int(n * factor), endpoint=True)
    ref = interp1d(x, data, axis=0)(t)
    ours = np.asarray(upscale_1d(jnp.asarray(data), factor))
    # f32 on-device vs f64 host interp: tolerance covers the cast
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_iq2rf_matches_reference(rng):
    # golden computed with scipy exactly like the reference's
    # ChirpDataset.iq2rf (datasets/chirp_dataset.py:79-91); the reference
    # module itself needs natsort which this image lacks
    from scipy.interpolate import interp1d

    n, fc, fs, r = 400, 5e6, 2e6, 10
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    x = np.linspace(0, n / fs, num=n, endpoint=True)
    t = np.linspace(0, n / fs, num=int(n * r), endpoint=True)
    y = interp1d(x, iq, axis=0)(t)
    ref = (y * np.exp(2j * np.pi * fc * t)).real
    ours = np.asarray(iq2rf(jnp.asarray(iq), fc=fc, fs=fs, rescale_factor=r))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)


def test_linear_resample_complex(rng):
    data = (rng.standard_normal(50) + 1j * rng.standard_normal(50))
    out = np.asarray(linear_resample(jnp.asarray(data), 200))
    assert out.shape == (200,)
    np.testing.assert_allclose(out[0], data[0], rtol=1e-6)
    np.testing.assert_allclose(out[-1], data[-1], rtol=1e-6)


def test_maxpool_leaky_values_and_grads(rng):
    """ops/poolgrad.maxpool_leaky: values == leaky(maxpool) == maxpool
    (leaky), and the residual-lean custom VJP matches jax.grad of the
    plain expression away from ties (reference models/stofnet.py:89-91
    tail semantics incl. the floor-crop)."""
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.ops.poolgrad import maxpool_leaky

    y = jnp.asarray(rng.standard_normal((2, 165, 6)).astype(np.float32))

    def plain(y):
        rows = y.shape[1] // 80
        y4 = y[:, : rows * 80].reshape(2, rows, 80, 6)
        return jnp.max(jax.nn.leaky_relu(y4, 0.01), axis=2)

    out = np.asarray(maxpool_leaky(y, 80, 0.01))
    np.testing.assert_allclose(out, np.asarray(plain(y)), rtol=1e-6)
    assert out.shape == (2, 2, 6)  # floor(165/80) rows

    g1 = jax.grad(lambda y: jnp.sum(maxpool_leaky(y, 80, 0.01) ** 2))(y)
    g2 = jax.grad(lambda y: jnp.sum(plain(y) ** 2))(y)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)
    # the cropped tail (samples 160:165) must get exactly zero gradient
    assert np.all(np.asarray(g1)[:, 160:] == 0)

    # tie routing: first maximal element takes the whole cotangent
    yt = jnp.zeros((1, 80, 1))
    gt = jax.grad(lambda y: jnp.sum(maxpool_leaky(y, 80, 0.01)))(yt)
    gt = np.asarray(gt)[0, :, 0]
    assert gt[0] != 0 and np.all(gt[1:] == 0)


def test_maxpool_leaky_matches_torch_backward(rng):
    """Golden vs torch: LeakyReLU(0.01) -> MaxPool1d(80) (the reference's
    SemiGlobalBlock tail, models/stofnet.py:89-91) — forward values AND
    input gradients, including torch's first-argmax tie routing."""
    import jax
    import jax.numpy as jnp
    import pytest

    torch = pytest.importorskip("torch")

    from stofnet_tpu.ops.poolgrad import maxpool_leaky

    y = rng.standard_normal((2, 323, 5)).astype(np.float32)
    # plant an exact tie inside one window to pin the routing rule
    y[0, 10, 0] = y[0, 55, 0] = 3.5

    ty = torch.tensor(np.transpose(y, (0, 2, 1)), requires_grad=True)
    tout = torch.nn.MaxPool1d(80)(torch.nn.LeakyReLU(0.01)(ty))
    tout.backward(torch.ones_like(tout))
    ref_out = np.transpose(tout.detach().numpy(), (0, 2, 1))
    ref_grad = np.transpose(ty.grad.numpy(), (0, 2, 1))

    out, vjp = jax.vjp(lambda v: maxpool_leaky(v, 80, 0.01), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-6)
    (grad,) = vjp(jnp.ones_like(out))
    np.testing.assert_allclose(np.asarray(grad), ref_grad,
                               rtol=1e-6, atol=1e-7)
