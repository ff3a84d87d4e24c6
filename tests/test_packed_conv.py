"""Exactness tests for the position-packed conv (ops/packed_conv.py) and
the packed StofNet inference path (models/fused.py:stofnet_apply_packed)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from stofnet_tpu.ops.packed_conv import conv1d_same_packed, pack_kernel
from stofnet_tpu.models import StofNet
from stofnet_tpu.models.fused import stofnet_apply_packed


def _plain(x, kernel, bias):
    k = kernel.shape[0]
    y = lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[((k - 1) // 2, k // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + bias


@pytest.mark.parametrize("K,Cin,Cout,P,L", [
    (7, 64, 64, 2, 160),    # the hot StofNet conv shape
    (9, 1, 64, 2, 160),     # conv1
    (3, 64, 4, 32, 320),    # conv_last, heavy packing
    (7, 64, 64, 4, 160),
    (5, 64, 96, 2, 160),
    (6, 8, 8, 2, 160),      # even kernel: asymmetric SAME padding
    (1, 8, 8, 4, 160),      # pointwise
])
def test_packed_matches_plain(rng, K, Cin, Cout, P, L):
    x = jnp.asarray(rng.standard_normal((2, L, Cin)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((K, Cin, Cout)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((Cout,)).astype(np.float32))
    ref = np.asarray(_plain(x, k, b))
    got = np.asarray(conv1d_same_packed(x, k, b, P))
    np.testing.assert_allclose(got, ref, rtol=1e-5,
                               atol=1e-5 * np.abs(ref).max())


def test_packed_fallback_when_indivisible(rng):
    """L % P != 0 falls back to the plain conv (still exact)."""
    x = jnp.asarray(rng.standard_normal((2, 159, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((7, 8, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    ref = np.asarray(_plain(x, k, b))
    got = np.asarray(conv1d_same_packed(x, k, b, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_pack_kernel_zero_structure():
    """The packed kernel reproduces each tap exactly once; everything else
    is zero (so the extra MACs contribute exactly 0)."""
    K, Cin, Cout, P = 7, 3, 5, 2
    kernel = jnp.arange(1, K * Cin * Cout + 1,
                        dtype=jnp.float32).reshape(K, Cin, Cout)
    wp, (lo, hi) = pack_kernel(kernel, P)
    assert wp.shape == (lo + hi + 1, P * Cin, P * Cout)
    # total mass: each of the K taps appears exactly P times (once per j)
    assert np.isclose(np.asarray(wp).sum(), P * np.asarray(kernel).sum())


@pytest.mark.parametrize("pack", [2, 4])
def test_stofnet_packed_path_matches_flax(rng, pack):
    model = StofNet()
    x = jnp.asarray(rng.standard_normal((2, 1, 800)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(variables, x))
    got = np.asarray(stofnet_apply_packed(variables, x, dtype=None,
                                          pack=pack))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5 * scale)


def test_stofnet_packed_path_no_sgb(rng):
    """The ablation config (semi_global_scale=1) routes around the SGB."""
    model = StofNet(semi_global_scale=1)
    x = jnp.asarray(rng.standard_normal((1, 1, 400)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(variables, x))
    got = np.asarray(stofnet_apply_packed(variables, x, dtype=None,
                                          pack=2, semi_global_scale=1))
    np.testing.assert_allclose(got, ref, rtol=1e-4,
                               atol=1e-5 * np.abs(ref).max())
