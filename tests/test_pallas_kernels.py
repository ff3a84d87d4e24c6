"""Pallas kernel tests (interpret mode on CPU; compiled path covered by the
TPU bench). Parity vs the flax/XLA implementations."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stofnet_tpu.ops.pallas.sgb_kernel import sgb_contract_pool
from stofnet_tpu.models.fused import stofnet_apply_fused
from stofnet_tpu.models import StofNet

from tests import reference


@pytest.mark.parametrize("L", [800, 2000])
def test_sgb_contract_pool_matches_xla(rng, L):
    import flax.linen as nn
    from jax import lax

    h = jnp.asarray(rng.standard_normal((2, L, 64)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((5, 64, 512)) * 0.05).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(512) * 0.1).astype(np.float32))

    out = np.asarray(sgb_contract_pool(h, w, b, interpret=True))

    y = lax.conv_general_dilated(h, w, (1,), [(2, 2)],
                                 dimension_numbers=("NHC", "HIO", "NHC"))
    y = jax.nn.leaky_relu(y + b, 0.01)
    ref_out = np.asarray(nn.max_pool(y, (80,), strides=(80,), padding="VALID"))

    assert out.shape == ref_out.shape == (2, L // 80, 512)
    np.testing.assert_allclose(out, ref_out, rtol=1e-5, atol=1e-5)


def test_stofnet_fused_matches_module(rng):
    """Fused apply == flax module apply with the reference checkpoint."""
    from stofnet_tpu.models.torch_import import import_stofnet

    path = reference.ckpt_path("different-armadillo")
    if path is None:
        pytest.skip("reference ckpts unavailable")
    variables, overrides = import_stofnet(str(path))
    model = StofNet(**overrides)

    x = jnp.asarray(rng.standard_normal((2, 1, 800)).astype(np.float32))
    ref_out = np.asarray(model.apply(variables, x))
    out = np.asarray(stofnet_apply_fused(variables, x, dtype=None,
                                         interpret=True, **overrides))
    scale = np.abs(ref_out).max()
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4 * scale)


def test_stofnet_fused_random_init(rng):
    model = StofNet()
    x = jnp.zeros((1, 1, 800))
    variables = model.init(jax.random.key(0), x)
    out = stofnet_apply_fused(variables, x, dtype=None, interpret=True)
    assert out.shape == (1, 1, 3200)


@pytest.mark.parametrize("L", [800, 8000, 12000])
def test_conv_stack_fused_matches_module(rng, L):
    """Full fused conv stack (incl. window stitching) == flax module."""
    from stofnet_tpu.models.torch_import import import_stofnet

    path = reference.ckpt_path("different-armadillo")
    if path is None:
        pytest.skip("reference ckpts unavailable")
    variables, overrides = import_stofnet(str(path))
    model = StofNet(**overrides)

    x = jnp.asarray(rng.standard_normal((1, 1, L)).astype(np.float32))
    ref_out = np.asarray(model.apply(variables, x))
    out = np.asarray(stofnet_apply_fused(variables, x, dtype=None,
                                         interpret=True, fused_stack=True,
                                         **overrides))
    scale = np.abs(ref_out).max()
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4 * scale)


def test_conv_stack_window_stitch_seams(rng):
    """Stitched windows must be exact at chunk seams and sequence edges."""
    from stofnet_tpu.ops.pallas.conv_stack_kernel import conv_stack_fused
    from stofnet_tpu.models.torch_import import import_stofnet

    path = reference.ckpt_path("different-armadillo")
    if path is None:
        pytest.skip("reference ckpts unavailable")
    variables, _ = import_stofnet(str(path))
    p = variables["params"]

    h0 = jnp.asarray(rng.standard_normal((1, 8000, 64)).astype(np.float32))
    out = np.asarray(conv_stack_fused(h0, p, interpret=True))

    # XLA reference for the same sub-stack
    import flax.linen as nn
    from jax import lax

    def conv1d(h, kern, bias):
        k = kern.shape[0]
        y = lax.conv_general_dilated(h, jnp.asarray(kern), (1,),
                                     [((k - 1) // 2, k // 2)],
                                     dimension_numbers=("NHC", "HIO", "NHC"))
        return y + jnp.asarray(bias)

    h = h0
    res = res1 = h
    for i in range(2, 12):
        y = conv1d(h, p[f"conv{i}"]["kernel"], p[f"conv{i}"]["bias"])
        if i in {3, 5, 7, 9, 11}:
            h = res + y
            res = h
        else:
            h = jax.nn.leaky_relu(y, 0.01)
    h = res1 + conv1d(h, p["conv12"]["kernel"], p["conv12"]["bias"])
    ref = np.asarray(conv1d(h, p["conv_last"]["kernel"],
                            p["conv_last"]["bias"]))
    np.testing.assert_allclose(out, ref, rtol=1e-4,
                               atol=1e-5 * np.abs(ref).max())


def test_sgb_trainable_grads_match_xla(rng):
    """Custom-VJP fused SGB: gradients equal jax.grad of the XLA
    expression leaky(maxpool80(conv_same(h, w) + b)) for h, w, and b —
    the backward routes cotangents through the argmax without ever
    materializing the dense (B, L, F) conv output."""
    from jax import lax

    from stofnet_tpu.ops.pallas.sgb_kernel import sgb_contract_pool_trainable

    b, length, c, f = 2, 240, 64, 512
    h = jnp.asarray(rng.standard_normal((b, length, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((5, c, f)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((f,)).astype(np.float32) * 0.1)
    # downstream cotangent shaping: a weighted sum keeps every output used
    probe = jnp.asarray(rng.standard_normal((b, length // 80, f))
                        .astype(np.float32))

    def xla_fn(h, w, bias):
        y = lax.conv_general_dilated(
            h, w, (1,), [(2, 2)], dimension_numbers=("NHC", "HIO", "NHC"))
        y = y + bias
        y = y.reshape(b, length // 80, 80, f).max(axis=2)
        y = jax.nn.leaky_relu(y, 0.01)
        return jnp.sum(y * probe)

    def fused_fn(h, w, bias):
        y = sgb_contract_pool_trainable(h, w, bias, 0.01, True)
        return jnp.sum(y * probe)

    ref_val, ref_grads = jax.value_and_grad(xla_fn, argnums=(0, 1, 2))(
        h, w, bias)
    got_val, got_grads = jax.value_and_grad(fused_fn, argnums=(0, 1, 2))(
        h, w, bias)

    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=1e-5)
    for g_got, g_ref, name in zip(got_grads, ref_grads, "h w bias".split()):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


@pytest.mark.parametrize("L", [800, 2400])
def test_sgb_dma_kernel_matches_xla(rng, L):
    """Manual-DMA packed-pair kernel (r3) == the XLA contract+pool
    expression: the (3, 128, 2F) weight packing and chunked pooling must
    reproduce conv k5 SAME + leaky + maxpool80 exactly."""
    import flax.linen as nn
    from jax import lax

    from stofnet_tpu.ops.pallas.sgb_dma_kernel import (
        dma_supported, sgb_contract_pool_dma,
    )

    assert dma_supported(L, 64) and not dma_supported(640, 64)
    h = jnp.asarray(rng.standard_normal((2, L, 64)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((5, 64, 512)) * 0.05).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(512) * 0.1).astype(np.float32))

    out = np.asarray(sgb_contract_pool_dma(h, w, b, interpret=True))

    y = lax.conv_general_dilated(h, w, (1,), [(2, 2)],
                                 dimension_numbers=("NHC", "HIO", "NHC"))
    y = jax.nn.leaky_relu(y + b, 0.01)
    ref_out = np.asarray(nn.max_pool(y, (80,), strides=(80,),
                                     padding="VALID"))
    assert out.shape == ref_out.shape == (2, L // 80, 512)
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-4)


def test_stofnet_fused_trainable_grads_match_module(rng):
    """trainable=True routes the SGB through the custom VJP; end-to-end
    jax.grad of a scalar loss must match the flax module's gradients."""
    model = StofNet()
    x = jnp.asarray(rng.standard_normal((2, 1, 800)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)

    def loss_ref(params):
        return jnp.mean(model.apply({"params": params}, x) ** 2)

    def loss_fused(params):
        pred = stofnet_apply_fused({"params": params}, x, dtype=None,
                                   interpret=True, trainable=True)
        return jnp.mean(pred ** 2)

    l1, g1 = jax.value_and_grad(loss_ref)(variables["params"])
    l2, g2 = jax.value_and_grad(loss_fused)(variables["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree.leaves(g1)
    flat2 = jax.tree.leaves(g2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)
