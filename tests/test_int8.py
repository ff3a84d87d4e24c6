"""int8 serving path (ops/int8.py, models/int8.py): primitive exactness,
the requantize/max-pool commutation the SGB path relies on, and end-to-end
decoded-coordinate agreement on the reference checkpoint."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stofnet_tpu.models import StofNet
from stofnet_tpu.models.int8 import quantize_stofnet, stofnet_apply_int8
from stofnet_tpu.ops import mask2coords
from stofnet_tpu.ops.int8 import (absmax_scale, conv1d_same_int8, quantize,
                                  quantize_weight)

from tests import reference


def test_conv1d_same_int8_impls_exact(rng):
    """Both s8 lowerings match an integer numpy reference bit-exactly."""
    xq = rng.integers(-127, 128, (2, 50, 8)).astype(np.int8)
    wq = rng.integers(-127, 128, (5, 8, 16)).astype(np.int8)
    ref = np.zeros((2, 50, 16), np.int64)
    xp = np.pad(xq.astype(np.int64), ((0, 0), (2, 2), (0, 0)))
    for t in range(5):
        ref += xp[:, t:t + 50] @ wq[t].astype(np.int64)

    for impl in ("conv", "dots"):
        out = np.asarray(conv1d_same_int8(jnp.asarray(xq), jnp.asarray(wq),
                                          impl=impl))
        assert out.dtype == np.int32
        np.testing.assert_array_equal(out, ref.astype(np.int32), err_msg=impl)


@pytest.mark.parametrize("k", [3, 7, 9])
def test_conv1d_same_int8_even_padding_split(rng, k):
    """SAME padding splits (k-1)//2 left, k//2 right like flax nn.Conv."""
    xq = rng.integers(-5, 6, (1, 12, 2)).astype(np.int8)
    wq = rng.integers(-5, 6, (k, 2, 3)).astype(np.int8)
    out = np.asarray(conv1d_same_int8(jnp.asarray(xq), jnp.asarray(wq)))
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(xq, jnp.float32), jnp.asarray(wq, jnp.float32),
            (1,), [((k - 1) // 2, k // 2)],
            dimension_numbers=("NHC", "HIO", "NHC")))
    np.testing.assert_array_equal(out, ref.astype(np.int32))


def test_requantize_commutes_with_maxpool(rng):
    """clip(round(v/s)) is monotone for s>0, so the SGB may pool the int8
    codes and dequantize the max instead of pooling f32 (models/int8.py)."""
    v = rng.standard_normal((3, 160, 4)).astype(np.float32) * 50
    v[0, 5:9, 0] = 3.14  # exact ties inside one window
    scale = np.abs(v).max(axis=(0, 1), keepdims=True).astype(np.float32) / 127
    q = np.asarray(quantize(jnp.asarray(v), jnp.asarray(scale)))

    pool_of_q = q.reshape(3, 2, 80, 4).max(axis=2)
    q_of_pool = np.asarray(quantize(jnp.asarray(v.reshape(3, 2, 80, 4)
                                                .max(axis=2)),
                                    jnp.asarray(scale)))
    np.testing.assert_array_equal(pool_of_q, q_of_pool)


def test_quantize_weight_bounds(rng):
    w = rng.standard_normal((7, 64, 64)).astype(np.float32) * 0.2
    wq, ws = quantize_weight(jnp.asarray(w))
    assert wq.dtype == jnp.int8 and ws.shape == (1, 1, 64)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(ws) - w)
    assert err.max() <= np.asarray(ws).max() * 0.5 + 1e-7


def test_absmax_scale_zero_guard():
    s = absmax_scale(jnp.zeros((4, 4)))
    assert float(s) == 1.0  # all-zero slice quantizes as a no-op


def _armadillo_coords(rng):
    from stofnet_tpu.models.torch_import import import_stofnet

    path = reference.ckpt_path("different-armadillo")
    if path is None:
        pytest.skip("reference ckpts unavailable")
    variables, overrides = import_stofnet(str(path))
    model = StofNet(**overrides)

    # B=64 (512 coordinate slots): the documented gate basis — at tiny B a
    # single near-tie noise flip dominates the ratio (1/32 busts 0.99)
    x = rng.standard_normal((64, 1, 800)).astype(np.float32)
    x /= np.abs(x).max(axis=-1, keepdims=True)
    x = jnp.asarray(x)

    up = overrides.get("upsample_factor", 4)

    def coords(heat):
        return np.asarray(mask2coords(jnp.asarray(heat), window_size=20,
                                      threshold=None, upsample_factor=up,
                                      max_echoes=8))

    heat_f32 = np.asarray(model.apply(variables, x))
    return variables, overrides, x, coords, coords(heat_f32), heat_f32


@pytest.mark.parametrize("impl", ["conv", "dots"])
def test_int8_sgb_forward_matches_f32_coords(rng, impl):
    """End-to-end on the reference checkpoint, serving default (SGB-only
    int8): decoded ToA coordinates agree with the f32 pipeline's at the
    SAME 0.99 gate bench.py serves behind (measured at the bf16 floor,
    0.9961 at B=64 — models/int8.py docstring)."""
    variables, overrides, x, coords, c_ref, heat_f32 = _armadillo_coords(rng)
    q = quantize_stofnet(variables, x, **overrides)
    heat_q = np.asarray(stofnet_apply_int8(q, x, dtype=None, impl=impl,
                                           **overrides))
    assert heat_q.shape == heat_f32.shape
    agree = np.mean(np.abs(c_ref - coords(heat_q)) <= 1.0)
    assert agree >= 0.99, f"coord agreement {agree:.3f}"


def test_int8_full_stack_experimental(rng):
    """quant_stack=True (all eleven k7 convs int8): documented-experimental
    quality — activation rounding compounds through the residual chain, so
    agreement sits BELOW the serving gate (~0.96 at B=64) but must stay in
    the measured band; a collapse here means the path broke outright."""
    variables, overrides, x, coords, c_ref, _ = _armadillo_coords(rng)
    q = quantize_stofnet(variables, x, quant_stack=True, **overrides)
    heat_q = np.asarray(stofnet_apply_int8(q, x, dtype=None,
                                           quant_stack=True, **overrides))
    agree = np.mean(np.abs(c_ref - coords(heat_q)) <= 1.0)
    assert agree >= 0.90, f"coord agreement {agree:.3f}"


def test_int8_chirp_protocol_agreement(rng, tmp_path):
    """The catch that shaped the scheme (models/int8.py docstring): on
    echo-bearing chirp data the earlier folded-weight scheme shifted
    decodes by hundreds of samples while still passing on noise inputs.
    Guard the serving default on BOTH distributions: synthetic chirp
    waveforms through the reference checkpoint must decode identically."""
    from stofnet_tpu.data.chirp import ChirpDataset
    from stofnet_tpu.data.synthetic import generate_chirp_dataset
    from stofnet_tpu.models.torch_import import import_stofnet

    path = reference.ckpt_path("different-armadillo")
    if path is None:
        pytest.skip("reference ckpts unavailable")
    variables, overrides = import_stofnet(str(path))

    root = generate_chirp_dataset(tmp_path / "chirp", sample_num=800)
    ds = ChirpDataset(str(root), split_dirname="test", rf_scale_factor=10)
    x = np.stack([ds[i][1] for i in range(len(ds))])[:, None, :]
    x = jnp.asarray(x.astype(np.float32))

    up = overrides.get("upsample_factor", 4)

    def coords(heat):
        return np.asarray(mask2coords(jnp.asarray(heat), window_size=20,
                                      threshold=None, upsample_factor=up,
                                      max_echoes=8))

    c_ref = coords(StofNet(**overrides).apply(variables, x))
    q = quantize_stofnet(variables, x, **overrides)
    # dtype=None isolates the QUANTIZATION error (measured exact: 1.0000,
    # max delta 0.0). With bf16 internals the comparison would instead be
    # dominated by the bf16 floor itself (0.9844 on this data, near-tie
    # decodes), which bench.py gates separately at serve time.
    c_q = coords(stofnet_apply_int8(q, x, dtype=None, **overrides))
    agree = np.mean(np.abs(c_ref - c_q) <= 1.0)
    assert agree >= 0.99, f"chirp coord agreement {agree:.3f}"


def test_int8_sharded_matches_single_device(rng):
    """int8 serving under dp sharding: the dynamic activation scales are
    per-waveform (row-local, no cross-shard reduce needed) and the sharded
    decode must match single-device bit-for-bit."""
    from stofnet_tpu.parallel.mesh import batch_sharding, make_mesh

    model = StofNet()
    x = rng.standard_normal((8, 1, 800)).astype(np.float32)
    x /= np.abs(x).max(axis=-1, keepdims=True)
    x = jnp.asarray(x)
    variables = model.init(jax.random.key(0), x)
    q = quantize_stofnet(variables, x)

    single = np.asarray(stofnet_apply_int8(q, x, dtype=None))

    mesh = make_mesh(dp=8)
    xs = jax.device_put(x, batch_sharding(mesh, x.ndim))
    sharded = np.asarray(stofnet_apply_int8(q, xs, dtype=None))
    np.testing.assert_array_equal(single, sharded)


def test_int8_batch_composition_independence(rng):
    """A waveform's int8 decode must not depend on what it is co-batched
    with: the dynamic activation scales are per-waveform, so serving the
    same waveform alone and next to a 100x louder one yields bit-identical
    outputs (a shared per-tensor scale would collapse the quiet waveform
    onto a few codes)."""
    model = StofNet()
    x = rng.standard_normal((2, 1, 800)).astype(np.float32)
    x /= np.abs(x).max(axis=-1, keepdims=True)
    x[1] *= 100.0  # deliberately unnormalized loud neighbour
    x = jnp.asarray(x)
    variables = model.init(jax.random.key(0), x)
    q = quantize_stofnet(variables, x)

    alone = np.asarray(stofnet_apply_int8(q, x[:1], dtype=None))
    together = np.asarray(stofnet_apply_int8(q, x, dtype=None))[:1]
    np.testing.assert_array_equal(alone, together)


def test_int8_state_checkpoint_roundtrip(rng, tmp_path):
    """The quantized serving state is a plain pytree of arrays, so it
    round-trips through the standard checkpoint I/O (train/checkpoint.py)
    — quantize/calibrate once, serve from disk — and the restored state
    produces bit-identical outputs."""
    from stofnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    model = StofNet()
    x = rng.standard_normal((2, 1, 800)).astype(np.float32)
    x /= np.abs(x).max(axis=-1, keepdims=True)
    x = jnp.asarray(x)
    variables = model.init(jax.random.key(0), x)
    q = quantize_stofnet(variables, x)

    path = save_checkpoint(tmp_path / "q_int8", jax.tree.map(np.asarray, q))
    q2 = load_checkpoint(path)
    out = np.asarray(stofnet_apply_int8(q, x, dtype=None))
    out2 = np.asarray(stofnet_apply_int8(
        jax.tree.map(jnp.asarray, q2), x, dtype=None))
    np.testing.assert_array_equal(out, out2)


def test_int8_no_sgb_variant_runs(rng):
    model = StofNet(semi_global_scale=1)
    x = jnp.asarray(rng.standard_normal((2, 1, 800)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    q = quantize_stofnet(variables, x, semi_global_scale=1, quant_stack=True)
    out = stofnet_apply_int8(q, x, semi_global_scale=1, quant_stack=True)
    assert out.shape == (2, 1, 3200)
    assert np.isfinite(np.asarray(out)).all()


def test_norm_stack_layers_semantics():
    """stack_layers wins over quant_stack, is deduped/sorted, and is
    range-checked (models/int8.py:_norm_stack_layers)."""
    from stofnet_tpu.models.int8 import _norm_stack_layers

    assert _norm_stack_layers(True, None, 13) == tuple(range(2, 13))
    assert _norm_stack_layers(False, None, 13) == ()
    assert _norm_stack_layers(False, (12, 2, 2), 13) == (2, 12)
    assert _norm_stack_layers(True, (5,), 13) == (5,)  # explicit set wins
    with pytest.raises(ValueError):
        _norm_stack_layers(False, (1,), 13)
    with pytest.raises(ValueError):
        _norm_stack_layers(False, (13,), 13)


def test_stack_layers_empty_matches_sgb_only(rng):
    """stack_layers=() is exactly the serving default (SGB-only int8)."""
    model = StofNet()
    x = jnp.asarray(rng.standard_normal((2, 1, 800)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    q = quantize_stofnet(variables, x)
    a = np.asarray(stofnet_apply_int8(q, x, dtype=None))
    b = np.asarray(stofnet_apply_int8(q, x, dtype=None, stack_layers=()))
    np.testing.assert_array_equal(a, b)


def test_eq_folded_weights_roundtrip(rng):
    """Equalization algebra (quantize_stofnet eq_alpha): the stored kernel
    is w*s quantized per-output-channel, the activation divides by s at
    runtime — so dequantizing the stored kernel and multiplying by inv_eq
    must recover the ORIGINAL kernel within the per-channel quant step
    (i.e. the rescale is exact in real arithmetic; only rounding moved)."""
    model = StofNet()
    x = jnp.asarray(rng.standard_normal((2, 1, 800)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    for alpha in (0.0, 0.5, 1.0):
        q = quantize_stofnet(variables, x, quant_stack=True, eq_alpha=alpha)
        for i in range(2, 13):
            layer = q["stack"][f"conv{i}"]
            k = np.asarray(variables["params"][f"conv{i}"]["kernel"])
            wq = np.asarray(layer["wq"], np.float32)
            ws = np.asarray(layer["wscale"])            # (1, 1, Cout)
            inv = np.asarray(layer["inv_eq"])[0, 0]     # (Cin,)
            rec = wq * ws * inv[None, :, None]
            bound = 0.5 * ws * inv[None, :, None] + 1e-7
            assert (np.abs(rec - k) <= bound).all(), f"conv{i} alpha={alpha}"


def test_stack_input_absmax_matches_captured_intermediates(rng):
    """_stack_input_absmax (the eq calibration forward) mirrors the real
    model: reconstruct every stack conv's input from flax
    capture_intermediates by replaying the residual schedule, and the
    collected per-channel absmaxes must match."""
    from stofnet_tpu.models.int8 import _stack_input_absmax

    model = StofNet()
    x = jnp.asarray(rng.standard_normal((2, 1, 800)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    _, mods = model.apply(variables, x, capture_intermediates=True)
    inter = mods["intermediates"]

    got = jax.tree.map(np.asarray, _stack_input_absmax(variables, x))

    h = np.asarray(inter["semi_global_block"]["__call__"][0])  # conv2 input
    residual_layers = set(range(3, 12, 2))
    res = h
    for i in range(2, 12):
        want = np.abs(h).max(axis=(0, 1))
        np.testing.assert_allclose(got[f"conv{i}"][0, 0], want,
                                   rtol=1e-5, atol=1e-6, err_msg=f"conv{i}")
        y = np.asarray(inter[f"conv{i}"]["__call__"][0])
        if i in residual_layers:
            h = res + y
            res = h
        else:
            h = np.where(y >= 0, y, 0.01 * y)
    np.testing.assert_allclose(got["conv12"][0, 0], np.abs(h).max(axis=(0, 1)),
                               rtol=1e-5, atol=1e-6, err_msg="conv12")


def test_partial_stack_eq_runs_close_to_f32(rng):
    """Partial-stack int8 with equalization: runs, right shape, and the
    heatmap deviation stays in the quantization-noise band (loose bound —
    decode-agreement gating happens at serve time, bench.py)."""
    model = StofNet()
    x = jnp.asarray(rng.standard_normal((2, 1, 800)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    ref = np.asarray(model.apply(variables, x))
    q = quantize_stofnet(variables, x, stack_layers=(2, 12), eq_alpha=0.5)
    out = np.asarray(stofnet_apply_int8(q, x, dtype=None,
                                        stack_layers=(2, 12)))
    assert out.shape == ref.shape
    dev = np.abs(out - ref).max() / np.abs(ref).max()
    assert dev < 0.05, f"relative heatmap deviation {dev:.4f}"

    # mismatched build/apply sets must fail loudly, not silently serve f32
    with pytest.raises(KeyError):
        stofnet_apply_int8(q, x, dtype=None, stack_layers=(2, 7))


def test_bias_correct_zeroes_calibration_mean_error(rng):
    """PTQ bias correction (quantize_stofnet bias_correct=True): after
    adding the calibrated deltas, each chosen stack conv's per-output-
    channel MEAN error vs the f32 conv — on the calibration batch's f32
    trajectory, the exact quantity `_stack_bias_deltas` estimates — is
    zero to float tolerance. Inputs are reconstructed independently from
    flax capture_intermediates by replaying the residual schedule
    (models/stofnet.py:83-118), so the walk itself is cross-checked."""
    from stofnet_tpu.models.int8 import _qconv

    model = StofNet()
    x = jnp.asarray(rng.standard_normal((2, 1, 800)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    chosen = (2, 5, 11, 12)
    qc = quantize_stofnet(variables, x, stack_layers=chosen, eq_alpha=0.5,
                          bias_correct=True)

    _, mods = model.apply(variables, x, capture_intermediates=True)
    inter = mods["intermediates"]
    h = np.asarray(inter["semi_global_block"]["__call__"][0])  # conv2 input
    residual_layers = set(range(3, 12, 2))
    res = h
    for i in range(2, 13):
        if i in chosen:
            y32 = np.asarray(inter[f"conv{i}"]["__call__"][0])
            yq = np.asarray(_qconv(jnp.asarray(h), qc["stack"][f"conv{i}"],
                                   "conv"))
            mean_err = np.abs((y32 - yq).mean(axis=(0, 1)))
            bound = 1e-4 * max(np.abs(y32).max(), 1.0)
            assert mean_err.max() < bound, (
                f"conv{i}: corrected mean error {mean_err.max():.2e} "
                f"vs bound {bound:.2e}")
        if i == 12:
            break
        y = np.asarray(inter[f"conv{i}"]["__call__"][0])
        if i in residual_layers:
            h = res + y
            res = h
        else:
            h = np.where(y >= 0, y, 0.01 * y)
