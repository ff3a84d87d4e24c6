"""Training across the whole model zoo, incl. BatchNorm/Dropout models.

The reference trains every model behind the same switch
(/root/reference/main.py:198-289); SincNet, Kuleshov and Wave-U-Net carry
BatchNorm (and Kuleshov dropout), so the train step must thread
batch_stats mutation and dropout rngs — this file locks that in, both at
the step level (stats actually update) and end-to-end through the CLI.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stofnet_tpu.models import Kuleshov, SincNet, WaveUnet
from stofnet_tpu.train.steps import (
    LossConfig,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    state_variables,
)


def _train_data(rng, batch=2, length=800, up=4):
    frame = rng.standard_normal((batch, 1, length)).astype(np.float32)
    gt = rng.uniform(10, length - 10, size=(batch, 1)).astype(np.float32)
    gt_true = np.round(gt[:, None, :] * up).astype(np.int32)
    return jnp.asarray(frame), jnp.asarray(gt), jnp.asarray(gt_true)


@pytest.mark.parametrize("name", ["sincnet", "kuleshov", "unet"])
def test_bn_model_train_step_updates_stats(name, rng):
    """One train step on a BatchNorm model: finite loss, params AND running
    stats change (regression test for the round-1 ScopeCollectionNotFound)."""
    length, up = 800, 1
    if name == "sincnet":
        model = SincNet(sample_rate=1e6)
    elif name == "kuleshov":
        model = Kuleshov(input_length=length, output_length=length * 4)
        up = 4
    else:
        model = WaveUnet(n_layers=2, channels_interval=16)

    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, length)))
    assert "batch_stats" in variables, f"{name} should carry BN stats"

    optimizer, _ = make_optimizer(steps_per_epoch=1)
    cfg = LossConfig(upsample_factor=up, max_echoes=8)
    step = make_train_step(model, optimizer, cfg)
    state = init_train_state(variables, optimizer)

    frame, gt, gt_true = _train_data(rng, length=length, up=up)
    new_state, aux = step(state, frame, gt, gt_true)
    assert np.isfinite(float(aux["loss"]))

    stats0 = jax.tree.leaves(state.batch_stats)
    stats1 = jax.tree.leaves(new_state.batch_stats)
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(stats0, stats1))
    assert changed, "BatchNorm running statistics did not update"

    p_changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                    for a, b in zip(jax.tree.leaves(state.params),
                                    jax.tree.leaves(new_state.params)))
    assert p_changed, "parameters did not update"

    # the updated state must evaluate cleanly (running averages used)
    ev = make_eval_step(model, cfg)
    out = ev(state_variables(new_state), frame, gt, gt_true)
    assert np.isfinite(float(out["loss"]))


def test_kuleshov_dropout_rng_varies_by_step(rng):
    """Dropout draws differ between steps (per-step fold_in) but are
    deterministic for a given (seed, step)."""
    length = 800
    model = Kuleshov(input_length=length, output_length=length * 4)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, length)))
    frame, gt, gt_true = _train_data(rng, length=length, up=4)

    optimizer, _ = make_optimizer(steps_per_epoch=1)
    cfg = LossConfig(upsample_factor=4, max_echoes=8)
    step = make_train_step(model, optimizer, cfg)
    state = init_train_state(variables, optimizer)

    s1, a1 = step(state, frame, gt, gt_true)
    s1b, a1b = step(state, frame, gt, gt_true)  # same (seed, step)
    np.testing.assert_allclose(float(a1["loss"]), float(a1b["loss"]))

    # isolate the per-step dropout stream: SAME params, only step bumped —
    # the loss difference can then come only from fold_in(rng, step)
    s_bumped = state._replace(step=state.step + 1)
    _, a_bumped = step(s_bumped, frame, gt, gt_true)
    assert float(a_bumped["loss"]) != float(a1["loss"])


def test_from_scratch_init_matches_torch_defaults():
    """Fresh-init weight scales match the reference's torch defaults
    (kaiming_uniform(a=sqrt(5)): std = sqrt(1/(3*fan_in))) — flax's default
    lecun_normal has 3x the variance and measurably changes from-scratch
    training dynamics (TRAINPARITY.md)."""
    from stofnet_tpu.models import StofNet

    model = StofNet()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 800)))
    p = variables["params"]

    for name, fan_in in [("conv1", 9 * 1), ("conv5", 7 * 64),
                         ("conv_last", 3 * 64)]:
        w = np.asarray(p[name]["kernel"])
        expect_std = (1.0 / (3.0 * fan_in)) ** 0.5
        assert abs(w.std() / expect_std - 1.0) < 0.15, (
            f"{name}: std {w.std():.4f} vs torch-default {expect_std:.4f}")
        b = np.asarray(p[name]["bias"])
        bound = fan_in ** -0.5
        assert np.abs(b).max() <= bound and b.std() > 0, (
            f"{name}: bias should be U(-{bound:.3f}, {bound:.3f})")

    # ESPCN keeps its bespoke reference init (espcn_1d.py:17-29)
    from stofnet_tpu.models import ESPCN1D

    e = ESPCN1D().init(jax.random.key(0), jnp.zeros((1, 1, 800)))["params"]
    w3 = np.asarray(e["conv3"]["kernel"])
    assert abs(w3.std() - 0.001) < 3e-4
    assert np.all(np.asarray(e["conv3"]["bias"]) == 0)


def test_zonzini_rejects_underflow_length():
    """Too-short inputs raise a clear error instead of emitting a 0-width
    VALID conv whose global pool silently NaNs (found training on TPU at
    rf_scale=2: stage 4 underflows below L=1600)."""
    from stofnet_tpu.models import ZonziniNetSmall

    model = ZonziniNetSmall()
    with pytest.raises(ValueError, match="too short"):
        model.init(jax.random.key(0), jnp.zeros((1, 1, 800)))
    # adequate length still works
    v = model.init(jax.random.key(0), jnp.zeros((1, 1, 1600)))
    out = model.apply(v, jnp.zeros((2, 1, 1600)))
    assert out.shape == (2, 1) and np.isfinite(np.asarray(out)).all()


def test_deterministic_model_train_step_unchanged(rng):
    """BN-free models keep an empty batch_stats and still train."""
    from stofnet_tpu.models import ESPCN1D

    model = ESPCN1D(upscale_factor=4)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 800)))
    assert "batch_stats" not in variables

    optimizer, _ = make_optimizer(steps_per_epoch=1)
    cfg = LossConfig(upsample_factor=4, max_echoes=8)
    step = make_train_step(model, optimizer, cfg)
    state = init_train_state(variables, optimizer)
    frame, gt, gt_true = _train_data(rng)
    new_state, aux = step(state, frame, gt, gt_true)
    assert np.isfinite(float(aux["loss"]))
    assert new_state.batch_stats == {}


class TestAmp:
    """bf16 mixed-precision training (make_train_step amp=True): bf16
    forward/backward, f32 master weights + loss + AdamW state. The
    reference has no AMP path (pure f32 torch, main.py:198-289); this is
    the standard TPU recipe (bf16 shares f32's exponent range, so unlike
    CUDA fp16 AMP no loss scaling is involved)."""

    def _steps(self, model, variables, cfg, n, rng, amp, remat=False,
               length=800, up=4):
        optimizer, _ = make_optimizer(steps_per_epoch=1)
        step = make_train_step(model, optimizer, cfg, amp=amp, remat=remat)
        state = init_train_state(variables, optimizer)
        losses = []
        for _ in range(n):
            frame, gt, gt_true = _train_data(rng, length=length, up=up)
            state, aux = step(state, frame, gt, gt_true)
            losses.append(float(aux["loss"]))
        return state, losses

    def test_stofnet_amp_trains_close_to_f32(self, rng):
        """State stays f32 end to end; the amp loss trajectory tracks the
        f32 one (same data stream) to bf16 tolerance and both decrease."""
        from stofnet_tpu.models import StofNet

        model = StofNet(num_features=16, semi_global_scale=8, num_blocks=4)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 800)))
        cfg = LossConfig(upsample_factor=4, max_echoes=8)

        s_f32, l_f32 = self._steps(model, variables, cfg, 8,
                                   np.random.default_rng(0), amp=False)
        s_amp, l_amp = self._steps(model, variables, cfg, 8,
                                   np.random.default_rng(0), amp=True)

        assert all(np.isfinite(l_amp))
        # master weights and optimizer state never leave f32
        for leaf in jax.tree.leaves(s_amp.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(s_amp.opt_state):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                assert leaf.dtype == jnp.float32
        # same-stream trajectories agree to mixed-precision tolerance
        np.testing.assert_allclose(l_amp, l_f32, rtol=0.05, atol=5e-3)
        assert l_amp[-1] < l_amp[0] and l_f32[-1] < l_f32[0]

    def test_bn_model_amp_keeps_f32_stats(self, rng):
        """BatchNorm running statistics come back f32 under amp (eval and
        checkpoints are amp-invariant), and they actually update."""
        length = 800
        model = Kuleshov(input_length=length, output_length=length * 4)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 1, length)))
        cfg = LossConfig(upsample_factor=4, max_echoes=8)
        state, losses = self._steps(model, variables, cfg, 2, rng, amp=True)

        assert all(np.isfinite(losses))
        stats = jax.tree.leaves(state.batch_stats)
        assert stats and all(s.dtype == jnp.float32 for s in stats)
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(variables["batch_stats"]), stats))
        assert changed
        # the amp-trained state evaluates through the normal f32 eval step
        ev = make_eval_step(model, cfg)
        frame, gt, gt_true = _train_data(rng, length=length)
        out = ev(state_variables(state), frame, gt, gt_true)
        assert np.isfinite(float(out["loss"]))

    def test_amp_composes_with_remat(self, rng):
        """jax.checkpoint wraps the bf16 forward: identical losses."""
        from stofnet_tpu.models import StofNet

        model = StofNet(num_features=16, semi_global_scale=8, num_blocks=4)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 800)))
        cfg = LossConfig(upsample_factor=4, max_echoes=8)
        _, plain = self._steps(model, variables, cfg, 3,
                               np.random.default_rng(1), amp=True)
        _, remat = self._steps(model, variables, cfg, 3,
                               np.random.default_rng(1), amp=True,
                               remat=True)
        np.testing.assert_allclose(plain, remat, rtol=1e-6)


class TestAccum:
    """Gradient accumulation (make_train_step accum=N): N sequential
    micro-batches, one averaged optimizer update — the production answer
    to the single-pass activation-memory cliff (docs/DESIGN.md; the
    reference trains at batch 4 and has no equivalent)."""

    def test_accum_matches_full_batch(self, rng):
        """For a deterministic (BN/dropout-free) model with a batch-mean
        loss, averaged micro-batch gradients equal the full-batch
        gradient: post-update params agree to reduction-order tolerance."""
        from stofnet_tpu.models import StofNet

        model = StofNet(num_features=16, semi_global_scale=8, num_blocks=4)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 800)))
        cfg = LossConfig(upsample_factor=4, max_echoes=8)
        optimizer, _ = make_optimizer(steps_per_epoch=1)
        frame, gt, gt_true = _train_data(rng, batch=8)

        s_full, a_full = make_train_step(model, optimizer, cfg)(
            init_train_state(variables, optimizer), frame, gt, gt_true)
        s_acc, a_acc = make_train_step(model, optimizer, cfg, accum=4)(
            init_train_state(variables, optimizer), frame, gt, gt_true)

        np.testing.assert_allclose(float(a_acc["loss"]),
                                   float(a_full["loss"]), rtol=1e-5)
        a = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(s_full.params)])
        b = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(s_acc.params)])
        diff = np.abs(a - b)
        # near-zero-gradient elements can take Adam-amplified ±lr flips
        # from f32 reduction-order changes (see the mesh test's note)
        assert np.mean(diff < 1e-5) > 0.999, f"agree {np.mean(diff < 1e-5)}"
        assert diff.max() < 2 * 5e-4

    def test_accum_bn_model_chains_stats(self, rng):
        """BatchNorm models accumulate: stats chain through the scan like
        N consecutive small batches, loss finite, params update."""
        length = 800
        model = Kuleshov(input_length=length, output_length=length * 4)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 1, length)))
        cfg = LossConfig(upsample_factor=4, max_echoes=8)
        optimizer, _ = make_optimizer(steps_per_epoch=1)
        step = make_train_step(model, optimizer, cfg, accum=2)
        state = init_train_state(variables, optimizer)
        frame, gt, gt_true = _train_data(rng, batch=4, length=length)
        new_state, aux = step(state, frame, gt, gt_true)
        assert np.isfinite(float(aux["loss"]))
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(state.batch_stats),
                            jax.tree.leaves(new_state.batch_stats)))
        assert changed

    def test_accum_indivisible_batch_rejected(self, rng):
        from stofnet_tpu.models import ESPCN1D

        model = ESPCN1D(upscale_factor=4)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 800)))
        optimizer, _ = make_optimizer(steps_per_epoch=1)
        cfg = LossConfig(upsample_factor=4, max_echoes=8)
        step = make_train_step(model, optimizer, cfg, accum=3)
        state = init_train_state(variables, optimizer)
        frame, gt, gt_true = _train_data(rng, batch=4)
        with pytest.raises(ValueError, match="not divisible"):
            step(state, frame, gt, gt_true)

    def test_accum_composes_with_amp_and_remat(self, rng):
        """accum=2 amp=True remat=True trains and stays f32-stated."""
        from stofnet_tpu.models import StofNet

        model = StofNet(num_features=16, semi_global_scale=8, num_blocks=4)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 800)))
        cfg = LossConfig(upsample_factor=4, max_echoes=8)
        optimizer, _ = make_optimizer(steps_per_epoch=1)
        step = make_train_step(model, optimizer, cfg, accum=2, amp=True,
                               remat=True)
        state = init_train_state(variables, optimizer)
        frame, gt, gt_true = _train_data(rng, batch=4)
        new_state, aux = step(state, frame, gt, gt_true)
        assert np.isfinite(float(aux["loss"]))
        for leaf in jax.tree.leaves(new_state.params):
            assert leaf.dtype == jnp.float32

    def test_accum_sparse_gt_micro_batch_stays_finite(self, rng):
        """Review-confirmed r3 bug: heatmap_loss normalizes the GT blur by
        its max over the (micro-)batch, so a micro-batch whose rows all
        lack GT spikes divided 0/0 and NaN-poisoned the params. The accum
        path now computes the normalizer over the FULL batch and feeds it
        to every micro-batch — finite loss, params match the full-batch
        step, even with GT only in the first half of the batch AND with
        two spikes inside one kernel width (the overlap case where the
        per-micro max would differ from the global max)."""
        from stofnet_tpu.models import ESPCN1D

        model = ESPCN1D(upscale_factor=4)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 800)))
        cfg = LossConfig(upsample_factor=4, max_echoes=8)
        optimizer, _ = make_optimizer(steps_per_epoch=1)

        frame = jnp.asarray(rng.standard_normal((4, 1, 800)).astype(
            np.float32))
        # rows 0-1 carry GT (row 0 with two spikes 2 apart: blur overlap
        # makes the global max exceed the kernel peak); rows 2-3 have none
        gt = np.zeros((4, 2), np.float32)
        gt[0] = [100.0, 100.5]
        gt[1] = [400.0, 0.0]
        gt_true = np.round(gt[:, None, :] * 4).astype(np.int32)
        gt, gt_true = jnp.asarray(gt), jnp.asarray(gt_true)

        s_full, a_full = make_train_step(model, optimizer, cfg)(
            init_train_state(variables, optimizer), frame, gt, gt_true)
        s_acc, a_acc = make_train_step(model, optimizer, cfg, accum=2)(
            init_train_state(variables, optimizer), frame, gt, gt_true)

        assert np.isfinite(float(a_acc["loss"]))
        np.testing.assert_allclose(float(a_acc["loss"]),
                                   float(a_full["loss"]), rtol=1e-5)
        a = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(s_full.params)])
        b = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(s_acc.params)])
        assert np.isfinite(b).all(), "accum step poisoned the params"
        diff = np.abs(a - b)
        assert np.mean(diff < 1e-5) > 0.999 and diff.max() < 2 * 5e-4


def test_stofnet_gradient_parity_vs_torch(rng):
    """Per-parameter GRADIENT golden: the full backward pass (13 conv
    transposed-kernel grads, SemiGlobalBlock max-pool argmax routing +
    nearest-upsample scatter, leaky slopes, the residual schedule's fan-in
    accumulation) against torch autograd on the SAME weights
    (different-armadillo), SAME batch, SAME loss (main.py:224-232 recipe).
    TRAINPARITY.md proves converged-quality equivalence; this pins the
    per-step math itself."""
    from tests import reference

    if not reference.available():
        pytest.skip("reference unavailable")
    reference.add_to_path()
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from utils.gaussian import gaussian_kernel as ref_gauss
    from utils.mask2samples import coords2mask as ref_coords2mask

    from stofnet_tpu.models import StofNet
    from stofnet_tpu.models.torch_import import (import_stofnet,
                                                 params_to_state_dict)
    from stofnet_tpu.train.loss import heatmap_loss

    path = reference.ckpt_path("different-armadillo")
    if path is None:
        pytest.skip("reference checkpoints unavailable")
    variables, overrides = import_stofnet(str(path))
    model = StofNet(**overrides)

    from models.stofnet import StofNet as TorchStofNet

    tm = TorchStofNet()
    tm.load_state_dict(torch.load(str(path), map_location="cpu",
                                  weights_only=True))
    tm.train()  # grads; StofNet has no BN/dropout so forward is identical

    b, length, up = 2, 800, 4
    x = rng.standard_normal((b, 1, length)).astype(np.float32)
    x /= np.abs(x).max()
    gt_sample = rng.uniform(5, length - 5, size=(b, 1)).astype(np.float32)
    gt_true = np.round(gt_sample[:, None] * up).astype(np.int64)  # (B,1,1)

    # torch: reference loss recipe verbatim (as in the loss golden)
    out = tm(torch.from_numpy(x))
    k = torch.tensor(ref_gauss(7, 1.0), dtype=torch.float32)[None, None]
    masks_true = ref_coords2mask(torch.from_numpy(gt_true.copy()),
                                 torch.zeros(b, 1, length * up))
    blur = F.conv1d(masks_true, k, padding=3)
    blur = blur / blur.max() * 20.0
    loss_t = (F.mse_loss(out.squeeze(1), blur.squeeze(1))
              + 1e-2 * out.squeeze(1).abs().mean())
    loss_t.backward()
    ref_grads = {n: p.grad.detach().numpy() for n, p in
                 tm.named_parameters()}

    # jax: same loss through our pipeline, grad over the params tree
    def loss_fn(params):
        pred = model.apply({"params": params}, jnp.asarray(x))
        loss, _ = heatmap_loss(pred, jnp.asarray(gt_true), kernel_size=7,
                               sigma=1.0, mask_amplitude=20.0,
                               lambda_value=1e-2)
        return loss

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)

    # the grads tree mirrors the params tree, so the torch exporter maps
    # it to torch names/layout directly
    grad_sd = params_to_state_dict({"params": grads})
    assert set(grad_sd) == set(ref_grads)
    for name, g_ref in sorted(ref_grads.items()):
        g = np.asarray(grad_sd[name], np.float32)
        assert g.shape == g_ref.shape, name
        scale = max(np.abs(g_ref).max(), 1e-12)
        np.testing.assert_allclose(
            g, g_ref, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"gradient mismatch on {name}")


def test_edsr_gradient_parity_vs_torch(rng):
    """Same per-parameter gradient golden for EDSR (proud-cherry weights):
    exercises the PixelShuffle1D backward and the ResBlock residual-scale
    accumulation against torch autograd."""
    from tests import reference

    if not reference.available():
        pytest.skip("reference unavailable")
    reference.add_to_path()
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from utils.gaussian import gaussian_kernel as ref_gauss
    from utils.mask2samples import coords2mask as ref_coords2mask

    from stofnet_tpu.models import build_model, import_checkpoint
    from stofnet_tpu.models.registry import _interop_spec
    from stofnet_tpu.models.torch_import import params_to_state_dict
    from stofnet_tpu.train.loss import heatmap_loss

    path = reference.ckpt_path("proud-cherry")
    if path is None:
        pytest.skip("ckpt missing")
    model, _ = build_model("edsr", upsample_factor=4)
    variables = import_checkpoint("edsr", str(path))

    from models.edsr_1d import EDSR_1D

    tm = EDSR_1D(num_channels=1, num_features=64, num_blocks=8,
                 upscale_factor=4)
    tm.load_state_dict(torch.load(str(path), map_location="cpu",
                                  weights_only=True))
    tm.train()

    b, length, up = 2, 800, 4
    x = rng.standard_normal((b, 1, length)).astype(np.float32)
    x /= np.abs(x).max()
    gt_true = np.round(rng.uniform(5, length - 5, size=(b, 1))[:, None]
                       * up).astype(np.int64)

    out = tm(torch.from_numpy(x))
    k = torch.tensor(ref_gauss(7, 1.0), dtype=torch.float32)[None, None]
    masks_true = ref_coords2mask(torch.from_numpy(gt_true.copy()),
                                 torch.zeros(b, 1, length * up))
    blur = F.conv1d(masks_true, k, padding=3)
    blur = blur / blur.max() * 20.0
    loss_t = (F.mse_loss(out.squeeze(1), blur.squeeze(1))
              + 1e-2 * out.squeeze(1).abs().mean())
    loss_t.backward()
    ref_grads = {n: p.grad.detach().numpy() for n, p in
                 tm.named_parameters()}

    def loss_fn(params):
        pred = model.apply({"params": params}, jnp.asarray(x))
        loss, _ = heatmap_loss(pred, jnp.asarray(gt_true), kernel_size=7,
                               sigma=1.0, mask_amplitude=20.0,
                               lambda_value=1e-2)
        return loss

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)

    _, unrewrite, _ = _interop_spec("edsr")
    grad_sd = {unrewrite(kk): v for kk, v in
               params_to_state_dict({"params": grads}).items()}
    assert set(grad_sd) == set(ref_grads)
    for name, g_ref in sorted(ref_grads.items()):
        g = np.asarray(grad_sd[name], np.float32)
        scale = max(np.abs(g_ref).max(), 1e-12)
        np.testing.assert_allclose(
            g, g_ref, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"gradient mismatch on {name}")


def test_sincnet_gradient_parity_vs_torch(rng):
    """Gradient golden for SincNet (pretty-brook): the sinc FILTERBANK is
    rebuilt from (low_hz_, band_hz_) every forward, so their grads flow
    through the bandpass construction — plus BatchNorm scale/bias grads
    (eval-mode running stats on both sides for determinism). Same
    heatmap loss (upsample 1, the driver's sincnet protocol)."""
    from tests import reference

    if not reference.available():
        pytest.skip("reference unavailable")
    reference.add_to_path()
    torch = pytest.importorskip("torch")
    import collections, collections.abc

    if not hasattr(collections, "Sequence"):
        collections.Sequence = collections.abc.Sequence
    import torch.nn.functional as F
    from utils.gaussian import gaussian_kernel as ref_gauss
    from utils.mask2samples import coords2mask as ref_coords2mask

    from stofnet_tpu.models import build_model, import_checkpoint
    from stofnet_tpu.models.sincnet import (BATCHNORM_MODULES,
                                            rewrite_flax_key)
    from stofnet_tpu.models.torch_import import params_to_state_dict
    from stofnet_tpu.train.loss import heatmap_loss

    path = reference.ckpt_path("pretty-brook")
    if path is None:
        pytest.skip("ckpt missing")

    rf_scale = 10
    length = 1000 * rf_scale
    fs = 1.953125e6 * rf_scale
    from models.sincnet import SincNet as TorchSincNet

    tm = TorchSincNet({
        "input_dim": length, "fs": fs,
        "cnn_N_filt": [128, 128, 128, 1],
        "cnn_len_filt": [1023, 11, 9, 7],
        "cnn_max_pool_len": [1, 1, 1, 1],
        "cnn_use_laynorm_inp": False, "cnn_use_batchnorm_inp": False,
        "cnn_use_laynorm": [False] * 4, "cnn_use_batchnorm": [True] * 4,
        "cnn_act": ["leaky_relu"] * 3 + ["linear"],
        "cnn_drop": [0.0] * 4, "use_sinc": True,
    })
    tm.load_state_dict(torch.load(str(path), map_location="cpu",
                                  weights_only=True))
    tm.eval()  # running-stat BN on both sides: deterministic grads

    model, _ = build_model("sincnet", fs=fs / rf_scale,
                           rf_scale_factor=rf_scale)
    variables = import_checkpoint("sincnet", str(path))

    b = 2
    x = rng.standard_normal((b, 1, length)).astype(np.float32)
    x /= np.abs(x).max()
    gt_true = np.round(rng.uniform(5, length - 5,
                                   size=(b, 1))[:, None]).astype(np.int64)

    out = tm(torch.from_numpy(x))
    k = torch.tensor(ref_gauss(7, 1.0), dtype=torch.float32)[None, None]
    masks_true = ref_coords2mask(torch.from_numpy(gt_true.copy()),
                                 torch.zeros(b, 1, length))
    blur = F.conv1d(masks_true, k, padding=3)
    blur = blur / blur.max() * 20.0
    loss_t = (F.mse_loss(out.squeeze(1), blur.squeeze(1))
              + 1e-2 * out.squeeze(1).abs().mean())
    loss_t.backward()
    ref_grads = {n: p.grad.detach().numpy() for n, p in
                 tm.named_parameters() if p.grad is not None}

    def loss_fn(params):
        pred = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x))  # train=False: running stats, like tm.eval()
        loss, _ = heatmap_loss(pred, jnp.asarray(gt_true), kernel_size=7,
                               sigma=1.0, mask_amplitude=20.0,
                               lambda_value=1e-2)
        return loss

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    grad_sd = {rewrite_flax_key(kk): v for kk, v in params_to_state_dict(
        {"params": grads}, batchnorm_modules=BATCHNORM_MODULES).items()}
    missing = set(ref_grads) - set(grad_sd)
    assert not missing, f"grads missing for {sorted(missing)[:4]}"
    for name, g_ref in sorted(ref_grads.items()):
        g = np.asarray(grad_sd[name], np.float32).reshape(g_ref.shape)
        scale = max(np.abs(g_ref).max(), 1e-12)
        np.testing.assert_allclose(
            g, g_ref, rtol=5e-3, atol=1e-3 * scale,
            err_msg=f"gradient mismatch on {name}")


def test_waveunet_gradient_parity_vs_torch(rng):
    """Gradient golden for Wave-U-Net: the slicing downsample's scatter
    backward, align_corners-interpolation backward, skip-concat routing
    into both encoder and decoder branches, and BN scale/bias grads
    (eval-mode running stats both sides; random seeded weights — no ckpt
    ships upstream). Driver protocol: upsample folded into the input, so
    the heatmap loss runs at upsample 1."""
    import tempfile

    from tests import reference

    if not reference.available():
        pytest.skip("reference unavailable")
    reference.add_to_path()
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from utils.gaussian import gaussian_kernel as ref_gauss
    from utils.mask2samples import coords2mask as ref_coords2mask

    from stofnet_tpu.models import import_checkpoint
    from stofnet_tpu.models.torch_import import params_to_state_dict
    from stofnet_tpu.models.wave_unet import (batchnorm_modules,
                                              rewrite_flax_key)
    from stofnet_tpu.train.loss import heatmap_loss

    from models.wave_unet import Model as TorchWaveUnet

    torch.manual_seed(0)
    n_layers = 2
    tm = TorchWaveUnet(n_layers=n_layers, channels_interval=16)
    tm.eval()

    with tempfile.NamedTemporaryFile(suffix=".pth") as f:
        torch.save(tm.state_dict(), f.name)
        variables = import_checkpoint("unet", f.name, n_layers=n_layers)

    model = WaveUnet(n_layers=n_layers, channels_interval=16)
    b, length = 2, 400
    x = rng.standard_normal((b, 1, length)).astype(np.float32)
    x /= np.abs(x).max()
    gt_true = np.round(rng.uniform(5, length - 5,
                                   size=(b, 1))[:, None]).astype(np.int64)

    out = tm(torch.from_numpy(x))
    k = torch.tensor(ref_gauss(7, 1.0), dtype=torch.float32)[None, None]
    masks_true = ref_coords2mask(torch.from_numpy(gt_true.copy()),
                                 torch.zeros(b, 1, length))
    blur = F.conv1d(masks_true, k, padding=3)
    blur = blur / blur.max() * 20.0
    loss_t = (F.mse_loss(out.squeeze(1), blur.squeeze(1))
              + 1e-2 * out.squeeze(1).abs().mean())
    loss_t.backward()
    ref_grads = {n: p.grad.detach().numpy() for n, p in
                 tm.named_parameters() if p.grad is not None}

    def loss_fn(params):
        pred = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=False)
        loss, _ = heatmap_loss(pred, jnp.asarray(gt_true), kernel_size=7,
                               sigma=1.0, mask_amplitude=20.0,
                               lambda_value=1e-2)
        return loss

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    bn = batchnorm_modules(n_layers)
    grad_sd = {rewrite_flax_key(kk): v for kk, v in params_to_state_dict(
        {"params": grads}, batchnorm_modules=bn).items()}
    missing = set(ref_grads) - set(grad_sd)
    assert not missing, f"grads missing for {sorted(missing)[:4]}"
    for name, g_ref in sorted(ref_grads.items()):
        g = np.asarray(grad_sd[name], np.float32).reshape(g_ref.shape)
        scale = max(np.abs(g_ref).max(), 1e-12)
        np.testing.assert_allclose(
            g, g_ref, rtol=5e-3, atol=1e-3 * scale,
            err_msg=f"gradient mismatch on {name}")


def test_zonzini_gradient_parity_vs_torch(rng):
    """Gradient golden for the REGRESSION training branch (Zonzini Small,
    graceful-wave): the reference regresses the first valid ToA directly
    (main.py:233-241 — argmin over zero-masked gt_true picks the first
    echo, MSE on the scalar), exercising the global-pool + FC backward
    that the heatmap branch never touches."""
    from tests import reference

    if not reference.available():
        pytest.skip("reference unavailable")
    reference.add_to_path()
    torch = pytest.importorskip("torch")

    from stofnet_tpu.models import build_model, import_checkpoint
    from stofnet_tpu.models.torch_import import params_to_state_dict
    from stofnet_tpu.models.zonzini import rewrite_flax_key
    from stofnet_tpu.train.loss import regression_loss

    path = reference.ckpt_path("graceful-wave")
    if path is None:
        pytest.skip("ckpt missing")
    from models.zonzini import ZonziniNetSmall as TorchSmall

    tm = TorchSmall()
    tm.load_state_dict(torch.load(str(path), map_location="cpu",
                                  weights_only=True))
    tm.train()  # no BN/dropout: train()/eval() forwards are identical

    model, _ = build_model("zonzini", dataset_kind="chirp")
    variables = import_checkpoint("zonzini", str(path))

    b, length = 3, 2000
    x = rng.standard_normal((b, 1, length)).astype(np.float32)
    x /= np.abs(x).max()
    # two echo slots, some zero (invalid) — the first VALID one is the
    # regression target, exactly the reference's masked argmin
    gt_sample = np.array([[0.0, 812.25], [331.5, 977.0], [0.0, 44.5]],
                         np.float32)
    gt_true = np.round(gt_sample).astype(np.int64)  # (B, E), 0 = invalid

    pred_t = tm(torch.from_numpy(x))
    gt_t = torch.from_numpy(gt_true.copy())
    gt_t[gt_t == 0] = int(1e12)
    idx = torch.argmin(gt_t, dim=-1, keepdim=True)
    target_t = torch.gather(torch.from_numpy(gt_sample), -1, idx).float()
    loss_t = torch.nn.functional.mse_loss(pred_t, target_t)
    loss_t.backward()
    ref_grads = {n: p.grad.detach().numpy() for n, p in
                 tm.named_parameters()}

    def loss_fn(params):
        pred = model.apply({"params": params}, jnp.asarray(x))
        loss, _ = regression_loss(pred, jnp.asarray(gt_sample),
                                  jnp.asarray(gt_true))
        return loss

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)

    grad_sd = {rewrite_flax_key(kk): v for kk, v in
               params_to_state_dict({"params": grads}).items()}
    assert set(grad_sd) == set(ref_grads)
    for name, g_ref in sorted(ref_grads.items()):
        g = np.asarray(grad_sd[name], np.float32).reshape(g_ref.shape)
        scale = max(np.abs(g_ref).max(), 1e-12)
        np.testing.assert_allclose(
            g, g_ref, rtol=5e-3, atol=1e-3 * scale,
            err_msg=f"gradient mismatch on {name}")


def test_kuleshov_gradient_parity_vs_torch(rng):
    """Gradient golden for Kuleshov (random seeded weights — no ckpt ships
    upstream): pixel-shuffle + time-axis skip-CONCAT backward (cotangent
    splitting between trunk and skip), BN scale/bias, eval-mode dropout
    (identity both sides). With this, every trainable model family has a
    per-parameter gradient golden (ESPCN's three plain convs are covered
    by the others; GradPeak has no parameters)."""
    import tempfile

    from tests import reference

    if not reference.available():
        pytest.skip("reference unavailable")
    reference.add_to_path()
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from utils.gaussian import gaussian_kernel as ref_gauss
    from utils.mask2samples import coords2mask as ref_coords2mask

    from stofnet_tpu.models import import_checkpoint
    from stofnet_tpu.models.kuleshov import BATCHNORM_MODULES
    from stofnet_tpu.models.torch_import import params_to_state_dict
    from stofnet_tpu.train.loss import heatmap_loss

    from models.kuleshov import Kuleshov as TorchKuleshov

    torch.manual_seed(0)
    n_in, up = 1000, 4
    tm = TorchKuleshov(input_length=n_in, output_length=n_in * up)
    tm.eval()  # running-stat BN + inert dropout on both sides

    with tempfile.NamedTemporaryFile(suffix=".pth") as f:
        torch.save(tm.state_dict(), f.name)
        variables = import_checkpoint("kuleshov", f.name)

    model = Kuleshov(input_length=n_in, output_length=n_in * up)
    b = 2
    x = rng.standard_normal((b, 1, n_in)).astype(np.float32)
    x /= np.abs(x).max()
    gt_true = np.round(rng.uniform(5, n_in - 5, size=(b, 1))[:, None]
                       * up).astype(np.int64)

    out = tm(torch.from_numpy(x))
    k = torch.tensor(ref_gauss(7, 1.0), dtype=torch.float32)[None, None]
    masks_true = ref_coords2mask(torch.from_numpy(gt_true.copy()),
                                 torch.zeros(b, 1, n_in * up))
    blur = F.conv1d(masks_true, k, padding=3)
    blur = blur / blur.max() * 20.0
    loss_t = (F.mse_loss(out.squeeze(1), blur.squeeze(1))
              + 1e-2 * out.squeeze(1).abs().mean())
    loss_t.backward()
    ref_grads = {n: p.grad.detach().numpy() for n, p in
                 tm.named_parameters() if p.grad is not None}

    def loss_fn(params):
        pred = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=False)
        loss, _ = heatmap_loss(pred, jnp.asarray(gt_true), kernel_size=7,
                               sigma=1.0, mask_amplitude=20.0,
                               lambda_value=1e-2)
        return loss

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    grad_sd = params_to_state_dict({"params": grads},
                                   batchnorm_modules=BATCHNORM_MODULES)
    missing = set(ref_grads) - set(grad_sd)
    assert not missing, f"grads missing for {sorted(missing)[:4]}"
    for name, g_ref in sorted(ref_grads.items()):
        g = np.asarray(grad_sd[name], np.float32).reshape(g_ref.shape)
        scale = max(np.abs(g_ref).max(), 1e-12)
        np.testing.assert_allclose(
            g, g_ref, rtol=5e-3, atol=1e-3 * scale,
            err_msg=f"gradient mismatch on {name}")
