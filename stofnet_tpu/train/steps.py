"""Jitted train / eval steps.

Replaces the reference's straight-line loops (main.py:198-402) with pure
functions: one traced+compiled step for training and one for evaluation.
The full pipeline — model forward, peak decoding, loss, ToA metrics — runs
on device with no host sync until the metrics tensor is fetched.

Training covers the whole model zoo: BatchNorm running statistics are
carried in ``TrainState.batch_stats`` and updated through
``mutable=["batch_stats"]`` (reference trains SincNet/Kuleshov/WaveUnet with
BN, models/sincnet.py:472-486, kuleshov.py:30-55, wave_unet.py:9-31), and
dropout layers draw from a per-step rng derived deterministically from
(seed, step) so resume reproduces the stream.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from stofnet_tpu.ops.gaussian import gaussian_kernel
from stofnet_tpu.ops.peaks import mask2coords
from stofnet_tpu.train.loss import heatmap_loss, regression_loss
from stofnet_tpu.train.metrics import toa_rmse


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any  # {} for models without BatchNorm
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array  # dropout stream root; folded with step each train step


def init_train_state(variables: Dict[str, Any],
                     optimizer: optax.GradientTransformation,
                     seed: int = 0) -> TrainState:
    """Build a TrainState from flax ``variables`` (init or checkpoint)."""
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.key(seed),
    )


def state_variables(state: TrainState) -> Dict[str, Any]:
    """The flax variables dict for eval/apply from a TrainState."""
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return variables


class LossConfig(NamedTuple):
    """Loss hyperparameters (config.yaml:20-26 semantics)."""

    kernel_size: int = 7
    sigma: float = 1.0
    mask_amplitude: float = 20.0
    lambda_value: float = 1e-2
    nms_win_size: int = 20
    th: Optional[float] = None
    etol: float = 1.0
    upsample_factor: int = 4
    max_echoes: int = 64
    model_kind: str = "heatmap"  # "heatmap" | "regression"


def make_train_step(model, optimizer: optax.GradientTransformation,
                    cfg: LossConfig, remat: bool = False, amp: bool = False,
                    accum: int = 1):
    """Build a jittable (state, frame, gt_sample, gt_true) -> (state, aux).

    ``accum=N`` splits the batch into N sequential micro-batches and
    averages their gradients before the single optimizer update (see the
    inline comment in ``train_step`` for semantics and memory behavior).

    ``remat=True`` rematerializes the forward pass in the backward sweep
    (jax.checkpoint), trading FLOPs for activation memory — lets the
    SemiGlobalBlock's (B, L, 512) pre-pool activation drop out of the
    training footprint at large batch.

    ``amp=True`` runs the forward AND backward sweeps in bfloat16 (double
    MXU throughput, half the activation HBM traffic) while keeping f32
    master weights, f32 loss/metrics, and an f32 AdamW state — the
    standard TPU mixed-precision recipe. bf16 shares f32's exponent range
    so no loss scaling is needed (unlike fp16 AMP on the reference's CUDA
    targets). The cast happens INSIDE the differentiated function, so
    cotangents flow back through it and ``jax.grad`` yields f32 gradients
    against the f32 master params; BatchNorm running stats are cast back
    to f32 so eval/checkpoint state is amp-invariant. Works for the whole
    zoo, model-agnostic (no per-module dtype plumbing needed).
    """
    kernel = gaussian_kernel(cfg.kernel_size, cfg.sigma)

    def _bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if getattr(x, "dtype", None) == jnp.float32 else x, tree)

    def _f32(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if getattr(x, "dtype", None) == jnp.bfloat16 else x, tree)

    def forward(variables, rng, frame):
        if amp:
            variables = {"params": _bf16(variables["params"]),
                         **{k: v for k, v in variables.items()
                            if k != "params"}}
            frame = frame.astype(jnp.bfloat16)
        pred, updated = model.apply(variables, frame, train=True,
                                    rngs={"dropout": rng},
                                    mutable=["batch_stats"])
        if amp:
            pred = pred.astype(jnp.float32)
            updated = _f32(dict(updated))
        return pred, updated

    if remat:
        forward = jax.checkpoint(forward)

    def loss_fn(params, batch_stats, rng, frame, gt_sample, gt_true,
                norm_max=None):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        pred, updated = forward(variables, rng, frame)
        if cfg.model_kind == "regression":
            gt_units = gt_true.reshape(gt_sample.shape) // cfg.upsample_factor
            loss, _ = regression_loss(pred, gt_sample, gt_units)
        else:
            loss, _ = heatmap_loss(
                pred, gt_true, kernel=kernel,
                mask_amplitude=cfg.mask_amplitude,
                lambda_value=cfg.lambda_value,
                norm_max=norm_max,
            )
        return loss, dict(updated.get("batch_stats", {}))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def train_step(state: TrainState, frame, gt_sample, gt_true,
                   update_scale=None):
        """``update_scale`` (optional traced scalar) multiplies the optax
        updates. For optax.adamw this is EXACTLY a learning-rate factor:
        the update is -lr*(adam_dir + wd*params), so scaling it by s equals
        running at lr*s with the same weight decay — the hook the job-array
        harness uses for per-member learning rates (parallel/array.py)."""
        rng = jax.random.fold_in(state.rng, state.step)
        if accum <= 1:
            (loss, batch_stats), grads = grad_fn(
                state.params, state.batch_stats, rng,
                frame, gt_sample, gt_true)
        else:
            # gradient accumulation: lax.scan over micro-batches keeps ONE
            # micro-batch's activations live at a time (the accumulator is
            # params-sized, negligible next to the SGB's (B, L, 512)), so
            # effective batch scales far past the single-pass memory cliff
            # (the production alternative to the fused-SGB kernel,
            # docs/DESIGN.md). Exact vs the full-batch step up to
            # reduction order: both losses are means over equal-size
            # micro-batches, and the heatmap loss's GT-blur normalizer —
            # the one batch-global quantity — is computed over the FULL
            # batch below and passed into every micro-batch (without it, a
            # micro-batch whose rows all lack GT spikes would 0/0-NaN and
            # poison the update). BatchNorm stats chain sequentially (same
            # semantics as N consecutive small batches); dropout draws a
            # distinct stream per micro-batch.
            if frame.shape[0] % accum:
                raise ValueError(f"batch {frame.shape[0]} not divisible by "
                                 f"accum={accum}")

            norm_max = None
            if cfg.model_kind != "regression":
                from stofnet_tpu.ops.gaussian import gaussian_blur1d
                from stofnet_tpu.ops.peaks import coords2mask

                l_out = frame.shape[-1] * cfg.upsample_factor
                norm_max = jnp.max(gaussian_blur1d(
                    coords2mask(gt_true, l_out), kernel))

            def split(x):
                return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

            def body(carry, inp):
                stats, gsum, lsum, i = carry
                f, gs, gtr = inp
                (l, stats), g = grad_fn(state.params, stats,
                                        jax.random.fold_in(rng, i),
                                        f, gs, gtr, norm_max)
                gsum = jax.tree.map(jnp.add, gsum, g)
                return (stats, gsum, lsum + l, i + 1), None

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            (batch_stats, gsum, lsum, _), _ = jax.lax.scan(
                body,
                (state.batch_stats, zero_g, jnp.zeros((), jnp.float32),
                 jnp.zeros((), jnp.int32)),
                (split(frame), split(gt_sample), split(gt_true)))
            grads = jax.tree.map(lambda g: g / accum, gsum)
            loss = lsum / accum
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        if update_scale is not None:
            updates = jax.tree.map(lambda u: u * update_scale, updates)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, batch_stats, opt_state, state.step + 1,
                           state.rng),
                {"loss": loss})

    return train_step


def make_eval_step(model, cfg: LossConfig):
    """Build a jittable eval step returning loss, decoded ToAs and metrics.

    Mirrors main.py:291-347: forward -> mask2coords (heatmap models) or raw
    regression output -> blurred-mask loss -> toa_rmse vs GT.

    The returned callable also exposes the two jitted halves so the driver
    can time the bare forward like the reference (main.py:313-315):

    - ``eval_step.forward(variables, frame) -> (pred, checksum)`` — the
      float32 scalar checksum forces completion with a tiny host fetch
      (the axon relay does not synchronize through block_until_ready).
    - ``eval_step.finish(pred, gt_sample, gt_true) -> dict`` — decode +
      loss + metrics from the already-computed heatmap.
    """
    kernel = gaussian_kernel(cfg.kernel_size, cfg.sigma)

    @jax.jit
    def forward(variables, frame):
        pred = model.apply(variables, frame)
        return pred, jnp.sum(pred.astype(jnp.float32))

    @jax.jit
    def finish(pred, gt_sample, gt_true) -> Dict[str, jnp.ndarray]:
        if cfg.model_kind == "regression":
            gt_units = gt_true.reshape(gt_sample.shape) // cfg.upsample_factor
            loss, _ = regression_loss(pred, gt_sample, gt_units)
            es_sample = pred.reshape(pred.shape[0], -1)
        else:
            loss, _ = heatmap_loss(
                pred, gt_true, kernel=kernel,
                mask_amplitude=cfg.mask_amplitude,
                lambda_value=cfg.lambda_value,
            )
            es_sample = mask2coords(
                pred, window_size=cfg.nms_win_size, threshold=cfg.th,
                upsample_factor=cfg.upsample_factor, max_echoes=cfg.max_echoes,
            )
        gs = gt_sample.reshape(gt_sample.shape[0], -1)
        metrics = toa_rmse(gs, es_sample, tol=cfg.etol)
        return {"loss": loss, "es_sample": es_sample, "toa_metrics": metrics,
                "masks_pred": pred}

    def eval_step(variables, frame, gt_sample, gt_true) -> Dict[str, jnp.ndarray]:
        pred, _ = forward(variables, frame)
        return finish(pred, gt_sample, gt_true)

    eval_step.forward = forward
    eval_step.finish = finish
    return eval_step


def make_optimizer(lr: float = 5e-4, weight_decay: float = 1e-8,
                   epochs: int = 80, steps_per_epoch: int = 1):
    """AdamW + per-epoch cosine annealing (config.yaml:11-14, main.py:179-180).

    torch steps CosineAnnealingLR once per epoch; we express the same
    schedule per optimizer step by holding lr constant within an epoch.
    """
    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, epochs)
        return lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / epochs))

    return optax.adamw(schedule, weight_decay=weight_decay), schedule
