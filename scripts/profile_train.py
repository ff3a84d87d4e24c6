"""Training-step ablation at the bench operating point (B=128, L=8000).

Where do the ~46 ms/step (r2 `bench.py --train`) go? Rows:

  fwd_loss         forward + loss only (no grad, no update)
  fwd_loss_window  same, with the pre-r3 reduce_window pool lowering
  train_full       full step, CURRENT model — i.e. the residual-lean
                   custom-VJP pool (ops/poolgrad.py, since e373cff); its
                   delta vs train_window IS the poolgrad effect CLAUDE.md
                   lists as the open hardware question
  train_window     full step, SemiGlobalBlock built with nn.max_pool
                   (reduce_window), whose gradient is XLA
                   select-and-scatter keeping the dense plane alive
  train_nosgb      full step, semi_global_scale=1 ablation
  train_remat      full step with jax.checkpoint on the forward
  train_f32        the reference-parity f32 recipe (amp=False)
  train_amp        bf16 compute / f32 master recipe (amp=True)
  train_amp_nosgb  amp + semi_global_scale=1 (is amp's win SGB-bound?)
  train_fused      full step through the Pallas fused-SGB custom VJP
                   (sgb_contract_pool_trainable — the B=512+ memory
                   unblock, bench --oom-demo): does never materializing
                   the (B, L, 512) pre-pool plane ALSO win time at
                   B=128, or does the ~12-23 GB/s kernel input cap
                   (CLAUDE.md) keep it a memory-only tool? (r5: the
                   train-MFU attack row, VERDICT r4 #6)

All bodies consume per-iteration staged batches (CLAUDE.md TIMING TRAP).
Run on the real chip: ``python scripts/profile_train.py``.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B, L = 128, 8000
K = 10


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.models import StofNet
    from stofnet_tpu.models.stofnet import SemiGlobalBlock
    from stofnet_tpu.train.steps import (LossConfig, init_train_state,
                                         make_optimizer, make_train_step)

    log(f"device: {jax.devices()[0]}")

    class SemiGlobalBlockWindow(SemiGlobalBlock):
        """The pre-r3 pool lowering (reduce_window) for comparison."""

        @nn.compact
        def __call__(self, x):
            from stofnet_tpu.models.init import torch_default

            feat = max(1, self.sample_scale // 10) * self.features
            s = nn.Conv(feat, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name="contract_conv",
                        **torch_default(self.kernel_size, x.shape[-1]))(x)
            s = jax.nn.leaky_relu(s, 0.01)
            s = nn.max_pool(s, (self.sample_scale,),
                            strides=(self.sample_scale,), padding="VALID")
            s = nn.Conv(self.features, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name="expand_conv",
                        **torch_default(self.kernel_size, feat))(s)
            s = jax.nn.leaky_relu(s, 0.01)
            s = jnp.repeat(s, self.sample_scale, axis=1)
            pad = max(0, x.shape[1] - s.shape[1])
            s = jnp.pad(s, ((0, 0), (pad // 2, pad // 2), (0, 0)))
            return x + s

    # the window variant: StofNet looks up `SemiGlobalBlock` in its module
    # globals at TRACE time, so the swap must stay active through the
    # variant's jit trace (same param names -> shared variables tree)
    import contextlib

    import stofnet_tpu.models.stofnet as stofnet_mod

    @contextlib.contextmanager
    def window_pool_sgb():
        orig = stofnet_mod.SemiGlobalBlock
        stofnet_mod.SemiGlobalBlock = SemiGlobalBlockWindow
        try:
            yield
        finally:
            stofnet_mod.SemiGlobalBlock = orig

    model = StofNet(dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, L)))
    model_nosgb = StofNet(dtype=jnp.bfloat16, semi_global_scale=1)
    v_nosgb = model_nosgb.init(jax.random.key(0), jnp.zeros((1, 1, L)))
    model_window = StofNet(dtype=jnp.bfloat16)

    cfg = LossConfig(upsample_factor=4, max_echoes=8)
    optimizer, _ = make_optimizer(steps_per_epoch=100)

    def staged(key, k=K):
        xs = jax.random.normal(key, (k, B, 1, L), jnp.float32)
        xs = xs / jnp.max(jnp.abs(xs), axis=-1, keepdims=True)
        gt = jnp.stack([jnp.full((B,), 2000.25), jnp.full((B,), 5500.5)], -1)
        gt = jnp.broadcast_to(gt, (k, B, 2))
        gt_true = jnp.round(gt[:, :, None, :] * 4).astype(jnp.int32)
        return xs, gt, gt_true

    xs, gt, gt_true = jax.jit(staged, static_argnums=1)(jax.random.key(0))

    def timed_steps(step_fn, state, reps=3):
        @jax.jit
        def run(state, xs, gt, gt_true):
            def body(st, inp):
                xb, g, gtr = inp
                st, aux = step_fn(st, xb, g, gtr)
                return st, aux["loss"]

            return jax.lax.scan(body, state, (xs, gt, gt_true))

        _, ls = run(state, xs, gt, gt_true)
        np.asarray(ls)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _, ls = run(state, xs, gt, gt_true)
            np.asarray(ls)
            best = min(best, time.perf_counter() - t0)
        return best / K * 1e3

    results = {}

    # forward + loss only
    from stofnet_tpu.ops.gaussian import gaussian_kernel
    from stofnet_tpu.train.loss import heatmap_loss

    gk = gaussian_kernel(cfg.kernel_size, cfg.sigma)

    def fwd_loss_step(state, xb, g, gtr):
        pred = model.apply(variables, xb)
        loss, _ = heatmap_loss(pred, gtr, kernel=gk,
                               mask_amplitude=cfg.mask_amplitude,
                               lambda_value=cfg.lambda_value)
        return state, {"loss": loss}

    def fwd_loss_window_step(state, xb, g, gtr):
        pred = model_window.apply(variables, xb)
        loss, _ = heatmap_loss(pred, gtr, kernel=gk,
                               mask_amplitude=cfg.mask_amplitude,
                               lambda_value=cfg.lambda_value)
        return state, {"loss": loss}

    for nm, fn, needs_window in [("fwd_loss", fwd_loss_step, False),
                                 ("fwd_loss_window", fwd_loss_window_step,
                                  True)]:
        try:
            ctx = (window_pool_sgb() if needs_window
                   else contextlib.nullcontext())
            with ctx:
                results[nm] = round(timed_steps(fn, 0), 2)
            log(f"{nm:15s}: {results[nm]} ms/step")
        except Exception as e:  # noqa: BLE001
            results[nm] = f"{type(e).__name__}: {str(e)[:80]}"
            log(f"{nm} FAILED {results[nm]}")

    for name, mdl, vs, remat, amp in [
        ("train_full", model, variables, False, False),
        ("train_window", model_window, variables, False, False),
        ("train_nosgb", model_nosgb, v_nosgb, False, False),
        ("train_remat", model, variables, True, False),
        # f32-module rows isolate the amp effect (the rows above carry
        # module dtype=bf16 forward compute already; amp also runs the
        # BACKWARD in bf16 with f32 master weights, train/steps.py)
        ("train_f32", StofNet(), variables, False, False),
        ("train_amp", StofNet(), variables, False, True),
        ("train_amp_nosgb", StofNet(semi_global_scale=1), v_nosgb,
         False, True),
    ]:
        try:
            ctx = (window_pool_sgb() if name == "train_window"
                   else contextlib.nullcontext())
            with ctx:
                step = make_train_step(mdl, optimizer, cfg, remat=remat,
                                       amp=amp)
                state = init_train_state(vs, optimizer)
                ms = timed_steps(step, state)
            results[name] = round(ms, 2)
            log(f"{name:12s}: {ms:.2f} ms/step "
                f"-> {B / ms * 1e3:.0f} wf/s")
        except Exception as e:  # noqa: BLE001
            results[name] = f"{type(e).__name__}: {str(e)[:80]}"
            log(f"{name}: FAILED {results[name]}")

    # the fused-SGB custom-VJP step (the oom-demo's B=512+ training
    # unblock) timed at the B=128 operating point — params-only state
    # like bench.oom_train_demo's fused_step; measured as the r5 attack
    # on the largest training residual (the ~20 ms SGB train cost)
    try:
        import optax

        from stofnet_tpu.models.fused import stofnet_apply_fused
        from stofnet_tpu.train.loss import heatmap_loss as hm_loss

        def fused_loss(params, frame, gtr):
            pred = stofnet_apply_fused({"params": params}, frame,
                                       dtype=jnp.bfloat16, trainable=True)
            loss, _ = hm_loss(pred, gtr, kernel=gk,
                              mask_amplitude=cfg.mask_amplitude,
                              lambda_value=cfg.lambda_value)
            return loss

        opt_state0 = optimizer.init(variables["params"])

        class _FusedState:
            def __init__(self, params, opt_state):
                self.params, self.opt_state = params, opt_state

        def fused_step(state, xb, g, gtr):
            loss, grads = jax.value_and_grad(fused_loss)(state.params, xb,
                                                         gtr)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            return (_FusedState(optax.apply_updates(state.params, updates),
                                opt_state), {"loss": loss})

        jax.tree_util.register_pytree_node(
            _FusedState,
            lambda s: ((s.params, s.opt_state), None),
            lambda _, c: _FusedState(*c))
        ms = timed_steps(fused_step, _FusedState(variables["params"],
                                                 opt_state0))
        results["train_fused"] = round(ms, 2)
        log(f"train_fused : {ms:.2f} ms/step -> {B / ms * 1e3:.0f} wf/s")
    except Exception as e:  # noqa: BLE001
        results["train_fused"] = f"{type(e).__name__}: {str(e)[:80]}"
        log(f"train_fused FAILED {results['train_fused']}")

    print(json.dumps({"metric": "profile_train_b128", **results}))


if __name__ == "__main__":
    main()
