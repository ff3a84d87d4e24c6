"""Job-array harness on hardware: N runs as ONE program vs N sequential.

The reference's array story is one GPU process per row
(bash_scripts/train_pala_array.sh:14, chirp_benchmark.sh:14); each row's
small batch leaves the accelerator mostly idle. parallel/array.py vmaps
the members into one XLA program instead. This script measures what that
buys on the real chip:

  solo_b32_train_ms    single-seed train step, B=32 (an array-row batch)
  array4_b32_train_ms  4 members x B=32 as ONE vmapped program
  solo_b128_train_ms   chip-filling single-model baseline (same 128
                       waveforms/step the array4 program carries)
  eval_th1_ms          forward + decode at one threshold, B=128
  eval_th8_sweep_ms    SAME forward decoded at 8 thresholds in-program
                       (the reference re-runs the model per threshold row)

Claims under test: (a) array4@B32 costs far less than 4x solo@B32 —
ideally ~solo@B128 (members pack the chip like batch does); (b) an
8-threshold sweep costs ~1 forward, not 8.

MEASURED (2026-08-19, docs/ARRAY_BENCH_r3.json): (a) is FALSE on one
chip — per-member weights make the convs grouped, so members don't merge
into larger MXU contractions: array4@B32 113.4 ms vs 4x solo@B32
116.8 ms (1.03x, dispatch amortization only) vs solo@B128 65.3 ms. The
array's parallel win is member-per-device mesh sharding, not vmap.
(b) holds: 2.98x at T=8 (53.1 vs 8x 19.7 ms; decode+metrics tail
~4.8 ms per threshold).

All scan bodies consume per-iteration staged data (CLAUDE.md TIMING
TRAP). Run on the real chip: ``python scripts/bench_array.py``; writes
docs/ARRAY_BENCH_r3.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SMOKE = "--smoke" in sys.argv  # CPU correctness drive: tiny shapes
L = 800 if SMOKE else 8000
K = 2 if SMOKE else 8  # staged iterations per timed run
REPS = 1 if SMOKE else 3
B_ROW, B_FULL = (4, 16) if SMOKE else (32, 128)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.models import StofNet
    from stofnet_tpu.parallel import (init_array_state,
                                      make_array_train_step,
                                      make_threshold_sweep_step)
    from stofnet_tpu.train.steps import (LossConfig, init_train_state,
                                         make_eval_step, make_optimizer,
                                         make_train_step)

    log(f"device: {jax.devices()[0]}")

    model = StofNet()
    x0 = jnp.zeros((1, 1, L))
    cfg = LossConfig(upsample_factor=4, max_echoes=8)
    optimizer, _ = make_optimizer(steps_per_epoch=100)

    def staged(key, b, k=K):
        xs = jax.random.normal(key, (k, b, 1, L), jnp.float32)
        xs = xs / jnp.max(jnp.abs(xs), axis=-1, keepdims=True)
        gt = jnp.stack([jnp.full((b,), 2000.25), jnp.full((b,), 5500.5)], -1)
        gt = jnp.broadcast_to(gt, (k, b, 2))
        gt_true = jnp.round(gt[:, :, None, :] * 4).astype(jnp.int32)
        return xs, gt, gt_true

    def timed(run, *args):
        """Best-of-REPS wall ms per staged iteration; fetch-synchronized
        (block_until_ready does not sync through the relay)."""
        out = run(*args)
        np.asarray(out)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = run(*args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best / K * 1e3

    results = {}

    # --- training: solo B=32 vs 4-member array B=32 vs solo B=128 -------
    step = make_train_step(model, optimizer, cfg)
    astep4 = make_array_train_step(model, optimizer, cfg)

    v = model.init(jax.random.key(0), x0)
    state32 = init_train_state(v, optimizer, seed=0)
    state128 = init_train_state(v, optimizer, seed=0)
    astate4 = init_array_state(model, optimizer, [0, 1, 2, 3], x0)

    xs32, gt32, gtr32 = jax.jit(staged, static_argnums=(1, 2))(
        jax.random.key(1), B_ROW)
    xs128, gt128, gtr128 = jax.jit(staged, static_argnums=(1, 2))(
        jax.random.key(2), B_FULL)

    def make_scan(step_fn):
        @jax.jit
        def run(state, xs, gt, gtr):
            def body(st, inp):
                st, aux = step_fn(st, *inp)
                return st, aux["loss"]
            return jax.lax.scan(body, state, (xs, gt, gtr))[1]
        return run

    for name, fn, st, data in [
            ("solo_b32_train_ms", step, state32, (xs32, gt32, gtr32)),
            ("array4_b32_train_ms", astep4, astate4, (xs32, gt32, gtr32)),
            ("solo_b128_train_ms", step, state128, (xs128, gt128, gtr128)),
    ]:
        ms = timed(make_scan(fn), st, *data)
        results[name] = round(ms, 2)
        log(f"{name}: {ms:.2f}")

    results["array4_vs_4x_solo_speedup"] = round(
        4 * results["solo_b32_train_ms"] / results["array4_b32_train_ms"], 2)
    results["array4_wf_s"] = round(
        4 * B_ROW / (results["array4_b32_train_ms"] / 1e3), 1)
    results["solo_b128_wf_s"] = round(
        B_FULL / (results["solo_b128_train_ms"] / 1e3), 1)

    # --- eval: 1-threshold decode vs 8-threshold single-forward sweep ---
    ev = make_eval_step(model, cfg)
    sweep = make_threshold_sweep_step(model, cfg)
    ths8 = jnp.asarray([0.003, 0.01, 0.03, 0.1, 0.3, 1.0, 3.0, 10.0],
                       jnp.float32)

    @jax.jit
    def run_eval(variables, xs, gt, gtr):
        def body(c, inp):
            out = ev(variables, *inp)
            return c, jnp.sum(out["toa_metrics"])
        return jax.lax.scan(body, 0, (xs, gt, gtr))[1]

    @jax.jit
    def run_sweep(variables, xs, gt, gtr):
        def body(c, inp):
            out = sweep(variables, *inp, ths8)
            return c, jnp.sum(out["toa_metrics"])
        return jax.lax.scan(body, 0, (xs, gt, gtr))[1]

    ms1 = timed(run_eval, v, xs128, gt128, gtr128)
    results["eval_th1_ms"] = round(ms1, 2)
    log(f"eval_th1_ms: {ms1:.2f}")
    ms8 = timed(run_sweep, v, xs128, gt128, gtr128)
    results["eval_th8_sweep_ms"] = round(ms8, 2)
    log(f"eval_th8_sweep_ms: {ms8:.2f}")
    results["th8_vs_8x_th1_speedup"] = round(8 * ms1 / ms8, 2)

    results["config"] = {"L": L, "K": K, "reps": REPS, "b_row": B_ROW,
                         "b_full": B_FULL, "device": str(jax.devices()[0])}
    out = json.dumps(results, indent=1)
    dest = ("/tmp/ARRAY_BENCH_smoke.json" if SMOKE
            else "/root/repo/docs/ARRAY_BENCH_r3.json")
    with open(dest, "w") as f:
        f.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
