"""Attribute the B=128 pipeline's ms/batch between model / SGB / decode.

VERDICT r2 weak #4: the measured steady state (~11 ms/batch at B=128,
L=8000) sits ~1.7x above the builder's own ~5 ms FLOP roofline and ~7 ms
HBM roofline, and nobody had profiled the gap. Relay-aware ablation: each
variant is a jitted ``lax.scan`` over K staged batches with a small fetched
output (the relay only synchronizes on host fetches), best-of-3.

Variants:
  full        model forward + nms + top_k decode (the bench pipeline)
  model       model forward only (heatmap reduced to a per-batch checksum)
  model_nosgb model with semi_global_scale=1 (random weights; timing only)
  decode      nms + top_k decode on staged f32 heatmaps
  decode_bf16 same on bf16 heatmaps
  nms         nms1d alone
  topk        lax.top_k(k=8) alone on (B, 32000)
  argmax8     iterative 8x (max+mask) exact top-k candidate
  model_int8  int8-SGB forward only (models/int8.py, the served path's
              model half; calibrated on the bench echo gate batch)
  full_int8   int8-SGB forward + decode (the r3 headline serving path)

Run on the real chip: ``python scripts/profile_gap.py``. One JSON line on
stdout; details on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 128
LENGTH = 8000
K = 20


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed_stream(make_batch, body, k=K, reps=3):
    """ms/batch of body over k staged batches (compile+warm excluded)."""
    import jax
    import jax.numpy as jnp

    xs = jnp.stack([make_batch(i) for i in range(2)])
    xs = jnp.concatenate([xs] * (k // 2), axis=0)

    @jax.jit
    def run(xs):
        def step(c, xb):
            out = body(xb)
            # reduce to a small checksum so the fetch is cheap but the
            # computation cannot be dead-code eliminated
            s = sum(jnp.sum(jnp.asarray(o, jnp.float32))
                    for o in jax.tree.leaves(out))
            return c + s, ()

        tot, _ = jax.lax.scan(step, jnp.float32(0), xs)
        return tot

    np.asarray(run(xs))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(xs))
        best = min(best, time.perf_counter() - t0)
    return best / k * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.models import StofNet
    from stofnet_tpu.models.torch_import import import_stofnet
    from stofnet_tpu.ops import mask2coords
    from stofnet_tpu.ops.peaks import nms1d, threshold_scores

    log(f"device: {jax.devices()[0]}")
    ckpt = ("/root/reference/ckpts/"
            "different-armadillo-1439_rf-scale10_epoch_46.pth")
    variables, overrides = import_stofnet(ckpt)
    model = StofNet(dtype=jnp.bfloat16, **overrides)
    model_nosgb = StofNet(dtype=jnp.bfloat16, upsample_factor=4,
                          semi_global_scale=1)
    v_nosgb = model_nosgb.init(jax.random.key(0),
                               jnp.zeros((1, 1, LENGTH)))

    rng = np.random.default_rng(0)

    def rf_batch(i):
        x = rng.standard_normal((BATCH, 1, LENGTH)).astype(np.float32)
        return jnp.asarray(x / np.abs(x).max(axis=-1, keepdims=True))

    def heat_batch(i):
        return jnp.asarray(rng.standard_normal(
            (BATCH, 1, 4 * LENGTH)).astype(np.float32))

    def heat_batch_bf16(i):
        return heat_batch(i).astype(jnp.bfloat16)

    def decode(h):
        return mask2coords(h, window_size=20, threshold=None,
                           upsample_factor=4, max_echoes=8)

    def argmax8(h):
        """Exact top-8 via 8 sequential masked argmaxes (VPU-only)."""
        h = h.squeeze(1)
        sup = threshold_scores(nms1d(h, 20), None)
        neg_inf = jnp.asarray(-jnp.inf, sup.dtype)
        key = jnp.where(sup != 0, sup, neg_inf)

        def step(key, _):
            i = jnp.argmax(key, axis=-1)
            v = jnp.take_along_axis(key, i[:, None], axis=-1)[:, 0]
            key = key.at[jnp.arange(key.shape[0]), i].set(neg_inf)
            return key, jnp.where(v > neg_inf, i, -1)

        _, idx = jax.lax.scan(step, key, None, length=8)
        return idx.T

    results = {}
    variants = [
        ("full", rf_batch, lambda x: decode(model.apply(variables, x))),
        ("model", rf_batch, lambda x: model.apply(variables, x)),
        ("model_nosgb", rf_batch, lambda x: model_nosgb.apply(v_nosgb, x)),
        ("decode", heat_batch, decode),
        ("decode_bf16", heat_batch_bf16, decode),
        ("nms", heat_batch, lambda h: nms1d(h.squeeze(1), 20)),
        ("topk", heat_batch,
         lambda h: jax.lax.top_k(h.squeeze(1), 8)[0]),
        ("argmax8", heat_batch, argmax8),
    ]
    try:
        from bench import make_gate_batch
        from stofnet_tpu.models.int8 import (quantize_stofnet,
                                             stofnet_apply_int8)

        gate = jnp.asarray(make_gate_batch(BATCH, LENGTH,
                                           np.random.default_rng(7)))
        q = quantize_stofnet(variables, gate, **overrides)
        variants += [
            ("model_int8", rf_batch,
             lambda x: stofnet_apply_int8(q, x, dtype=jnp.bfloat16,
                                          **overrides)),
            ("full_int8", rf_batch,
             lambda x: decode(stofnet_apply_int8(q, x, dtype=jnp.bfloat16,
                                                 **overrides))),
        ]
    except Exception as e:  # noqa: BLE001
        log(f"int8 variants unavailable: {type(e).__name__}: {str(e)[:80]}")
    for name, mk, body in variants:
        try:
            ms = timed_stream(mk, body)
            results[name] = round(ms, 3)
            log(f"{name:12s}: {ms:7.3f} ms/batch")
        except Exception as e:  # noqa: BLE001
            results[name] = f"{type(e).__name__}: {str(e)[:80]}"
            log(f"{name:12s}: FAILED {results[name]}")

    print(json.dumps({"metric": "profile_gap_b128", **results}))


if __name__ == "__main__":
    main()
