"""Headline benchmark: StofNet inference throughput on one TPU chip.

Protocol mirrors the reference's timing definition (main.py:313-315: model
forward only, per-waveform) at the BASELINE.json operating point: batch 128,
L=8000 RF samples, upsample x4, reference ``different-armadillo`` weights.
Prints exactly ONE JSON line; vs_baseline is the speedup over the measured
CPU PyTorch reference (6.9 waveforms/s, BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_WF_S = 6.9  # measured reference CPU throughput (BASELINE.md)
BATCH = 128
LENGTH = 8000


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.models import StofNet
    from stofnet_tpu.models.torch_import import import_stofnet
    from stofnet_tpu.ops import mask2coords

    dev = jax.devices()[0]
    log(f"device: {dev}")

    ckpt = "/root/reference/ckpts/different-armadillo-1439_rf-scale10_epoch_46.pth"
    try:
        variables, overrides = import_stofnet(ckpt)
    except Exception as e:  # no reference tree: bench random weights
        log(f"ckpt import failed ({e}); using random init")
        model = StofNet()
        variables = model.init(jax.random.key(0), jnp.zeros((1, 1, LENGTH)))
        overrides = {}

    rng = np.random.default_rng(3008)
    x_host = rng.standard_normal((BATCH, 1, LENGTH)).astype(np.float32)
    x_host /= np.abs(x_host).max(axis=-1, keepdims=True)
    x = jax.device_put(jnp.asarray(x_host), dev)

    model_f32 = StofNet(**overrides)
    model_bf16 = StofNet(dtype=jnp.bfloat16, **overrides)

    fwd_f32 = jax.jit(model_f32.apply)
    fwd_bf16 = jax.jit(model_bf16.apply)

    # decode-parity gate: bf16 must reproduce f32 ToA coords on this batch
    h32 = fwd_f32(variables, x)
    h16 = fwd_bf16(variables, x)
    c32 = np.asarray(mask2coords(h32, 20, None, 4, max_echoes=8))
    c16 = np.asarray(mask2coords(h16, 20, None, 4, max_echoes=8))
    agree = np.mean(np.abs(c32 - c16) <= 1.0)
    use_bf16 = agree >= 0.99
    log(f"bf16/f32 coord agreement: {agree:.4f} -> using "
        f"{'bf16' if use_bf16 else 'f32'}")

    fwd = fwd_bf16 if use_bf16 else fwd_f32

    for _ in range(3):  # warmup
        fwd(variables, x).block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        fwd(variables, x).block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    wf_s = BATCH / dt
    log(f"forward {dt * 1e3:.2f} ms/batch(128) -> {wf_s:.1f} wf/s")

    print(json.dumps({
        "metric": "stofnet_infer_throughput",
        "value": round(wf_s, 1),
        "unit": "waveforms/s/chip (B=128, L=8000, x4)",
        "vs_baseline": round(wf_s / BASELINE_WF_S, 2),
    }))


if __name__ == "__main__":
    main()
