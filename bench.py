"""Headline benchmark: StofNet RF->ToF inference throughput on one TPU chip.

Operating point from BASELINE.json: batch 128, L=8000 RF samples, upsample
x4, reference ``different-armadillo`` weights. We measure the full on-chip
pipeline — model forward + NMS + peak decoding — with only the decoded
(B, 8) ToF coordinates leaving the device (the reference times the forward
alone, main.py:313-315, and then decodes on host; our fused pipeline does
strictly more work per waveform).

Timing is sustained-throughput over a device-resident stream: K batches are
processed by one compiled ``lax.scan`` (weights loaded once, the serving
pattern for a buffered RF stream) and all decoded coordinates are fetched.
This measures the chip's actual pipeline rate; per-call measurements through
this container's axon relay are bounded by its ~140 ms dispatch round-trip,
which is a harness artifact, not hardware (logged to stderr for reference).
NOTE: block_until_ready() does not actually synchronize through the axon
relay — only host fetches do, hence explicit np.asarray on outputs.

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

    def make_input(batch):
        x = rng.standard_normal((batch, 1, LENGTH)).astype(np.float32)
        x /= np.abs(x).max(axis=-1, keepdims=True)
        return jax.device_put(jnp.asarray(x), dev)

    def make_pipeline(dtype):
        model = StofNet(dtype=dtype, **overrides)

        @jax.jit
        def rf_to_tof(v, x):
            heat = model.apply(v, x)
            return mask2coords(heat, window_size=20, threshold=None,
                               upsample_factor=4, max_echoes=8)

        return rf_to_tof

    x = make_input(BATCH)

    # decode-parity gate: bf16 must reproduce f32 ToA coords on this batch
    pipe_f32 = make_pipeline(None)
    pipe_bf16 = make_pipeline(jnp.bfloat16)
    c32 = np.asarray(pipe_f32(variables, x))
    c16 = np.asarray(pipe_bf16(variables, x))
    agree = np.mean(np.abs(c32 - c16) <= 1.0)
    use_bf16 = bool(agree >= 0.99)
    log(f"bf16/f32 coord agreement: {agree:.4f} -> using "
        f"{'bf16' if use_bf16 else 'f32'}")
    pipe = pipe_bf16 if use_bf16 else pipe_f32

    # opportunistic Pallas path: the fused SGB+conv-stack kernels are exact
    # (tests/test_pallas_kernels.py) but this harness's Mosaic compile helper
    # is intermittently unavailable — gate on compile success + coord parity
    use_fused = False
    if overrides and use_bf16:
        try:
            from stofnet_tpu.models.fused import stofnet_apply_fused

            @jax.jit
            def pipe_fused(v, xb):
                heat = stofnet_apply_fused(v, xb, dtype=jnp.bfloat16,
                                           fused_stack=True, **overrides)
                return mask2coords(heat, window_size=20, threshold=None,
                                   upsample_factor=4, max_echoes=8)

            cf = np.asarray(pipe_fused(variables, x))
            agree_f = np.mean(np.abs(c32 - cf) <= 1.0)
            if agree_f >= 0.99:
                pipe = pipe_fused
                use_fused = True
            log(f"pallas fused pipeline: coord agreement {agree_f:.4f} -> "
                f"{'using fused' if use_fused else 'keeping XLA'}")
        except Exception as e:
            log(f"pallas fused pipeline unavailable "
                f"({type(e).__name__}); keeping XLA path")

    # per-call latency through the relay (harness-bound, stderr only)
    np.asarray(pipe(variables, x))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(pipe(variables, x))
    log(f"per-call latency B={BATCH} (relay-bound): "
        f"{(time.perf_counter() - t0) / 5 * 1e3:.1f} ms")

    def stream_pipeline(body_fn, batch, k):
        @jax.jit
        def run(v, key):
            xs = jax.random.normal(key, (k, batch, 1, LENGTH), jnp.float32)
            xs = xs / jnp.max(jnp.abs(xs), axis=-1, keepdims=True)

            def body(carry, xb):
                return carry, body_fn(v, xb)

            _, cs = jax.lax.scan(body, 0, xs)
            return cs

        return run

    def sustained_wf_s(body_fn, batch, k):
        run = stream_pipeline(body_fn, batch, k)
        key = jax.random.key(0)
        np.asarray(run(variables, key))  # compile + warm
        t0 = time.perf_counter()
        cs = np.asarray(run(variables, key))
        dt = time.perf_counter() - t0
        assert cs.shape == (k, batch, 8)
        return batch * k / dt, dt / k

    try:
        wf_s, dt = sustained_wf_s(pipe, BATCH, 50)
    except Exception as e:
        if not use_fused:
            raise
        log(f"fused stream failed to compile ({type(e).__name__}); "
            f"falling back to XLA stream")
        use_fused = False
        pipe = pipe_bf16 if use_bf16 else pipe_f32
        wf_s, dt = sustained_wf_s(pipe, BATCH, 50)
    log(f"stream B={BATCH} k=50 ({'pallas-fused' if use_fused else 'xla'}): "
        f"{dt * 1e3:.2f} ms/batch -> {wf_s:.1f} wf/s")

    print(json.dumps({
        "metric": "stofnet_rf_to_tof_throughput",
        "value": round(wf_s, 1),
        "unit": "waveforms/s/chip (B=128, L=8000, x4, fused decode)",
        "vs_baseline": round(wf_s / BASELINE_WF_S, 2),
    }))


if __name__ == "__main__":
    main()
