"""Which INPUT quantization scheme clears the 0.99 decode gate? (r5)

VERDICT r4 #2/#3: the serving stack's remaining end-to-end lever is
shipping compact inputs on BOTH legs (client->daemon wire, daemon->
device relay). The r4 per-waveform int8 wire measured 0.9795 coord
agreement — below the 0.99 ship bar. This sweep measures, on CPU
(the artifact's cpu lowering is the serving reference), the decode
agreement of each candidate input encoding vs exact f32 input through
the SAME pipeline (bf16 + int8-SGB, the served headline path):

  bf16      round-to-nearest-even f32->bf16 (2 B/sample; the pipeline's
            own first-op cast -> expected lossless)
  s16       per-waveform symmetric int16, scale = max|row|/32767
  s8        per-waveform symmetric int8 (the r4 wire; expected ~0.98)
  s8c<N>    per-CHUNK symmetric int8, N chunks per waveform — a quiet
            chunk keeps a fine scale instead of riding the loudest
            echo's coarse one (4 B/chunk overhead; ~1 B/sample)

Agreement is measured on BOTH echo-bearing gate batches (the serving
gate convention) and pure-noise batches (the decode tie-breaking
lottery surface, bench.make_gate_batch docstring).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       python scripts/input_enc_sweep.py
"""

from __future__ import annotations

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS", None) != "" or \
        os.environ.get("JAX_PLATFORMS", "") != "cpu":
    os.execvpe(sys.executable, [sys.executable, *sys.argv],
               dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu"))

import numpy as np

sys.path.insert(0, "/root/repo")

B, L = 48, 8000
SEEDS = (11,)


def encode(rows: np.ndarray, scheme: str) -> np.ndarray:
    """(k, L) f32 -> dequantized f32 rows under the scheme — THROUGH the
    SHIPPED codecs (serving/codecs.py / serving/tcp.py), so the measured
    agreements cover exactly the code the wire and encoded-input
    artifacts run (review finding r5; "s8" = the per-waveform wire-2
    scheme = s8c with one chunk)."""
    from stofnet_tpu.serving import decode_payload, encode_rows
    from stofnet_tpu.serving.codecs import decode_s8c, decode_s16, \
        encode_s8c, encode_s16
    from stofnet_tpu.serving.tcp import WIRE_BF16, WIRE_INT8

    k, length = rows.shape
    if scheme == "f32":
        return rows
    if scheme == "bf16":
        return decode_payload(encode_rows(rows, WIRE_BF16), WIRE_BF16, k,
                              length)[:, 0]
    if scheme == "s16":
        return decode_s16(*encode_s16(rows))
    if scheme == "s8":
        # the r4 wire-2 scheme, bit-for-bit
        return decode_payload(encode_rows(rows, WIRE_INT8), WIRE_INT8, k,
                              length)[:, 0]
    if scheme.startswith("s8c"):
        return decode_s8c(*encode_s8c(rows, int(scheme[3:])))
    raise ValueError(scheme)


def main():
    import jax.numpy as jnp

    from bench import make_gate_batch
    from stofnet_tpu.cli.export import resolve_variables_and_overrides
    from stofnet_tpu.serve import make_pipeline

    variables, overrides = resolve_variables_and_overrides(
        {"model_file": "different-armadillo",
         "ckpt_dir": "/root/reference/ckpts"})
    rng = np.random.default_rng(7)
    calib = np.asarray(make_gate_batch(16, L, rng), np.float32)
    import jax
    pipe = jax.jit(make_pipeline(variables, overrides, threshold=None,
                                 max_echoes=8, int8_calib=jnp.asarray(calib)))

    schemes = ["bf16", "s16", "s8", "s8c8", "s8c16", "s8c32"]
    batches = {}
    for seed in SEEDS:
        r = np.random.default_rng(seed)
        batches[f"echo{seed}"] = np.asarray(
            make_gate_batch(B, L, r), np.float32)[:, 0]
        batches[f"noise{seed}"] = r.normal(
            size=(B, L)).astype(np.float32)

    print(f"{'scheme':8s} " + " ".join(f"{n:>10s}" for n in batches)
          + "   bytes/(128,8000) req", flush=True)
    import time

    refs = {}
    for n, x in batches.items():
        t0 = time.perf_counter()
        refs[n] = np.asarray(pipe(x[:, None]))
        print(f"ref {n}: {time.perf_counter() - t0:.1f} s",
              file=sys.stderr, flush=True)
    for s in schemes:
        ag = []
        for n, x in batches.items():
            got = np.asarray(pipe(encode(x, s)[:, None]))
            ag.append(float(np.mean(np.abs(got - refs[n]) <= 1.0)))
        if s == "bf16":
            nbytes = 2 * 128 * L
        elif s == "s16":
            nbytes = 128 * (4 + 2 * L)
        elif s == "s8":
            nbytes = 128 * (4 + L)
        else:
            nbytes = 128 * (4 * int(s[3:]) + L)
        print(f"{s:8s} " + " ".join(f"{a:10.4f}" for a in ag)
              + f"   {nbytes / 1e6:.3f} MB", flush=True)


if __name__ == "__main__":
    main()
