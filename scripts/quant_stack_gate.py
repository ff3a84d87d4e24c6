"""Re-measure full-stack int8 (quant_stack=True) decode agreement on
ECHO-BEARING gate batches (CPU).

The documented ~0.96 quant_stack verdict (docs/DESIGN.md) was measured on
PURE-NOISE batches — which session 7 showed gate on th=Null tie-breaking
luck, not localization (bf16 itself only reached ~0.995 there). This
script re-runs the question on the fixed in-distribution gate batches
(bench.make_gate_batch): f32 pipeline coords vs int8 quant_stack coords,
several seeds / batch sizes, plus the per-row miss magnitudes so a rank
flip (huge delta to an unrelated peak) is distinguishable from a real
localization shift (small delta).
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_gate_batch, make_xla_pipeline, make_decoder  # noqa: E402

from stofnet_tpu.models.torch_import import import_stofnet  # noqa: E402
from stofnet_tpu.models.int8 import quantize_stofnet, stofnet_apply_int8  # noqa: E402

CKPT = "/root/reference/ckpts/different-armadillo-1439_rf-scale10_epoch_46.pth"


def main() -> None:
    variables, overrides = import_stofnet(CKPT)
    decode = make_decoder(overrides)
    pipe_f32 = make_xla_pipeline(overrides, None)
    pipe_bf16 = make_xla_pipeline(overrides, jnp.bfloat16)

    @jax.jit
    def pipe_sgb(q, xb):
        return decode(stofnet_apply_int8(q, xb, dtype=jnp.bfloat16,
                                         quant_stack=False, **overrides))

    @jax.jit
    def pipe_full(q, xb):
        return decode(stofnet_apply_int8(q, xb, dtype=jnp.bfloat16,
                                         quant_stack=True, **overrides))

    for batch, seed in [(64, 3008), (64, 1), (64, 2), (64, 3), (64, 4)]:
        rng = np.random.default_rng(seed)
        x = jnp.asarray(make_gate_batch(batch, 8000, rng))
        c32 = np.asarray(pipe_f32(variables, x))
        cb = np.asarray(pipe_bf16(variables, x))

        rows = {}
        rows["bf16"] = cb
        q = quantize_stofnet(variables, x, quant_stack=False, **overrides)
        rows["int8-sgb"] = np.asarray(pipe_sgb(q, x))
        qs = quantize_stofnet(variables, x, quant_stack=True, **overrides)
        rows["int8-full"] = np.asarray(pipe_full(qs, x))

        print(f"== B={batch} seed={seed}", flush=True)
        for name, c in rows.items():
            d = np.abs(c32 - c)
            agree = float(np.mean(d <= 1.0))
            miss = d[d > 1.0]
            print(f"  {name:10s} agreement {agree:.4f}  misses {miss.size}"
                  f"  |delta| median {np.median(miss) if miss.size else 0:.1f}"
                  f"  max {miss.max() if miss.size else 0:.1f}")


if __name__ == "__main__":
    main()
