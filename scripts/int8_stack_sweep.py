"""Stack-quantization design sweep (CPU): which int8 stack configs keep
decode agreement at the bf16 floor on echo-bearing gate batches?

Phases (pass as argv[1], default "alpha"):
- alpha:   full-stack with SmoothQuant-style equalization alpha in
           {None, 0.25, 0.5, 0.75} on two draws — does scale migration
           rescue the full stack (plain full measured 0.9453/0.9570)?
- singles: one int8 stack conv at a time (conv2..conv12) on one draw —
           per-layer sensitivity ranking for partial-stack serving.
- subset:  a comma-separated layer list + optional alpha from argv[2:]
           (e.g. ``subset 2,4,6,8 0.5``) on two draws.

Floor context measured on the same draws (scripts/quant_stack_gate.py):
seed 3008: bf16 0.9922, int8-sgb 0.9902; seed 1: bf16 0.9863,
int8-sgb 0.9883. Configs are judged RELATIVE to the bf16 floor, since
the absolute number at B=64 is draw-noisy.
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
BATCH, LENGTH = 64, 8000


def main() -> None:
    phase = sys.argv[1] if len(sys.argv) > 1 else "alpha"
    variables, overrides = import_stofnet(CKPT)
    decode = make_decoder(overrides)
    pipe_f32 = make_xla_pipeline(overrides, None)

    seeds = [3008, 1] if phase != "singles" else [3008]
    draws, refs = {}, {}
    for seed in seeds:
        rng = np.random.default_rng(seed)
        draws[seed] = jnp.asarray(make_gate_batch(BATCH, LENGTH, rng))
        refs[seed] = np.asarray(pipe_f32(variables, draws[seed]))
        print(f"f32 ref ready seed={seed}", flush=True)

    def run(tag, stack_layers, eq_alpha, bias_correct=False):
        for seed in seeds:
            x = draws[seed]
            q = quantize_stofnet(variables, x, stack_layers=stack_layers,
                                 eq_alpha=eq_alpha,
                                 bias_correct=bias_correct, **overrides)

            @jax.jit
            def pipe(q, xb):
                return decode(stofnet_apply_int8(
                    q, xb, dtype=jnp.bfloat16, stack_layers=stack_layers,
                    **overrides))

            c = np.asarray(pipe(q, x))
            d = np.abs(refs[seed] - c)
            agree = float(np.mean(d <= 1.0))
            miss = d[d > 1.0]
            print(f"{tag:28s} seed={seed} agreement {agree:.4f} "
                  f"misses {miss.size} "
                  f"median {np.median(miss) if miss.size else 0:.1f}",
                  flush=True)

    full = tuple(range(2, 13))
    if phase == "alpha":
        for a in (0.5, 0.25, 0.75, None):
            run(f"full eq_alpha={a}", full, a)
    elif phase == "singles":
        alpha = float(sys.argv[2]) if len(sys.argv) > 2 else None
        for i in range(2, 13):
            run(f"single conv{i} a={alpha}", (i,), alpha)
    elif phase == "subset":
        layers = tuple(int(t) for t in sys.argv[2].split(","))
        alpha = float(sys.argv[3]) if len(sys.argv) > 3 else None
        run(f"subset {layers} a={alpha}", layers, alpha)
    elif phase == "bc":
        # bias-corrected variants (quantize_stofnet bias_correct=True):
        # full stack with/without equalization, plus the argv[2:] subset
        for a in (0.5, None):
            run(f"full bc a={a}", full, a, bias_correct=True)
        if len(sys.argv) > 2:
            layers = tuple(int(t) for t in sys.argv[2].split(","))
            alpha = float(sys.argv[3]) if len(sys.argv) > 3 else None
            run(f"subset-bc {layers} a={alpha}", layers, alpha,
                bias_correct=True)
    else:
        raise SystemExit(f"unknown phase {phase}")


if __name__ == "__main__":
    main()
