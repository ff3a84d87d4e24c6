"""Diagnose espcn's 0.9844 f32 TPU-vs-CPU coord agreement (VERDICT r4 #5).

The zoo hardware probes (docs/ZOO_SERVE_tpu.md, EXPORT_GATE_tpu.md)
measured vital-puddle ESPCN at 0.9844 in f32 — below the 0.99 bar every
other ship decision clears. Two hypotheses:

  (a) decode KNIFE-EDGE: the th=Null decode keeps each row's maximum
      (ops/peaks.threshold_scores falsy mode, reference
      utils/mask2samples.py:19-22); if the f32 heatmap has near-ties at
      the top, any platform-level ulp difference (conv reduction order,
      fused multiplies) flips the argmax to a far-away bin;
  (b) a REAL numeric delta between the artifact's tpu and cpu lowerings.

This probe decides by fetching the raw HEATMAP from the chip alongside
the coords: for every disagreeing row it computes the heatmap's
platform delta and the CPU-side top-2 margin after NMS. Verdict rule —
if every flipped row has margin <= 2*delta (the tie is inside the
platform noise), the disagreement is (a), and the margin-aware
agreement (accept a flip when the row's margin is within the measured
platform noise) must come back 1.0000; any row with a LARGE margin
flip is (b) and fails the probe.

ONE TPU process (the device phase subprocess); orchestrator CPU-only.
Writes docs/ESPCN_DIAG_tpu.md.

Smoke (all-CPU): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/espcn_diag_tpu.py --smoke
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

if os.environ.get("PALLAS_AXON_POOL_IPS", None) != "" or \
        os.environ.get("JAX_PLATFORMS", "") != "cpu":
    os.execvpe(sys.executable, [sys.executable, *sys.argv],
               dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu"))

import numpy as np

sys.path.insert(0, "/root/repo")

SMOKE = "--smoke" in sys.argv
TAG = "smoke" if SMOKE else "tpu"
B, L = 16, 8000
WINDOW = 20
ART = f"/tmp/espcn_diag_{TAG}.jaxexp"
HEAT = f"/tmp/espcn_heat_{TAG}.jaxexp"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def export_artifacts():
    """Coords artifact (the zoo serving contract, f32) + a heatmap
    artifact (same forward, raw scores out) — both cpu+tpu lowered."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from stofnet_tpu.cli.export import resolve_zoo_variables_and_overrides
    from stofnet_tpu.models.registry import build_model
    from stofnet_tpu.serve import export_pipeline, save_pipeline

    args = {"model_file": "vital-puddle",
            "ckpt_dir": "/root/reference/ckpts", "dataset_kind": "chirp"}
    variables, overrides = resolve_zoo_variables_and_overrides(args, "espcn")
    blob = export_pipeline(variables, overrides, B, L, model_name="espcn",
                           dtype=jnp.float32, threshold=None, max_echoes=8,
                           window_size=WINDOW,
                           platforms=("cpu",) if SMOKE else ("cpu", "tpu"))
    save_pipeline(ART, blob)

    model, _ = build_model("espcn", dtype=jnp.float32, **{
        k: v for k, v in overrides.items()
        if k in ("dataset_kind", "upsample_factor", "rf_scale_factor")})

    # RAW heatmap (no NMS): the platform-delta metric must be computed
    # on the model output itself — NMS zeroes non-maxima, so a one-bin
    # peak shift would read as a ~100% "delta" and say nothing
    def heat(x):
        h = model.apply(variables, x).astype(jnp.float32)
        if h.ndim == 3:
            h = h.squeeze(1)
        return h

    exp = jexport.export(
        jax.jit(heat),
        platforms=("cpu",) if SMOKE else ("cpu", "tpu"))(
        jax.ShapeDtypeStruct((B, 1, L), jnp.float32))
    open(HEAT, "wb").write(exp.serialize())
    log(f"exported {ART} + heatmap artifact")


def main():
    from bench import make_gate_batch
    from stofnet_tpu.serve import load_pipeline

    export_artifacts()
    rng = np.random.default_rng(20260820)
    x = np.asarray(make_gate_batch(B, L, rng), np.float32)
    np.save(f"/tmp/espcn_x_{TAG}.npy", x)

    # CPU reference: coords + raw heatmap
    pipe = load_pipeline(ART)
    coords_cpu = np.asarray(pipe(x))
    from jax import export as jexport

    heat_cpu = np.asarray(jexport.deserialize(
        open(HEAT, "rb").read()).call(x))
    log(f"cpu: coords {coords_cpu.shape}, heat {heat_cpu.shape}")

    # device phase: ONE TPU process runs both artifacts
    dev_src = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import numpy as np, jax\n"
        "from jax import export as jexport\n"
        "from stofnet_tpu.serve import load_pipeline\n"
        "print('device:', jax.devices()[0].device_kind, file=sys.stderr)\n"
        f"x = np.load('/tmp/espcn_x_{TAG}.npy')\n"
        f"coords = np.asarray(load_pipeline('{ART}')(x))\n"
        f"heat = np.asarray(jexport.deserialize(open('{HEAT}', 'rb')"
        ".read()).call(x))\n"
        f"np.savez('/tmp/espcn_dev_{TAG}.npz', coords=coords, heat=heat)\n")
    env_dev = (dict(os.environ) if SMOKE else
               dict(os.environ, PALLAS_AXON_POOL_IPS="127.0.0.1",
                    JAX_PLATFORMS="axon"))
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-c", dev_src], check=True, env=env_dev,
                   cwd="/root/repo", timeout=3600)
    log(f"device phase in {time.perf_counter() - t0:.1f} s")
    dev = np.load(f"/tmp/espcn_dev_{TAG}.npz")
    coords_tpu, heat_tpu = dev["coords"], dev["heat"]

    # ---- analysis ---------------------------------------------------
    agree = np.abs(coords_tpu - coords_cpu) <= 1.0
    agreement = float(np.mean(agree))
    flipped_rows = sorted(set(np.nonzero(~agree)[0].tolist()))
    log(f"plain coord agreement {agreement:.4f}; "
        f"{len(flipped_rows)}/{coords_cpu.shape[0]} rows carry flips")

    # per-row platform noise (on the RAW heatmap) and decode margin (on
    # the NMS'd scores the decode actually ranks), both relative to the
    # row's top value so rows are comparable
    import jax.numpy as jnp

    from stofnet_tpu.ops.peaks import nms1d

    top = np.max(heat_cpu, axis=-1)
    delta = np.max(np.abs(heat_tpu - heat_cpu), axis=-1) / np.maximum(
        top, 1e-30)
    sup = np.asarray(nms1d(jnp.asarray(heat_cpu), WINDOW))
    part = np.partition(sup, -2, axis=-1)
    margin = (part[:, -1] - part[:, -2]) / np.maximum(top, 1e-30)
    log(f"platform heat delta: median {np.median(delta):.3e}, "
        f"max {np.max(delta):.3e}")
    log(f"decode margin: median {np.median(margin):.3e}, "
        f"min {np.min(margin):.3e}")

    rows_out, knife, real = [], [], []
    for r in flipped_rows:
        is_knife = margin[r] <= 2 * delta[r]
        (knife if is_knife else real).append(r)
        rows_out.append((r, margin[r], delta[r],
                         "knife-edge tie" if is_knife else
                         "REAL numeric delta"))
        log(f"row {r}: margin {margin[r]:.3e} vs heat delta "
            f"{delta[r]:.3e} -> {rows_out[-1][-1]}")

    # margin-aware agreement: a flip is accepted iff its row's tie is
    # inside the measured platform noise
    aware = float(np.mean(agree | (margin <= 2 * delta)[:, None]))
    verdict_ok = len(real) == 0 and aware >= 0.999

    if not SMOKE:
        lines = [
            "# espcn 0.9844 diagnosis — knife-edge ties vs real deltas",
            "",
            f"{time.strftime('%Y-%m-%d')}: vital-puddle ESPCN f32 artifact "
            f"(the auto-gate's fallback) + a raw-heatmap artifact run "
            f"on the chip over B={B} echo-bearing waveforms; every "
            f"disagreeing row is attributed by comparing the CPU decode's "
            f"top-2 margin against the measured per-row platform heatmap "
            f"delta (VERDICT r4 #5; decode mode: th=Null per-row max, "
            f"ref utils/mask2samples.py:19-22).",
            "",
            f"- plain coord agreement: **{agreement:.4f}**",
            f"- platform heat delta (rel): median {np.median(delta):.2e}, "
            f"max {np.max(delta):.2e}",
            f"- decode top-2 margin (rel): median {np.median(margin):.2e}, "
            f"min {np.min(margin):.2e}",
            f"- flipped rows: {len(flipped_rows)} "
            f"({len(knife)} knife-edge, {len(real)} real)",
            f"- margin-aware agreement (flips accepted iff the row's tie "
            f"is inside the platform noise): **{aware:.4f}**",
            "",
            "| row | top-2 margin | platform delta | verdict |",
            "|---|---|---|---|",
        ]
        for r, m, d, v in rows_out:
            lines.append(f"| {r} | {m:.3e} | {d:.3e} | {v} |")
        lines += [
            "",
            "Read: " + (
                "every flip sits on a top-2 tie narrower than the "
                "platform's own ulp noise — the 1.6% residual is decode "
                "tie-breaking (hypothesis (a)), not a numeric fault; the "
                "tolerance-aware test in tests/test_serve.py pins the "
                "mechanism on CPU." if verdict_ok else
                "at least one flip has a margin WIDER than the platform "
                "noise — a real numeric delta remains; investigate."),
        ]
        open("/root/repo/docs/ESPCN_DIAG_tpu.md", "w").write(
            "\n".join(lines) + "\n")
        log("wrote docs/ESPCN_DIAG_tpu.md")

    print({"agreement": agreement, "margin_aware": aware,
           "knife": len(knife), "real": len(real), "ok": verdict_ok})
    sys.exit(0 if verdict_ok else 1)


if __name__ == "__main__":
    main()
