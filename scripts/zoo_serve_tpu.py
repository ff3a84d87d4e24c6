"""Zoo serving artifacts on the real chip: TPU lowering + decode parity.

The stofnet artifact's TPU path is proven (docs/SERVE_DAEMON_tpu.md,
bench.py --serve/--soak). This closes the same question for EVERY other
family behind the exporter's ``model=`` switch (cli/export.py): export
batch-polymorphic cpu+tpu artifacts — shipped checkpoints where the
reference ships one (edsr proud-cherry, espcn vital-puddle, sincnet
pretty-brook, zonzini graceful-wave), random-init orbax checkpoints for
the two families with no upstream ckpt (unet, kuleshov — lowering/
execution validation, agreement reported without a gate since random
heatmaps argmax on knife edges), plus the parameter-free GradPeak; run
all on the chip in ONE TPU process (CLAUDE.md: batch hardware
experiments — consecutive TPU processes pay a multi-minute claim
wedge); compare decoded outputs against the SAME artifacts' cpu
lowering. Writes docs/ZOO_SERVE_tpu.md.

kuleshov runs at L=800, not 8000: its analytic Linear head scales as
width x output_length — ~1.2 B params (≈5 GB f32) at L=8000, which is
unservable and is presumably why the reference comments it out of its
sweeps (bash_scripts/array_chirp_params.txt:8). Even L=1600 (~38 M
params) bakes a 290 MB artifact that this environment's relay
remote-compile endpoint refuses (HTTP 413 body limit) — a relay
constraint, not a model one; L=800 keeps the artifact ~40 MB.

Smoke on CPU: ``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
python scripts/zoo_serve_tpu.py --smoke`` (device phase also on cpu).

NB: run the orchestrator itself CPU-only (PALLAS_AXON_POOL_IPS= env).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SMOKE = "--smoke" in sys.argv
TAG = "smoke" if SMOKE else "tpu"
B = 8

# (name, input length, export args beyond model/out/batch/length/platforms,
#  gated?) — gated=False rows are random-init (no upstream ckpt): they
# validate TPU lowering + execution; agreement is reported but not
# pass/fail (random flat heatmaps argmax on knife edges between the two
# backends' bf16)
REF = "ckpt_dir=/root/reference/ckpts"
CASES = [
    ("edsr", 8000, ["model_file=proud-cherry", REF, "th=Null",
                    "max_echoes=8"], True),
    # dtype=float32: vital-puddle's sigmoid saturates to EXACT 1.0 over
    # ~266 bins in bf16 on this input (argmax tie lottery — measured
    # backend disagreement, agreement 0.0000); f32 has a unique max
    ("espcn", 8000, ["model_file=vital-puddle", REF, "th=Null",
                     "max_echoes=8", "dtype=float32"], True),
    ("sincnet", 8000, ["model_file=pretty-brook", REF, "th=Null",
                       "max_echoes=8", "fs=1e5"], True),
    ("unet", 8000, ["model_file={unet_ckpt}", "th=Null", "max_echoes=8"],
     False),
    ("kuleshov", 800, ["model_file={kuleshov_ckpt}", "th=Null",
                       "max_echoes=8", "sample_num=80"], False),
    ("zonzini", 8000, ["model_file=graceful-wave", REF], True),
    ("gradpeak", 8000, ["th=1e-5", "max_echoes=8"], True),
]
LENGTHS = {n: length for n, length, _, _ in CASES}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def art_path(name):
    return f"/tmp/zoo_{name}_{TAG}.jaxexp"


def main():
    env_cpu = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    env_dev = (env_cpu if SMOKE else
               dict(os.environ, PALLAS_AXON_POOL_IPS="127.0.0.1",
                    JAX_PLATFORMS="axon"))

    # 0) random-init orbax checkpoints for the two families the reference
    #    ships no weights for (kuleshov: commented out of its sweeps;
    #    unet: no chirp ckpt in ckpts/)
    init_src = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from stofnet_tpu.models.registry import build_model\n"
        "from stofnet_tpu.train.checkpoint import save_checkpoint\n"
        "import shutil\n"
        f"for name, L, kw in (('unet', 8000, {{}}),\n"
        f"                    ('kuleshov', 800, {{'sample_num': 80}})):\n"
        "    model, _ = build_model(name, **kw)\n"
        "    v = model.init(jax.random.key(0), jnp.zeros((1, 1, L)))\n"
        f"    path = f'/tmp/zoo_{{name}}_init{{L}}_{TAG}'\n"
        "    shutil.rmtree(path, ignore_errors=True)  # stale lengths\n"
        "    save_checkpoint(path, {'variables': v})\n")
    subprocess.run([sys.executable, "-c", init_src], check=True,
                   env=env_cpu, cwd="/root/repo", timeout=900)
    subst = {"unet_ckpt": f"/tmp/zoo_unet_init8000_{TAG}",
             "kuleshov_ckpt": f"/tmp/zoo_kuleshov_init800_{TAG}"}

    # 1) export every artifact (CPU process per export keeps each cheap;
    #    no TPU claim involved)
    for name, length, extra, _ in CASES:
        extra = [a.format(**subst) if "{" in a else a for a in extra]
        subprocess.run(
            [sys.executable, "-m", "stofnet_tpu.cli.export",
             f"model={name}", f"out={art_path(name)}", "batch=b",
             f"length={length}", "platforms=cpu,tpu", *extra],
            check=True, env=env_cpu, cwd="/root/repo", timeout=900)
        log(f"exported {art_path(name)} "
            f"({os.path.getsize(art_path(name)) / 1e6:.2f} MB)")

    # 2) per-length inputs + cpu-lowering reference outputs
    from bench import make_gate_batch

    rng = np.random.default_rng(20260819)
    for length in sorted(set(LENGTHS.values())):
        if length >= 2000:
            x = np.asarray(make_gate_batch(B, length, rng), np.float32)
        else:
            # make_gate_batch's 500-sample margins don't fit short
            # frames; same single-echo shape, margins scaled to L
            t = np.arange(length, dtype=np.float32)
            pos = rng.uniform(length / 8, 7 * length / 8, B)
            x = np.stack([
                (np.exp(-0.5 * ((t - p) / 12.0) ** 2)
                 * np.sin(2 * np.pi * t / 20.0))[None]
                for p in pos]).astype(np.float32)
        np.save(f"/tmp/zoo_x{length}_{TAG}.npy", x)

    t0 = time.perf_counter()
    ref_src = (
        "import numpy as np, sys; sys.path.insert(0, '/root/repo')\n"
        "from stofnet_tpu.serve import load_pipeline\n"
        f"LENGTHS = {LENGTHS!r}\n"
        f"out = {{name: np.asarray(load_pipeline(f'/tmp/zoo_{{name}}_{TAG}"
        f".jaxexp')(np.load(f'/tmp/zoo_x{{L}}_{TAG}.npy')))\n"
        "       for name, L in LENGTHS.items()}\n"
        f"np.savez('/tmp/zoo_ref_{TAG}.npz', **out)\n")
    subprocess.run([sys.executable, "-c", ref_src], check=True, env=env_cpu,
                   cwd="/root/repo", timeout=1800)
    log(f"cpu reference outputs in {time.perf_counter() - t0:.1f} s")
    expected = dict(np.load(f"/tmp/zoo_ref_{TAG}.npz"))

    # 3) ONE device process runs every artifact; per-artifact wall time
    #    bracketed by host fetches (the relay does not synchronize
    #    through block_until_ready)
    dev_src = (
        "import json, sys, time; sys.path.insert(0, '/root/repo')\n"
        "import numpy as np, jax\n"
        "from stofnet_tpu.serve import load_pipeline\n"
        "print('device:', jax.devices()[0].device_kind, file=sys.stderr)\n"
        f"LENGTHS = {LENGTHS!r}\n"
        "out, secs = {}, {}\n"
        "for name, L in LENGTHS.items():\n"
        "  try:\n"
        f"    x = np.load(f'/tmp/zoo_x{{L}}_{TAG}.npy')\n"
        f"    pipe = load_pipeline(f'/tmp/zoo_{{name}}_{TAG}.jaxexp')\n"
        "    out[name] = np.asarray(pipe(x))  # compile + run + fetch\n"
        "    t0 = time.perf_counter()\n"
        "    for _ in range(3): got = np.asarray(pipe(x))\n"
        "    secs[name] = (time.perf_counter() - t0) / 3\n"
        "    out[name] = got\n"
        "  except Exception as e:  # one family must not kill the probe\n"
        "    print(f'{name}: {type(e).__name__}: {e}', file=sys.stderr)\n"
        "    secs[name] = None\n"
        f"np.savez('/tmp/zoo_got_{TAG}.npz', **out)\n"
        f"open('/tmp/zoo_secs_{TAG}.json', 'w').write(json.dumps(secs))\n")
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-c", dev_src], check=True, env=env_dev,
                   cwd="/root/repo", timeout=3600)
    log(f"device phase in {time.perf_counter() - t0:.1f} s")
    got = dict(np.load(f"/tmp/zoo_got_{TAG}.npz"))
    secs = json.loads(open(f"/tmp/zoo_secs_{TAG}.json").read())

    # 4) parity vs the cpu lowering: coords within ±1 sample (the serving
    #    gate convention); zonzini is a continuous regression output —
    #    report its max abs deviation in samples
    rows = []
    ok = True
    for name, length, _, gated in CASES:
        if name not in got or secs.get(name) is None:
            # an ungated (random-init, report-only) row hitting an
            # environment constraint (e.g. the relay's remote-compile
            # body limit on kuleshov's ~163 MB baked weights) is
            # reported but does not fail the probe
            rows.append((name, length, "device error (see log)", not gated,
                         float("nan")))
            ok &= not gated
            log(f"{name}: device error")
            continue
        r, g = expected[name], got[name]
        if name == "zonzini":
            maxd = float(np.max(np.abs(r - g)))
            good = maxd <= 2.0
            # "max abs dev", not "max |Δ|": the verdict lands in a markdown
            # table cell where unescaped pipes would split the row
            rows.append((name, length, f"max abs dev {maxd:.3f} samples",
                         good, secs[name]))
        else:
            agree = float(np.mean(np.abs(r - g) <= 1.0))
            good = agree >= 0.95 if gated else True
            verdict = (f"coord agreement {agree:.4f}"
                       + ("" if gated else " (report-only: random init)"))
            rows.append((name, length, verdict, good, secs[name]))
        ok &= good
        log(f"{name}: {rows[-1][2]} ({'ok' if good else 'FAIL'}), "
            f"{1e3 * secs[name]:.1f} ms/batch B={B} L={length}")

    if not SMOKE:
        body = [
            "# Zoo serving artifacts on hardware",
            "",
            f"Every non-StofNet family behind the exporter's `model=` "
            f"switch, run on the chip ({time.strftime('%Y-%m-%d')}): "
            f"batch-polymorphic cpu+tpu artifacts (B={B}), ONE TPU "
            f"process for all of them, outputs vs the SAME artifacts' cpu "
            f"lowering. Shipped reference checkpoints where they exist; "
            f"unet/kuleshov have no upstream ckpt, so their rows run "
            f"random-init (lowering/execution validation, report-only; "
            f"kuleshov at L={LENGTHS['kuleshov']} — its analytic Linear "
            f"head is ~1.2 B params at L=8000, unservable, presumably why "
            f"the reference comments it out of sweeps). StofNet's hardware "
            f"story is separate (docs/SERVE_DAEMON_tpu.md, bench.py "
            f"--serve/--soak).",
            "",
            "| artifact | L | parity vs cpu lowering | ms/batch (B=8, "
            "incl. relay fetch) |",
            "|---|---|---|---|",
        ]
        for name, length, verdict, good, s in rows:
            body.append(f"| {name} | {length} | {verdict} "
                        f"({'ok' if good else 'FAIL'}) | {1e3 * s:.1f} |")
        body += [
            "",
            "espcn is exported f32 (its sigmoid saturates to exact-1.0 "
            "ties in bf16 — DESIGN.md trap); zonzini is a continuous "
            "per-frame regression (one ToA slot); the others decode "
            "coords (±1 sample = the serving gate convention). gradpeak "
            "runs in f32 (no weights — the classical detector). Timings "
            "are per-call wall time through the relay (dispatch-bound at "
            "B=8; not a throughput claim).",
        ]
        with open("/root/repo/docs/ZOO_SERVE_tpu.md", "w") as f:
            f.write("\n".join(body) + "\n")
        log("wrote docs/ZOO_SERVE_tpu.md")

    print(json.dumps({"ok": ok, "rows": rows}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
