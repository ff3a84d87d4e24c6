"""Zoo serving artifacts on the real chip: TPU lowering + decode parity.

The stofnet artifact's TPU path is proven (docs/SERVE_DAEMON_tpu.md,
bench.py --serve/--soak). This closes the same question for the REST of
the zoo behind the exporter's ``model=`` switch (cli/export.py): export
batch-polymorphic cpu+tpu artifacts for an EDSR checkpoint
(proud-cherry), a Zonzini checkpoint (graceful-wave), and the
parameter-free GradPeak; run each on the chip in ONE TPU process
(CLAUDE.md: batch hardware experiments — consecutive TPU processes pay
a multi-minute claim wedge); compare decoded outputs against the SAME
artifacts' cpu lowering. Writes docs/ZOO_SERVE_tpu.md.

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
L = 8000
B = 8

# (name, export args beyond model/out/batch/length/platforms)
CASES = [
    ("edsr", ["model_file=proud-cherry", "ckpt_dir=/root/reference/ckpts",
              "th=Null", "max_echoes=8"]),
    ("zonzini", ["model_file=graceful-wave", "ckpt_dir=/root/reference/ckpts"]),
    ("gradpeak", ["th=1e-5", "max_echoes=8"]),
]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def art_path(name):
    return f"/tmp/zoo_{name}_{TAG}.jaxexp"


def main():
    env_cpu = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    env_dev = (env_cpu if SMOKE else
               dict(os.environ, PALLAS_AXON_POOL_IPS="127.0.0.1",
                    JAX_PLATFORMS="axon"))

    # 1) export all three artifacts (CPU process per export keeps each
    #    cheap; no TPU claim involved)
    for name, extra in CASES:
        subprocess.run(
            [sys.executable, "-m", "stofnet_tpu.cli.export",
             f"model={name}", f"out={art_path(name)}", "batch=b",
             f"length={L}", "platforms=cpu,tpu", *extra],
            check=True, env=env_cpu, cwd="/root/repo", timeout=900)
        log(f"exported {art_path(name)} "
            f"({os.path.getsize(art_path(name)) / 1e6:.2f} MB)")

    # 2) shared inputs + cpu-lowering reference outputs
    from bench import make_gate_batch

    rng = np.random.default_rng(20260819)
    x = np.asarray(make_gate_batch(B, L, rng), np.float32)  # (B, 1, L)
    np.save(f"/tmp/zoo_x_{TAG}.npy", x)

    expected = {}
    t0 = time.perf_counter()
    ref_src = (
        "import numpy as np, sys; sys.path.insert(0, '/root/repo')\n"
        "from stofnet_tpu.serve import load_pipeline\n"
        f"x = np.load('/tmp/zoo_x_{TAG}.npy')\n"
        f"out = {{name: np.asarray(load_pipeline(f'/tmp/zoo_{{name}}_{TAG}"
        ".jaxexp')(x)) for name in ('edsr', 'zonzini', 'gradpeak')}\n"
        f"np.savez('/tmp/zoo_ref_{TAG}.npz', **out)\n")
    subprocess.run([sys.executable, "-c", ref_src], check=True, env=env_cpu,
                   cwd="/root/repo", timeout=900)
    log(f"cpu reference outputs in {time.perf_counter() - t0:.1f} s")
    expected = dict(np.load(f"/tmp/zoo_ref_{TAG}.npz"))

    # 3) ONE device process runs all three artifacts; per-artifact wall
    #    time bracketed by host fetches (the relay does not synchronize
    #    through block_until_ready)
    dev_src = (
        "import json, sys, time; sys.path.insert(0, '/root/repo')\n"
        "import numpy as np, jax\n"
        "from stofnet_tpu.serve import load_pipeline\n"
        "print('device:', jax.devices()[0].device_kind, file=sys.stderr)\n"
        f"x = np.load('/tmp/zoo_x_{TAG}.npy')\n"
        "out, secs = {}, {}\n"
        "for name in ('edsr', 'zonzini', 'gradpeak'):\n"
        f"    pipe = load_pipeline(f'/tmp/zoo_{{name}}_{TAG}.jaxexp')\n"
        "    out[name] = np.asarray(pipe(x))  # compile + run + fetch\n"
        "    t0 = time.perf_counter()\n"
        "    for _ in range(3): got = np.asarray(pipe(x))\n"
        "    secs[name] = (time.perf_counter() - t0) / 3\n"
        "    out[name] = got\n"
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
    for name, _ in CASES:
        r, g = expected[name], got[name]
        if name == "zonzini":
            maxd = float(np.max(np.abs(r - g)))
            good = maxd <= 2.0
            rows.append((name, f"max |Δ| {maxd:.3f} samples", good,
                         secs[name]))
        else:
            agree = float(np.mean(np.abs(r - g) <= 1.0))
            good = agree >= 0.95
            rows.append((name, f"coord agreement {agree:.4f}", good,
                         secs[name]))
        ok &= good
        log(f"{name}: {rows[-1][1]} ({'ok' if good else 'FAIL'}), "
            f"{1e3 * secs[name]:.1f} ms/batch B={B}")

    if not SMOKE:
        body = [
            "# Zoo serving artifacts on hardware",
            "",
            f"Every non-StofNet family behind the exporter's `model=` "
            f"switch, run on the chip ({time.strftime('%Y-%m-%d')}): "
            f"batch-polymorphic cpu+tpu artifacts (B={B}, L={L}), one TPU "
            f"process for all three, outputs vs the SAME artifacts' cpu "
            f"lowering. StofNet's hardware serving story is separate "
            f"(docs/SERVE_DAEMON_tpu.md, bench.py --serve/--soak).",
            "",
            "| artifact | parity vs cpu lowering | ms/batch (B=8, incl. "
            "relay fetch) |",
            "|---|---|---|",
        ]
        for name, verdict, good, s in rows:
            body.append(f"| {name} | {verdict} ({'ok' if good else 'FAIL'}) "
                        f"| {1e3 * s:.1f} |")
        body += [
            "",
            "zonzini is a continuous per-frame regression (one ToA slot); "
            "the others decode coords (±1 sample = the serving gate "
            "convention). gradpeak runs in f32 (no weights — the "
            "classical detector). Timings are per-call wall time through "
            "the relay (dispatch-bound at B=8; not a throughput claim).",
        ]
        with open("/root/repo/docs/ZOO_SERVE_tpu.md", "w") as f:
            f.write("\n".join(body) + "\n")
        log("wrote docs/ZOO_SERVE_tpu.md")

    print(json.dumps({"ok": ok, "rows": [(n, v, g, s) for n, v, g, s in
                                         rows]}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
