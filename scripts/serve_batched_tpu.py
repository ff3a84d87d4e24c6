"""Daemon throughput with BATCHED clients: request wires AND device legs.

bench.py's load curves drive SINGLE-waveform clients (the latency
shape: 356 wf/s at 128 clients, relay dispatch-rate bound) and its
`host_fed_wf_s` measures the raw host->device path at B=128 with no
serving layer at all (~430-780 wf/s; the relay's host->device transfer
is the ceiling for ANY host-resident data). This probe closes the gap
between those two numbers: closed-loop clients submitting FULL
(128, L) requests through the TCP daemon — every request rides one
full bucket, so the measured wf/s is the serving stack's best case.

r5 measures BOTH transfer legs (VERDICT r4 #2/#3):

- CLIENT WIRE (serving/tcp.py SFN2): f32 / bf16 / s16 / int8 request
  encodings through one baseline daemon. The 0.99 ship gate comes from
  the CPU encoding sweep (scripts/input_enc_sweep.py): bf16 lossless,
  s16 0.9974, per-waveform int8 0.974 and per-chunk s8c ~0.977 — the
  carrier-cycle near-tie flips live inside the echo's own chunk, so
  8-bit input codes of ANY scaling stay below the gate (measured dead
  end; int8 rides along here as the documented experiment with a 0.9
  sanity floor against codec breakage).
- DEVICE LEG (serve.py ``input_enc=``): artifacts whose device
  signature is (codes, scales) — the daemon->device relay transfer
  ships 16-bit codes instead of f32 (input_enc=s16, half the bytes,
  gate-clearing) measured against the same-run f32-input baseline,
  plus the fully compact path (s16 wire x s16 device leg; the double
  encode is idempotent, tests/test_serving_codecs.py).

ONE TPU process at a time (each daemon), sequential with claim-wedge
sleeps. Rewrites docs/SERVE_BATCHED_tpu.md.

Smoke: ``python scripts/serve_batched_tpu.py --smoke`` (CPU-forced).
"""

from __future__ import annotations

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS", None) != "" or \
        os.environ.get("JAX_PLATFORMS", "") != "cpu":
    os.execvpe(sys.executable, [sys.executable, *sys.argv],
               dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu"))

import signal
import socket
import subprocess
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SMOKE = "--smoke" in sys.argv
TAG = "smoke" if SMOKE else "tpu"
PORT = 17739 if SMOKE else 17738
L = 8000
# smoke: the CPU lowering of the int8 pipeline takes minutes per
# (128, L) call — a small bucket keeps the plumbing check honest and fast
K = 8 if SMOKE else 128   # waveforms per request = one full bucket
CLIENTS = 4
SECONDS = 2 if SMOKE else 40
CLAIM_SLEEP = 0 if SMOKE else 120  # post-process claim wedge (CLAUDE.md)

# (daemon label, export input_enc, [(wire, gated?)...]); agreement gates:
# bf16/s16 >= 0.99 (shippable), int8 >= 0.9 sanity floor (experiment)
PLAN = [
    ("f32-input", None, [("f32", None), ("bf16", 0.99), ("s16", 0.99),
                         ("int8", 0.9)]),
    ("s16-input", "s16", [("f32", 0.99), ("s16", 0.99)]),
    ("bf16-input", "bf16", [("bf16", 0.99)]),
]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def wire_mb(wire):
    from stofnet_tpu.serving.tcp import parse_wire, payload_nbytes

    w, p = parse_wire(wire)
    return payload_nbytes(w, K, L, p) / 1e6


def main():
    env_cpu = dict(os.environ)
    env_tpu = (env_cpu if SMOKE else
               dict(os.environ, PALLAS_AXON_POOL_IPS="127.0.0.1",
                    JAX_PLATFORMS="axon"))
    rng = np.random.default_rng(11)

    from bench import make_gate_batch
    from stofnet_tpu.serving import ServingClient

    calib = f"/tmp/sb_calib_{TAG}.npy"
    np.save(calib, np.asarray(make_gate_batch(16, L, rng), np.float32))
    x = np.asarray(make_gate_batch(K, L, rng), np.float32)[:, 0]

    arts = {}
    for label, enc, _ in PLAN:
        art = f"/tmp/sb_{label}_{TAG}.jaxexp"
        cmd = [sys.executable, "-m", "stofnet_tpu.cli.export",
               "model_file=different-armadillo",
               "ckpt_dir=/root/reference/ckpts",
               f"out={art}", "batch=b", f"length={L}", "th=Null",
               "max_echoes=8", f"int8_calib={calib}", "platforms=cpu,tpu"]
        if enc:
            cmd.append(f"input_enc={enc}")
        subprocess.run(cmd, check=True, env=env_cpu, cwd="/root/repo",
                       timeout=900)
        arts[label] = art
        log(f"exported {art} ({os.path.getsize(art) / 1e6:.2f} MB, "
            f"int8-SGB, input_enc={enc or 'f32'})")

    results, agreement, stats_by = {}, {}, {}
    ref_coords = None
    for label, enc, wires in PLAN:
        # warmup=False: only the full K=128 bucket is ever exercised;
        # the explicit warm request below compiles it
        daemon = subprocess.Popen(
            [sys.executable, "-m", "stofnet_tpu.cli.serve",
             f"artifact={arts[label]}", f"port={PORT}", f"max_batch={K}",
             "warmup=False"],
            env=env_tpu, cwd="/root/repo", stderr=subprocess.PIPE,
            text=True)
        try:
            deadline = time.perf_counter() + (600 if SMOKE else 1800)
            while time.perf_counter() < deadline:
                try:
                    socket.create_connection(("127.0.0.1", PORT), 1).close()
                    break
                except OSError:
                    if daemon.poll() is not None:
                        raise RuntimeError(
                            f"daemon exited rc={daemon.returncode}: "
                            f"{daemon.stderr.read()[-2000:]}")
                    time.sleep(2)
            else:
                raise TimeoutError("daemon never opened the port")

            # warm + agreement gates (vs the f32-input daemon's f32-wire
            # coords — the end-to-end exact reference). Gate on STABLE
            # rows: with single-echo gate waveforms and th=Null, a row
            # decoding to >1 nonzero coord has an EXACT top-2 heatmap
            # tie (both positions == row max survive the reference's
            # falsy-threshold rule) — its answer is an index-order
            # lottery that ANY perturbation flips (measured: the int8-
            # SGB path's discrete codes create such ties; same mechanism
            # as docs/ESPCN_DIAG_tpu.md), so it carries no information
            # about the encoding under test.
            for wire, gate in wires:
                with ServingClient(("127.0.0.1", PORT), timeout=600.0,
                                   wire=wire) as c:
                    coords = c.infer(x)
                if ref_coords is None:
                    ref_coords = coords
                    tie_rows = (ref_coords != 0).sum(-1) > 1
                    log(f"exact-tie rows in the reference decode: "
                        f"{int(tie_rows.sum())}/{K} (excluded from gates)")
                key = (label, wire)
                st = ~tie_rows
                agreement[key] = float(np.mean(
                    np.abs(coords[st] - ref_coords[st]) <= 1.0))
                log(f"[{label} | {wire} wire] stable-row coord agreement "
                    f"vs f32/f32: {agreement[key]:.4f}"
                    + (f" (gate {gate})" if gate else ""))

            for wire, _ in wires:
                counts = [0] * CLIENTS
                stop = threading.Event()

                def client(i, wire=wire):
                    with ServingClient(("127.0.0.1", PORT), timeout=600.0,
                                       wire=wire) as c:
                        while not stop.is_set():
                            c.infer(x)
                            counts[i] += 1

                threads = [threading.Thread(target=client, args=(i,),
                                            daemon=True)
                           for i in range(CLIENTS)]
                t0 = time.perf_counter()
                for t in threads:
                    t.start()
                time.sleep(SECONDS)
                stop.set()
                for t in threads:
                    t.join(timeout=600)
                elapsed = time.perf_counter() - t0
                wf_s = sum(counts) * K / elapsed
                results[(label, wire)] = round(wf_s, 1)
                log(f"[{label} | {wire} wire] {CLIENTS} clients x "
                    f"({K}, {L}): {sum(counts) * K} waveforms in "
                    f"{elapsed:.1f} s -> {wf_s:.1f} wf/s")

            with ServingClient(("127.0.0.1", PORT)) as c:
                stats_by[label] = c.stats()
            daemon.send_signal(signal.SIGTERM)
            rc = daemon.wait(timeout=180)
            drained = "served:" in daemon.stderr.read()
            if rc != 0 or not drained:
                raise RuntimeError(f"daemon {label} exit rc={rc} "
                                   f"drained={drained}")
        finally:
            if daemon.poll() is None:
                daemon.send_signal(signal.SIGTERM)
                try:
                    daemon.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    daemon.kill()
        if label != PLAN[-1][0]:
            log(f"sleeping {CLAIM_SLEEP} s (claim wedge)...")
            time.sleep(CLAIM_SLEEP)

    ok = all(results.get(k, 0) > 0 for k in results)
    for label, enc, wires in PLAN:
        for wire, gate in wires:
            if gate and agreement[(label, wire)] < gate:
                ok = False
                log(f"GATE FAIL: {label}/{wire} "
                    f"{agreement[(label, wire)]:.4f} < {gate}")

    if not SMOKE:
        base = results[("f32-input", "f32")]
        lines = [
            "# Batched-client daemon throughput on hardware — both legs",
            "",
            f"{time.strftime('%Y-%m-%d')}: {CLIENTS} closed-loop TCP "
            f"clients each submitting FULL ({K}, {L}) requests to the "
            f"int8-SGB artifact daemon (max_batch={K}), {SECONDS} s "
            f"steady state per row. Rows vary the CLIENT WIRE "
            f"(serving/tcp.py SFN2) and the DEVICE LEG (serve.py "
            f"``input_enc=``: the daemon->device relay transfer ships "
            f"16-bit codes instead of f32 — VERDICT r4 #2/#3). All "
            f"agreements are end-to-end vs the all-f32 path.",
            "",
            "| device leg (artifact) | client wire | bytes/request | "
            "throughput | vs all-f32 | stable-row coord agreement |",
            "|---|---|---|---|---|---|",
        ]
        for label, enc, wires in PLAN:
            for wire, gate in wires:
                k = (label, wire)
                lines.append(
                    f"| {label} | {wire} | {wire_mb(wire):.2f} MB | "
                    f"{results[k]:.1f} wf/s | "
                    f"{results[k] / base - 1:+.1%} | {agreement[k]:.4f}"
                    + (" (experiment)" if gate == 0.9 else "") + " |")
        lines += [
            "",
            f"Same-run baseline discipline (VERDICT r4 #6): every delta "
            f"is against THIS run's all-f32 row ({base:.1f} wf/s); "
            f"absolute wf/s rides the relay's per-run load (r3 measured "
            f"1,019.6, r4 650.3 on the same setup).",
            "",
            "Agreements are computed over STABLE rows: a reference row "
            "decoding to >1 nonzero coord carries an EXACT top-2 heatmap "
            "tie (the int8-SGB path's discrete codes create these; both "
            "tied positions survive th=Null by the reference's own rule) "
            "— an index-order lottery ANY perturbation flips, the same "
            "mechanism docs/ESPCN_DIAG_tpu.md pins for espcn. Tie rows "
            "are excluded from gates and counted in the run log.",
            "",
            "Why 16-bit and not 8-bit: the CPU encoding sweep "
            "(scripts/input_enc_sweep.py) measured per-waveform int8 at "
            "0.974 and per-CHUNK s8c8/16/32 at ~0.977 on echo data — the "
            "decode flips are carrier-cycle near-ties inside the echo's "
            "own chunk, which finer chunk scales cannot fix; s16 (0.9974) "
            "and bf16 (lossless by construction) clear the 0.99 gate at "
            "half the f32 bytes. The int8 wire row is kept as the "
            "documented experiment with a 0.9 sanity floor (ADVICE r4).",
            "",
            f"Daemon occupancy this run: "
            + ", ".join(f"{lbl} {stats_by[lbl]['occupancy']:.3f}"
                        for lbl, _, _ in PLAN) + ".",
        ]
        with open("/root/repo/docs/SERVE_BATCHED_tpu.md", "w") as f:
            f.write("\n".join(lines) + "\n")
        log("wrote docs/SERVE_BATCHED_tpu.md")

    print({"ok": ok,
           "wf_s": {f"{a}/{b}": v for (a, b), v in results.items()},
           "agreement": {f"{a}/{b}": round(v, 4)
                         for (a, b), v in agreement.items()}})
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
