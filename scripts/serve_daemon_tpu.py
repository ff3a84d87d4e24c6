"""Drive the one-command TCP serving daemon end-to-end on the real chip.

The production deployment chain, every link live: `cli.export` writes a
batch-polymorphic cpu+tpu artifact (CPU process), `cli.serve` loads it as
the machine's ONLY TPU process, and a separate CPU-only process speaks the
length-prefixed TCP protocol to it. Correctness is checked by running the
SAME artifact's cpu lowering on identical inputs (coords within ±1 sample,
the serving gate convention); the daemon then drains on SIGTERM.

The in-process host already has hardware load curves + a 10-min soak
(bench.py --serve/--soak); this closes the remaining untested hardware
hop: the TCP daemon itself. Writes docs/SERVE_DAEMON_tpu.md.

Smoke on CPU: ``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
python scripts/serve_daemon_tpu.py --smoke`` (daemon also runs on cpu).

NB: run the orchestrator itself CPU-only (PALLAS_AXON_POOL_IPS= env) — it
must not claim the chip the daemon needs.
"""

from __future__ import annotations

import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SMOKE = "--smoke" in sys.argv
PORT = 17733 if not SMOKE else 17734
# distinct smoke/real artifacts: a CPU smoke must never overwrite the
# artifact a concurrent hardware daemon is loading
ART = ("/tmp/stofnet_daemon_smoke.jaxexp" if SMOKE
       else "/tmp/stofnet_daemon.jaxexp")
L = 8000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def echo_waves(n, rng):
    """Synthetic single-echo waveforms (the bench gate distribution)."""
    from bench import make_gate_batch

    return np.asarray(make_gate_batch(n, L, rng))[:, 0]  # (n, L)


def main():
    env_cpu = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    env_tpu = (env_cpu if SMOKE else
               dict(os.environ, PALLAS_AXON_POOL_IPS="127.0.0.1",
                    JAX_PLATFORMS="axon"))

    # 1) export: batch-polymorphic artifact, weights baked in (CPU process)
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, "-m", "stofnet_tpu.cli.export",
         "model_file=different-armadillo", "ckpt_dir=/root/reference/ckpts",
         f"out={ART}", "batch=b", f"length={L}", "th=Null", "max_echoes=8",
         "platforms=cpu,tpu"],
        check=True, env=env_cpu, cwd="/root/repo", timeout=900)
    export_s = time.perf_counter() - t0
    size_mb = os.path.getsize(ART) / 1e6
    log(f"exported {ART} ({size_mb:.1f} MB) in {export_s:.1f} s")

    # 2) daemon: the machine's only TPU process
    daemon = subprocess.Popen(
        [sys.executable, "-m", "stofnet_tpu.cli.serve",
         f"artifact={ART}", f"port={PORT}", "max_batch=32"],
        env=env_tpu, cwd="/root/repo", stderr=subprocess.PIPE, text=True)
    try:
        t0 = time.perf_counter()
        deadline = time.perf_counter() + (300 if SMOKE else 1200)
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
        startup_s = time.perf_counter() - t0
        log(f"daemon up in {startup_s:.1f} s (incl. artifact load + "
            f"bucket warmup)")

        # 3) client traffic (stdlib TCP; this process never touches jax
        #    until the CPU check below)
        from stofnet_tpu.serving import ServingClient

        rng = np.random.default_rng(42)
        waves = echo_waves(32, rng)
        with ServingClient(("127.0.0.1", PORT)) as client:
            got1 = client.infer(waves[0])           # single waveform
            lat = []
            for i in range(50):
                t1 = time.perf_counter()
                client.infer(waves[i % 32])
                lat.append(time.perf_counter() - t1)
            got_batch = client.infer(waves)          # (32, L) one request
        p50 = float(np.percentile(lat, 50)) * 1e3
        p99 = float(np.percentile(lat, 99)) * 1e3
        log(f"client: 50 round trips p50 {p50:.1f} ms p99 {p99:.1f} ms")

        # 4) correctness: same artifact, cpu lowering, same inputs
        from stofnet_tpu.serve import load_pipeline

        ref = np.asarray(load_pipeline(ART)(waves[:, None, :]))
        agree = float(np.mean(np.abs(ref - got_batch) <= 1.0))
        single_ok = bool(np.all(np.abs(ref[0] - got1) <= 1.0))
        log(f"coord agreement daemon-vs-cpu-artifact: {agree:.4f} "
            f"(single-waveform ok: {single_ok})")

        # 5) clean shutdown: SIGTERM -> drain -> stats line
        daemon.send_signal(signal.SIGTERM)
        rc = daemon.wait(timeout=120)
        tail = daemon.stderr.read()
        drained = "served:" in tail
        log(f"daemon rc={rc} drained={drained}")

        if not SMOKE:
            dev_line = "TPU v5 lite"
            body = f"""# TCP serving daemon on hardware

The full production chain driven live ({time.strftime('%Y-%m-%d')}):
`cli.export` -> batch-polymorphic cpu+tpu artifact ({size_mb:.1f} MB,
weights baked in) -> `cli.serve artifact=... port={PORT}` as the only
TPU process -> a separate CPU-only process speaking the length-prefixed
TCP protocol (`serving/tcp.py`).

| step | result |
|---|---|
| export (CPU, cross-lowered cpu+tpu) | {export_s:.1f} s |
| daemon startup (load + bucket warmup, {dev_line}) | {startup_s:.1f} s |
| single-waveform TCP round trip p50 / p99 | {p50:.1f} / {p99:.1f} ms |
| 32-waveform batched request | ok |
| decoded-coord agreement vs the SAME artifact on cpu | {agree:.4f} |
| SIGTERM -> drain -> exit | rc={rc}, stats printed: {drained} |

The round-trip latency is the relay-dispatch floor seen in the load
curves (bench.py --serve: 1-client p50 ~115 ms) plus TCP; throughput
scaling under concurrency is measured there and in the 10-minute soak
(docs/SOAK_r3.json).
"""
            with open("/root/repo/docs/SERVE_DAEMON_tpu.md", "w") as f:
                f.write(body)
            log("wrote docs/SERVE_DAEMON_tpu.md")

        ok = agree >= 0.99 and single_ok and rc == 0 and drained
        print({"ok": ok, "agree": agree, "p50_ms": round(p50, 1),
               "rc": rc, "drained": drained})
        sys.exit(0 if ok else 1)
    finally:
        if daemon.poll() is None:
            daemon.send_signal(signal.SIGTERM)
            try:
                daemon.wait(timeout=60)
            except subprocess.TimeoutExpired:
                daemon.kill()


if __name__ == "__main__":
    main()
