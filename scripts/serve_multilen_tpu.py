"""Multi-length + int8-artifact serving daemon on the real chip.

Closes the last two serving hops not yet driven on hardware:

1. the EXPORTED int8-SGB artifact (the live int8 pipeline serves the
   headline six times over — bench.py; the artifact is bit-exact vs the
   live pipeline on CPU — tests/test_serve.py — but had not itself run
   on the chip);
2. LENGTH ROUTING through one daemon port (the router is host-side
   logic, but the two per-length pipelines sharing one chip process is
   the deployment shape).

ONE TPU process (the daemon) serves BOTH: an int8 stofnet artifact at
L=8000 and a bf16 stofnet artifact at L=4000, comma-separated on the
CLI; a separate CPU-only client drives echo waveforms of both lengths
plus the SFNS live-stats query, and decoded coords are checked against
each artifact's cpu lowering (±1 sample). SIGTERM drain closes it.
Writes docs/SERVE_MULTILEN_tpu.md.

Smoke on CPU: ``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
python scripts/serve_multilen_tpu.py --smoke``.

NB: run the orchestrator CPU-only (PALLAS_AXON_POOL_IPS= env).
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
TAG = "smoke" if SMOKE else "tpu"
PORT = 17737 if SMOKE else 17736
L_INT8, L_BF16 = 8000, 4000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def echoes(n, length, rng):
    from bench import make_gate_batch

    if length >= 2000:
        return np.asarray(make_gate_batch(n, length, rng), np.float32)
    t = np.arange(length, dtype=np.float32)
    pos = rng.uniform(length / 8, 7 * length / 8, n)
    return np.stack([(np.exp(-0.5 * ((t - p) / 12.0) ** 2)
                      * np.sin(2 * np.pi * t / 20.0))[None]
                     for p in pos]).astype(np.float32)


def main():
    env_cpu = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    env_tpu = (env_cpu if SMOKE else
               dict(os.environ, PALLAS_AXON_POOL_IPS="127.0.0.1",
                    JAX_PLATFORMS="axon"))
    rng = np.random.default_rng(10)
    art8, art4 = f"/tmp/ml_int8_{TAG}.jaxexp", f"/tmp/ml_bf16_{TAG}.jaxexp"
    calib = f"/tmp/ml_calib_{TAG}.npy"
    np.save(calib, echoes(16, L_INT8, rng))

    # 1) exports (CPU): int8-SGB at L=8000, bf16 at L=4000
    for out, length, extra in (
            (art8, L_INT8, [f"int8_calib={calib}"]),
            (art4, L_BF16, [])):
        subprocess.run(
            [sys.executable, "-m", "stofnet_tpu.cli.export",
             "model_file=different-armadillo",
             "ckpt_dir=/root/reference/ckpts", f"out={out}", "batch=b",
             f"length={length}", "th=Null", "max_echoes=8",
             "platforms=cpu,tpu", *extra],
            check=True, env=env_cpu, cwd="/root/repo", timeout=900)
        log(f"exported {out} ({os.path.getsize(out) / 1e6:.2f} MB)")

    # 2) daemon: the machine's only TPU process, serving BOTH lengths
    daemon = subprocess.Popen(
        [sys.executable, "-m", "stofnet_tpu.cli.serve",
         f"artifact={art8},{art4}", f"port={PORT}", "max_batch=32",
         "max_pending=256"],
        env=env_tpu, cwd="/root/repo", stderr=subprocess.PIPE, text=True)
    try:
        t0 = time.perf_counter()
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
        startup_s = time.perf_counter() - t0
        log(f"daemon up in {startup_s:.1f} s (2 artifacts, bucket warmup)")

        from stofnet_tpu.serving import ServingClient

        x8 = echoes(16, L_INT8, rng)
        x4 = echoes(16, L_BF16, rng)
        with ServingClient(("127.0.0.1", PORT), timeout=600.0) as cli:
            got8 = cli.infer(x8[:, 0])          # (16, L8000) one request
            got4 = cli.infer(x4[:, 0])          # routed by length
            # interleaved singles across lengths on ONE connection
            inter8 = cli.infer(x8[0, 0])
            inter4 = cli.infer(x4[0, 0])
            stats = cli.stats()
        log(f"stats: {stats}")

        # 3) correctness vs each artifact's cpu lowering
        from stofnet_tpu.serve import load_pipeline

        ref8 = np.asarray(load_pipeline(art8)(x8))
        ref4 = np.asarray(load_pipeline(art4)(x4))
        agree8 = float(np.mean(np.abs(ref8 - got8) <= 1.0))
        agree4 = float(np.mean(np.abs(ref4 - got4) <= 1.0))
        inter_ok = bool(np.all(np.abs(ref8[0] - inter8) <= 1.0)
                        and np.all(np.abs(ref4[0] - inter4) <= 1.0))
        per_len = {int(k): v for k, v in stats["per_length"].items()}
        routed_ok = (per_len[L_INT8]["requests"] == 2
                     and per_len[L_BF16]["requests"] == 2)
        log(f"int8 L8000 agreement {agree8:.4f}; bf16 L4000 agreement "
            f"{agree4:.4f}; interleaved ok {inter_ok}; routing "
            f"counters ok {routed_ok}")

        # 4) clean shutdown
        daemon.send_signal(signal.SIGTERM)
        rc = daemon.wait(timeout=180)
        drained = "served:" in daemon.stderr.read()

        ok = (agree8 >= 0.99 and agree4 >= 0.99 and inter_ok and routed_ok
              and rc == 0 and drained)
        if not SMOKE:
            body = f"""# Multi-length + int8-artifact daemon on hardware

One `cli.serve` daemon ({time.strftime('%Y-%m-%d')}), the machine's
only TPU process, serving TWO artifacts from one port — the int8-SGB
export at L={L_INT8} and the bf16 export at L={L_BF16} — requests
routed by waveform length (serving/router.py), driven by a separate
CPU-only TCP client.

| check | result |
|---|---|
| daemon startup (2 artifacts, bucket warmups) | {startup_s:.1f} s |
| int8 artifact decode agreement vs its cpu lowering (16 echo wf) | {agree8:.4f} |
| bf16 L={L_BF16} artifact agreement | {agree4:.4f} |
| interleaved per-length singles on one connection | {'ok' if inter_ok else 'FAIL'} |
| SFNS live stats per-length request counters | {'ok' if routed_ok else 'FAIL'} |
| SIGTERM -> drain -> exit | rc={rc}, drained={drained} |

This closes the last serving hops not previously driven on the chip:
the EXPORTED int8 artifact (live int8 serves the headline, bench.py)
and length routing with two pipelines sharing one device process.
"""
            with open("/root/repo/docs/SERVE_MULTILEN_tpu.md", "w") as f:
                f.write(body)
            log("wrote docs/SERVE_MULTILEN_tpu.md")

        print({"ok": ok, "agree_int8": agree8, "agree_bf16": agree4,
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
