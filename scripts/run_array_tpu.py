"""Drive the job-array CLI end-to-end on the real TPU chip.

One process (consecutive TPU processes pay 5-10 min claim-wedge stalls,
CLAUDE.md), three in-process drives of ``stofnet_tpu.cli.array.run``:

1. train mode  — ``seeds=2`` on a synthetic chirp set (the reference's
   train_pala_array.sh shape: N seeds, here as ONE program);
2. eval mode   — ``model_files=[different-armadillo, graceful-snow]``:
   the two full-SGB StofNet reference checkpoints (chirp rf10 + PALA
   rf20, array_chirp_params.txt:1 / array_pala_params.txt:1) stacked
   into one array program over the test split;
3. th_sweep    — ``th_sweep=[...]`` decoding ONE forward at T thresholds
   (the reference's per-threshold rows re-run the model each time).

Writes docs/ARRAY_CLI_tpu.md with the emitted tables/rows.

Smoke on CPU first: ``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
python scripts/run_array_tpu.py --smoke``.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SMOKE = "--smoke" in sys.argv


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    from stofnet_tpu.cli.array import run
    from stofnet_tpu.cli.main import DEFAULT_CONFIG
    from stofnet_tpu.data.synthetic import generate_chirp_dataset
    from stofnet_tpu.utils.config import load_config

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    log(f"device: {jax.devices()[0]}")

    sample_num = 160 if SMOKE else 800
    # distinct smoke/real roots: a CPU smoke must never regenerate the
    # dataset out from under a concurrent hardware run
    base = "/tmp/array_tpu_chirp_smoke" if SMOKE else "/tmp/array_tpu_chirp"
    root = generate_chirp_dataset(
        f"{base}/stof_chirp101_dataset", sample_num=sample_num,
        n_positions=3, n_train_per_pos=6, n_test_per_pos=4)

    def cfg(**over):
        c = load_config(DEFAULT_CONFIG)
        c.update(data_dir=str(root), run_dir="/tmp/array_tpu_runs",
                 ckpt_dir="/tmp/array_tpu_ckpts", model="stofnet",
                 rf_scale_factor=4 if SMOKE else 10, max_echoes=8,
                 etol=1600)
        c.update(over)
        return c

    sections = []

    # 1) multi-seed training as one program
    t0 = time.perf_counter()
    tout = run(cfg(seeds=2, epochs=2, batch_size=4, crop_ratio=0.75))
    dt = time.perf_counter() - t0
    log(f"train seeds=2: {dt:.1f} s, members={tout['members']}")
    sections.append(
        "## train: seeds=2, epochs=2 (one vmapped program)\n\n"
        f"wall {dt:.1f} s | best seed {tout['best_seed']} "
        f"(val loss {tout['best_val_loss']:.4f})\n\n"
        "| seed | val loss | val RMSE | val Jaccard |\n|---|---|---|---|\n"
        + "\n".join(
            f"| {m['seed']} | {m['val_loss']:.4f} | {m['val_rmse']:.2f} "
            f"| {m['val_jaccard']:.1f} |" for m in tout["members"]))

    # 2) two same-arch reference checkpoints in one eval program
    t0 = time.perf_counter()
    eout = run(cfg(evaluate=True, batch_size=4,
                   ckpt_dir="/root/reference/ckpts",
                   model_files=["different-armadillo", "graceful-snow"],
                   th=None))  # per-row max decode, the published protocol
    dt = time.perf_counter() - t0
    log(f"eval model_files: {dt:.1f} s")
    sections.append(
        "## eval: model_files=[different-armadillo, graceful-snow]\n\n"
        "Both full-SGB StofNet reference checkpoints (chirp rf10 / PALA "
        "rf20) as ONE array program over the synthetic chirp test split "
        f"(the rf20 member is cross-domain here, as expected).\n"
        f"wall {dt:.1f} s\n\n"
        "| member | RMSE | Jaccard % | precision | recall |\n"
        "|---|---|---|---|---|\n"
        + "\n".join(
            f"| {r['member']} | {r['total_distance_mean']:.2f} "
            f"±{r['total_distance_std']:.2f} | {r['total_jaccard']:.1f} "
            f"| {r['precision']:.1f} | {r['recall']:.1f} |"
            for r in eout["rows"]))

    # 3) threshold sweep: one forward, T decodes
    ths = [0.01, 0.1, 1.0, 3.0]  # spans under- to over-thresholded decode
    t0 = time.perf_counter()
    sout = run(cfg(evaluate=True, batch_size=4,
                   ckpt_dir="/root/reference/ckpts",
                   model_file="different-armadillo", th_sweep=ths))
    dt = time.perf_counter() - t0
    log(f"th_sweep: {dt:.1f} s")
    sections.append(
        f"## th_sweep: {ths} (one forward per batch, T decodes)\n\n"
        f"wall {dt:.1f} s\n\n"
        "| member | RMSE | Jaccard % |\n|---|---|---|\n"
        + "\n".join(
            f"| {r['member']} | {r['total_distance_mean']:.2f} "
            f"±{r['total_distance_std']:.2f} | {r['total_jaccard']:.1f} |"
            for r in sout["rows"]))

    dev = str(jax.devices()[0])
    body = (
        "# Job-array CLI on hardware\n\n"
        f"`cli.array` driven end-to-end on `{dev}` "
        f"({time.strftime('%Y-%m-%d')}; synthetic chirp, "
        f"sample_num={sample_num}, one process for all three drives).\n\n"
        + "\n\n".join(sections) + "\n")
    dest = ("/tmp/ARRAY_CLI_smoke.md" if SMOKE
            else "/root/repo/docs/ARRAY_CLI_tpu.md")
    with open(dest, "w") as f:
        f.write(body)
    log(f"wrote {dest}")
    print(json.dumps({"ok": True, "device": dev}))


if __name__ == "__main__":
    main()
