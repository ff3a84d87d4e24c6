"""Regenerate the PALA + rat sweep tables with a quality-bearing row.

VERDICT r2 #3: the r2 PALA/rat tables were ~all NaN because reference
checkpoints (trained on the real, upstream-lost acquisition) met the
synthetic stand-in data. This script makes the tables quality-bearing the
only honest way available: it TRAINS StofNet from scratch on the synthetic
PALA training sequences (the recipe train-parity validated against torch —
scripts/train_parity_pala.py / TRAINPARITY_pala.md), then runs the full
reference sweep protocols (array_pala_params.txt rows + rat_benchmark.sh
th=1/ch_gap=1/etol=2) on a held-out sequence, with the trained-here
checkpoint as an extra row. Ckpt-less / mismatched rows now carry the
random-init dagger automatically (cli/sweep.py footnotes).

One TPU process end to end (train + both sweeps) — each python start pays
the axon claim, so everything rides one claim. Outputs:
  runs_pala_sweep/metrics_table.{md,tex}, runs_rat_sweep/metrics_table.*
  (stdout echoes both tables; docs/SWEEP_*_tpu.md are updated from these)

Usage: python scripts/run_pala_sweeps.py [epochs]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SEED = 3008
TRAIN_SEQS = [0, 1]
EVAL_SEQS = [2]
# --smoke: tiny dataset + 1 epoch on CPU — validates the train->sweep
# plumbing (incl. the trained-here EDSR rows) without the hardware run
SMOKE = "--smoke" in sys.argv
if SMOKE:
    sys.argv.remove("--smoke")
DATA = Path("/tmp/pala_synth_smoke" if SMOKE else "/tmp/pala_synth_r3")
CKPTS = REPO / ("ckpts_smoke" if SMOKE else "ckpts")
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else (1 if SMOKE else 25)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from stofnet_tpu.cli.main import DEFAULT_CONFIG, run
    from stofnet_tpu.cli.sweep import (SWEEP_OVERRIDES, SWEEPS, run_sweep,
                                       write_tables)
    from stofnet_tpu.data.pala import generate_pala_dataset
    from stofnet_tpu.utils.config import load_config

    if not (DATA / "pala_config.yaml").exists():
        if SMOKE:
            generate_pala_dataset(DATA, n_sequences=3, n_frames=8,
                                  n_angles=2, n_channels=8, n_samples=100,
                                  n_targets=2, seed=SEED)
        else:
            generate_pala_dataset(DATA, n_sequences=3, n_frames=30,
                                  n_angles=2, n_channels=16, n_samples=400,
                                  n_targets=3, seed=SEED)
    log(f"dataset at {DATA}")

    # 1) train StofNet AND EDSR from scratch on the synthetic train
    #    sequences (protocol shape: rf_scale=20 -> L=8000, ch_gap default
    #    32). Two trained-here families make the held-out table an actual
    #    model comparison (VERDICT r3 #5) instead of one quality row among
    #    protocol-smoke reference-ckpt rows.
    ckpts = {}
    for fam in ("stofnet", "edsr"):
        cfg = load_config(DEFAULT_CONFIG)
        cfg.update(data_dir=str(DATA), evaluate=False, model=fam,
                   sequences=TRAIN_SEQS, epochs=EPOCHS,
                   batch_size=2 if SMOKE else 4,
                   rf_scale_factor=20, max_echoes=8, snr_db=30, seed=SEED,
                   plot_interval=0,
                   run_dir=str(REPO / f"runs_pala_train_{fam}"),
                   ckpt_dir=str(CKPTS))
        out = run(cfg)
        ckpts[fam] = Path(out["checkpoint"])
        log(f"trained-here {fam} checkpoint: {ckpts[fam]}")
    ckpt = ckpts["stofnet"]

    # 2) both sweeps: reference rows + the trained-here rows (the rat
    #    protocol's th=1/ch_gap=1/etol=2 arrive via SWEEP_OVERRIDES)
    for sweep_name, extra_row_th in (("pala", None), ("rat", 1.0)):
        # trained-here quality rows (both families) + the stofnet ckpt
        # through the int8 serving path (CLI int8=True) as a
        # quantized-quality row
        rows = list(SWEEPS[sweep_name]) + [
            ["stofnet", ckpt.name, extra_row_th],
            ["edsr", ckpts["edsr"].name, extra_row_th],
            ["stofnet", ckpt.name, extra_row_th, {"int8": True}]]
        scfg = load_config(DEFAULT_CONFIG)
        scfg.update(data_dir=str(DATA), sequences=EVAL_SEQS,
                    ckpt_dir=str(CKPTS), max_echoes=8, seed=SEED,
                    run_dir=str(REPO / f"runs_{sweep_name}_sweep"),
                    save_artifacts=False, th_search_interval=10)
        for k, v in SWEEP_OVERRIDES[sweep_name].items():
            scfg[k] = v
        results = run_sweep(scfg, rows)
        md = write_tables(results, scfg.run_dir)
        print(f"===== {sweep_name} =====")
        print(md)
        print()


if __name__ == "__main__":
    main()
