"""Regenerate the chirp sweep table with a quality-bearing row.

Same move as scripts/run_pala_sweeps.py for the chirp protocol
(array_chirp_params.txt: batch_size=1, rf_scale=10, per-model
thresholds): the shipped checkpoints were trained on the real (absent
upstream) chirp acquisition, so on the synthetic stand-in their rows
measure protocol plumbing only; a StofNet trained here on the synthetic
train split (the recipe train-parity validated in TRAINPARITY.md) adds a
row with meaningful held-out RMSE/Jaccard. One TPU process end to end.

Usage: python scripts/run_chirp_sweep.py [epochs]
Outputs runs_chirp_sweep/metrics_table.{md,tex}; stdout echoes the table.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SEED = 3008
DATA = Path("/tmp/stof_chirp101_dataset_r3")
CKPTS = REPO / "ckpts"
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from stofnet_tpu.cli.main import DEFAULT_CONFIG, run
    from stofnet_tpu.cli.sweep import (SWEEP_OVERRIDES, SWEEPS, run_sweep,
                                       write_tables)
    from stofnet_tpu.data.synthetic import generate_chirp_dataset
    from stofnet_tpu.utils.config import load_config

    if not DATA.exists():
        generate_chirp_dataset(DATA, n_positions=4, n_train_per_pos=40,
                               n_test_per_pos=10, sample_num=800)
    log(f"dataset at {DATA}")

    # train StofNet AND EDSR from scratch on the synthetic train split
    # (L = 800*10 = 8000: the full protocol length). Two trained-here
    # families make the held-out table an actual model comparison
    # (VERDICT r4 #1, same move as run_pala_sweeps.py).
    ckpts = {}
    for fam in ("stofnet", "edsr"):
        cfg = load_config(DEFAULT_CONFIG)
        cfg.update(data_dir=str(DATA), evaluate=False, model=fam,
                   epochs=EPOCHS, batch_size=8, rf_scale_factor=10,
                   max_echoes=8, crop_ratio=0.75, snr_db=30, seed=SEED,
                   plot_interval=0,
                   run_dir=str(REPO / f"runs_chirp_train_{fam}"),
                   ckpt_dir=str(CKPTS))
        out = run(cfg)
        ckpts[fam] = Path(out["checkpoint"])
        log(f"trained-here {fam} checkpoint: {ckpts[fam]}")
    ckpt = ckpts["stofnet"]

    # trained-here quality rows (both families) + the stofnet checkpoint
    # through the int8 serving path (models/int8.py; CLI int8=True) as a
    # quantized-quality row
    rows = list(SWEEPS["chirp"]) + [
        ["stofnet", ckpt.name, None],
        ["edsr", ckpts["edsr"].name, None],
        ["stofnet", ckpt.name, None, {"int8": True}],
    ]
    scfg = load_config(DEFAULT_CONFIG)
    scfg.update(data_dir=str(DATA), ckpt_dir=str(CKPTS), max_echoes=8,
                seed=SEED, run_dir=str(REPO / "runs_chirp_sweep"),
                save_artifacts=True, th_search_interval=10)
    for k, v in SWEEP_OVERRIDES["chirp"].items():
        scfg[k] = v
    results = run_sweep(scfg, rows)
    print(write_tables(results, scfg.run_dir))


if __name__ == "__main__":
    main()
