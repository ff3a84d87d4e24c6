"""Training-parity demonstration #2: the REGRESSION model family.

Same method as scripts/train_parity.py (which covers the heatmap family via
StofNet) but for ZonziniNetSmall, whose training objective is plain MSE to
the first-valid GT ToA sample (/root/reference/main.py:233-241) instead of
the blurred-mask heatmap loss: torch reference and stofnet_tpu train from
scratch on the same synthetic chirp data with the same recipe (AdamW lr
5e-4 wd 1e-8, cosine, early-stop patience 5), then both final models run
through OUR shared evaluation pipeline (torch weights via the golden-tested
.pth importer). Distribution-level parity, not bitwise (SURVEY "hard
parts").

Writes TRAINPARITY_zonzini.md. Run on CPU:
    PALLAS_AXON_POOL_IPS= python scripts/train_parity_zonzini.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

EPOCHS = 60
BATCH = 8
SAMPLE_NUM = 400
RF_SCALE = 4  # L = 1600
ETOL = 2500.0  # squared samples: single-echo regression, match within 50
SEED = 3008


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def train_torch(chirp_root, ckpt_dir: Path):
    """Reference recipe for the zonzini branch (main.py:179,233-248)."""
    import torch
    from torch import nn

    import reference  # tests/reference.py

    reference.add_to_path()
    from models import ZonziniNetSmall  # noqa: reference package

    from stofnet_tpu.data.chirp import ChirpDataset
    from stofnet_tpu.data.loader import DataLoader, split_dataset
    from stofnet_tpu.data.transforms import (
        AddNoise, Compose, CropChannelData, NormalizeVol,
    )
    from stofnet_tpu.train.early_stop import EarlyStopping

    torch.manual_seed(SEED)
    rng = np.random.default_rng(SEED)
    tf = Compose([NormalizeVol(), CropChannelData(ratio=0.75, rng=rng),
                  AddNoise(snr=30, rng=rng)])
    ds = ChirpDataset(chirp_root, split_dirname="train",
                      rf_scale_factor=RF_SCALE, transforms=tf)
    train_idx, val_idx = split_dataset(len(ds), 0.2, seed=SEED)
    train_loader = DataLoader(ds, train_idx, batch_size=BATCH, shuffle=True,
                              drop_last=True, seed=SEED)
    val_loader = DataLoader(ds, val_idx, batch_size=BATCH, drop_last=True)

    model = ZonziniNetSmall()
    optimizer = torch.optim.AdamW(model.parameters(), lr=5e-4,
                                  weight_decay=1e-8)
    scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(optimizer,
                                                           T_max=EPOCHS)
    early = EarlyStopping(patience=5, delta=1e-6, verbose=None)
    mse = nn.MSELoss()

    def torch_batch(batch):
        _, rf, _, gt_sample, _, _ = batch
        frame = torch.from_numpy(rf.astype(np.float32)).unsqueeze(1)
        # single-echo GT: first (only) valid ToA, main.py:236-240 semantics
        gt = torch.from_numpy(gt_sample.astype(np.float32)).reshape(-1, 1)
        gt[(gt <= 0) | torch.isnan(gt)] = 0
        return frame, gt

    curve = []
    epochs_run = 0
    for e in range(EPOCHS):
        model.train()
        tl, n = 0.0, 0
        for batch in train_loader:
            frame, gt = torch_batch(batch)
            loss = mse(model(frame), gt)
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
            tl += float(loss.item())  # sum of batch means (main.py:242)
            n += frame.shape[0]
        scheduler.step()

        model.eval()
        vl = 0.0
        with torch.no_grad():
            for batch in val_loader:
                frame, gt = torch_batch(batch)
                vl += float(mse(model(frame), gt).item())
        curve.append((tl / max(len(train_idx), 1), vl))
        epochs_run = e + 1
        log(f"[torch] epoch {e}: train {curve[-1][0]:.2f} val {vl:.2f}")
        if early(vl):
            break

    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"torchref-0000_rf-scale{RF_SCALE}_epoch_{epochs_run}.pth"
    torch.save(model.state_dict(), path)
    return curve, path


def train_jax(chirp_root, run_dir: Path, ckpt_dir: Path):
    from stofnet_tpu.cli.main import DEFAULT_CONFIG, run
    from stofnet_tpu.utils.config import load_config

    cfg = load_config(DEFAULT_CONFIG)
    cfg.update(data_dir=str(chirp_root), evaluate=False, model="zonzini",
               epochs=EPOCHS, batch_size=BATCH, rf_scale_factor=RF_SCALE,
               max_echoes=8, crop_ratio=0.75, snr_db=30, seed=SEED,
               plot_interval=0, run_dir=str(run_dir), ckpt_dir=str(ckpt_dir))
    out = run(cfg)

    import json

    curve = []
    for line in open(Path(run_dir) / f"{out['run_name']}.jsonl"):
        rec = json.loads(line)
        if rec.get("event") == "epoch":
            curve.append((rec["train_loss"], rec["val_loss"]))
    return curve, Path(out["checkpoint"])


def evaluate_ckpt(chirp_root, ckpt: Path, run_dir: Path):
    from stofnet_tpu.cli.main import DEFAULT_CONFIG, run
    from stofnet_tpu.utils.config import load_config

    cfg = load_config(DEFAULT_CONFIG)
    cfg.update(data_dir=str(chirp_root), evaluate=True, model="zonzini",
               model_file=ckpt.name, ckpt_dir=str(ckpt.parent),
               batch_size=2, rf_scale_factor=RF_SCALE, th=None,
               max_echoes=8, etol=ETOL, seed=SEED,
               run_dir=str(run_dir), save_artifacts=False)
    return run(cfg)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from stofnet_tpu.data.synthetic import generate_chirp_dataset

    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        chirp_root = generate_chirp_dataset(
            td / "stof_chirp101_dataset", n_positions=4, n_train_per_pos=40,
            n_test_per_pos=10, sample_num=SAMPLE_NUM)

        log("=== training JAX ZonziniNetSmall ===")
        jax_curve, jax_ckpt = train_jax(chirp_root, td / "runs_jax",
                                        td / "ckpts_jax")
        log("=== training torch reference ZonziniNetSmall ===")
        torch_curve, torch_ckpt = train_torch(chirp_root, td / "ckpts_torch")

        log("=== evaluating both through the shared pipeline ===")
        jax_eval = evaluate_ckpt(chirp_root, jax_ckpt, td / "runs_eval_jax")
        torch_eval = evaluate_ckpt(chirp_root, torch_ckpt,
                                   td / "runs_eval_torch")

    rj, rt = jax_eval["total_distance_mean"], torch_eval["total_distance_mean"]
    jj, jt = jax_eval["total_jaccard"], torch_eval["total_jaccard"]

    lines = [
        "# TRAINPARITY (zonzini) — regression-family training parity",
        "",
        "Companion to TRAINPARITY.md (heatmap family / StofNet): both",
        "frameworks train ZonziniNetSmall from scratch with the reference",
        "recipe — plain MSE to the first-valid GT ToA",
        "(/root/reference/main.py:233-241), AdamW lr 5e-4, cosine over",
        f"{EPOCHS} epochs, early-stop patience 5 — on the same synthetic",
        f"chirp data (L={SAMPLE_NUM * RF_SCALE}), then evaluate through the",
        "shared pipeline (torch weights via the golden-tested importer).",
        "",
        f"Generated by scripts/train_parity_zonzini.py on "
        f"{time.strftime('%Y-%m-%d')} (CPU, {time.time() - t0:.0f}s).",
        "",
        f"## Final held-out metrics (etol={ETOL} squared samples)",
        "",
        "| framework | ToA RMSE [samples] | Jaccard [%] | val loss |",
        "|---|---|---|---|",
        f"| stofnet_tpu (JAX) | {rj:.2f} | {jj:.1f} | "
        f"{jax_eval['val_loss']:.2f} |",
        f"| reference (torch) | {rt:.2f} | {jt:.1f} | "
        f"{torch_eval['val_loss']:.2f} |",
        "",
        "## Loss curves (per epoch: train, val; regression MSE in samples^2)",
        "",
        "| epoch | JAX train | JAX val | torch train | torch val |",
        "|---|---|---|---|---|",
    ]
    for i in range(max(len(jax_curve), len(torch_curve))):
        j = jax_curve[i] if i < len(jax_curve) else ("-", "-")
        t = torch_curve[i] if i < len(torch_curve) else ("-", "-")
        fmt = lambda v: f"{v:.2f}" if isinstance(v, float) else v  # noqa: E731
        lines.append(f"| {i} | {fmt(j[0])} | {fmt(j[1])} | {fmt(t[0])} | "
                     f"{fmt(t[1])} |")
    lines.append("")

    (REPO / "TRAINPARITY_zonzini.md").write_text("\n".join(lines))
    log(f"JAX:   rmse {rj:.2f}  jaccard {jj:.1f}")
    log(f"torch: rmse {rt:.2f}  jaccard {jt:.1f}")
    log("wrote TRAINPARITY_zonzini.md")

    assert abs(jj - jt) <= 20.0, f"jaccard gap too large: {jj} vs {jt}"
    assert rj <= 2.0 * max(rt, 2.0), f"rmse gap too large: {rj} vs {rt}"
    log("PARITY OK")


if __name__ == "__main__":
    main()
