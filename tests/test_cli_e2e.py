"""End-to-end driver tests: evaluate + train on synthetic data through the
CLI entry point, chirp and PALA paths."""

import json
from pathlib import Path

import numpy as np
import pytest

from stofnet_tpu.cli.main import DEFAULT_CONFIG, run
from stofnet_tpu.data.synthetic import generate_chirp_dataset
from stofnet_tpu.data.pala import PalaDatasetRf, generate_pala_dataset
from stofnet_tpu.utils.config import load_config

from tests import reference


@pytest.fixture(scope="module")
def chirp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli") / "stof_chirp101_dataset"
    return generate_chirp_dataset(root, n_positions=3, n_train_per_pos=4,
                                  n_test_per_pos=2, sample_num=400)


@pytest.fixture(scope="module")
def pala_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli") / "pala_synth"
    return generate_pala_dataset(root)


def base_cfg(tmp_path, **over):
    cfg = load_config(DEFAULT_CONFIG)
    cfg.update(run_dir=str(tmp_path / "runs"),
               ckpt_dir=str(tmp_path / "ckpts"))
    cfg.update(over)
    return cfg


def test_evaluate_stofnet_reference_ckpt(chirp_root, tmp_path):
    """Full chirp benchmark protocol with the shipped armadillo weights."""
    if reference.ckpt_path("different-armadillo") is None:
        pytest.skip("reference ckpts unavailable")
    cfg = base_cfg(
        tmp_path, data_dir=str(chirp_root), evaluate=True, batch_size=2,
        model="stofnet", model_file="different-armadillo", th=None,
        rf_scale_factor=10, max_echoes=8, etol=1600,  # tol is SQUARED samples
        ckpt_dir="/root/reference/ckpts",
    )
    out = run(cfg)
    # armadillo was trained on the (missing) real chirp101 hardware pulses;
    # on our synthetic stand-in we assert the pipeline wiring: finite loss,
    # detections within 40 samples of GT (the net localizes the synthetic
    # echo with a small onset-convention bias)
    assert np.isfinite(out["val_loss"])
    assert np.isfinite(out["total_distance_mean"])
    assert out["total_distance_mean"] < 40.0

    runs = list(Path(cfg.run_dir).glob("*_summary.json"))
    assert runs, "summary JSON written"
    summary = json.loads(runs[0].read_text())
    assert summary["model_name"] == "stofnet"
    assert summary["total_parameters"] == 645_764


def test_evaluate_gradpeak(chirp_root, tmp_path):
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
                   batch_size=2, model="gradpeak", th=None,
                   rf_scale_factor=10, max_echoes=8, etol=14400)
    out = run(cfg)
    assert np.isfinite(out["total_distance_mean"])


def test_train_stofnet_short(chirp_root, tmp_path):
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=4, model="stofnet", epochs=2,
                   rf_scale_factor=4, max_echoes=8, crop_ratio=0.75)
    out = run(cfg)
    assert np.isfinite(out["val_loss"])
    assert Path(out["checkpoint"]).exists()
    assert out["epochs"] == 2


def test_train_then_eval_roundtrip(chirp_root, tmp_path):
    """A checkpoint written by train loads back for evaluate."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=4, model="espcn", epochs=1,
                   rf_scale_factor=4, max_echoes=8)
    out = run(cfg)
    ckpt_name = Path(out["checkpoint"]).name
    cfg2 = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
                    batch_size=2, model="espcn", model_file=ckpt_name,
                    rf_scale_factor=4, max_echoes=8, th=None)
    out2 = run(cfg2)
    assert np.isfinite(out2["val_loss"])


def test_pala_dataset_contract(pala_root):
    ds = PalaDatasetRf(pala_root, sequences=[0, 1], rescale_factor=2,
                       ch_gap=2, angle_threshold=45)
    assert len(ds) == 8  # 2 sequences x 4 frames
    assert ds.get_channel_num() == 8
    assert ds.get_sample_num() == 400
    assert float(ds.get_key("wavelength")) == pytest.approx(1540.0 / 1.25e6)

    frame, _, gt, _, _, _ = ds[0]
    assert frame.shape == (3, 8, 800)
    assert gt.shape == (3, 8, 32)
    valid = gt[gt > 0]
    assert valid.size > 0 and valid.max() < 800

    # GT delay must coincide with an actual RF pulse peak on that channel
    w, c = 1, 4
    g = sorted(v for v in gt[w, c] if v > 0)[0]
    seg = np.abs(frame[w, c][int(g) - 12: int(g) + 12])
    assert seg.max() > 0.5 * np.abs(frame[w, c]).max()


def test_evaluate_pala_gradpeak(pala_root, tmp_path):
    cfg = base_cfg(tmp_path, data_dir=str(pala_root) + "/", evaluate=True,
                   batch_size=2, model="gradpeak", th=1e-5,
                   rf_scale_factor=2, ch_gap=2, sequences=[0],
                   max_echoes=16, etol=4)
    out = run(cfg)
    assert np.isfinite(out["total_distance_mean"])


def test_compile_cache_populates(chirp_root, tmp_path):
    """compile_cache=DIR turns on jax's persistent compilation cache
    (production cold-start: restarts skip the first-jit compile). The
    eval run must succeed and leave serialized executables in the dir."""
    cache = tmp_path / "xla_cache"
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=4, model="stofnet", epochs=1,
                   rf_scale_factor=4, max_echoes=8,
                   compile_cache=str(cache))
    out = run(cfg)
    assert np.isfinite(out["val_loss"])
    entries = list(cache.glob("*")) if cache.exists() else []
    assert entries, "compilation cache dir is empty after a jitted run"


def test_train_amp_e2e(chirp_root, tmp_path):
    """amp=True trains through the CLI driver (bf16 fwd/bwd, f32 master
    weights — train/steps.py make_train_step) and the resulting f32
    checkpoint evaluates through the normal path."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=4, model="stofnet", epochs=1,
                   rf_scale_factor=4, max_echoes=8, amp=True)
    out = run(cfg)
    assert np.isfinite(out["val_loss"])
    ckpt_name = Path(out["checkpoint"]).name
    cfg2 = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
                    batch_size=2, model="stofnet", model_file=ckpt_name,
                    rf_scale_factor=4, max_echoes=8, th=None)
    out2 = run(cfg2)
    assert np.isfinite(out2["val_loss"])


def test_train_resume(chirp_root, tmp_path):
    """Mid-run resume restores params + optimizer state + epoch counter."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=4, model="espcn", epochs=1,
                   rf_scale_factor=4, max_echoes=8)
    out1 = run(cfg)
    assert out1["epochs"] == 1

    cfg2 = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                    batch_size=4, model="espcn", epochs=2,
                    rf_scale_factor=4, max_echoes=8,
                    resume=out1["checkpoint"])
    out2 = run(cfg2)
    assert out2["epochs"] == 2  # continued from epoch 1, ran one more
    assert Path(out2["checkpoint"]).name.endswith("epoch_2")


@pytest.mark.parametrize("model", ["sincnet", "unet", "kuleshov", "edsr"])
def test_train_batchnorm_models_e2e(model, chirp_root, tmp_path):
    """The reference trains its whole zoo (main.py:198-289); BN/dropout
    models must train through the CLI too (round-1 crash regression).
    edsr rounds out the model axis (stofnet/espcn/zonzini covered below)."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=2, model=model, epochs=1,
                   rf_scale_factor=2, max_echoes=8, crop_ratio=0.75,
                   plot_interval=0)
    out = run(cfg)
    assert np.isfinite(out["val_loss"])
    assert Path(out["checkpoint"]).exists()


def test_train_zonzini_regression_path(chirp_root, tmp_path):
    """The regression train path (scalar ToA MSE, main.py:233-241) through
    the CLI: train one epoch, then evaluate the produced checkpoint."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=4, model="zonzini", epochs=1,
                   rf_scale_factor=4, max_echoes=8, plot_interval=0)
    out = run(cfg)
    assert np.isfinite(out["val_loss"])
    cfg2 = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
                    batch_size=2, model="zonzini",
                    model_file=Path(out["checkpoint"]).name,
                    rf_scale_factor=4, max_echoes=8, etol=1e9)
    out2 = run(cfg2)
    assert np.isfinite(out2["total_distance_mean"])


def test_train_export_pth(chirp_root, tmp_path):
    """export_pth=True writes a reference-compatible .pth next to the
    orbax checkpoint."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=4, model="espcn", epochs=1, rf_scale_factor=4,
                   max_echoes=8, export_pth=True, plot_interval=0)
    out = run(cfg)
    assert Path(out["export_pth"]).exists()
    import torch

    sd = torch.load(out["export_pth"], map_location="cpu", weights_only=True)
    assert any(k.endswith("conv1.weight") for k in sd)


def test_train_figures_logged(chirp_root, tmp_path):
    """In-loop channel-overview figures appear under runs/ (main.py:250-276)."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=4, model="espcn", epochs=1,
                   rf_scale_factor=4, max_echoes=8, plot_interval=1)
    run(cfg)
    figs = list(Path(cfg.run_dir).glob("*_figs/train_*.png"))
    assert figs, "no channel-overview figures written during training"


def test_eval_comparison_figures_logged(chirp_root, tmp_path):
    """Per-eval-artifact comparison figures appear next to the npz frames
    (main.py:369-384)."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
                   batch_size=2, model="espcn", th=None,
                   rf_scale_factor=4, max_echoes=8)
    run(cfg)
    figs = list(Path(cfg.run_dir).glob("*_frames/frame_*.png"))
    assert figs, "no comparison figures written during evaluation"


def test_evaluate_on_mesh_matches_single_device(chirp_root, tmp_path):
    """`mesh=True mesh_dp=4 mesh_sp=2` through the CLI reproduces the
    single-device benchmark metrics (SURVEY §2.31: DP/SP as first-class
    driver capability, not just a library)."""
    common = dict(data_dir=str(chirp_root), evaluate=True, batch_size=4,
                  model="espcn", th=None, rf_scale_factor=4, max_echoes=8)
    out_single = run(base_cfg(tmp_path / "s", **common))
    out_mesh = run(base_cfg(tmp_path / "m", mesh=True, mesh_dp=4, mesh_sp=2,
                            **common))
    assert out_mesh["total_distance_mean"] == pytest.approx(
        out_single["total_distance_mean"], rel=1e-4, abs=1e-5, nan_ok=True)
    assert out_mesh["total_jaccard"] == pytest.approx(
        out_single["total_jaccard"], rel=1e-4)
    assert out_mesh["val_loss"] == pytest.approx(out_single["val_loss"],
                                                 rel=1e-3)


def test_train_on_mesh_e2e(chirp_root, tmp_path):
    """Data-parallel training end to end through the CLI."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=4, model="espcn", epochs=1, rf_scale_factor=4,
                   max_echoes=8, mesh=True, mesh_dp=4, mesh_sp=2,
                   plot_interval=0)
    out = run(cfg)
    assert np.isfinite(out["val_loss"])
    assert Path(out["checkpoint"]).exists()


def test_evaluate_pala_stofnet(pala_root, tmp_path):
    """StofNet heatmap path on PALA RF channels (BASELINE config #4 wiring)."""
    cfg = base_cfg(tmp_path, data_dir=str(pala_root) + "/", evaluate=True,
                   batch_size=2, model="stofnet", th=0.015,
                   rf_scale_factor=2, ch_gap=2, sequences=[0],
                   max_echoes=16, etol=4)
    out = run(cfg)
    assert np.isfinite(out["val_loss"])


def test_train_nan_guard(chirp_root, tmp_path, monkeypatch):
    """A poisoned batch stops training with a clear error instead of
    silently optimizing on NaN (failure detection beyond the reference)."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=4, model="espcn", epochs=1,
                   rf_scale_factor=4, max_echoes=8, crop_ratio=0.75,
                   lr=1e30)  # guaranteed blow-up within the first epoch
    with pytest.raises(RuntimeError, match="non-finite train loss"):
        run(cfg)


def test_evaluate_empty_split_raises(chirp_root, tmp_path):
    """batch_size > eval split with drop_last must error, not report an
    all-NaN benchmark summary."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
                   batch_size=512, model="espcn", th=None,
                   rf_scale_factor=4, max_echoes=8)
    with pytest.raises(ValueError, match="no batches"):
        run(cfg)


def test_missing_ckpt_prefix_warns_and_runs(chirp_root, tmp_path, capsys):
    """Non-matching model_file prefix: reference semantics (run the fresh
    init, main.py:174-177) but with a loud stderr warning."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
                   batch_size=2, model="espcn", model_file="no-such-ckpt",
                   th=None, rf_scale_factor=4, max_echoes=8)
    out = run(cfg)
    assert np.isfinite(out["val_loss"])
    assert "RANDOM INIT" in capsys.readouterr().err


def test_train_empty_split_raises(chirp_root, tmp_path):
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=512, model="espcn", epochs=1,
                   rf_scale_factor=4, max_echoes=8, crop_ratio=0.75)
    with pytest.raises(ValueError, match="zero steps"):
        run(cfg)


def test_train_empty_val_split_raises(chirp_root, tmp_path):
    """Train split fits but the 20% val split is smaller than a batch:
    early stopping on zero val batches must error, not drive on 0.0."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=8, model="espcn", epochs=1,
                   rf_scale_factor=4, max_echoes=8, crop_ratio=0.75)
    # chirp_root train split has 12 items -> train 10 / val 2 < batch 8
    with pytest.raises(ValueError, match="validation split is empty"):
        run(cfg)


def test_evaluate_pala_on_mesh_matches_single_device(pala_root, tmp_path):
    """The channel-flattened PALA eval batch (B*C waveforms, main.py:208-210
    semantics) shards over the (dp, sp) mesh and reproduces single-device
    metrics — the mesh parity check test_evaluate_on_mesh_matches_single_
    device gives the chirp family, this covers the PALA branch (per-channel
    multi-target GT, ch_gap subsampling)."""
    common = dict(data_dir=str(pala_root) + "/", evaluate=True, batch_size=4,
                  model="espcn", th=None, rf_scale_factor=2, max_echoes=8,
                  sequences=[0, 1], ch_gap=16, etol=400)
    out_single = run(base_cfg(tmp_path / "s", **common))
    out_mesh = run(base_cfg(tmp_path / "m", mesh=True, mesh_dp=4, mesh_sp=2,
                            **common))
    assert out_mesh["total_distance_mean"] == pytest.approx(
        out_single["total_distance_mean"], rel=1e-4, abs=1e-5, nan_ok=True)
    assert out_mesh["total_jaccard"] == pytest.approx(
        out_single["total_jaccard"], rel=1e-4, nan_ok=True)
    assert out_mesh["val_loss"] == pytest.approx(out_single["val_loss"],
                                                 rel=1e-3)


def test_evaluate_int8_serving_path(chirp_root, tmp_path):
    """``int8=True`` runs the quantized serving path (models/int8.py)
    through the FULL benchmark protocol — decode, loss, toa_rmse — and
    scores within a near-tie margin of the f32 pipeline (the SGB-only
    scheme is decode-exact up to occasional near-tie peak flips; see
    tests/test_int8.py for the per-coordinate agreement gates)."""
    if reference.ckpt_path("different-armadillo") is None:
        pytest.skip("reference ckpts unavailable")
    common = dict(data_dir=str(chirp_root), evaluate=True, batch_size=2,
                  model="stofnet", model_file="different-armadillo", th=None,
                  rf_scale_factor=10, max_echoes=8, etol=1600,
                  ckpt_dir="/root/reference/ckpts", save_artifacts=False)
    out_f32 = run(base_cfg(tmp_path / "f32", **common))
    out_q = run(base_cfg(tmp_path / "q", int8=True, **common))
    assert out_q["int8"] is True
    assert "int8" not in out_f32
    assert np.isfinite(out_q["val_loss"])
    # the SGB is the only quantized op: heatmap loss moves by rounding only
    assert out_q["val_loss"] == pytest.approx(out_f32["val_loss"], rel=0.02)
    assert abs(out_q["total_distance_mean"]
               - out_f32["total_distance_mean"]) < 10.0


def test_evaluate_int8_rejects_other_models(chirp_root, tmp_path):
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
                   batch_size=2, model="espcn", th=None, rf_scale_factor=4,
                   max_echoes=8, int8=True)
    with pytest.raises(ValueError, match="int8"):
        run(cfg)


def test_train_int8_rejected(chirp_root, tmp_path):
    """int8 is a serving path: silently training full-precision under the
    flag would be a footgun, so the driver errors up front."""
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   batch_size=4, model="stofnet", epochs=1,
                   rf_scale_factor=4, max_echoes=8, int8=True)
    with pytest.raises(ValueError, match="SERVING"):
        run(cfg)


def test_profile_dir_writes_trace(chirp_root, tmp_path):
    """profile_dir= captures a jax.profiler trace window through the real
    driver (train mode; the reference has no profiler at all, SURVEY §5).
    The window starts at step 2 so it excludes the jit compile."""
    import os

    trace_dir = tmp_path / "trace"
    cfg = base_cfg(tmp_path, data_dir=str(chirp_root), evaluate=False,
                   model="stofnet", epochs=1, batch_size=4,
                   rf_scale_factor=4, max_echoes=8, crop_ratio=0.75,
                   profile_dir=str(trace_dir), profile_steps=1)
    run(cfg)
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(trace_dir)
             for f in fs]
    assert files, "profile_dir produced no trace files"
    assert any("trace" in f or f.endswith((".pb", ".json.gz"))
               for f in files), files
