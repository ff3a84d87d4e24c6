"""Aux subsystems: sweep runner + table, plotting, profiling, logging."""

import json
from pathlib import Path

import numpy as np
import pytest

from stofnet_tpu.cli.sweep import SWEEPS, format_table, run_sweep
from stofnet_tpu.cli.main import DEFAULT_CONFIG
from stofnet_tpu.utils.config import load_config
from stofnet_tpu.utils.plotting import (
    plot_channel_overview, plot_comparison, fig_to_array,
)
from stofnet_tpu.utils.profiling import (
    benchmark_fn, count_params, flops_estimate,
)
from stofnet_tpu.data.synthetic import generate_chirp_dataset


@pytest.fixture(scope="module")
def chirp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("aux") / "stof_chirp101_dataset"
    return generate_chirp_dataset(root, n_positions=2, n_train_per_pos=2,
                                  n_test_per_pos=2, sample_num=400)


def test_sweep_rows_match_reference():
    # same (model, ckpt) rows as bash_scripts/array_*_params.txt
    assert [r[0] for r in SWEEPS["chirp"]] == [
        "stofnet", "stofnet", "edsr", "sincnet", "espcn", "zonzini", "gradpeak"]
    assert SWEEPS["pala"][0][2] == 0.015


def test_mini_sweep_and_table(chirp_root, tmp_path):
    cfg = load_config(DEFAULT_CONFIG)
    cfg.update(data_dir=str(chirp_root), run_dir=str(tmp_path / "runs"),
               ckpt_dir=str(tmp_path / "ckpts"), batch_size=2,
               rf_scale_factor=4, max_echoes=8, etol=14400)
    rows = [["espcn", None, None], ["gradpeak", None, None]]
    results = run_sweep(cfg, rows)
    assert len(results) == 2
    assert all("error" not in r for r in results)

    md = format_table(results)
    assert "RMSE [sample]" in md and "espcn" in md
    tex = format_table(results, latex=True)
    assert tex.startswith("\\begin{tabular}")
    assert "ESPCN" in tex


def test_plot_channel_overview(rng):
    frame = rng.standard_normal((4, 500)).astype(np.float32)
    gt = np.array([[100.0], [200.0], [0.0], [400.0]])
    es = np.array([[104.0], [198.0], [50.0], [0.0]])
    fig = plot_channel_overview(frame, gt, echoes=es)
    img = fig_to_array(fig)
    assert img.ndim == 3 and img.shape[-1] == 3


def test_plot_comparison(rng, tmp_path):
    wave = rng.standard_normal(1000).astype(np.float32)
    fig = plot_comparison(wave, [np.array([300.0]), np.array([305.0])],
                          ["stofnet", "gradpeak"],
                          gt_samples=np.array([302.0]),
                          save_path=str(tmp_path / "cmp.png"))
    assert (tmp_path / "cmp.png").exists()
    assert fig_to_array(fig).ndim == 3


def test_profiling_utils():
    import jax.numpy as jnp

    def f(x):
        return (x @ x).sum()

    x = jnp.ones((64, 64))
    flops = flops_estimate(f, x)
    if flops is not None:
        assert flops >= 2 * 64 * 64 * 64 * 0.5  # at least the matmul

    import jax

    stats = benchmark_fn(jax.jit(f), x, iters=3, warmup=1)
    assert stats["mean_ms"] > 0

    assert count_params({"a": np.zeros((3, 4)), "b": np.zeros(5)}) == 17
