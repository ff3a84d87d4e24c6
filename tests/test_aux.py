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

    # cross-model paper figure from the per-run frame artifacts
    # (utils/load_table_contents.py:115-116 -> stofnet_plot)
    from stofnet_tpu.cli.sweep import sweep_comparison_figure

    fig_path = sweep_comparison_figure(results, tmp_path / "runs")
    assert fig_path is not None and fig_path.exists()


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
    # vector-export parity (reference plot_frame.py:95-96 saves svg + eps):
    # a sequence of paths saves each, format inferred from the extension
    plot_comparison(wave, [np.array([300.0])], ["stofnet"],
                    save_path=[str(tmp_path / "cmp.svg"),
                               str(tmp_path / "cmp.eps")])
    assert (tmp_path / "cmp.svg").exists() and (tmp_path / "cmp.eps").exists()
    assert b"<svg" in (tmp_path / "cmp.svg").read_bytes()[:400]


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


def test_zip_extract_roundtrip(tmp_path):
    import zipfile
    from stofnet_tpu.utils.zip_extract import zip_extract

    src = tmp_path / "payload"
    src.mkdir()
    (src / "a.txt").write_text("hello")
    zpath = tmp_path / "payload.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(src / "a.txt", "payload/a.txt")
    import shutil

    shutil.rmtree(src)
    out = zip_extract(zpath)
    assert (out / "a.txt").read_text() == "hello"
    zip_extract(zpath)  # idempotent


def test_hilbert_concat_oscil(rng):
    import jax.numpy as jnp
    from stofnet_tpu.ops.hilbert import hilbert_transform_features

    x = rng.standard_normal((2, 1, 128)).astype("float32")
    out = hilbert_transform_features(jnp.asarray(x), concat_oscil=True)
    assert out.shape == (2, 2, 128)
    np.testing.assert_array_equal(np.asarray(out[:, 1]), x[:, 0])


def test_attention_block(rng):
    import jax
    import jax.numpy as jnp
    from stofnet_tpu.models.attention import AttentionBlock1D

    blk = AttentionBlock1D(features=32, num_heads=4, pool=4)
    x = jnp.asarray(rng.standard_normal((2, 64, 32)).astype("float32"))
    v = blk.init(jax.random.key(0), x)
    y = blk.apply(v, x)
    assert y.shape == x.shape


def test_report_tool_local(tmp_path):
    """Post-hoc report (cli/report.py): table rebuilt from past run
    summaries without re-running (load_table_contents.py parity)."""
    rd = tmp_path / "runs"
    rd.mkdir()
    for i, m in enumerate(["stofnet", "edsr"]):
        (rd / f"run{i}_summary.json").write_text(json.dumps({
            "model_name": m, "total_parameters": 1000 + i,
            "total_jaccard": 90.0, "total_inference_time": 1e-3,
            "total_distance_mean": 0.5, "total_distance_std": 0.1}))
    from stofnet_tpu.cli.report import local_results, main as report_main

    report_main([f"run_dir={rd}"])
    md = (rd / "metrics_table.md").read_text()
    assert (rd / "metrics_table.tex").exists()
    assert "stofnet" in md and "edsr" in md
    assert len(local_results(rd, 1)) == 1  # num_recent honored


def test_report_tool_empty_dir(tmp_path):
    from stofnet_tpu.cli.report import main as report_main

    with pytest.raises(SystemExit):
        report_main([f"run_dir={tmp_path / 'nothing'}"])


def test_zip_extract_mismatched_root(tmp_path):
    """Archive whose top-level dir differs from the zip stem: the actual
    extracted dir is detected and returned (not a nonexistent <stem>/)."""
    import zipfile

    from stofnet_tpu.utils.zip_extract import zip_extract

    src = tmp_path / "inner_dataset"
    src.mkdir()
    (src / "a.txt").write_text("1")
    zpath = tmp_path / "download.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(src / "a.txt", "inner_dataset/a.txt")
    import shutil

    shutil.rmtree(src)
    out = zip_extract(zpath)
    assert out.name == "inner_dataset" and (out / "a.txt").exists()
    assert zip_extract(zpath) == out  # idempotent, no re-extract loop


def test_bench_fetch_retries(monkeypatch):
    """bench.fetch recovers transient relay faults and bounds its retries
    (r2 post-mortem: one unretried FAILED_PRECONDITION killed BENCH_r02)."""
    import bench

    monkeypatch.setattr(bench, "FETCH_BACKOFF_S", 0.0)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("FAILED_PRECONDITION: TPU backend error")
        return 7

    assert bench.fetch(flaky, "probe") == 7 and calls["n"] == 3

    def dead():
        raise ValueError("permanent")

    with pytest.raises(ValueError, match="permanent"):
        bench.fetch(dead, "probe")


def test_bench_respawn_bounded(monkeypatch, tmp_path):
    """At the attempt ceiling with no last-good cache the belt re-raises
    (the driver then records rc=1 with the real traceback)."""
    import bench

    monkeypatch.setattr(bench, "CACHE_FILE", str(tmp_path / "lg.json"))
    monkeypatch.setenv("STOFNET_BENCH_ATTEMPT", str(bench.PROCESS_ATTEMPTS))
    execs = []
    monkeypatch.setattr(bench.os, "execv", lambda *a: execs.append(a))

    def boom():
        raise RuntimeError("wedged")

    with pytest.raises(RuntimeError, match="wedged"):
        bench.respawn_on_failure(boom, "headline")
    assert not execs

    # below the ceiling it sleeps then execs a fresh interpreter
    monkeypatch.setenv("STOFNET_BENCH_ATTEMPT", "1")
    monkeypatch.setattr(bench, "PROCESS_BACKOFF_S", 0.0)
    bench.respawn_on_failure(boom, "headline")
    assert len(execs) == 1 and execs[0][0] == bench.sys.executable


def test_bench_stale_fallback(monkeypatch, tmp_path, capsys):
    """When the relay outlasts the whole re-exec budget (r3: >12 h outage),
    the belt serves the last hardware-validated record for the mode from
    BENCH_LAST_GOOD.json, explicitly marked stale — one honest JSON line
    with rc=0 instead of a stack trace. Deterministic ShapeRegressions are
    never masked by the cache."""
    import json as _json

    import bench

    cache = tmp_path / "lg.json"
    monkeypatch.setattr(bench, "CACHE_FILE", str(cache))
    monkeypatch.setenv("STOFNET_BENCH_ATTEMPT", str(bench.PROCESS_ATTEMPTS))

    # emit() on a CPU backend refuses to cache (protects the committed
    # hardware record from relay-down debugging runs) ...
    rec = {"metric": "stofnet_rf_to_tof_throughput", "value": 11615.6,
           "unit": "wf/s", "vs_baseline": 1683.42, "path": "xla"}
    bench.emit(rec, "headline")
    assert not cache.exists()
    capsys.readouterr()

    # ... and persists a successful record when allowed (TPU in prod)
    monkeypatch.setenv("STOFNET_BENCH_CACHE_ANYWAY", "1")
    bench.emit(rec, "headline")
    saved = _json.loads(cache.read_text())["headline"]
    assert saved["record"] == rec and saved["measured_at"]
    capsys.readouterr()

    def down():
        raise RuntimeError("FAILED_PRECONDITION: TPU backend unreachable")

    bench.respawn_on_failure(down, "headline")  # rc=0 path: returns
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # still exactly ONE JSON line
    served = _json.loads(out[0])
    assert served["stale"] is True
    assert served["value"] == rec["value"] and served["path"] == "xla"
    assert "FAILED_PRECONDITION" in served["stale_reason"]
    assert served["measured_at"] == saved["measured_at"]

    # a different mode has no cache -> re-raise, no stale masking
    with pytest.raises(RuntimeError):
        bench.respawn_on_failure(down, "train")

    # deterministic pipeline regressions are code bugs: never served stale
    def regressed():
        raise bench.ShapeRegression("coords shape changed")

    with pytest.raises(bench.ShapeRegression):
        bench.respawn_on_failure(regressed, "headline")

    # any non-relay-shaped repeated failure (a code bug: AttributeError,
    # TypeError, an OOM in new bench code) also re-raises with rc=1 —
    # the stale cache answers ENVIRONMENT faults only (review finding)
    def code_bug():
        raise AttributeError("'NoneType' object has no attribute 'apply'")

    with pytest.raises(AttributeError):
        bench.respawn_on_failure(code_bug, "headline")
    assert not bench._relay_shaped(TypeError("bad arg"))
    assert bench._relay_shaped(bench.FetchTimeout("gate: still blocked"))
    assert bench._relay_shaped(
        RuntimeError("FAILED_PRECONDITION: TPU backend error"))


def test_bench_hang_watchdog(monkeypatch, tmp_path, capsys):
    """A fetch that HANGS (the observed full-outage failure mode: the first
    device fetch blocks forever after `device: TPU v5 lite0`) trips the
    watchdog, skips in-process retries (the claim is poisoned), and at the
    tighter timeout re-exec budget serves the stale record."""
    import json as _json
    import threading

    import bench

    monkeypatch.setattr(bench, "FETCH_TIMEOUT_S", 0.2)
    release = threading.Event()

    def hung():
        release.wait(30)  # parked like a dead-relay fetch

    with pytest.raises(bench.FetchTimeout, match="still blocked"):
        bench.fetch(hung, "gate")
    release.set()  # unpark the daemon worker

    # watchdog passes results and exceptions through when the relay is fine
    assert bench.fetch(lambda: 41 + 1, "ok") == 42

    # FetchTimeout gets the tighter budget: at attempt 2 it serves stale
    cache = tmp_path / "lg.json"
    cache.write_text(_json.dumps({"train": {
        "record": {"metric": "stofnet_train_throughput", "value": 2802.0,
                   "unit": "wf/s", "vs_baseline": 406.1},
        "measured_at": "2026-08-16T00:00:00Z"}}))
    monkeypatch.setattr(bench, "CACHE_FILE", str(cache))
    monkeypatch.setenv("STOFNET_BENCH_ATTEMPT",
                       str(bench.TIMEOUT_PROCESS_ATTEMPTS))
    execs = []
    monkeypatch.setattr(bench.os, "execv", lambda *a: execs.append(a))

    def outage():
        raise bench.FetchTimeout("gate: still blocked after 720s")

    # a FetchTimeout leaves the watchdogged fetch thread blocked in the
    # relay's native call, so after printing the stale record the bench
    # must HARD-exit (os._exit) — normal teardown aborts on that thread
    # (observed SIGABRT rc=134 after a valid JSON line, 2026-08-19)
    exits = []
    monkeypatch.setattr(bench, "_exit", lambda code: exits.append(code))
    bench.respawn_on_failure(outage, "train")
    served = _json.loads(capsys.readouterr().out.strip())
    assert served["stale"] is True and served["value"] == 2802.0
    assert not execs  # budget exhausted: no further claim-burn on a hang
    assert exits == [0]  # teardown skipped, rc=0

    # BELOW the budget, a hang re-execs ONCE with the wedge-recovery sleep
    # (r3 post-mortem: the round-end capture hung on the post-process claim
    # wedge, which a fresh process claim rides out) — no stale serve yet
    assert bench.TIMEOUT_PROCESS_ATTEMPTS >= 2  # VERDICT r3 #1
    monkeypatch.setenv("STOFNET_BENCH_ATTEMPT", "1")
    monkeypatch.setattr(bench, "TIMEOUT_BACKOFF_S", 0.0)
    bench.respawn_on_failure(outage, "train")
    assert len(execs) == 1 and execs[0][0] == bench.sys.executable
    assert capsys.readouterr().out.strip() == ""  # nothing served


def test_report_tool_wandb_pull(tmp_path, monkeypatch):
    """The cloud branch (reference utils/load_table_contents.py:8-41
    parity): last-N finished runs of a group pulled through the W&B API,
    newest first, and rendered into the table — exercised against a mock
    API so the offline harness can test it."""
    import sys
    import types

    from stofnet_tpu.cli import report

    class FakeRun:
        def __init__(self, name, group, created_at, summary):
            self.name, self.group = name, group
            self.created_at, self.summary = created_at, summary

    runs = [
        FakeRun("old-run", "chirp_array", "2026-01-01", {
            "model_name": "espcn", "total_distance_mean": 9.0,
            "total_distance_std": 1.0, "total_jaccard": 10.0,
            "total_parameters": 6948, "total_inference_time": 0.002}),
        FakeRun("new-run", "chirp_array", "2026-02-01", {
            "model_name": "stofnet", "total_distance_mean": 1.5,
            "total_distance_std": 0.5, "total_jaccard": 88.0,
            "total_parameters": 645764, "total_inference_time": 0.001}),
        FakeRun("other-group", "pala_array", "2026-03-01", {
            "model_name": "edsr"}),
    ]

    fake = types.ModuleType("wandb")

    class Api:
        def runs(self, project):
            assert project == "stofnet_tpu"
            return list(runs)

    fake.Api = Api
    monkeypatch.setitem(sys.modules, "wandb", fake)

    got = report.wandb_results("chirp_array", num_recent=7)
    assert [r["model"] for r in got] == ["stofnet", "espcn"]  # newest first
    assert report.wandb_results("chirp_array", num_recent=1)[0][
        "run_name"] == "new-run"

    # end-to-end: main() with wandb_group renders the CLOUD summaries
    report.main([f"run_dir={tmp_path}", "wandb_group=chirp_array"])
    md = (tmp_path / "metrics_table.md").read_text()
    assert "stofnet" in md and "espcn" in md and "88.0" in md
    assert "edsr" not in md  # other group filtered out

    # API failure falls back to None -> local summaries
    def boom(self, project):
        raise ConnectionError("offline")

    monkeypatch.setattr(Api, "runs", boom)
    assert report.wandb_results("chirp_array", 7) is None


def test_sweep_table_footnotes():
    """Generated tables carry the first-batch timing note always, and a
    dagger + note on random-init rows (VERDICT r2: the zonzini PALA row ran
    random-init with no marker in the table)."""
    from stofnet_tpu.cli.sweep import format_table

    rows = [
        {"model": "stofnet", "ckpt": "x", "total_distance_mean": 1.0,
         "total_distance_std": 0.1, "total_jaccard": 90.0,
         "total_parameters": 1000, "total_inference_time": 0.001},
        {"model": "zonzini", "ckpt": "polar-sun", "random_init": True,
         "total_distance_mean": 50.0, "total_distance_std": 5.0,
         "total_jaccard": 0.0, "total_parameters": 2000,
         "total_inference_time": 0.001},
    ]
    md = format_table(rows)
    assert "first" in md.lower() and "jit compilation" in md
    assert "zonzini (polar-sun) †" in md and "RANDOM-INIT" in md
    tex = format_table(rows, latex=True)
    assert "$^\\dagger$" in tex and "\\footnotesize" in tex

    md_clean = format_table(rows[:1])
    assert "†" not in md_clean  # no dagger section without random-init rows

    # quantized-serving rows (CLI int8=True) are labelled in both formats
    qrow = dict(rows[0], int8=True)
    assert "stofnet (x) [int8]" in format_table([qrow])
    assert "(int8)" in format_table([qrow], latex=True)


def test_bench_decoder_uses_ckpt_upsample():
    """Every bench pipeline decodes with the CHECKPOINT's upsample factor
    (import_stofnet reports it in overrides) — a non-x4 checkpoint must
    yield coords in its own sample units, not x4's."""
    import jax.numpy as jnp

    import bench

    heat = np.zeros((1, 1, 400), np.float32)
    heat[0, 0, 100] = 1.0
    for up in (2, 4):
        dec = bench.make_decoder({"upsample_factor": up})
        coords = np.asarray(dec(jnp.asarray(heat)))
        assert coords.max() == pytest.approx(100 / up)


def test_bench_shape_regression_not_retried(monkeypatch):
    """A deterministic output-shape regression must not be retried or
    re-exec'd (it would burn ~15 min of claim churn and bury the error)."""
    import bench

    monkeypatch.setenv("STOFNET_BENCH_ATTEMPT", "1")
    execs = []
    monkeypatch.setattr(bench.os, "execv", lambda *a: execs.append(a))
    monkeypatch.setattr(bench, "PROCESS_BACKOFF_S", 0.0)

    def bad():
        raise bench.ShapeRegression("pipeline output shape (1,) != (2,)")

    with pytest.raises(bench.ShapeRegression):
        bench.respawn_on_failure(bad, "headline")
    assert not execs  # escalated immediately, no re-exec


def test_console_scripts_resolve():
    """Every [project.scripts] entry point imports to a callable (a typo
    here would only surface at install time otherwise)."""
    import importlib

    targets = {
        "stofnet-tpu": "stofnet_tpu.cli.main:main",
        "stofnet-tpu-sweep": "stofnet_tpu.cli.sweep:main",
        "stofnet-tpu-array": "stofnet_tpu.cli.array:main",
        "stofnet-tpu-export": "stofnet_tpu.cli.export:main",
        "stofnet-tpu-serve": "stofnet_tpu.cli.serve:main",
        "stofnet-tpu-report": "stofnet_tpu.cli.report:main",
    }
    import tomllib
    from pathlib import Path

    pyproject = tomllib.loads(
        (Path(__file__).parent.parent / "pyproject.toml").read_text())
    assert pyproject["project"]["scripts"] == targets
    for spec in targets.values():
        mod, _, fn = spec.partition(":")
        assert callable(getattr(importlib.import_module(mod), fn))
