"""Job-array harness (parallel/array.py + cli/array.py): vmapped multi-seed
training, multi-checkpoint / multi-threshold evaluation — exactness against
the equivalent sequential single-model runs, member sharding on the 8-way
virtual mesh, and the CLI drivers end to end.

Reference parity target: the SLURM job arrays these replace
(bash_scripts/chirp_benchmark.sh:14, train_pala_array.sh:14) run N
independent processes; the array program must therefore reproduce N
independent runs' results member for member.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stofnet_tpu.models import StofNet
from stofnet_tpu.ops.peaks import mask2coords, threshold_scores
from stofnet_tpu.parallel import (
    init_array_state,
    make_array_eval_step,
    make_array_train_step,
    make_mesh,
    make_threshold_sweep_step,
    n_members,
    shard_members,
    stack_checkpoint_variables,
    stack_trees,
    unstack_tree,
)
from stofnet_tpu.train.steps import (
    LossConfig,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

LENGTH = 640
SEEDS = [0, 1, 2]


@pytest.fixture(scope="module")
def setup():
    model = StofNet(upsample_factor=4, semi_global_scale=80)
    rng = np.random.default_rng(7)
    frame = rng.standard_normal((4, 1, LENGTH)).astype(np.float32)
    gt = rng.uniform(10, LENGTH - 10, size=(4, 1)).astype(np.float32)
    gt_true = np.round(gt[:, :, None] * 4).astype(np.int32)
    opt, _ = make_optimizer(steps_per_epoch=1)
    return model, opt, jnp.asarray(frame), jnp.asarray(gt), jnp.asarray(gt_true)


@pytest.fixture(scope="module")
def trained_states(setup):
    """Two array train steps; returns (array_state, per-seed solo states)."""
    model, opt, frame, gt, gt_true = setup
    cfg = LossConfig()
    x0 = jnp.zeros((1, 1, LENGTH))

    astep = make_array_train_step(model, opt, cfg)
    astate = init_array_state(model, opt, SEEDS, x0)
    for _ in range(2):
        astate, aaux = astep(astate, frame, gt, gt_true)

    sstep = make_train_step(model, opt, cfg)
    solo = []
    for seed in SEEDS:
        v = model.init(jax.random.key(seed), x0)
        s = init_train_state(v, opt, seed=seed)
        for _ in range(2):
            s, saux = sstep(s, frame, gt, gt_true)
        solo.append(s)
    return astate, solo, aaux, saux


def test_multi_seed_train_matches_solo_runs(trained_states):
    """Member i of the array == an independent single-seed run with seed i
    (same init, same dropout stream, same data): the SLURM-array contract."""
    astate, solo, aaux, _ = trained_states
    assert n_members(astate.params) == len(SEEDS)
    for i, s in enumerate(solo):
        member = unstack_tree(astate.params, i)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5),
            member, s.params)


def test_array_members_differ(trained_states):
    """Different seeds must yield genuinely different members (guards a
    broadcast bug silently training N copies of one model)."""
    astate, _, aaux, _ = trained_states
    losses = np.asarray(aaux["loss"])
    assert len(np.unique(losses)) == len(SEEDS)
    w0 = np.asarray(unstack_tree(astate.params, 0)["conv1"]["kernel"])
    w1 = np.asarray(unstack_tree(astate.params, 1)["conv1"]["kernel"])
    assert np.abs(w0 - w1).max() > 1e-3


def test_duplicate_seeds_rejected(setup):
    model, opt, *_ = setup
    with pytest.raises(ValueError, match="duplicate seeds"):
        init_array_state(model, opt, [3, 3], jnp.zeros((1, 1, LENGTH)))


def test_array_eval_matches_solo(trained_states, setup):
    model, opt, frame, gt, gt_true = setup
    astate, solo, *_ = trained_states
    cfg = LossConfig()
    aeval = make_array_eval_step(model, cfg)
    out = aeval({"params": astate.params}, frame, gt, gt_true)
    assert "masks_pred" not in out  # dropped unless keep_heatmaps
    assert out["toa_metrics"].shape == (len(SEEDS), 4, 7)

    ev = make_eval_step(model, cfg)
    for i, s in enumerate(solo):
        ref = ev({"params": s.params}, frame, gt, gt_true)
        np.testing.assert_allclose(np.asarray(out["es_sample"][i]),
                                   np.asarray(ref["es_sample"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(out["loss"][i]),
                                   float(ref["loss"]), rtol=1e-4)


def test_threshold_sweep_matches_per_threshold_decode(trained_states, setup):
    """One forward decoded at T thresholds == T independent static-threshold
    eval steps (the reference's per-threshold array rows)."""
    model, opt, frame, gt, gt_true = setup
    astate, *_ = trained_states
    variables = {"params": unstack_tree(astate.params, 0)}
    ths = [0.02, 0.05, 0.2]

    sweep = make_threshold_sweep_step(model, LossConfig())
    out = sweep(variables, frame, gt, gt_true, jnp.asarray(ths))
    assert out["toa_metrics"].shape == (len(ths), 4, 7)

    for t, th in enumerate(ths):
        ref = make_eval_step(model, LossConfig(th=th))(
            variables, frame, gt, gt_true)
        np.testing.assert_allclose(np.asarray(out["es_sample"][t]),
                                   np.asarray(ref["es_sample"]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["toa_metrics"][t]),
                                   np.asarray(ref["toa_metrics"]),
                                   rtol=1e-5, atol=1e-5)


def test_threshold_scores_traced_threshold():
    """threshold_scores under vmap over a threshold vector matches the
    static-threshold call; Python-falsy semantics are preserved."""
    rng = np.random.default_rng(5)
    scores = jnp.asarray(rng.standard_normal((3, 64)), jnp.float32)
    ths = [0.1, 0.7]
    got = jax.vmap(lambda t: threshold_scores(scores, t))(jnp.asarray(ths))
    for i, t in enumerate(ths):
        np.testing.assert_array_equal(np.asarray(got[i]),
                                      np.asarray(threshold_scores(scores, t)))
    # falsy scalars still mean per-row-max mode
    mx = np.asarray(threshold_scores(scores, None))
    np.testing.assert_array_equal(np.asarray(threshold_scores(scores, 0.0)),
                                  mx)
    assert (mx != 0).sum() == 3


def test_member_sharded_train_matches_unsharded(setup):
    """8 members one-per-device over the dp axis == unsharded vmap."""
    model, opt, frame, gt, gt_true = setup
    assert jax.device_count() >= 8
    cfg = LossConfig()
    x0 = jnp.zeros((1, 1, LENGTH))
    seeds = list(range(8))
    astep = make_array_train_step(model, opt, cfg)

    s_plain = init_array_state(model, opt, seeds, x0)
    s_plain, aux_plain = astep(s_plain, frame, gt, gt_true)

    mesh = make_mesh(dp=8, sp=1)
    s_shard = shard_members(mesh, init_array_state(model, opt, seeds, x0))
    s_shard, aux_shard = astep(s_shard, frame, gt, gt_true)

    np.testing.assert_allclose(np.asarray(aux_shard["loss"]),
                               np.asarray(aux_plain["loss"]),
                               rtol=1e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5),
        s_shard.params, s_plain.params)


def test_per_member_data_axis(setup):
    """per_member_data feeds each member its own batch slice."""
    model, opt, frame, gt, gt_true = setup
    cfg = LossConfig()
    x0 = jnp.zeros((1, 1, LENGTH))
    astep = make_array_train_step(model, opt, cfg, per_member_data=True)
    st = init_array_state(model, opt, [0, 1], x0)
    f2 = jnp.stack([frame, frame * 0.5])
    g2 = jnp.stack([gt, gt])
    t2 = jnp.stack([gt_true, gt_true])
    st, aux = astep(st, f2, g2, t2)
    assert aux["loss"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(aux["loss"])))


def test_stack_checkpoint_variables_shape_guard(setup):
    model, opt, *_ = setup
    v0 = model.init(jax.random.key(0), jnp.zeros((1, 1, LENGTH)))
    small = StofNet(upsample_factor=4, num_features=32, semi_global_scale=80)
    v1 = small.init(jax.random.key(1), jnp.zeros((1, 1, LENGTH)))
    stacked = stack_checkpoint_variables([v0, v0])
    assert n_members(stacked["params"]) == 2
    with pytest.raises(ValueError, match="different architecture"):
        stack_checkpoint_variables([v0, v1])


def test_stack_unstack_roundtrip(setup):
    model, opt, *_ = setup
    v0 = model.init(jax.random.key(0), jnp.zeros((1, 1, LENGTH)))["params"]
    v1 = model.init(jax.random.key(1), jnp.zeros((1, 1, LENGTH)))["params"]
    stacked = stack_trees([v0, v1])
    for i, v in enumerate([v0, v1]):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            unstack_tree(stacked, i), v)


# --- BatchNorm members keep independent running statistics ---------------


def test_batchnorm_members_independent():
    """A BN model's members must not share batch statistics: member i of
    the array == solo run i, including the batch_stats buffers."""
    import flax.linen as nn

    class BNNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = jnp.transpose(x, (0, 2, 1))
            h = nn.Conv(8, (3,), padding="SAME")(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.Conv(4, (3,), padding="SAME")(h)
            h = jnp.transpose(h, (0, 2, 1))
            from stofnet_tpu.ops.shuffle import sample_shuffle
            return sample_shuffle(h, 4)

    model = BNNet()
    opt, _ = make_optimizer(steps_per_epoch=1)
    cfg = LossConfig()
    x0 = jnp.zeros((1, 1, 64))
    rng = np.random.default_rng(11)
    frame = jnp.asarray(rng.standard_normal((2, 1, 64)), jnp.float32)
    gt = jnp.asarray(rng.uniform(5, 60, (2, 1)), jnp.float32)
    gt_true = jnp.asarray(np.round(np.asarray(gt)[:, :, None] * 4), jnp.int32)

    astep = make_array_train_step(model, opt, cfg)
    astate = init_array_state(model, opt, [0, 1], x0)
    astate, _ = astep(astate, frame, gt, gt_true)

    sstep = make_train_step(model, opt, cfg)
    for i, seed in enumerate([0, 1]):
        v = model.init(jax.random.key(seed), x0)
        s = init_train_state(v, opt, seed=seed)
        s, _ = sstep(s, frame, gt, gt_true)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            unstack_tree(astate.batch_stats, i), s.batch_stats)
    # the two members' stats must differ (different conv inits see the
    # same data -> different pre-BN activations)
    m0 = np.asarray(unstack_tree(astate.batch_stats, 0)["BatchNorm_0"]["mean"])
    m1 = np.asarray(unstack_tree(astate.batch_stats, 1)["BatchNorm_0"]["mean"])
    assert np.abs(m0 - m1).max() > 1e-6


# --- CLI drivers end to end ----------------------------------------------


@pytest.fixture(scope="module")
def chirp_root(tmp_path_factory):
    from stofnet_tpu.data.synthetic import generate_chirp_dataset

    root = tmp_path_factory.mktemp("array_cli") / "stof_chirp101_dataset"
    return generate_chirp_dataset(root, n_positions=3, n_train_per_pos=4,
                                  n_test_per_pos=2, sample_num=400)


def _cfg(tmp_path, **over):
    from stofnet_tpu.cli.main import DEFAULT_CONFIG
    from stofnet_tpu.utils.config import load_config

    cfg = load_config(DEFAULT_CONFIG)
    cfg.update(run_dir=str(tmp_path / "runs"),
               ckpt_dir=str(tmp_path / "ckpts"))
    cfg.update(over)
    return cfg


def test_cli_train_array(chirp_root, tmp_path):
    from pathlib import Path

    from stofnet_tpu.cli.array import run

    cfg = _cfg(tmp_path, data_dir=str(chirp_root), seeds=2, epochs=2,
               batch_size=4, model="stofnet", rf_scale_factor=4,
               max_echoes=8, crop_ratio=0.75)
    out = run(cfg)
    assert out["mode"] == "train_array"
    assert len(out["members"]) == 2
    assert {m["seed"] for m in out["members"]} == {3008, 3009}
    for m in out["members"]:
        assert np.isfinite(m["val_loss"])
        assert Path(m["checkpoint"]).exists()
    assert out["best_seed"] in (3008, 3009)

    # per-member checkpoints load back as normal single-model states
    from stofnet_tpu.train.checkpoint import load_checkpoint

    best = next(m for m in out["members"] if m["seed"] == out["best_seed"])
    restored = load_checkpoint(best["checkpoint"])
    assert "params" in restored["variables"]


def test_cli_th_sweep(chirp_root, tmp_path):
    from stofnet_tpu.cli.array import run

    cfg = _cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
               model="stofnet", th_sweep=[0.001, 0.01, 0.1], batch_size=2,
               rf_scale_factor=4, max_echoes=8, etol=1600)
    out = run(cfg)
    assert out["mode"] == "th_sweep"
    assert [r["member"] for r in out["rows"]] == [
        "th=0.001", "th=0.01", "th=0.1"]
    for r in out["rows"]:
        assert np.isfinite(r["total_jaccard"])


def test_cli_th_sweep_rejects_falsy(chirp_root, tmp_path):
    from stofnet_tpu.cli.array import run

    cfg = _cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
               model="stofnet", th_sweep=[0.0, 0.1], batch_size=2,
               rf_scale_factor=4, max_echoes=8)
    with pytest.raises(ValueError, match="must be > 0"):
        run(cfg)


def test_find_checkpoint_full_prefix_disambiguates(tmp_path):
    """Array members share the run-name first token; the full-string pass
    must distinguish them while the reference's first-token fallback
    (main.py:174) still resolves plain names."""
    from stofnet_tpu.train.checkpoint import find_checkpoint

    d = tmp_path / "ckpts"
    d.mkdir()
    a = d / "brave-fox-7_seed3008_rf-scale4_epoch_2"
    b = d / "brave-fox-7_seed3009_rf-scale4_epoch_2"
    a.mkdir(), b.mkdir()
    assert find_checkpoint(d, "brave-fox-7_seed3009") == b
    assert find_checkpoint(d, "brave-fox-7_seed3008") == a
    # reference-style first-token lookup still works (first sorted match)
    assert find_checkpoint(d, "brave-fox-7") == a
    assert find_checkpoint(d, "no-such") is None


def test_cli_eval_array_model_files(chirp_root, tmp_path):
    """Positive model_files= e2e: train 2 seeds, then evaluate BOTH member
    checkpoints in one array program — each member label resolves to its
    own checkpoint (not the first sorted run entry)."""
    from stofnet_tpu.cli.array import run
    from stofnet_tpu.train.checkpoint import find_checkpoint

    tcfg = _cfg(tmp_path, data_dir=str(chirp_root), seeds=2, epochs=1,
                batch_size=4, model="stofnet", rf_scale_factor=4,
                max_echoes=8, crop_ratio=0.75)
    tout = run(tcfg)
    names = [f"{tout['run_name']}_seed{m['seed']}"
             for m in tout["members"]]
    paths = [find_checkpoint(tcfg.ckpt_dir, n) for n in names]
    assert paths[0] != paths[1] and None not in paths

    # explicit small th: a 1-epoch model's per-row max (th=Null) can sit
    # at position 0 = the invalid slot, making every row's jaccard the
    # reference's 0/0 NaN; a fixed threshold keeps detections flowing
    ecfg = _cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
                model="stofnet", model_files=names, batch_size=2,
                rf_scale_factor=4, max_echoes=8, etol=1600, th=0.001)
    out = run(ecfg)
    assert out["mode"] == "eval_array"
    assert [r["member"] for r in out["rows"]] == names
    for r in out["rows"]:
        assert np.isfinite(r["total_jaccard"])
        assert np.isfinite(r["val_loss"])
    # one-epoch members differ -> their eval losses must differ too
    assert out["rows"][0]["val_loss"] != out["rows"][1]["val_loss"]


def test_cli_eval_array_missing_ckpt_is_loud(chirp_root, tmp_path):
    from stofnet_tpu.cli.array import run

    cfg = _cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
               model="stofnet", model_files=["no-such-ckpt"], batch_size=2,
               rf_scale_factor=4, max_echoes=8)
    with pytest.raises(FileNotFoundError, match="no-such-ckpt"):
        run(cfg)


def test_lr_scales_match_solo_lr_runs(setup):
    """Per-member lr via update scaling is EXACT: member i of a same-init
    lr-sweep array equals an independent solo run built with
    make_optimizer(lr*scale_i). (AdamW's update is -lr*(dir + wd*p), so
    scaling the update == scaling the lr, weight decay included —
    train/steps.py:train_step.)"""
    model, opt, frame, gt, gt_true = setup
    cfg = LossConfig()
    x0 = jnp.zeros((1, 1, LENGTH))
    scales = [1.0, 3.0]

    astep = make_array_train_step(model, opt, cfg, lr_scales=scales)
    astate = init_array_state(model, opt, [0, 0], x0,
                              allow_duplicate_seeds=True)
    for _ in range(2):
        astate, aaux = astep(astate, frame, gt, gt_true)
    # members share init but run at different lrs -> must diverge
    losses = np.asarray(aaux["loss"])
    assert losses[0] != losses[1]

    base_lr = 5e-4  # make_optimizer default
    for i, scale in enumerate(scales):
        opt_i, _ = make_optimizer(lr=base_lr * scale, steps_per_epoch=1)
        sstep = make_train_step(model, opt_i, cfg)
        v = model.init(jax.random.key(0), x0)
        s = init_train_state(v, opt_i, seed=0)
        for _ in range(2):
            s, saux = sstep(s, frame, gt, gt_true)
        member = unstack_tree(astate.params, i)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5),
            member, s.params)
        np.testing.assert_allclose(losses[i], float(saux["loss"]),
                                   rtol=2e-5, atol=1e-6)


def test_duplicate_seeds_allowed_for_lr_sweep(setup):
    model, opt, *_ = setup
    state = init_array_state(model, opt, [5, 5], jnp.zeros((1, 1, LENGTH)),
                             allow_duplicate_seeds=True)
    assert n_members(state.params) == 2


def test_cli_lr_sweep(chirp_root, tmp_path):
    """lrs=[...] trains a same-init lr sweep: per-member lr in the rows,
    lr-tagged non-colliding checkpoints, best_lr reported."""
    from pathlib import Path

    from stofnet_tpu.cli.array import run

    cfg = _cfg(tmp_path, data_dir=str(chirp_root), lrs=[1e-4, 5e-4],
               epochs=1, batch_size=4, model="stofnet", rf_scale_factor=4,
               max_echoes=8, crop_ratio=0.75)
    out = run(cfg)
    assert out["mode"] == "train_array"
    assert [m["lr"] for m in out["members"]] == [1e-4, 5e-4]
    # same-init sweep: every member carries the same base seed
    assert {m["seed"] for m in out["members"]} == {3008}
    paths = [m["checkpoint"] for m in out["members"]]
    assert len(set(paths)) == 2 and all(Path(p).exists() for p in paths)
    assert "lr0.0001" in paths[0] and "lr0.0005" in paths[1]
    assert out["best_lr"] in (1e-4, 5e-4)
    assert all(np.isfinite(m["val_loss"]) for m in out["members"])


def test_cli_lrs_seeds_mismatch_raises(chirp_root, tmp_path):
    from stofnet_tpu.cli.array import run

    cfg = _cfg(tmp_path, data_dir=str(chirp_root), lrs=[1e-4, 5e-4],
               seeds=3, epochs=1, batch_size=4, model="stofnet",
               rf_scale_factor=4, max_echoes=8)
    with pytest.raises(ValueError, match="seeds=3 but 2 lrs"):
        run(cfg)


def test_lr_scales_compose_with_member_sharding(setup):
    """A same-init lr sweep sharded one-member-per-device over dp matches
    the unsharded vmap (the lr_scales constant rides GSPMD replication)."""
    model, opt, frame, gt, gt_true = setup
    assert jax.device_count() >= 8
    cfg = LossConfig()
    x0 = jnp.zeros((1, 1, LENGTH))
    scales = [0.25, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 5.0]
    astep = make_array_train_step(model, opt, cfg, lr_scales=scales)

    # two steps: step-1 losses are pre-update and identical by
    # construction (same init); the lr shows up from step 2 on
    s_plain = init_array_state(model, opt, [0] * 8, x0,
                               allow_duplicate_seeds=True)
    for _ in range(2):
        s_plain, aux_plain = astep(s_plain, frame, gt, gt_true)

    mesh = make_mesh(dp=8, sp=1)
    s_shard = shard_members(mesh, init_array_state(
        model, opt, [0] * 8, x0, allow_duplicate_seeds=True))
    for _ in range(2):
        s_shard, aux_shard = astep(s_shard, frame, gt, gt_true)

    losses = np.asarray(aux_plain["loss"])
    assert len(np.unique(losses)) == 8  # scales genuinely differentiate
    np.testing.assert_allclose(np.asarray(aux_shard["loss"]), losses,
                               rtol=1e-5, atol=1e-6)
    # two Adam steps amplify sharded-vs-unsharded reduction-order noise
    # through 1/sqrt(v) while v is still tiny; slightly looser than the
    # single-step mesh test above
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        s_shard.params, s_plain.params)


def test_cli_duplicate_lrs_rejected(chirp_root, tmp_path):
    """Same-init duplicate lrs = bit-identical members + colliding
    lr-tagged checkpoint names; rejected loudly."""
    from stofnet_tpu.cli.array import run

    cfg = _cfg(tmp_path, data_dir=str(chirp_root), lrs=[1e-4, 1e-4],
               epochs=1, batch_size=4, model="stofnet", rf_scale_factor=4,
               max_echoes=8)
    with pytest.raises(ValueError, match="duplicate lrs"):
        run(cfg)


def test_cli_eval_array_profile_dir(chirp_root, tmp_path):
    """profile_dir= captures a trace in the array CLI's eval mode too."""
    import os

    from stofnet_tpu.cli.array import run

    trace_dir = tmp_path / "trace"
    cfg = _cfg(tmp_path, data_dir=str(chirp_root), evaluate=True,
               model="stofnet", th_sweep=[0.01, 0.1], batch_size=2,
               rf_scale_factor=4, max_echoes=8, etol=1600,
               profile_dir=str(trace_dir), profile_steps=1)
    run(cfg)
    files = [f for _, _, fs in os.walk(trace_dir) for f in fs]
    assert files, "eval_array wrote no trace files"
