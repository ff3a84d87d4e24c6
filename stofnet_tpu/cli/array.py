"""Job-array driver: N runs as one compiled program.

TPU-native replacement for the reference's SLURM job arrays
(bash_scripts/chirp_benchmark.sh:14, train_pala_array.sh:14 — one GPU
process per benchmark row / training seed). Instead of N processes, the
members execute as ONE XLA program (parallel/array.py): vmapped over a
member axis, optionally sharded one-member-per-device over the mesh.

Three modes, selected by the config keys present:

- ``seeds=N`` (train): train N differently-seeded members of one model on
  the SAME data stream in one jitted step per batch. Per-member
  checkpoints + a per-member results table come out the other end.

      python -m stofnet_tpu.cli.array seeds=4 model=stofnet epochs=20 \\
          data_dir=datasets/stof_chirp101_dataset [mesh=True mesh_dp=4]

  ``lrs=[...]`` sweeps the learning rate across members instead of (or on
  top of) the seed: with ``lrs`` alone every member starts from the SAME
  init so the comparison isolates the lr (exact per-member AdamW lr via
  update scaling, parallel/array.py); with ``seeds=N lrs=[N values]`` each
  member gets its own (seed, lr) pair. This is the reference's
  hyperparameter-array-row use case (train_pala_array.sh:31-40) as one
  compiled program.

      python -m stofnet_tpu.cli.array lrs='[1e-4,5e-4,1e-3]' model=stofnet \\
          epochs=20 data_dir=datasets/stof_chirp101_dataset

- ``model_files=[a,b,...]`` (eval): evaluate N same-architecture
  checkpoints over the test split in one program; per-member metric rows
  in the sweep table schema.

      python -m stofnet_tpu.cli.array evaluate=True model=stofnet \\
          model_files='[different-armadillo,misty-comet]' th=Null \\
          data_dir=datasets/stof_chirp101_dataset

- ``th_sweep=[...]`` (eval): decode ONE checkpoint at T thresholds from a
  single forward pass per batch (the reference re-runs the model per
  threshold row; thresholds must be > 0 — the falsy per-row-max mode is a
  structural branch, use cli.main for it).

      python -m stofnet_tpu.cli.array evaluate=True model=stofnet \\
          model_file=different-armadillo th_sweep='[0.01,0.05,0.1]' \\
          data_dir=datasets/stof_chirp101_dataset

Early stopping in train mode watches the MEAN val loss across members
(array rows finish together — the SLURM analogue runs every row to its own
end; a per-member stop would leave the lockstep program computing dead
members anyway).
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from stofnet_tpu.utils.config import Config, load_config, merge_cli
from stofnet_tpu.utils.logging import MetricsLogger, make_run_name
from stofnet_tpu.cli.main import (
    DEFAULT_CONFIG, _loss_config, _nanmean, batch_to_arrays, setup,
)


def _member_mesh(cfg: Config, n: int):
    """Mesh for member sharding (members ride the dp axis)."""
    if not cfg.get("mesh"):
        return None
    import jax

    from stofnet_tpu.parallel import make_mesh

    dp = int(cfg.get("mesh_dp") or 0) or None
    sp = int(cfg.get("mesh_sp") or 1)
    if sp != 1:
        raise ValueError("array mode shards members over dp; mesh_sp "
                         "must be 1 (length sharding would need per-member "
                         "batch sharding too)")
    mesh = make_mesh(dp=dp, sp=sp,
                     devices=jax.devices()[: (dp or len(jax.devices()))])
    if n % mesh.shape["dp"]:
        raise ValueError(f"{n} members not divisible by mesh dp="
                         f"{mesh.shape['dp']}")
    return mesh


def _loaders(cfg: Config, ds):
    from stofnet_tpu.data.loader import (
        DataLoader, default_num_workers, split_dataset,
    )

    nw = cfg.get("num_workers")
    nw = default_num_workers() if nw is None else int(nw)
    train_idx, val_idx = split_dataset(len(ds), 0.2, seed=int(cfg.seed))
    train_loader = DataLoader(ds, train_idx, batch_size=int(cfg.batch_size),
                              shuffle=True, drop_last=True,
                              seed=int(cfg.seed), num_workers=nw)
    val_loader = DataLoader(ds, val_idx, batch_size=int(cfg.batch_size),
                            drop_last=True, num_workers=nw)
    return train_loader, val_loader


def _host_batches(loader, kind: str, up: int):
    for batch in loader:
        frame, gt = batch_to_arrays(batch, kind)
        gt_true = np.round(gt[:, None, :] * up).astype(np.int32)
        yield frame, gt, gt_true


def train_array(cfg: Config, logger: MetricsLogger) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.data.loader import pipeline_batches
    from stofnet_tpu.parallel import (
        init_array_state, make_array_eval_step, make_array_train_step,
        shard_members, unstack_tree,
    )
    from stofnet_tpu.train.checkpoint import save_checkpoint
    from stofnet_tpu.train.early_stop import EarlyStopping
    from stofnet_tpu.train.steps import make_optimizer, state_variables
    from stofnet_tpu.utils.profiling import StepTraceProfiler

    lrs = [float(x) for x in cfg.get("lrs") or []]
    if lrs:
        if any(lr <= 0 for lr in lrs):
            raise ValueError(f"lrs must be positive, got {lrs}")
        if not cfg.get("seeds") and len(set(lrs)) != len(lrs):
            # same-init sweep: duplicate lrs would train bit-identical
            # members AND collide on the lr-tagged checkpoint names
            raise ValueError(f"duplicate lrs in {lrs}: same-init members "
                             f"would be bit-identical copies (add seeds=N "
                             f"to vary the init instead)")
        n = len(lrs)
        if cfg.get("seeds") and int(cfg.seeds) != n:
            raise ValueError(f"seeds={cfg.seeds} but {n} lrs given; with "
                             f"both keys each member is one (seed, lr) pair")
        # lrs alone: SAME init for every member so the sweep isolates the lr
        same_init = not cfg.get("seeds")
        seeds = ([int(cfg.seed)] * n if same_init
                 else [int(cfg.seed) + i for i in range(n)])
        lr_scales = [lr / float(cfg.lr) for lr in lrs]
    else:
        n = int(cfg.seeds)
        seeds = [int(cfg.seed) + i for i in range(n)]
        same_init = False
        lr_scales = None
    ctx = setup(cfg)
    ds, info, kind = ctx["dataset"], ctx["info"], ctx["info"]["kind"]
    up = int(cfg.upsample_factor)

    train_loader, val_loader = _loaders(cfg, ds)
    if len(train_loader) == 0 or len(val_loader) == 0:
        raise ValueError("empty train or val split at this batch_size "
                         "(drop_last); lower batch_size or enlarge the "
                         "dataset")

    lcfg = _loss_config(cfg, ctx["model_kind"])
    optimizer, schedule = make_optimizer(
        lr=float(cfg.lr), weight_decay=float(cfg.weight_decay),
        epochs=int(cfg.epochs), steps_per_epoch=max(1, len(train_loader)))
    astep = make_array_train_step(
        ctx["model"], optimizer, lcfg, remat=bool(cfg.get("remat", False)),
        amp=bool(cfg.get("amp", False)), accum=int(cfg.get("accum", 1) or 1),
        lr_scales=lr_scales)
    aeval = make_array_eval_step(ctx["model"], lcfg)

    L = info["sample_num"] * int(cfg.rf_scale_factor)
    state = init_array_state(ctx["model"], optimizer, seeds,
                             jnp.zeros((1, 1, L)),
                             allow_duplicate_seeds=same_init)

    mesh = _member_mesh(cfg, n)
    if mesh is not None:
        state = shard_members(mesh, state)
        print(f"array train: {n} members over dp={mesh.shape['dp']}",
              file=sys.stderr)

    early = EarlyStopping(patience=int(cfg.patience), delta=float(cfg.delta))
    put = lambda b: tuple(jnp.asarray(x) for x in b)  # noqa: E731
    profiler = StepTraceProfiler(cfg.get("profile_dir"),
                                 cfg.get("profile_steps") or 5)

    # unique per-member tags (seed alone collides under a same-init lr sweep)
    member_tags = [f"seed{s}" + (f"_lr{lrs[i]:g}" if lrs else "")
                   for i, s in enumerate(seeds)]

    val_losses = np.full(n, np.inf)
    epochs_run = 0
    for epoch in range(int(cfg.epochs)):
        train_loader.set_epoch(epoch)
        step_global = 0
        for _, dev in pipeline_batches(
                _host_batches(train_loader, kind, up), put):
            frame_d, gt_d, gt_true_d = dev
            state, aux = astep(state, frame_d, gt_d, gt_true_d)
            losses = np.asarray(aux["loss"])
            profiler.step()  # no-op unless profile_dir= is set
            if not np.all(np.isfinite(losses)):
                bad = [member_tags[i]
                       for i in np.nonzero(~np.isfinite(losses))[0]]
                raise RuntimeError(
                    f"non-finite train loss in member(s) {bad} at "
                    f"epoch {epoch}; lower the lr or drop those members")
            step_global += 1
            logger.log({"event": "train", "epoch": epoch,
                        "train_loss_members": losses.tolist()})

        vlosses, vmetrics = [], []
        for _, dev in pipeline_batches(
                _host_batches(val_loader, kind, up), put):
            frame_d, gt_d, gt_true_d = dev
            out = aeval(state_variables(state), frame_d, gt_d, gt_true_d)
            vlosses.append(np.asarray(out["loss"]))       # (N,)
            vmetrics.append(np.asarray(out["toa_metrics"]))  # (N, B, 7)
        val_losses = np.sum(vlosses, axis=0)
        vm = np.concatenate(vmetrics, axis=1)  # (N, B_total, 7)
        epochs_run = epoch + 1
        logger.log({"event": "epoch", "epoch": epoch,
                    "val_loss_members": val_losses.tolist(),
                    "val_jaccard_members":
                        [_nanmean(vm[i, :, 3]) for i in range(n)],
                    "lr": float(schedule(np.asarray(epoch
                                                    * len(train_loader))))})
        if early(float(np.mean(val_losses))):
            print(f"Finished at epoch: {epoch} (mean member val loss)",
                  file=sys.stderr)
            break

    profiler.close()  # flush an unfinished trace window (short runs)
    # per-member checkpoints: each member IS a normal single-model state
    ckpt_dir = Path(cfg.ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    members = []
    host_state = jax.tree.map(np.asarray, state_variables(state))
    host_opt = jax.tree.map(np.asarray, state.opt_state)
    for i, seed in enumerate(seeds):
        name = (f"{logger.run_name}_{member_tags[i]}"
                f"_rf-scale{cfg.rf_scale_factor}_epoch_{epochs_run}")
        path = save_checkpoint(ckpt_dir / name, {
            "variables": unstack_tree(host_state, i),
            "opt_state": unstack_tree(host_opt, i),
            "step": int(np.asarray(state.step)[i]),
            "epoch": int(epochs_run),
        })
        members.append({"seed": seed,
                        **({"lr": lrs[i]} if lrs else {}),
                        "val_loss": float(val_losses[i]),
                        "val_jaccard": _nanmean(vm[i, :, 3]),
                        "val_rmse": _nanmean(vm[i, :, 0]),
                        "checkpoint": str(path)})
        logger.log({"event": "member", **members[-1]})

    best = int(np.argmin(val_losses))
    summary = {"mode": "train_array", "members": members,
               "best_seed": seeds[best],
               **({"best_lr": lrs[best]} if lrs else {}),
               "best_val_loss": float(val_losses[best]),
               "epochs": epochs_run}
    logger.set_summary(**{k: v for k, v in summary.items()
                          if k != "members"})
    return summary


def eval_array(cfg: Config, logger: MetricsLogger) -> Dict[str, Any]:
    """Multi-checkpoint (model_files=[...]) or multi-threshold (th_sweep=)
    evaluation over the test split, one compiled program per batch shape."""
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.data.loader import DataLoader, default_num_workers
    from stofnet_tpu.parallel import (
        make_array_eval_step, make_threshold_sweep_step, shard_members,
        stack_checkpoint_variables,
    )
    from stofnet_tpu.train.checkpoint import find_checkpoint, \
        load_model_variables
    from stofnet_tpu.utils.profiling import StepTraceProfiler

    profiler = StepTraceProfiler(cfg.get("profile_dir"),
                                 cfg.get("profile_steps") or 5)
    cfg.evaluate = True
    ctx = setup(cfg)
    ds, kind = ctx["dataset"], ctx["info"]["kind"]
    up = int(cfg.upsample_factor)
    lcfg = _loss_config(cfg, ctx["model_kind"])

    th_sweep = cfg.get("th_sweep")
    model_files = cfg.get("model_files")
    nw = cfg.get("num_workers")
    nw = default_num_workers() if nw is None else int(nw)
    loader = DataLoader(ds, list(range(len(ds))),
                        batch_size=int(cfg.batch_size), drop_last=True,
                        num_workers=nw)

    if th_sweep:
        if ctx["model_kind"] != "heatmap":
            raise ValueError(f"th_sweep decodes heatmaps; model "
                             f"{cfg.model!r} is a {ctx['model_kind']} model")
        ths = [float(t) for t in th_sweep]
        if any(t <= 0 for t in ths):
            raise ValueError(f"th_sweep thresholds must be > 0, got {ths} "
                             "(the falsy per-row-max mode is a structural "
                             "decode branch; run it via cli.main th=Null)")
        labels = [f"th={t:g}" for t in ths]
        step = make_threshold_sweep_step(ctx["model"], lcfg)
        variables = ctx["variables"]
        ths_arr = jnp.asarray(ths, jnp.float32)
        run = lambda f, gs, gt: step(variables, f, gs, gt, ths_arr)  # noqa: E731
        n = len(ths)
    elif model_files:
        names = [str(m) for m in model_files]
        n_layers = 2 if kind == "chirp" else 10
        vlist = []
        for m in names:
            path = (find_checkpoint(cfg.ckpt_dir, m)
                    or find_checkpoint("/root/reference/ckpts", m))
            if path is None:
                raise FileNotFoundError(
                    f"checkpoint prefix {m!r} not found in {cfg.ckpt_dir} "
                    f"or /root/reference/ckpts (array eval has no "
                    f"random-init fallback: a silently fresh member would "
                    f"poison the whole table)")
            vlist.append(load_model_variables(cfg.model, path, n_layers))
            print(f"loaded checkpoint {path}", file=sys.stderr)
        variables = stack_checkpoint_variables(vlist)
        mesh = _member_mesh(cfg, len(names))
        if mesh is not None:
            variables = shard_members(mesh, variables)
        labels = names
        astep = make_array_eval_step(ctx["model"], lcfg)
        run = lambda f, gs, gt: astep(variables, f, gs, gt)  # noqa: E731
        n = len(names)
    else:
        raise ValueError("array eval needs model_files=[...] or "
                         "th_sweep=[...]")

    all_metrics: List[np.ndarray] = []
    losses: List[np.ndarray] = []
    for batch in loader:
        frame, gt = batch_to_arrays(batch, kind)
        gt_true = np.round(gt[:, None, :] * up).astype(np.int32)
        out = run(jnp.asarray(frame), jnp.asarray(gt),
                  jnp.asarray(gt_true))
        all_metrics.append(np.asarray(out["toa_metrics"]))  # (N, B, 7)
        profiler.step()  # no-op unless profile_dir= is set
        if "loss" in out:
            losses.append(np.asarray(out["loss"]))

    profiler.close()  # flush an unfinished trace window (short splits)
    vm = np.concatenate(all_metrics, axis=1)  # (N, total, 7)
    rows = []
    for i, label in enumerate(labels):
        rows.append({
            "member": label,
            "total_distance_mean": _nanmean(vm[i, :, 0]),
            "total_distance_std": float(np.nanstd(vm[i, :, 0])),
            # toa_rmse's jaccard/precision/recall are already percentages
            # (train/metrics.py:55, reference utils/metrics.py:37-39)
            "total_jaccard": _nanmean(vm[i, :, 3]),
            "precision": _nanmean(vm[i, :, 1]),
            "recall": _nanmean(vm[i, :, 2]),
            **({"val_loss": float(np.sum([l[i] for l in losses]))}
               if losses else {}),
        })
        logger.log({"event": "member", **rows[-1]})

    md = ["| Member | RMSE [sample] | Jaccard [%] | Precision [%] "
          "| Recall [%] |",
          "|---|---|---|---|---|"]
    for r in rows:
        md.append(f"| {r['member']} | {r['total_distance_mean']:.2f} "
                  f"±{r['total_distance_std']:.2f} | "
                  f"{r['total_jaccard']:.1f} | {r['precision']:.2f} | "
                  f"{r['recall']:.2f} |")
    table = "\n".join(md)
    (Path(logger.run_dir) / f"{logger.run_name}_array_table.md").write_text(
        table + "\n")
    print(table)
    summary = {"mode": "th_sweep" if th_sweep else "eval_array",
               "rows": rows}
    logger.set_summary(mode=summary["mode"], members=len(rows))
    return summary


def run(cfg: Config) -> Dict[str, Any]:
    import time

    run_name = make_run_name(int(cfg.seed) + int(time.time()) % 100000)
    logger = MetricsLogger(cfg.get("run_dir", "runs"), run_name,
                           config=dict(cfg),
                           wandb_group=cfg.logging if cfg.logging else None)
    try:
        if cfg.get("seeds") or cfg.get("lrs"):
            out = train_array(cfg, logger)
        else:
            out = eval_array(cfg, logger)
        out["run_name"] = run_name
        return out
    finally:
        logger.finish()


def main(argv: Optional[list] = None) -> None:
    cfg = merge_cli(load_config(DEFAULT_CONFIG), argv)
    out = run(cfg)
    print(f"array run complete: {out.get('mode')}", file=sys.stderr)


if __name__ == "__main__":
    main()
