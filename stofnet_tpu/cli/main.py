"""Train / evaluate driver.

Functional replacement for the reference's 433-line straight-line script
(main.py): ``python -m stofnet_tpu.cli.main key=value ...`` with the same
config keys and semantics — ``evaluate=True`` runs the benchmark protocol,
otherwise the training recipe (AdamW + cosine anneal + early stopping).
All device work happens in two jitted steps (train_step / eval_step); the
host loop only feeds batches and logs.
"""

from __future__ import annotations

import random as pyrandom
import sys
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from stofnet_tpu.utils.config import Config, load_config, merge_cli
from stofnet_tpu.utils.logging import MetricsLogger, make_run_name

DEFAULT_CONFIG = Path(__file__).parent / "config.yaml"


def _nanmean(x) -> float:
    x = np.asarray(x, dtype=np.float64)
    ok = ~np.isnan(x)
    return float(x[ok].mean()) if ok.any() else float("nan")


def _save_channel_overview(path: Path, frame: np.ndarray, gt: np.ndarray,
                           es: np.ndarray, logger: MetricsLogger) -> None:
    """Channel-overview panel like the reference's in-loop W&B figure
    (main.py:250-276); saved locally, mirrored to W&B when enabled."""
    try:
        import matplotlib.pyplot as plt

        from stofnet_tpu.utils.plotting import plot_channel_overview
    except Exception:
        return
    fig = plot_channel_overview(frame[:, 0], gt, echoes=es)
    logger.log_figure("channel_overview", fig, path=path)
    plt.close(fig)


def _save_comparison(path: Path, frame: np.ndarray, es: np.ndarray,
                     gt: np.ndarray, label: str,
                     logger: MetricsLogger) -> None:
    """Per-eval-sample comparison figure (main.py:369-384 + plot_frame.py)."""
    try:
        import matplotlib.pyplot as plt

        from stofnet_tpu.utils.plotting import plot_comparison
    except Exception:
        return
    fig = plot_comparison(frame[0, 0], [np.asarray(es[0])], [label],
                          gt_samples=gt[0])
    logger.log_figure("comparison", fig, path=path)
    plt.close(fig)


def _build_mesh(cfg: Config):
    """Create the (dp, sp) device mesh when ``mesh=True`` (SURVEY §2.31:
    DP over waveforms is the throughput axis, SP shards the RF sample axis
    with GSPMD halo exchanges). Returns None for single-device runs."""
    if not cfg.get("mesh"):
        return None
    from stofnet_tpu.parallel import make_mesh

    dp = cfg.get("mesh_dp")
    return make_mesh(dp=int(dp) if dp else None,
                     sp=int(cfg.get("mesh_sp", 1) or 1))


def _shard_inputs(mesh, frame, gt, gt_true):
    """Device-put one batch with dp(+sp) shardings: frame (B,1,L) shards
    batch over dp and the sample axis over sp; GT tensors shard batch only.
    B must divide dp and L must divide sp."""
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.parallel import batch_seq_sharding, batch_sharding

    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    if frame.shape[0] % dp:
        raise ValueError(
            f"batch_size={frame.shape[0]} not divisible by mesh_dp={dp}")
    if sp > 1 and frame.shape[-1] % sp:
        raise ValueError(
            f"sample length {frame.shape[-1]} not divisible by mesh_sp={sp}")
    fsh = (batch_seq_sharding(mesh, 3, seq_axis=2) if sp > 1
           else batch_sharding(mesh, 3))
    return (jax.device_put(jnp.asarray(frame), fsh),
            jax.device_put(jnp.asarray(gt), batch_sharding(mesh, 2)),
            jax.device_put(jnp.asarray(gt_true), batch_sharding(mesh, 3)))


def dataset_kind(data_dir: str) -> str:
    d = str(data_dir).lower()
    if "pala" in d:
        return "pala"
    if "rat" in d:
        return "rat"
    if "chirp" in d:
        return "chirp"
    raise ValueError(f"no dataset class for data path {data_dir!r}")


def build_dataset(cfg: Config):
    """Instantiate the dataset + transforms; returns (dataset, info dict)."""
    from stofnet_tpu.data.transforms import (
        AddNoise, Compose, CropChannelData, NormalizeVol,
    )

    kind = dataset_kind(cfg.data_dir)
    rng = np.random.default_rng(cfg.seed)
    tf = [NormalizeVol()]
    if str(cfg.data_dir).lower().endswith(".zip"):  # main.py:79-80 semantics
        from stofnet_tpu.utils.zip_extract import zip_extract

        cfg.data_dir = str(zip_extract(cfg.data_dir))
    if kind == "chirp":
        from stofnet_tpu.data.chirp import ChirpDataset

        if not cfg.evaluate:
            tf += [CropChannelData(ratio=cfg.crop_ratio, rng=rng),
                   AddNoise(snr=cfg.snr_db, rng=rng)]
        ds = ChirpDataset(
            root_dir=cfg.data_dir,
            split_dirname="test" if cfg.evaluate else "train",
            rf_scale_factor=cfg.rf_scale_factor,
            transforms=Compose(tf),
            seed=int(cfg.seed),
        )
        info = {"kind": kind, "fs": float(ds.cfg["fhz_sample"]),
                "c": float(ds.cfg["speed_of_sound"]),
                "channel_num": ds.get_channel_num(),
                "sample_num": ds.get_sample_num()}
    else:
        from stofnet_tpu.data.pala import PalaDatasetRf

        if not cfg.evaluate:
            tf += [AddNoise(snr=cfg.snr_db, rng=rng)]
        ds = PalaDatasetRf(
            dataset_path=cfg.data_dir,
            sequences=cfg.sequences,
            rescale_factor=cfg.rf_scale_factor,
            ch_gap=cfg.ch_gap,
            angle_threshold=cfg.angle_threshold,
            clutter_db=cfg.clutter_db,
            temporal_filter_opt=(kind == "rat"),
            pow_law_opt=cfg.pow_law_opt,
            transforms=Compose(tf),
            seed=int(cfg.seed),
        )
        info = {"kind": kind, "fs": float(ds.get_key("fs")),
                "c": float(ds.get_key("c")),
                "wavelength": float(ds.get_key("wavelength")),
                "channel_num": ds.get_channel_num(),
                "sample_num": ds.get_sample_num()}
    return ds, info


def batch_to_arrays(batch, kind: str) -> Tuple[np.ndarray, np.ndarray]:
    """Extract (frame (B',1,L), gt_sample (B',G)) from a dataset batch,
    flattening PALA's channel dim into the batch like main.py:208-210."""
    if kind == "chirp":
        _, rf, _, gt_sample, _, _ = batch
        frame = rf[:, None, :].astype(np.float32)
        gt = gt_sample.reshape(-1, 1).astype(np.float32)
    else:
        frame_all, gt_all = batch[0], batch[2]
        wv_idx = min(1, frame_all.shape[1] - 1)
        fr = frame_all[:, wv_idx]  # (B, C, L)
        frame = fr.reshape(-1, fr.shape[-1])[:, None, :].astype(np.float32)
        g = gt_all[:, wv_idx]  # (B, C, E)
        gt = g.reshape(-1, g.shape[-1]).astype(np.float32)
    gt = np.where(np.isnan(gt) | (gt <= 0), 0.0, gt)
    return frame, gt


def _loss_config(cfg: Config, model_kind: str):
    from stofnet_tpu.train.steps import LossConfig

    return LossConfig(
        kernel_size=int(cfg.kernel_size), sigma=float(cfg.sigma),
        mask_amplitude=float(cfg.mask_amplitude),
        lambda_value=float(cfg.lambda_value),
        nms_win_size=int(cfg.nms_win_size),
        th=None if cfg.th in (None, "Null") else float(cfg.th),
        etol=float(cfg.etol), upsample_factor=int(cfg.upsample_factor),
        max_echoes=int(cfg.get("max_echoes", 64)), model_kind=model_kind,
    )


def setup(cfg: Config):
    """Common setup: seed, dataset, model, variables. Returns a dict."""
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.models import build_model
    from stofnet_tpu.train.checkpoint import (
        find_checkpoint, load_model_variables,
    )

    pyrandom.seed(cfg.seed)
    np.random.seed(cfg.seed)

    # model-name-driven config mutations that the DATASET depends on,
    # applied BEFORE the (potentially expensive) dataset build: the unet
    # rf-scale fold mirrors main.py:44-46 exactly; gradpeak's forced
    # evaluate (main.py:165 — which the reference applies too late,
    # silently benchmarking the augmented train split when evaluate was
    # omitted) moves ahead of the build so the eval split + transforms are
    # right the first time. The registry re-reports both as no-op updates.
    name = str(cfg.model).lower()
    if name == "unet":
        cfg.rf_scale_factor = int(cfg.rf_scale_factor) * int(
            cfg.upsample_factor)
        cfg.upsample_factor = 1
    elif name == "gradpeak":
        cfg.evaluate = True

    ds, info = build_dataset(cfg)
    kind = info["kind"]

    dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else None
    model, updates = build_model(
        cfg.model, dataset_kind=kind, upsample_factor=int(cfg.upsample_factor),
        sample_num=info["sample_num"], rf_scale_factor=int(cfg.rf_scale_factor),
        fs=info.get("fs"),
        th=None if cfg.th in (None, "Null") else float(cfg.th), dtype=dtype,
        semi_global_scale=int(cfg.get("semi_global_scale", 80)),
    )
    # rebuild only if an update actually CHANGES a dataset-relevant knob
    # (the pre-build mutations above make the common cases no-ops)
    needs_rebuild = any(k in ("rf_scale_factor", "evaluate")
                        and cfg.get(k) != v for k, v in updates.items())
    for k, v in updates.items():
        cfg[k] = v
    if needs_rebuild:
        ds, info = build_dataset(cfg)

    model_kind = ("regression" if cfg.model.lower() in ("zonzini", "gradpeak")
                  else "heatmap")

    variables = None
    random_init = False
    if cfg.model.lower() != "gradpeak":
        if cfg.model_file:
            path = find_checkpoint(cfg.ckpt_dir, cfg.model_file)
            if path is None:
                path = find_checkpoint("/root/reference/ckpts", cfg.model_file)
            if path is not None:
                n_layers = 2 if kind == "chirp" else 10
                variables = load_model_variables(cfg.model, path, n_layers)
                print(f"loaded checkpoint {path}", file=sys.stderr)
            else:
                # the reference silently skips a non-matching prefix and
                # runs the fresh init (main.py:174-177); keep the no-crash
                # semantics but make the benchmark-integrity hazard LOUD
                print(f"WARNING: checkpoint prefix {cfg.model_file!r} not "
                      f"found in {cfg.ckpt_dir} or /root/reference/ckpts — "
                      f"continuing with RANDOM INIT (reference semantics); "
                      f"metrics will not reflect trained weights",
                      file=sys.stderr)
        if variables is None:
            # covers BOTH the unmatched prefix above and model_file=None:
            # either way a trainable model evaluates on fresh-init weights
            # and the integrity marker must say so
            random_init = True
            L = info["sample_num"] * int(cfg.rf_scale_factor)
            variables = model.init(jax.random.key(int(cfg.seed)),
                                   jnp.zeros((1, 1, L)))
    else:
        variables = {"params": {}}

    return {"dataset": ds, "info": info, "model": model,
            "variables": variables, "model_kind": model_kind, "cfg": cfg,
            "random_init": random_init}


def evaluate(ctx: Dict[str, Any], logger: MetricsLogger) -> Dict[str, float]:
    """Benchmark protocol: whole test split, metrics per frame
    (main.py:291-421 semantics)."""
    import jax.numpy as jnp

    from stofnet_tpu.data.loader import (
        DataLoader, default_num_workers, pipeline_batches,
    )
    from stofnet_tpu.train.steps import make_eval_step
    from stofnet_tpu.train.threshold import find_threshold
    from stofnet_tpu.utils.profiling import StepTraceProfiler

    cfg = ctx["cfg"]
    profiler = StepTraceProfiler(cfg.get("profile_dir"),
                                 cfg.get("profile_steps") or 5)
    ds, info = ctx["dataset"], ctx["info"]
    kind = info["kind"]
    eval_step = make_eval_step(ctx["model"], _loss_config(cfg, ctx["model_kind"]))

    mesh = _build_mesh(cfg)
    variables = ctx["variables"]
    if mesh is not None:
        import jax

        from stofnet_tpu.parallel import replicate

        variables = jax.device_put(variables, replicate(mesh))
        print(f"eval on mesh dp={mesh.shape['dp']} sp={mesh.shape['sp']}",
              file=sys.stderr)

    nw = cfg.get("num_workers")
    nw = default_num_workers() if nw is None else int(nw)
    loader = DataLoader(ds, batch_size=int(cfg.batch_size), drop_last=True,
                        num_workers=nw)
    up = int(cfg.upsample_factor)

    # int8=True swaps the forward for the quantized serving path
    # (models/int8.py: s8 SGB contract conv + s8 pre-pool tensor) so the
    # full benchmark protocol — decode, loss, toa_rmse — scores the
    # quantized model exactly like any other; decode/metrics stay f32.
    use_int8 = bool(cfg.get("int8"))
    if use_int8:
        if str(cfg.model).lower() != "stofnet":
            raise ValueError("int8=True supports model=stofnet only "
                             "(the quantized path targets the "
                             "SemiGlobalBlock; other models have none)")
        from stofnet_tpu.models.int8 import (quantize_stofnet,
                                             stofnet_apply_int8)

        # pre-pool requantization calibration: per-channel absmax over up
        # to 8 batches (one atypically quiet first batch must not set a
        # scale the rest of the split saturates; activation input scales
        # are dynamic per waveform and need no calibration at all)
        calib = []
        for batch in loader:
            calib.append(batch_to_arrays(batch, kind)[0])
            if len(calib) >= 8:
                break
        if not calib:
            raise ValueError("int8=True needs at least one eval batch for "
                             "the pre-pool requantization calibration")
        m = ctx["model"]
        ov = {"upsample_factor": int(m.upsample_factor),
              "num_blocks": int(m.num_blocks),
              "semi_global_scale": int(m.semi_global_scale)}
        q = quantize_stofnet(ctx["variables"],
                             jnp.asarray(np.concatenate(calib)), **ov)
        int8_dtype = (jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16"
                      else None)
        finish = eval_step.finish

        def int8_forward(_variables, frame):
            pred = stofnet_apply_int8(q, frame, dtype=int8_dtype, **ov)
            return pred, jnp.sum(pred.astype(jnp.float32))

        def int8_eval_step(variables, frame, gt_sample, gt_true):
            pred, _ = int8_forward(variables, frame)
            return finish(pred, gt_sample, gt_true)

        int8_eval_step.forward = int8_forward
        int8_eval_step.finish = finish
        eval_step = int8_eval_step
        print(f"int8 serving path: s8 SGB contract conv + s8 pre-pool "
              f"tensor, calibrated on {sum(c.shape[0] for c in calib)} "
              f"waveforms (weights/decode unchanged)", file=sys.stderr)

    def host_batches():
        for batch in loader:
            frame, gt = batch_to_arrays(batch, kind)
            gt_true = np.round(gt[:, None, :] * up).astype(np.int32)
            yield frame, gt, gt_true

    if mesh is not None:
        put = lambda b: _shard_inputs(mesh, *b)  # noqa: E731
    else:
        put = lambda b: tuple(jnp.asarray(x) for x in b)  # noqa: E731

    total = {"loss": [], "distance": [], "jaccard": [], "time": []}
    val_step = 0
    # find_threshold runs on every eval batch like the reference
    # (main.py:330); th_search_interval>1 thins the (host-side) search
    th_every = int(cfg.get("th_search_interval", 1))
    for batch_idx, (host, dev) in enumerate(
            pipeline_batches(host_batches(), put)):
        frame, gt, gt_true = host
        frame_d, gt_d, gt_true_d = dev

        # time the bare forward like the reference (main.py:313-315); the
        # checksum fetch forces device completion through the relay
        tic = time.perf_counter()
        pred, checksum = eval_step.forward(variables, frame_d)
        float(checksum)
        toc_fwd = time.perf_counter() - tic
        out = eval_step.finish(pred, gt_d, gt_true_d)
        metrics = np.asarray(out["toa_metrics"])  # forces completion
        toc = time.perf_counter() - tic
        profiler.step()  # no-op unless profile_dir= is set

        loss = float(out["loss"])
        val_step += 1
        # first batch's wall time is dominated by jit compilation; record it
        # as NaN so the nan-mean summary reflects steady-state throughput.
        # Denominator is cfg.batch_size like the reference (main.py:350) —
        # NOT the channel-flattened frame.shape[0], which would shrink PALA
        # timings by the per-frame channel count.
        bs = int(cfg.batch_size)
        infer_time = (toc_fwd / bs) if batch_idx > 0 else float("nan")
        step_time = (toc / bs) if batch_idx > 0 else float("nan")

        ideal_th = 0.0
        if ctx["model_kind"] == "heatmap" and batch_idx % th_every == 0:
            from stofnet_tpu.ops.peaks import coords2mask

            pred_np = np.asarray(out["masks_pred"])
            masks_true = np.asarray(
                coords2mask(jnp.asarray(gt_true), pred_np.shape[-1]))
            ideal_th = find_threshold(pred_np, masks_true)

        # per-frame data artifact + comparison figure every 100th batch
        # (main.py:369-391), saved locally
        if batch_idx % 100 == 1 and cfg.get("save_artifacts", True):
            art_dir = Path(logger.run_dir) / f"{logger.run_name}_frames"
            art_dir.mkdir(parents=True, exist_ok=True)
            es = np.asarray(out["es_sample"])
            np.savez_compressed(
                art_dir / f"frame_{batch_idx:05d}.npz",
                data=frame, toa=es, gt=gt)
            _save_comparison(art_dir / f"frame_{batch_idx:05d}.png",
                             frame, es, gt, str(cfg.model), logger)

        for k, row in enumerate(metrics):
            total["distance"].append(row[0])
            total["jaccard"].append(row[3])
            total["time"].append(infer_time)
        total["loss"].append(loss)

        logger.log({"event": "val", "val_step": val_step, "val_loss": loss,
                    "val_ideal_threshold": ideal_th,
                    "inference_time": infer_time,
                    "eval_step_time": step_time,
                    "val_toa_distance": _nanmean(metrics[:, 0]),
                    "val_toa_precision": _nanmean(metrics[:, 1]),
                    "val_toa_recall": _nanmean(metrics[:, 2]),
                    "val_toa_jaccard": _nanmean(metrics[:, 3])})

    profiler.close()  # flush an unfinished trace window (short splits)
    if val_step == 0:
        raise ValueError(
            f"evaluation produced no batches: the eval split has "
            f"{len(ctx['dataset'])} item(s) and batch_size="
            f"{cfg.batch_size} with drop_last — an all-NaN summary would "
            f"be reported otherwise; lower batch_size or enlarge the split")

    dist = np.asarray(total["distance"], dtype=np.float64)
    summary = {
        "model_name": cfg.model,
        "total_jaccard": _nanmean(total["jaccard"]),
        "total_inference_time": _nanmean(total["time"]),
        "total_distance_mean": _nanmean(dist),
        "total_distance_std": float(np.std(dist[~np.isnan(dist)]))
        if (~np.isnan(dist)).any() else float("nan"),
        "val_loss": float(np.mean(total["loss"])) if total["loss"] else 0.0,
    }
    if use_int8:
        summary["int8"] = True
    logger.set_summary(**summary)
    return summary


def train(ctx: Dict[str, Any], logger: MetricsLogger) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.data.loader import (
        DataLoader, default_num_workers, pipeline_batches, split_dataset,
    )
    from stofnet_tpu.train.early_stop import EarlyStopping
    from stofnet_tpu.train.checkpoint import save_checkpoint
    from stofnet_tpu.train.steps import (
        TrainState, init_train_state, make_eval_step, make_optimizer,
        make_train_step, state_variables,
    )
    from stofnet_tpu.utils.profiling import StepTraceProfiler

    cfg = ctx["cfg"]
    profiler = StepTraceProfiler(cfg.get("profile_dir"),
                                 cfg.get("profile_steps") or 5)
    ds, info = ctx["dataset"], ctx["info"]
    kind = info["kind"]
    up = int(cfg.upsample_factor)

    nw = cfg.get("num_workers")
    nw = default_num_workers() if nw is None else int(nw)
    train_idx, val_idx = split_dataset(len(ds), 0.2, seed=int(cfg.seed))
    train_loader = DataLoader(ds, train_idx, batch_size=int(cfg.batch_size),
                              shuffle=True, drop_last=True, seed=int(cfg.seed),
                              num_workers=nw)
    val_loader = DataLoader(ds, val_idx, batch_size=int(cfg.batch_size),
                            drop_last=True, num_workers=nw)

    if int(cfg.epochs) > 0 and len(train_loader) == 0:
        raise ValueError(
            f"training would run zero steps: the train split has "
            f"{len(train_idx)} item(s) and batch_size={cfg.batch_size} "
            f"with drop_last; lower batch_size or enlarge the dataset")
    if int(cfg.epochs) > 0 and len(val_loader) == 0:
        raise ValueError(
            f"validation split is empty ({len(val_idx)} item(s) < "
            f"batch_size={cfg.batch_size} with drop_last): val_loss and "
            f"early stopping would run on zero batches")

    lcfg = _loss_config(cfg, ctx["model_kind"])
    optimizer, schedule = make_optimizer(
        lr=float(cfg.lr), weight_decay=float(cfg.weight_decay),
        epochs=int(cfg.epochs), steps_per_epoch=max(1, len(train_loader)))
    train_step = make_train_step(ctx["model"], optimizer, lcfg,
                                 remat=bool(cfg.get("remat", False)),
                                 amp=bool(cfg.get("amp", False)),
                                 accum=int(cfg.get("accum", 1) or 1))
    eval_step = make_eval_step(ctx["model"], lcfg)

    state = init_train_state(ctx["variables"], optimizer, seed=int(cfg.seed))
    start_epoch = 0
    if cfg.get("resume"):
        from stofnet_tpu.train.checkpoint import load_checkpoint

        restored = load_checkpoint(
            cfg.resume,
            {"variables": state_variables(state),
             "opt_state": state.opt_state, "step": 0, "epoch": 0})
        state = TrainState(restored["variables"]["params"],
                           restored["variables"].get("batch_stats", {}),
                           restored["opt_state"],
                           jnp.asarray(restored["step"], jnp.int32),
                           state.rng)
        start_epoch = int(restored.get("epoch", 0))
        print(f"resumed from {cfg.resume} at epoch {start_epoch}",
              file=sys.stderr)
    early = EarlyStopping(patience=int(cfg.patience), delta=float(cfg.delta))

    mesh = _build_mesh(cfg)
    if mesh is not None:
        from stofnet_tpu.parallel import replicate

        state = jax.device_put(state, replicate(mesh))
        print(f"train on mesh dp={mesh.shape['dp']} sp={mesh.shape['sp']}",
              file=sys.stderr)

    # in-loop figure panels every N train batches (main.py:250-276; the
    # reference uploads to W&B every 800, we save PNGs next to the JSONL)
    plot_every = int(cfg.get("plot_interval", 800))
    plot_dir = Path(logger.run_dir) / f"{logger.run_name}_figs"

    def host_batches(loader):
        for batch in loader:
            frame, gt = batch_to_arrays(batch, kind)
            gt_true = np.round(gt[:, None, :] * up).astype(np.int32)
            yield frame, gt, gt_true

    if mesh is not None:
        put = lambda b: _shard_inputs(mesh, *b)  # noqa: E731
    else:
        put = lambda b: tuple(jnp.asarray(x) for x in b)  # noqa: E731

    def save_ckpt(tag: str, epoch_count: int):
        ckpt_dir = Path(cfg.ckpt_dir)
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        return save_checkpoint(ckpt_dir / tag, {
            "variables": jax.tree.map(np.asarray, state_variables(state)),
            "opt_state": jax.tree.map(np.asarray, state.opt_state),
            "step": int(state.step),
            "epoch": int(epoch_count),
        })

    train_global = int(state.step)
    epochs_run = start_epoch
    val_loss = float("inf")
    for epoch in range(start_epoch, int(cfg.epochs)):
        # epoch e's batch order is a function of (seed, e): resumed runs
        # replay the order the uninterrupted run would have used
        train_loader.set_epoch(epoch)
        # lr actually used THIS epoch (the reference logs
        # optimizer.param_groups lr before scheduler.step(), main.py:284-288)
        lr_epoch = float(schedule(state.step))
        epoch_loss = 0.0
        n_items = 0
        for host, dev in pipeline_batches(host_batches(train_loader), put):
            frame, gt, gt_true = host
            frame_d, gt_d, gt_true_d = dev
            state, aux = train_step(state, frame_d, gt_d, gt_true_d)
            loss = float(aux["loss"])
            profiler.step()  # no-op unless profile_dir= is set
            if not np.isfinite(loss):
                # failure detection (beyond the reference, which would
                # silently train on NaN until the end-of-run summary):
                # stop at the poisoned step with enough context to resume
                # from the last checkpoint
                raise RuntimeError(
                    f"non-finite train loss {loss} at step {train_global + 1}"
                    f" (epoch {epoch}, lr {float(schedule(state.step)):.2e});"
                    " resume from the last checkpoint with a lower lr")
            epoch_loss += loss  # sum of per-batch means (main.py:242)
            n_items += frame.shape[0]
            train_global += 1
            logger.log({"event": "train", "train_step": train_global,
                        "train_loss": loss})
            if plot_every and train_global % plot_every == 0:
                out = eval_step(state_variables(state), frame_d, gt_d,
                                gt_true_d)
                _save_channel_overview(
                    plot_dir / f"train_{train_global:06d}.png", frame, gt,
                    np.asarray(out["es_sample"]), logger)
        epochs_run = epoch + 1

        # validation (loss + tolerance-matched ToA metrics, main.py:291-347)
        vlosses, vmetrics = [], []
        for _, dev in pipeline_batches(host_batches(val_loader), put):
            frame_d, gt_d, gt_true_d = dev
            out = eval_step(state_variables(state), frame_d, gt_d, gt_true_d)
            vlosses.append(float(out["loss"]))
            vmetrics.append(np.asarray(out["toa_metrics"]))
        val_loss = float(np.sum(vlosses))
        vm = (np.concatenate(vmetrics) if vmetrics
              else np.full((1, 7), np.nan))
        # epoch train_loss is the reference's sum(batch means)/len(train_set)
        # (main.py:242,281); per-step per-batch means are in the 'train'
        # events above
        logger.log({"event": "epoch", "epoch": epoch,
                    "train_loss": epoch_loss / max(len(train_idx), 1),
                    "val_loss": val_loss,
                    "val_toa_distance": _nanmean(vm[:, 0]),
                    "val_toa_jaccard": _nanmean(vm[:, 3]),
                    "lr": lr_epoch})

        # mid-run safety checkpoint (the reference saves only at the end,
        # main.py:423-427, losing everything on a crash): overwrite a
        # rolling 'last' checkpoint each epoch so the NaN fail-fast's
        # resume guidance is actually actionable
        save_ckpt(f"{logger.run_name}_last", epochs_run)

        if early(val_loss):
            print(f"Finished at epoch: {epoch}", file=sys.stderr)
            break

    profiler.close()  # flush an unfinished trace window (short runs)
    name = (f"{logger.run_name}_rf-scale{cfg.rf_scale_factor}"
            f"_epoch_{epochs_run}")
    path = save_ckpt(name, epochs_run)
    logger.log_artifact(path, name)  # W&B mirror (main.py:428-430)
    summary = {"val_loss": val_loss, "checkpoint": str(path),
               "epochs": epochs_run}
    if cfg.get("export_pth") and cfg.model.lower() != "gradpeak":
        # reference-compatible .pth alongside the orbax checkpoint, so
        # weights trained here load into the torch pipeline (main.py:172-177)
        from stofnet_tpu.models.registry import export_checkpoint

        pth = export_checkpoint(
            cfg.model, state_variables(state),
            str(Path(cfg.ckpt_dir) / f"{name}.pth"),
            n_layers=2 if kind == "chirp" else 10)
        summary["export_pth"] = str(pth)
    logger.set_summary(final_val_loss=val_loss, **summary)
    return summary


def run(cfg: Config) -> Dict[str, Any]:
    if cfg.get("int8") and not cfg.evaluate:
        raise ValueError("int8=True is a SERVING path (evaluate=True only):"
                         " training runs full-precision — drop the flag or"
                         " add evaluate=True")
    if cfg.get("compile_cache"):
        # persistent XLA compilation cache: serving/eval restarts skip the
        # 20-60 s first-jit compile (the reference's torch has no compile
        # step to cache; under jit ours is the cold-start cost that
        # matters in production). Must be set before the first compile;
        # scoped to THIS run (restored in the finally below) so later
        # in-process runs — or the rest of a pytest session — don't
        # silently keep reading/writing this run's cache dir.
        import jax

        prev_cache = (jax.config.jax_compilation_cache_dir,
                      jax.config.jax_persistent_cache_min_compile_time_secs)
        jax.config.update("jax_compilation_cache_dir",
                          str(cfg.compile_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    else:
        prev_cache = None
    ctx = setup(cfg)
    import jax

    # trainable parameters only — BatchNorm running stats are buffers and
    # excluded, like the reference's torchinfo count (main.py:415-417)
    n_params = sum(int(np.prod(np.shape(p)))
                   for p in jax.tree.leaves(ctx["variables"].get("params",
                                                                 {})))
    run_name = make_run_name(int(cfg.seed) + int(time.time()) % 100000)
    logger = MetricsLogger(cfg.get("run_dir", "runs"), run_name,
                           config=dict(cfg),
                           wandb_group=cfg.logging if cfg.logging else None)
    logger.set_summary(model_name=cfg.model, total_parameters=n_params)
    try:
        if cfg.evaluate:
            result = evaluate(ctx, logger)
            if ctx.get("random_init"):
                # benchmark-integrity marker: the requested checkpoint was
                # not found and the protocol ran on fresh init weights —
                # downstream tables must say so, not just this stderr line
                result["random_init"] = True
                logger.set_summary(random_init=True)
        else:
            result = train(ctx, logger)
    finally:
        logger.finish()
        if prev_cache is not None:
            jax.config.update("jax_compilation_cache_dir", prev_cache[0])
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              prev_cache[1])
    print(f"run {run_name}: " + ", ".join(
        f"{k}={v}" for k, v in result.items()), file=sys.stderr)
    return {"run_name": run_name, **result}


def main(argv: Optional[list] = None) -> None:
    cfg = merge_cli(load_config(DEFAULT_CONFIG), argv)
    run(cfg)


if __name__ == "__main__":
    main()
