"""Job-array execution as ONE compiled program.

The reference's only multi-run story is SLURM job arrays: one GPU process
per benchmark row (`bash_scripts/chirp_benchmark.sh:14`, rows =
(model, ckpt, threshold) from `array_chirp_params.txt`) and one process per
training seed/config (`bash_scripts/train_pala_array.sh:14`, `%6`
concurrency). Each row pays a full process launch, model load, and — at the
published protocol's `batch_size=1` (`chirp_benchmark.sh:35`) — leaves the
accelerator almost entirely idle between dispatches.

This module is the TPU-native replacement promised in SURVEY.md §2.31: N
same-architecture members (training seeds, checkpoints, or decode
thresholds) become a single XLA program with a leading *member* axis.

What each shape buys (hardware-measured, docs/ARRAY_BENCH_r3.json,
scripts/bench_array.py):

- **vmap over members (single chip)** — N members ride ONE process, ONE
  compile, and one dispatch stream instead of N of each; compute does NOT
  merge (per-member weights make the convs grouped, so XLA cannot fuse
  members into one larger MXU contraction: measured array4@B32 113.4 ms
  vs 4x solo@B32 116.8 ms — a 1.03x dispatch-overhead win only, nowhere
  near the 65.3 ms one B=128 model costs). On one chip the array is a
  convenience/orchestration win, not a throughput win.
- **member sharding (the real parallel win)** — the member axis maps onto
  the mesh's ``dp`` axis (one member('s shard) per device = exactly the
  SLURM-array shape, minus the processes and compiles). GSPMD executes
  members embarrassingly parallel, so N members on N devices run at ~solo
  speed; with members replicated instead, it shards the batch as usual.
- **threshold sweeps run the model once** — the reference re-runs the full
  forward for every threshold row; here one forward is decoded at T
  thresholds inside the same program. Measured 2.98x at T=8, B=128
  (53.1 ms vs 8x 19.7 ms): the decode+metrics tail is ~4.8 ms per
  threshold, so the sweep pays one forward + T tails instead of T
  full pipelines.
- **per-member learning rates** — ``lr_scales`` runs member *i* at an
  exactly-scaled AdamW lr inside the same program (the reference's
  hyperparameter array rows, one process per config).

Semantics:

- Training members see the SAME host data stream (the reference's array
  training varies seed/config per row, not the data) and differ by init
  seed and dropout stream; BatchNorm members keep independent running
  statistics. ``per_member_data=True`` instead feeds each member its own
  leading-axis slice.
- Everything composes with the existing single-model machinery: a member
  extracted with :func:`unstack_tree` is a normal ``TrainState`` /
  variables dict (checkpointable, exportable, evaluable).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from stofnet_tpu.ops.peaks import mask2coords
from stofnet_tpu.parallel.mesh import shard_batch
from stofnet_tpu.train.metrics import toa_rmse
from stofnet_tpu.train.steps import (
    LossConfig,
    TrainState,
    make_eval_step,
    make_train_step,
)


def stack_trees(trees: Sequence[Any]) -> Any:
    """Stack a list of identically-structured pytrees along a new leading
    *member* axis (checkpoints -> one array model)."""
    if not trees:
        raise ValueError("stack_trees needs at least one tree")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def unstack_tree(tree: Any, member: int) -> Any:
    """Extract one member's pytree (inverse of :func:`stack_trees`)."""
    return jax.tree.map(lambda x: x[member], tree)


def n_members(tree: Any) -> int:
    """Member count = leading-axis size of the first leaf."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        raise ValueError("empty tree has no member axis")
    return int(leaves[0].shape[0])


def shard_members(mesh, tree):
    """Device-put a stacked member tree with the member axis over ``dp``.

    The member axis is the leading axis of every stacked leaf, exactly the
    layout :func:`stofnet_tpu.parallel.mesh.shard_batch` shards, so this is
    the same placement with array semantics: one member('s shard) per dp
    slice — the SLURM-array shape on a mesh. Scalars (e.g. a shared step
    counter) replicate.
    """
    return shard_batch(mesh, tree)


def init_array_state(model, optimizer, seeds: Sequence[int],
                     sample_input: jnp.ndarray, *,
                     allow_duplicate_seeds: bool = False) -> TrainState:
    """Per-seed model inits stacked into one member-axis TrainState.

    Each member's params/opt_state/rng match what a solo run with
    ``init_train_state(model.init(jax.random.key(seed), x), opt, seed)``
    would produce, so array training is comparable member-for-member
    against N sequential single-seed runs (tests/test_array.py pins this).

    ``allow_duplicate_seeds`` is for members differentiated by something
    OTHER than init — e.g. a per-member learning rate sweep wants every
    member to start from the SAME init so the comparison isolates the lr.
    """
    seeds = [int(s) for s in seeds]
    if len(set(seeds)) != len(seeds) and not allow_duplicate_seeds:
        raise ValueError(f"duplicate seeds in {seeds}: members would be "
                         f"bit-identical copies (pass "
                         f"allow_duplicate_seeds=True only when per-member "
                         f"lr_scales differentiate them)")

    def one(seed: int) -> TrainState:
        variables = model.init(jax.random.key(seed), sample_input)
        params = variables["params"]
        return TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.key(seed),
        )

    states = [one(s) for s in seeds]
    # typed PRNG keys stack like any other array leaf (jax >= 0.4.16)
    return stack_trees(states)


def make_array_train_step(model, optimizer, cfg: LossConfig, *,
                          remat: bool = False, amp: bool = False,
                          accum: int = 1, per_member_data: bool = False,
                          lr_scales: Optional[Sequence[float]] = None):
    """Jitted ``(stacked_state, frame, gt_sample, gt_true) -> (state, aux)``.

    vmaps the standard train step (train/steps.py — same loss, BatchNorm,
    dropout, amp/remat/accum recipes) over the member axis. With
    ``per_member_data`` the data arguments carry their own leading member
    axis; otherwise every member sees the same batch.

    ``lr_scales`` (one float per member) runs member *i* at
    ``lr_scales[i] × `` the optimizer's learning rate — exact for AdamW
    (the scale multiplies the whole update, which is what lr does in
    optax.adamw; see train/steps.py:train_step). This is the TPU-native
    form of the reference's hyperparameter array rows
    (bash_scripts/train_pala_array.sh:31-40 — one SLURM process per
    config): an lr sweep becomes N members of one compiled program.
    """
    step = make_train_step(model, optimizer, cfg, remat=remat, amp=amp,
                           accum=accum)
    data_ax = 0 if per_member_data else None
    if lr_scales is None:
        return jax.jit(jax.vmap(step, in_axes=(0, data_ax, data_ax, data_ax)))
    scales = jnp.asarray([float(s) for s in lr_scales], jnp.float32)
    vstep = jax.vmap(step, in_axes=(0, data_ax, data_ax, data_ax, 0))

    @jax.jit
    def scaled_step(state, frame, gt_sample, gt_true):
        return vstep(state, frame, gt_sample, gt_true, scales)

    return scaled_step


def make_array_eval_step(model, cfg: LossConfig, *,
                         keep_heatmaps: bool = False):
    """Jitted member-axis eval: stacked variables, shared batch ->
    per-member ``{loss, es_sample, toa_metrics}`` (leading member axis).

    One program evaluates N same-architecture checkpoints — the
    benchmark-sweep shape (cli/sweep.py rows that share a model family).
    ``keep_heatmaps`` also returns the (N, B, 1, L*r) heatmaps; off by
    default because N×B heatmaps dominate memory for nothing the metrics
    need.
    """
    ev = make_eval_step(model, cfg)

    def one(variables, frame, gt_sample, gt_true) -> Dict[str, jnp.ndarray]:
        out = ev(variables, frame, gt_sample, gt_true)
        if not keep_heatmaps:
            out = {k: v for k, v in out.items() if k != "masks_pred"}
        return out

    return jax.jit(jax.vmap(one, in_axes=(0, None, None, None)))


def make_threshold_sweep_step(model, cfg: LossConfig):
    """Jitted ``(variables, frame, gt_sample, gt_true, thresholds) -> dict``
    decoding ONE forward pass at T thresholds.

    The reference's threshold rows (array_*_params.txt third column) re-run
    the full model per value; here the (T,) threshold vector vmaps over the
    decode+metrics tail only. Returns ``es_sample`` (T, B, max_echoes) and
    ``toa_metrics`` (T, B, 7). Thresholds must be > 0 (the falsy
    "per-row max" mode is a structural branch — ops/peaks.threshold_scores;
    evaluate it via the plain eval step instead).
    """

    @jax.jit
    def sweep(variables, frame, gt_sample, gt_true,
              thresholds: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        pred = model.apply(variables, frame)
        gs = gt_sample.reshape(gt_sample.shape[0], -1)

        def decode_at(th):
            es = mask2coords(pred, window_size=cfg.nms_win_size, threshold=th,
                             upsample_factor=cfg.upsample_factor,
                             max_echoes=cfg.max_echoes)
            return {"es_sample": es, "toa_metrics": toa_rmse(gs, es,
                                                             tol=cfg.etol)}

        return jax.vmap(decode_at)(jnp.asarray(thresholds))

    return sweep


def stack_checkpoint_variables(variables_list: Sequence[Dict[str, Any]],
                               ) -> Dict[str, Any]:
    """Stack N loaded same-architecture variables dicts for array eval.

    Raises with the offending path if the checkpoints disagree on a leaf
    shape (different architectures can't share one program).
    """
    if not variables_list:
        raise ValueError("no variables to stack")
    first = variables_list[0]
    ref_shapes = jax.tree.map(jnp.shape, first)
    for i, v in enumerate(variables_list[1:], start=1):
        shapes = jax.tree.map(jnp.shape, v)
        if shapes != ref_shapes:
            raise ValueError(
                f"checkpoint {i} has a different architecture than "
                f"checkpoint 0: {shapes} vs {ref_shapes}")
    return stack_trees(list(variables_list))
