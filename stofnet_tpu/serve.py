"""AOT serving export: serialize the full RF→ToF pipeline to StableHLO.

No reference equivalent (the torch reference serves eagerly from a live
python process, main.py:291-347). For production TPU serving, the whole
pipeline — StofNet forward in bf16 + static-shape peak decode — is
exported once via ``jax.export`` with the checkpoint weights baked in as
constants, producing a single self-contained artifact that:

- needs NO model code, flax, or checkpoint files at serving time
  (``load_pipeline`` + one ``.call``);
- is lowered for BOTH cpu and tpu by default (export on a CPU host,
  serve on a TPU worker);
- pins the serving contract statically: (batch, 1, length) f32 in,
  (batch * channels, max_echoes) f32 coords out, 0 = empty slot —
  exactly the benchmark protocol's decode (`ops/peaks.mask2coords`).

The artifact format is jax.export's serialization (StableHLO + calling
convention, versioned and stable across jax releases); compile-at-load
is XLA's job and pairs with the CLI's ``compile_cache=`` flag for fast
cold starts.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np


def make_pipeline(variables: Dict[str, Any], overrides: Dict[str, Any],
                  *, model_name: str = "stofnet", window_size: int = 20,
                  threshold: Optional[float] = None,
                  max_echoes: int = 64, dtype: Any = None,
                  int8_calib: Any = None,
                  int8_stack_layers: Optional[Tuple[int, ...]] = None,
                  int8_eq_alpha: Optional[float] = None,
                  int8_bias_correct: bool = False):
    """The serving callable ``x (B, 1, L) f32 -> coords`` with weights
    closed over: model forward (bf16 by default) + the protocol decode
    in the checkpoint's own upsample units (reference main.py:291-321).

    ``model_name`` serves ANY registry model — the reference benchmarks a
    7-model zoo behind one CLI switch (main.py:133-167), so the serving
    story covers the zoo behind one flag too. For non-StofNet models,
    ``overrides`` holds the ``registry.build_model`` kwargs
    (``dataset_kind``/``upsample_factor``/``sample_num``/
    ``rf_scale_factor``/``fs``). Output stays coords-shaped for every
    family: heatmap models decode via ``mask2coords`` (0 = empty slot);
    regression models (zonzini: direct per-frame ToA, gradpeak: the
    classical detector's echo table) return their predictions reshaped to
    ``(B, n_echoes)`` f32 — exactly the eval protocol's ``es_sample``
    (train/steps.py regression branch). For ``gradpeak``, ``threshold``
    is the detector's hysteresis threshold, as in the reference CLI.

    ``int8_calib``: a representative (B, 1, L) f32 batch switches the
    forward to the int8-SGB serving path (`models/int8.py`) — the batch
    calibrates the pre-pool requantization scales (activation input
    scales stay dynamic per waveform), and the QUANTIZED state is what
    gets baked into the export. Calibrate on echo-bearing data
    (docs/DESIGN.md: noise-only calibration passes noise gates but can
    shift echo decodes).

    ``int8_stack_layers`` / ``int8_eq_alpha`` / ``int8_bias_correct``
    (with ``int8_calib``) additionally run the chosen k=7 stack convs on
    the s8 MXU path with SmoothQuant-style equalization and PTQ bias
    correction — the partial-stack serving config the CPU sensitivity
    sweep picks (scripts/int8_stack_sweep.py, bench.py
    INT8_STACK_LAYERS). Validate decode agreement on YOUR data before
    serving a stack config."""
    import jax.numpy as jnp

    from stofnet_tpu.ops import mask2coords

    dtype = jnp.bfloat16 if dtype is None else dtype
    model_name = model_name.lower()
    up = int(overrides.get("upsample_factor", 4))

    def decode(heat, up=up):  # zoo branch overrides (updates force up=1)
        return mask2coords(heat.astype(jnp.float32),
                           window_size=window_size, threshold=threshold,
                           upsample_factor=up, max_echoes=max_echoes)

    if model_name != "stofnet":
        if int8_calib is not None or int8_stack_layers:
            raise ValueError("int8 serving targets model=stofnet only "
                             "(the quantized path is the SemiGlobalBlock; "
                             "other models have none)")
        from stofnet_tpu.models.registry import build_model

        model, updates = build_model(model_name, th=threshold, dtype=dtype,
                                     **overrides)
        if model_name in ("zonzini", "gradpeak"):
            if model_name == "gradpeak":
                # slot count follows the serving contract (echo_max — the
                # top-amplitude pruning — stays the registry's protocol
                # value); GradPeak is a plain callable, not a flax module
                model.max_echoes = max_echoes

            def pipe(x):
                pred = model.apply(variables, x)
                return pred.reshape((pred.shape[0], -1)).astype(jnp.float32)

            return pipe
        zoo_up = int(updates.get("upsample_factor", up))

        def pipe(x):
            return decode(model.apply(variables, x), up=zoo_up)

        return pipe

    if int8_calib is not None:
        from stofnet_tpu.models.int8 import (quantize_stofnet,
                                             stofnet_apply_int8)

        qkw = {k: int(v) for k, v in overrides.items()
               if k in ("upsample_factor", "num_blocks",
                        "semi_global_scale")}
        stack = (tuple(int(i) for i in int8_stack_layers)
                 if int8_stack_layers else None)
        q = quantize_stofnet(variables, jnp.asarray(int8_calib),
                             stack_layers=stack, eq_alpha=int8_eq_alpha,
                             bias_correct=int8_bias_correct, **qkw)

        def pipe(x):
            return decode(stofnet_apply_int8(q, x, dtype=dtype,
                                             stack_layers=stack, **qkw))

        return pipe

    from stofnet_tpu.models import StofNet

    model = StofNet(dtype=dtype, **overrides)

    def pipe(x):
        return decode(model.apply(variables, x))

    return pipe


def probe_dtype_agreement(variables: Dict[str, Any],
                          overrides: Dict[str, Any], *, length: int,
                          model_name: str = "stofnet", batch: int = 16,
                          seed: int = 3008, **pipe_kwargs) -> float:
    """Decode-agreement probe for the export-time dtype gate: the bf16
    and f32 pipelines run the same in-distribution echo batch
    (data/synthetic.gate_batch) and the returned fraction of coords
    agreeing within 1 sample decides whether bf16 is safe to ship.

    Exists because of a measured hardware trap (docs/ZOO_SERVE_tpu.md):
    a saturating activation can emit EXACT-1.0 ties across hundreds of
    bins in bf16 (vital-puddle ESPCN's sigmoid, ~266 tied bins), turning
    the per-channel-max decode into an argmax lottery — TPU-vs-CPU
    agreement 0.0000 while every other family held ≥0.98. The same tie
    knife-edge shows up as bf16-vs-f32 disagreement on CPU, which is
    what this probe measures (no device needed at export time)."""
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.data.synthetic import gate_batch

    x = jnp.asarray(gate_batch(batch, length, np.random.default_rng(seed)))
    coords = {}
    for name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        pipe = jax.jit(make_pipeline(variables, overrides,
                                     model_name=model_name, dtype=dtype,
                                     **pipe_kwargs))
        coords[name] = np.asarray(pipe(x))
    return float(np.mean(np.abs(coords["bf16"] - coords["f32"]) <= 1.0))


def export_pipeline(variables: Dict[str, Any], overrides: Dict[str, Any],
                    batch: int | str, length: int,
                    *, platforms: Sequence[str] = ("cpu", "tpu"),
                    **pipe_kwargs) -> bytes:
    """Serialize the pipeline for a (batch, 1, length) f32 input.

    The LENGTH stays static (the TPU serving contract: the decode's top_k
    and the SemiGlobalBlock pooling are length-specialized); ``batch`` may
    be an int (one artifact per batch size) or a symbolic-dimension name
    such as ``"b"`` — then ONE artifact serves every batch size
    (jax.export shape polymorphism; decoded coords verified bit-exact vs
    the direct pipeline at B=1/3/8, tests/test_serve.py)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if isinstance(batch, str):
        batch = jexport.symbolic_shape(batch)[0]
    pipe = make_pipeline(variables, overrides, **pipe_kwargs)
    exp = jexport.export(jax.jit(pipe), platforms=tuple(platforms))(
        jax.ShapeDtypeStruct((batch, 1, length), jnp.float32))
    return exp.serialize()


def _flatten_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Nested dict-of-arrays → flat ``a/b/c`` keys (sidecar .npz layout).
    Only plain nested mappings are supported — exactly what every
    checkpoint importer here produces (params trees mirror torch names,
    CLAUDE.md conventions)."""
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if hasattr(v, "items"):
            out.update(_flatten_tree(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_tree(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in flat:
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return out


def _to_plain_dict(tree: Any) -> Any:
    """FrozenDict/Mapping → plain nested dict, so the exported calling
    convention's pytree structure is reproducible at load time from the
    sidecar alone (no flax import needed on the serving host)."""
    if hasattr(tree, "items"):
        return {k: _to_plain_dict(v) for k, v in tree.items()}
    return tree


def export_pipeline_weightless(
        variables: Dict[str, Any], overrides: Dict[str, Any],
        batch: int | str, length: int,
        *, platforms: Sequence[str] = ("cpu", "tpu"),
        **pipe_kwargs) -> Tuple[bytes, Dict[str, Any]]:
    """Weights-AS-INPUTS export: returns ``(blob, weights)`` where the
    StableHLO body takes the params tree as arguments instead of baking
    it in as constants, and ``weights`` is the plain-dict tree to save as
    the artifact's sidecar (``save_pipeline(path, blob, weights=...)``).

    Why this exists (measured, docs/ZOO_SERVE_tpu.md): baked weights
    inflate the artifact BODY — kuleshov's ~35 M-param conv schedule
    floors the file at 163 MB even at L=800, and the axon relay's
    remote-compile refuses ~290 MB bodies outright (HTTP 413). With
    weights as inputs the body carries only program text (a few MB);
    the weights ride the normal host→device data path at load time.

    int8 exports keep baking (the quantized state is precomputed from
    the calibration batch; its tree is not a plain params dict)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if (pipe_kwargs.get("int8_calib") is not None
            or pipe_kwargs.get("int8_stack_layers")):
        raise ValueError("bake_weights=False does not compose with int8 "
                         "exports (the quantized state is baked by "
                         "design); drop int8_calib or bake the weights")
    if isinstance(batch, str):
        batch = jexport.symbolic_shape(batch)[0]
    weights = _to_plain_dict(variables)

    def pipe_w(variables, x):
        return make_pipeline(variables, overrides, **pipe_kwargs)(x)

    var_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), weights)
    exp = jexport.export(jax.jit(pipe_w), platforms=tuple(platforms))(
        var_specs, jax.ShapeDtypeStruct((batch, 1, length), jnp.float32))
    return exp.serialize(), weights


def save_pipeline(path: str | Path, blob: bytes,
                  weights: Optional[Dict[str, Any]] = None) -> Path:
    """Write the artifact; with ``weights`` (a weightless export's params
    tree) also write the ``<path>.weights.npz`` sidecar that
    ``load_pipeline`` auto-detects."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(blob)
    if weights is not None:
        np.savez(str(path) + ".weights.npz", **_flatten_tree(weights))
    return path


def load_pipeline(path: str | Path):
    """Deserialize an exported artifact; returns a callable
    ``f(x) -> coords`` (jit-compiles for the local backend on first call).
    No model code or checkpoint needed.

    A ``<path>.weights.npz`` sidecar (weightless export,
    ``export_pipeline_weightless``) is detected automatically and closed
    over — callers see the identical ``f(x) -> coords`` contract either
    way, and ``in_avals`` stays the waveform input alone (the serving
    daemon reads the contract from it, cli/serve.py)."""
    from jax import export as jexport

    exp = jexport.deserialize(Path(path).read_bytes())
    sidecar = Path(str(path) + ".weights.npz")
    if sidecar.exists():
        with np.load(sidecar) as z:
            weights = _unflatten_tree({k: z[k] for k in z.files})

        def call(x):
            return exp.call(weights, x)

        call.in_avals = (exp.in_avals[-1],)
    else:
        def call(x):
            return exp.call(x)

        call.in_avals = exp.in_avals
    call.platforms = exp.platforms
    return call
