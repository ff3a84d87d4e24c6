"""Export the serving pipeline to a self-contained StableHLO artifact.

No reference equivalent (the torch reference serves eagerly from python,
main.py:291-347); see ``stofnet_tpu/serve.py`` for the design. Usage::

    python -m stofnet_tpu.cli.export model_file=different-armadillo \
        out=stofnet_b128.jaxexp batch=128 length=8000 [th=Null]
        [ckpt_dir=...] [platforms=cpu,tpu] [max_echoes=64] [window_size=20]
        [dtype=auto|bfloat16|float32]
        [int8_calib=x.npy [int8_stack=4,8,10] [int8_eq_alpha=0.5]
         [int8_bias_correct=True]]

``dtype=auto`` (the default) self-checks: a bf16-vs-f32 decode-agreement
probe on in-distribution echoes picks bf16 when agreement >= 0.99 and
falls back to float32 with a loud note otherwise (the measured ESPCN
bf16-saturation trap, docs/ZOO_SERVE_tpu.md).

``bake_weights=False`` exports the weights AS INPUTS (StableHLO body =
program text only, params ride a ``<out>.weights.npz`` sidecar that
``load_pipeline`` auto-detects) — for large models whose baked body
floors the artifact size (kuleshov's ~35 M-param schedule → 163 MB at
L=800; the relay remote-compile refuses ~290 MB bodies).

The WHOLE model zoo exports, mirroring the reference's one-switch
benchmark (main.py:133-167): ``model=edsr|espcn|sincnet|unet|kuleshov``
(heatmap decode like stofnet), ``model=zonzini`` (direct per-frame ToA,
one coord slot), ``model=gradpeak`` (classical detector, no model_file).
Family-specific build knobs: ``dataset_kind=chirp|pala|rat``
``rf_scale_factor=`` ``sample_num=`` (kuleshov) ``fs=`` (sincnet)
``n_layers=`` (unet .pth import). int8 keys are stofnet-only.

``batch=b`` (any symbolic name) exports one BATCH-POLYMORPHIC artifact
that serves every batch size; length stays static (the decode top_k and
SGB pooling are length-specialized — export one artifact per length).

The artifact bakes the checkpoint's weights in; serve it with::

    from stofnet_tpu.serve import load_pipeline
    coords = load_pipeline("stofnet_b128.jaxexp")(x)   # x: (B, 1, L) f32
"""

from __future__ import annotations

import sys
from typing import Any, Dict, List, Optional

import yaml


def parse_args(argv: Optional[List[str]] = None) -> Dict[str, Any]:
    args: Dict[str, Any] = {}
    for arg in (sys.argv[1:] if argv is None else argv):
        if "=" not in arg:
            raise SystemExit(f"expected key=value, got {arg!r}; see "
                             f"module docstring")
        k, _, v = arg.partition("=")
        args[k.strip()] = yaml.safe_load(v) if v != "" else None
    return args


_KNOWN_KEYS = frozenset({
    "model_file", "out", "ckpt_dir", "platforms", "th", "batch", "length",
    "window_size", "max_echoes", "int8_calib",
    # zoo serving (model= picks any registry model; the rest are the
    # registry.build_model kwargs the chosen family needs — sample_num
    # for kuleshov, fs for sincnet, n_layers for unet .pth import)
    "model", "dataset_kind", "rf_scale_factor", "sample_num", "fs",
    "n_layers",
    # forward compute dtype: auto (default) | bfloat16 | float32. auto
    # runs a bf16-vs-f32 decode-agreement probe on in-distribution
    # echoes (serve.probe_dtype_agreement) and falls back to f32 with a
    # loud note when agreement < 0.99. The trap it guards (measured on
    # hardware): vital-puddle ESPCN's sigmoid emits EXACT-1.0 ties
    # across hundreds of bins in bf16 (argmax knife-edge, TPU-vs-CPU
    # agreement 0.0000), unique max in f32
    "dtype",
    # partial-stack int8 serving config (with int8_calib; see
    # serve.make_pipeline): int8_stack=4,8,10 int8_eq_alpha=0.5
    # int8_bias_correct=True
    "int8_stack", "int8_eq_alpha", "int8_bias_correct",
    # bake_weights=False: weights-AS-INPUTS export (StableHLO body takes
    # the params tree as arguments + a <out>.weights.npz sidecar) — for
    # large models whose baked body floors the artifact (kuleshov 163 MB
    # at L=800; the relay remote-compile 413s ~290 MB bodies). Default
    # True (self-contained single file).
    "bake_weights",
    # input_enc=f32|bf16|s16|s8c<n>: ENCODED-INPUT artifact — the device
    # signature becomes (codes[, scales]); load_pipeline encodes
    # host-side so callers keep f(x f32)->coords while the host->device
    # transfer (the measured serving ceiling, docs/SERVE_BATCHED_tpu.md)
    # ships 2x (bf16/s16) or ~4x (s8c) fewer bytes. Gate the scheme's
    # decode agreement on YOUR data like any quantization
    # (scripts/input_enc_sweep.py measured s16 lossless-grade and s8c16
    # >= the per-waveform int8 wire on echo data).
    "input_enc",
    # architecture overrides (win over params-tree inference — needed
    # where the architecture is not recoverable from shapes, e.g. a
    # non-default semi_global_scale pooling factor)
    "num_features", "semi_global_scale", "num_blocks", "upsample_factor",
})


def resolve_variables_and_overrides(args: Dict[str, Any]):
    """Resolve ``model_file=``/``ckpt_dir=`` to (variables, overrides).
    Works for both reference .pth and trained-here orbax dirs; shape-
    recoverable architecture knobs are inferred from the params tree
    (conv_last Cout = upsample factor, conv<i> names = num_blocks,
    conv1 Cout = num_features, SGB presence). semi_global_scale is NOT
    in any shape — the default 80 matches every shipped checkpoint;
    pass semi_global_scale=N explicitly for a non-default pooling scale.
    Shared by this exporter and the serving daemon (cli/serve.py)."""
    from stofnet_tpu.train.checkpoint import load_model_variables

    variables = load_model_variables("stofnet", _resolve_ckpt_path(args))
    params = variables["params"]
    overrides = {
        "upsample_factor": int(params["conv_last"]["kernel"].shape[-1]),
        "num_blocks": 1 + max(int(k[4:]) for k in params
                              if k.startswith("conv") and k[4:].isdigit()),
        "num_features": int(params["conv1"]["kernel"].shape[-1]),
    }
    if "semi_global_block" not in params:
        overrides["semi_global_scale"] = 1
    for k in ("num_features", "semi_global_scale", "num_blocks",
              "upsample_factor"):
        if args.get(k) is not None:
            overrides[k] = int(args[k])
    return variables, overrides


def _resolve_ckpt_path(args: Dict[str, Any]) -> str:
    """Shared checkpoint lookup policy: prefix-match in ckpt_dir, then in
    the reference's shipped ckpts, else treat model_file as a raw path
    (reference main.py:174-177 semantics). One place, so the stofnet and
    zoo exporters and the serving daemon stay in lockstep."""
    from stofnet_tpu.train.checkpoint import find_checkpoint

    path = args["model_file"]
    resolved = (find_checkpoint(args.get("ckpt_dir", "ckpts"), str(path))
                or find_checkpoint("/root/reference/ckpts", str(path)))
    return str(resolved) if resolved is not None else str(path)


def resolve_zoo_variables_and_overrides(args: Dict[str, Any], model: str):
    """variables + ``registry.build_model`` kwargs for a non-StofNet model.

    The reference benchmarks its whole zoo behind one ``model=`` switch
    (main.py:133-167); the export/serving story mirrors that. gradpeak is
    parameter-free (no ``model_file``); kuleshov needs ``sample_num=``;
    sincnet needs ``fs=`` (its sinc filterbank is parameterized by the
    sample rate, reference models/sincnet.py:147-188)."""
    kind = str(args.get("dataset_kind", "chirp"))
    overrides: Dict[str, Any] = {
        "dataset_kind": kind,
        "upsample_factor": int(args.get("upsample_factor") or 4),
        "rf_scale_factor": int(args.get("rf_scale_factor") or 10),
    }
    if model == "kuleshov":
        if args.get("sample_num") is None:
            raise SystemExit("model=kuleshov needs sample_num= (its FC "
                             "head is sized analytically from "
                             "sample_num*rf_scale_factor)")
        overrides["sample_num"] = int(args["sample_num"])
        n = overrides["sample_num"] * overrides["rf_scale_factor"]
        length = int(args.get("length", 8000))
        if n != length:
            raise SystemExit(
                f"kuleshov input_length sample_num*rf_scale_factor={n} "
                f"must equal the export length={length}")
    if model == "sincnet":
        if args.get("fs") is None:
            raise SystemExit("model=sincnet needs fs= (the sinc filterbank "
                             "is parameterized by the sample rate)")
        overrides["fs"] = float(args["fs"])
    if model == "gradpeak":
        return {"params": {}}, overrides

    from stofnet_tpu.train.checkpoint import load_model_variables

    n_layers = args.get("n_layers")
    n_layers = int(n_layers) if n_layers is not None else (
        2 if kind == "chirp" else 10)
    if model == "unet":
        # the CONSTRUCTED depth must match the imported tree, not just
        # the import's rewrite table (registry.build_model n_layers)
        overrides["n_layers"] = n_layers
    return (load_model_variables(model, _resolve_ckpt_path(args),
                                 n_layers=n_layers), overrides)


def resolve_dtype(args: Dict[str, Any]):
    """``dtype=auto|bfloat16|float32`` → jnp dtype, or the string
    ``"auto"`` when unset/auto (the exporter then runs the decode-
    agreement probe and picks). f32 matters for saturating activations
    (see _KNOWN_KEYS note)."""
    if args.get("dtype") in (None, "auto"):
        return "auto"
    import jax.numpy as jnp

    table = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
             "float32": jnp.float32, "f32": jnp.float32}
    if str(args["dtype"]) not in table:
        raise SystemExit(f"dtype= must be one of {sorted(table)} or auto")
    return table[str(args["dtype"])]


def apply_dtype_gate(dtype, variables, overrides, *, model_name: str,
                     length: int, **pipe_kwargs):
    """Self-checking dtype gate (shared by the exporter and the
    checkpoint-serving daemon): when ``dtype`` is ``"auto"``, probe
    bf16-vs-f32 decode agreement on in-distribution echoes
    (serve.probe_dtype_agreement) and only ship bf16 when it clears the
    same 0.99 bar every quantization decision gates on; otherwise fall
    back to float32 with a loud stderr note. An explicit dtype passes
    through untouched (user pinned it)."""
    if dtype != "auto":
        return dtype
    from stofnet_tpu.serve import probe_dtype_agreement

    agree = probe_dtype_agreement(variables, overrides, length=length,
                                  model_name=model_name, **pipe_kwargs)
    if agree >= 0.99:
        print(f"dtype gate: bf16 OK (bf16-vs-f32 decode agreement "
              f"{agree:.4f} >= 0.99)", file=sys.stderr)
        return None  # the pipeline's bf16 default
    import jax.numpy as jnp

    print(f"dtype gate FIRED: bf16-vs-f32 decode agreement {agree:.4f} "
          f"< 0.99 on in-distribution echoes -> serving float32 "
          f"(saturating-activation argmax trap, docs/ZOO_SERVE_tpu.md). "
          f"Pass dtype=bfloat16 to override.", file=sys.stderr)
    return jnp.float32


def load_calib(args: Dict[str, Any]):
    """``int8_calib=<.npy>`` → (B, 1, L) f32 calibration batch or None."""
    if not args.get("int8_calib"):
        return None
    import numpy as _np

    calib = _np.load(str(args["int8_calib"])).astype(_np.float32)
    if calib.ndim != 3 or calib.shape[1] != 1:
        raise SystemExit(f"int8_calib must be a (B, 1, L) array, got "
                         f"{calib.shape}")
    return calib


def load_stack_cfg(args: Dict[str, Any]) -> Dict[str, Any]:
    """``int8_stack=4,8,10`` (or a YAML list) + ``int8_eq_alpha=`` +
    ``int8_bias_correct=`` → partial-stack kwargs for make_pipeline."""
    raw = args.get("int8_stack")
    if raw in (None, ""):
        layers = None
    elif isinstance(raw, (list, tuple)):
        layers = tuple(int(i) for i in raw)
    else:
        layers = tuple(int(t) for t in str(raw).split(","))
    if layers and not args.get("int8_calib"):
        raise SystemExit("int8_stack= requires int8_calib= (the stack "
                         "scales are calibrated)")
    alpha = args.get("int8_eq_alpha")
    return {
        "int8_stack_layers": layers,
        "int8_eq_alpha": None if alpha in (None, "Null") else float(alpha),
        "int8_bias_correct": bool(args.get("int8_bias_correct", False)),
    }


def main(argv: Optional[List[str]] = None) -> str:
    args = parse_args(argv)
    unknown = set(args) - _KNOWN_KEYS
    if unknown:
        raise SystemExit(f"unknown argument(s) {sorted(unknown)}; "
                         f"supported: {sorted(_KNOWN_KEYS)}")
    model = str(args.get("model") or "stofnet").lower()
    if not args.get("model_file") and model != "gradpeak":
        raise SystemExit("model_file=<ckpt prefix or path> is required")
    dtype = resolve_dtype(args)
    out = args.get("out") or f"{args.get('model_file') or model}.jaxexp"

    from stofnet_tpu.serve import export_pipeline, save_pipeline

    if model == "stofnet":
        variables, overrides = resolve_variables_and_overrides(args)
    else:
        if any(args.get(k) for k in ("int8_calib", "int8_stack",
                                     "int8_eq_alpha", "int8_bias_correct")):
            raise SystemExit("int8 export targets model=stofnet only")
        variables, overrides = resolve_zoo_variables_and_overrides(args,
                                                                   model)

    platforms = args.get("platforms", "cpu,tpu")
    if isinstance(platforms, str):
        platforms = [p.strip() for p in platforms.split(",") if p.strip()]
    th = args.get("th")
    # int8-SGB serving export: the .npy batch calibrates the pre-pool
    # requantization scales; the quantized state is baked in. Use
    # echo-bearing waveforms (docs/DESIGN.md calibration trap).
    calib = load_calib(args)
    stack_cfg = load_stack_cfg(args)
    length = int(args.get("length", 8000))
    threshold = None if th in (None, "Null") else float(th)
    max_echoes = int(args.get("max_echoes", 64))
    window_size = int(args.get("window_size", 20))
    dtype = apply_dtype_gate(dtype, variables, overrides, model_name=model,
                             length=length, window_size=window_size,
                             threshold=threshold, max_echoes=max_echoes,
                             int8_calib=calib, **stack_cfg)
    # batch=b (any non-numeric name) exports ONE batch-polymorphic
    # artifact via jax.export symbolic shapes; an int pins the batch
    batch = args.get("batch", 128)
    batch = str(batch) if isinstance(batch, str) and not str(
        batch).isdigit() else int(batch)
    pipe_kwargs = dict(platforms=platforms, model_name=model, dtype=dtype,
                       window_size=window_size, threshold=threshold,
                       max_echoes=max_echoes, int8_calib=calib, **stack_cfg)
    if args.get("input_enc") not in (None, "", "f32"):
        # added after the dtype gate on purpose: the gate probes the
        # bf16-vs-f32 COMPUTE choice on the plain f32-input pipeline;
        # the input encoding is orthogonal and measured separately
        pipe_kwargs["input_enc"] = str(args["input_enc"])
    if args.get("bake_weights", True):
        blob = export_pipeline(variables, overrides, batch, length,
                               **pipe_kwargs)
        weights = None
        note = "weights baked in"
    else:
        from stofnet_tpu.serve import export_pipeline_weightless

        blob, weights = export_pipeline_weightless(variables, overrides,
                                                   batch, length,
                                                   **pipe_kwargs)
        note = f"weights-as-inputs + {out}.weights.npz sidecar"
    p = save_pipeline(out, blob, weights=weights)
    enc = pipe_kwargs.get("input_enc", "f32")
    print(f"exported {p} ({len(blob) / 1e6:.2f} MB, model={model}, "
          f"platforms={','.join(platforms)}, "
          f"input=({args.get('batch', 128)}, 1, {length}) {enc}"
          + (" [encoded-input: codes ride the host->device leg]"
             if enc != "f32" else "") + f", {note})",
          file=sys.stderr)
    return str(p)


if __name__ == "__main__":
    main()
