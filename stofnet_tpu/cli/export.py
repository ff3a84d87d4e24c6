"""Export the serving pipeline to a self-contained StableHLO artifact.

No reference equivalent (the torch reference serves eagerly from python,
main.py:291-347); see ``stofnet_tpu/serve.py`` for the design. Usage::

    python -m stofnet_tpu.cli.export model_file=different-armadillo \
        out=stofnet_b128.jaxexp batch=128 length=8000 [th=Null]
        [ckpt_dir=...] [platforms=cpu,tpu] [max_echoes=64] [window_size=20]
        [int8_calib=x.npy [int8_stack=4,8,10] [int8_eq_alpha=0.5]
         [int8_bias_correct=True]]

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
    # partial-stack int8 serving config (with int8_calib; see
    # serve.make_pipeline): int8_stack=4,8,10 int8_eq_alpha=0.5
    # int8_bias_correct=True
    "int8_stack", "int8_eq_alpha", "int8_bias_correct",
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
    from stofnet_tpu.train.checkpoint import (find_checkpoint,
                                              load_model_variables)

    path = args["model_file"]
    resolved = (find_checkpoint(args.get("ckpt_dir", "ckpts"), str(path))
                or find_checkpoint("/root/reference/ckpts", str(path)))
    if resolved is not None:
        path = resolved
    variables = load_model_variables("stofnet", path)
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
    if not args.get("model_file"):
        raise SystemExit("model_file=<ckpt prefix or path> is required")
    out = args.get("out") or f"{args['model_file']}.jaxexp"

    from stofnet_tpu.serve import export_pipeline, save_pipeline

    variables, overrides = resolve_variables_and_overrides(args)

    platforms = args.get("platforms", "cpu,tpu")
    if isinstance(platforms, str):
        platforms = [p.strip() for p in platforms.split(",") if p.strip()]
    th = args.get("th")
    # int8-SGB serving export: the .npy batch calibrates the pre-pool
    # requantization scales; the quantized state is baked in. Use
    # echo-bearing waveforms (docs/DESIGN.md calibration trap).
    calib = load_calib(args)
    # batch=b (any non-numeric name) exports ONE batch-polymorphic
    # artifact via jax.export symbolic shapes; an int pins the batch
    batch = args.get("batch", 128)
    batch = str(batch) if isinstance(batch, str) and not str(
        batch).isdigit() else int(batch)
    blob = export_pipeline(
        variables, overrides,
        batch, int(args.get("length", 8000)),
        platforms=platforms,
        window_size=int(args.get("window_size", 20)),
        threshold=None if th in (None, "Null") else float(th),
        max_echoes=int(args.get("max_echoes", 64)),
        int8_calib=calib, **load_stack_cfg(args))
    p = save_pipeline(out, blob)
    print(f"exported {p} ({len(blob) / 1e6:.2f} MB, "
          f"platforms={','.join(platforms)}, "
          f"input=({args.get('batch', 128)}, 1, {args.get('length', 8000)}) "
          f"f32)", file=sys.stderr)
    return str(p)


if __name__ == "__main__":
    main()
