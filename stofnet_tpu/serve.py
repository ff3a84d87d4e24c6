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


def parse_input_enc(enc: Optional[str]) -> Tuple[str, int]:
    """``input_enc=`` spelling → (kind, n_chunks). Kinds: ``"f32"``
    (default), ``"bf16"``, ``"s16"`` (alias ``int16``), ``"s8c"`` with an
    optional chunk count (``s8c16``; default serving/codecs.DEFAULT_CHUNKS).
    The same spellings the TCP wire accepts, because they are the same
    schemes (serving/codecs.py)."""
    enc = "f32" if enc in (None, "") else str(enc)
    if enc in ("f32", "bf16"):
        return enc, 0
    if enc in ("s16", "int16"):
        return "s16", 0
    from stofnet_tpu.serving.codecs import parse_s8c

    n = parse_s8c(enc)
    if n is not None:
        return "s8c", n
    raise ValueError(f"input_enc must be f32|bf16|s16|s8c<n>, got {enc!r}")


def encoded_input_specs(enc: Optional[str], batch, length: int):
    """The artifact's device input signature for ``input_enc=enc`` —
    ShapeDtypeStructs for (codes[, scales]); the f32 default is the plain
    (batch, 1, length) f32 waveform."""
    import jax
    import jax.numpy as jnp

    kind, n = parse_input_enc(enc)
    if kind == "f32":
        return (jax.ShapeDtypeStruct((batch, 1, length), jnp.float32),)
    if kind == "bf16":
        return (jax.ShapeDtypeStruct((batch, 1, length), jnp.bfloat16),)
    if kind == "s16":
        return (jax.ShapeDtypeStruct((batch, 1, length), jnp.int16),
                jax.ShapeDtypeStruct((batch, 1, 1), jnp.float32))
    from stofnet_tpu.serving.codecs import chunk_len

    chunk_len(length, n)  # config-time divisibility check
    return (jax.ShapeDtypeStruct((batch, 1, length), jnp.int8),
            jax.ShapeDtypeStruct((batch, 1, n), jnp.float32))


def make_input_encoder(enc: Optional[str]):
    """Host-side (numpy) encoder matching ``make_pipeline(input_enc=enc)``:
    ``(B, 1, L) f32 → tuple of device inputs``. This is where the
    daemon→device transfer win happens: the relay ships the codes, the
    dequantization runs on device fused into the first conv
    (docs/SERVE_BATCHED_tpu.md names this leg as the serving ceiling)."""
    kind, n = parse_input_enc(enc)
    if kind == "f32":
        return lambda x: (np.ascontiguousarray(x, np.float32),)
    if kind == "bf16":
        import ml_dtypes

        return lambda x: (np.asarray(x, np.float32)
                          .astype(ml_dtypes.bfloat16),)
    if kind == "s16":
        from stofnet_tpu.serving.codecs import encode_s16

        def enc_s16(x):
            x = np.asarray(x, np.float32)
            codes, scales = encode_s16(x.reshape(x.shape[0], -1))
            return (codes.reshape(x.shape),
                    scales.reshape(-1, 1, 1).astype(np.float32))

        return enc_s16
    from stofnet_tpu.serving.codecs import encode_s8c

    def enc_s8c(x):
        x = np.asarray(x, np.float32)
        codes, scales = encode_s8c(x.reshape(x.shape[0], -1), n)
        return (codes.reshape(x.shape),
                scales.reshape(x.shape[0], 1, n).astype(np.float32))

    return enc_s8c


def _wrap_input_enc(pipe, enc: Optional[str]):
    """Wrap an ``x f32``-input pipeline so it takes the encoded device
    inputs instead; the dequantization is jnp (traced/exported) and
    bit-matches the numpy codecs' decode (tests/test_serving_codecs.py)."""
    import jax.numpy as jnp

    kind, n = parse_input_enc(enc)
    if kind in ("f32", "bf16"):
        # f32: identity. bf16: the base pipeline's own first-op cast
        # absorbs a bf16 input; no dequant needed (lossless for
        # bf16-forward models)
        return pipe
    if kind == "s16":
        return lambda codes, scales: pipe(
            codes.astype(jnp.float32) * scales)

    def pipe_s8c(codes, scales):
        b, _, length = codes.shape
        c = length // n
        x = (codes.reshape(b, 1, n, c).astype(jnp.float32)
             * scales[..., None]).reshape(b, 1, length)
        return pipe(x)

    return pipe_s8c


def make_pipeline(variables: Dict[str, Any], overrides: Dict[str, Any],
                  *, model_name: str = "stofnet", window_size: int = 20,
                  threshold: Optional[float] = None,
                  max_echoes: int = 64, dtype: Any = None,
                  int8_calib: Any = None,
                  int8_stack_layers: Optional[Tuple[int, ...]] = None,
                  int8_eq_alpha: Optional[float] = None,
                  int8_bias_correct: bool = False,
                  input_enc: Optional[str] = None):
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

            return _wrap_input_enc(pipe, input_enc)
        zoo_up = int(updates.get("upsample_factor", up))

        def pipe(x):
            return decode(model.apply(variables, x), up=zoo_up)

        return _wrap_input_enc(pipe, input_enc)

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

        return _wrap_input_enc(pipe, input_enc)

    from stofnet_tpu.models import StofNet

    model = StofNet(dtype=dtype, **overrides)

    def pipe(x):
        return decode(model.apply(variables, x))

    return _wrap_input_enc(pipe, input_enc)


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
    the direct pipeline at B=1/3/8, tests/test_serve.py).

    ``input_enc=`` (in ``pipe_kwargs``) exports an ENCODED-INPUT artifact
    whose device signature is (codes[, scales]) instead of f32 waveforms
    — ``load_pipeline`` detects the signature and encodes host-side, so
    serving callers keep the ``f(x f32) → coords`` contract while the
    host→device transfer ships the compact codes (the measured serving
    ceiling, docs/SERVE_BATCHED_tpu.md)."""
    import jax
    from jax import export as jexport

    if isinstance(batch, str):
        batch = jexport.symbolic_shape(batch)[0]
    specs = encoded_input_specs(pipe_kwargs.get("input_enc"), batch, length)
    pipe = make_pipeline(variables, overrides, **pipe_kwargs)
    exp = jexport.export(jax.jit(pipe), platforms=tuple(platforms))(*specs)
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
    specs = encoded_input_specs(pipe_kwargs.get("input_enc"), batch, length)

    def pipe_w(variables, *data):
        return make_pipeline(variables, overrides, **pipe_kwargs)(*data)

    var_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), weights)
    exp = jexport.export(jax.jit(pipe_w), platforms=tuple(platforms))(
        var_specs, *specs)
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


def _detect_input_enc(avals) -> Tuple[str, int]:
    """Infer the artifact's ``input_enc`` from its trailing device input
    avals (the artifact format carries no side metadata — the signature
    IS the metadata): codes dtype int8 + a (b, 1, n) f32 scales aval →
    ``s8c<n>``; int16 codes → ``s16``; a bf16 waveform → ``bf16``; plain
    f32 → ``f32``. Returns (enc spelling, number of data avals)."""
    import jax.numpy as jnp

    if len(avals) >= 2:
        codes, scales = avals[-2], avals[-1]
        if codes.dtype == jnp.int8 and scales.dtype == jnp.float32:
            return f"s8c{int(scales.shape[-1])}", 2
        if codes.dtype == jnp.int16 and scales.dtype == jnp.float32 \
                and int(scales.shape[-1]) == 1:
            return "s16", 2
    if avals[-1].dtype == jnp.bfloat16:
        return "bf16", 1
    return "f32", 1


def load_pipeline(path: str | Path):
    """Deserialize an exported artifact; returns a callable
    ``f(x) -> coords`` (jit-compiles for the local backend on first call).
    No model code or checkpoint needed.

    A ``<path>.weights.npz`` sidecar (weightless export,
    ``export_pipeline_weightless``) is detected automatically and closed
    over — callers see the identical ``f(x) -> coords`` contract either
    way, and ``in_avals`` stays the waveform input alone (the serving
    daemon reads the contract from it, cli/serve.py).

    An ENCODED-INPUT artifact (``input_enc=`` export) is detected from
    its device signature: the returned callable still takes f32
    waveforms, encodes them host-side (numpy, ``make_input_encoder``) and
    ships the codes — the host→device transfer is the measured serving
    ceiling, and this is the lever that shrinks it. The encoding attrs
    (``input_enc``, ``encode``, ``raw_call``, ``raw_in_avals``) are
    exposed for mesh serving (cli/serve.py shards the codes)."""
    from jax import export as jexport

    exp = jexport.deserialize(Path(path).read_bytes())
    sidecar = Path(str(path) + ".weights.npz")
    weights = None
    if sidecar.exists():
        with np.load(sidecar) as z:
            weights = _unflatten_tree({k: z[k] for k in z.files})
    enc, n_data = _detect_input_enc(exp.in_avals)
    encode = make_input_encoder(enc)

    if weights is not None:
        def raw_call(*data):
            return exp.call(weights, *data)
    else:
        def raw_call(*data):
            return exp.call(*data)

    if enc == "f32":
        call = raw_call  # pass-through: no host round-trip for device args
    else:
        def call(x):
            return raw_call(*encode(x))

    call.in_avals = exp.in_avals[-n_data:][:1]
    call.platforms = exp.platforms
    call.input_enc = enc
    call.encode = encode
    call.raw_call = raw_call
    call.raw_in_avals = exp.in_avals[-n_data:]
    return call
