"""Post-training-quantized (int8) StofNet serving path.

Parity target: /root/reference/models/stofnet.py:42-67 (the StofNet
forward) reproduced functionally over the imported parameter tree, like
models/fused.py — the reference has no quantized path; this is the
TPU-native performance extension on top of exact parity.

What gets int8 and why (r3 gap attribution, docs/DESIGN.md): the
pipeline's entire gap over roofline is the SemiGlobalBlock contract
conv's (B, L, 512) pre-pool materialization (~2.6 ms of HBM round-trip +
1.7 ms of MXU at B=128/L=8k, of a 10.3 ms pipeline). v5e's MXU does
s8xs8->s32 at 2x the bf16 rate and int8 halves the pre-pool bytes, so BY
DEFAULT exactly that conv is quantized.

The quantization scheme — every choice below was MEASURED on both noise
batches and synthetic chirp echo data (decoded-coord agreement vs f32;
see tests/test_int8.py and docs/DESIGN.md):

- **Weights**: per-output-channel symmetric s8 of the RAW kernel.
  Weight-only quantization is free (agreement 1.0000). Do NOT fold
  per-input-channel activation scales into the kernel before quantizing:
  heterogeneous channel scales make the folded rows span wildly
  different magnitudes and per-output-channel rounding then destroys the
  small-scale rows — measured catastrophic on echo data (agreement
  0.875, decode shifts of hundreds of samples) at ANY input precision
  (even a folded u16 input fails identically, which is what pinned the
  fault on the folded-weight rounding).
- **Activations**: per-WAVEFORM symmetric s8 with a DYNAMIC (runtime)
  scale ``max|h_row|/127`` — one per-row reduce fused off the previous
  conv's output. Per-row so each waveform's codes are independent of its
  batch neighbours (a quiet waveform co-batched with a loud one keeps its
  full code range; with a shared per-tensor scale its decode would depend
  on batch composition, which the f32 path's does not). The contract
  input is post-ReLU so the codes span 0..127. Measured: agreement
  1.0000 on chirp echoes (max coord delta 0.0), 0.9961 on B=64 noise ==
  the bf16 floor exactly (identical for per-tensor and per-row scales on
  these normalized batches; per-row is strictly finer); an unsigned
  0..255 code buys nothing further (same 0.9961), so the plain s8
  lowering is used.
- **The (B, L, 512) pre-pool tensor is REQUANTIZED to s8 in the conv
  epilogue** (per-channel calibrated scale, 1.25x headroom against
  serve-time saturation): requantization (clip(round(v/s)) with s>0) is
  monotone, so 80x max-pool commutes with it exactly — pooling the s8
  codes and dequantizing the max equals quantizing the pooled f32 maxima
  (property-tested). Measured alone: agreement 1.0000 (max delta <= 1
  sample). This is the half-the-HBM-bytes half of the win.

``quant_stack=True`` additionally quantizes the ten k=7 stack convs
(FLOP-bound, ~5.9 ms) with the same dynamic-per-tensor scheme. Measured
honestly: activation rounding there COMPOUNDS through the residual chain
and flips which near-tie noise peak ranks first (~0.96 agreement at
B=64; MSE-optimal clip calibration is WORSE than absmax because decode
cares about peaks; per-row dynamic scales do not help). It is an
experimental opt-in, not the serving default; bench.py would refuse to
serve it through its 0.99 gate. Everything else stays bf16/f32: conv1
(Cin=1), the expand conv ((B, L/80, 512) input), conv_last (Cout=4), all
residual carries, decode.

Serving safety: bench.py measures this path alongside xla/packed/pallas
and serves it only if it is both fastest AND passes the same
decoded-coordinate agreement gate (>=99% of coords within +-1 sample of
the f32 pipeline) every other path must pass.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from stofnet_tpu.ops.int8 import (INT8_MAX, absmax_scale, conv1d_same_int8,
                                  quantize, quantize_weight)
from stofnet_tpu.ops.packed_conv import conv1d_same as _conv1d_same
from stofnet_tpu.ops.shuffle import sample_shuffle

_QCONFIG = ("upsample_factor", "num_blocks", "semi_global_scale")
PRE_SCALE_HEADROOM = 1.25


def _kb(p, name):
    node = p
    for part in name.split("."):
        node = node[part]
    return (jnp.asarray(node["kernel"], jnp.float32),
            jnp.asarray(node["bias"], jnp.float32))


@jax.jit
def _prepool_absmax(variables: Any, x: jnp.ndarray):
    """f32 forward to the SGB contract conv output; returns its
    per-channel absmax (the pre-pool requantization scale basis).
    Mirrors StofNet.__call__ up to that point (models/stofnet.py:83-98).
    """
    p = variables["params"]
    h = jnp.transpose(x, (0, 2, 1)).astype(jnp.float32)
    h = jax.nn.relu(_conv1d_same(h, *_kb(p, "conv1")))
    v = _conv1d_same(h, *_kb(p, "semi_global_block.contract_conv"))
    return jnp.max(jnp.abs(v), axis=(0, 1), keepdims=True)


@partial(jax.jit, static_argnames=("num_blocks", "semi_global_scale"))
def _stack_input_absmax(variables: Any, x: jnp.ndarray,
                        num_blocks: int = 13, semi_global_scale: int = 80):
    """f32 forward through the stack, collecting each stack conv's INPUT
    per-channel absmax (1, 1, Cin) — the activation side of the
    SmoothQuant-style equalization basis. Mirrors StofNet.__call__
    (models/stofnet.py:83-118) exactly in f32."""
    p = variables["params"]
    h = jnp.transpose(x, (0, 2, 1)).astype(jnp.float32)
    h = jax.nn.relu(_conv1d_same(h, *_kb(p, "conv1")))
    if semi_global_scale != 1:
        v = _conv1d_same(h, *_kb(p, "semi_global_block.contract_conv"))
        rows = v.shape[1] // semi_global_scale
        s = jnp.max(v[:, : rows * semi_global_scale].reshape(
            v.shape[0], rows, semi_global_scale, v.shape[2]), axis=2)
        s = jnp.where(s >= 0, s, 0.01 * s)
        s = _conv1d_same(s, *_kb(p, "semi_global_block.expand_conv"))
        s = jax.nn.leaky_relu(s, 0.01)
        s = jnp.repeat(s, semi_global_scale, axis=1)
        pad = max(0, h.shape[1] - s.shape[1])
        s = jnp.pad(s, ((0, 0), (pad // 2, pad // 2), (0, 0)))
        h = h + s

    absmax = {}
    residual_layers = set(range(3, num_blocks - 1, 2))
    res = res1 = h
    for i in range(2, num_blocks - 1):
        absmax[f"conv{i}"] = jnp.max(jnp.abs(h), axis=(0, 1), keepdims=True)
        y = _conv1d_same(h, *_kb(p, f"conv{i}"))
        if i in residual_layers:
            h = res + y
            res = h
        else:
            h = jax.nn.leaky_relu(y, 0.01)
    absmax[f"conv{num_blocks - 1}"] = jnp.max(jnp.abs(h), axis=(0, 1),
                                              keepdims=True)
    return absmax


@partial(jax.jit, static_argnames=("chosen", "num_blocks",
                                   "semi_global_scale", "impl"))
def _stack_bias_deltas(variables: Any, calib_x: jnp.ndarray, q: dict,
                       chosen: tuple, num_blocks: int = 13,
                       semi_global_scale: int = 80,
                       impl: str = "conv") -> dict:
    """Per-output-channel quantization bias of each chosen stack conv on
    the calibration batch: ``E[conv_f32(h) - qconv(h)]`` over (B, L) with
    ``h`` the F32 trajectory's layer input (standard PTQ bias correction,
    Nagel et al. 2019). Adding the delta to the stored bias cancels the
    systematic (mean) component of the rounding error at zero runtime
    cost; the residual error is then zero-mean per channel. Walks
    StofNet.__call__ (models/stofnet.py:83-118) exactly like
    `_stack_input_absmax`."""
    p = variables["params"]
    h = jnp.transpose(calib_x, (0, 2, 1)).astype(jnp.float32)
    h = jax.nn.relu(_conv1d_same(h, *_kb(p, "conv1")))
    if semi_global_scale != 1:
        v = _conv1d_same(h, *_kb(p, "semi_global_block.contract_conv"))
        rows = v.shape[1] // semi_global_scale
        s = jnp.max(v[:, : rows * semi_global_scale].reshape(
            v.shape[0], rows, semi_global_scale, v.shape[2]), axis=2)
        s = jnp.where(s >= 0, s, 0.01 * s)
        s = _conv1d_same(s, *_kb(p, "semi_global_block.expand_conv"))
        s = jax.nn.leaky_relu(s, 0.01)
        s = jnp.repeat(s, semi_global_scale, axis=1)
        pad = max(0, h.shape[1] - s.shape[1])
        s = jnp.pad(s, ((0, 0), (pad // 2, pad // 2), (0, 0)))
        h = h + s

    deltas = {}
    residual_layers = set(range(3, num_blocks - 1, 2))
    res = h
    for i in range(2, num_blocks):
        y = _conv1d_same(h, *_kb(p, f"conv{i}"))
        if i in chosen:
            yq = _qconv(h, q["stack"][f"conv{i}"], impl)
            deltas[f"conv{i}"] = jnp.mean(y - yq, axis=(0, 1))
        if i == num_blocks - 1:  # conv{last-1} feeds the res1 skip-add only
            break
        if i in residual_layers:
            h = res + y
            res = h
        else:
            h = jax.nn.leaky_relu(y, 0.01)
    return deltas


def _norm_stack_layers(quant_stack, stack_layers, num_blocks):
    """The set of stack convs to run in int8: ``stack_layers`` (a tuple of
    layer indices in [2, num_blocks-1]) wins when given; else quant_stack
    toggles all-or-none. Returns a sorted tuple (hashable: jit-static)."""
    if stack_layers is not None:
        bad = [i for i in stack_layers if not 2 <= i <= num_blocks - 1]
        if bad:
            raise ValueError(f"stack_layers out of range [2, {num_blocks - 1}]"
                             f": {bad}")
        return tuple(sorted(set(int(i) for i in stack_layers)))
    return tuple(range(2, num_blocks)) if quant_stack else ()


def quantize_stofnet(variables: Any, calib_x: jnp.ndarray,
                     upsample_factor: int = 4, num_blocks: int = 13,
                     semi_global_scale: int = 80,
                     quant_stack: bool = False,
                     stack_layers: Optional[tuple] = None,
                     eq_alpha: Optional[float] = None,
                     bias_correct: bool = False) -> dict:
    """Build the int8 serving state from a trained parameter tree.

    ``calib_x`` is a representative (B, 1, L) batch; its calibration
    roles are the pre-pool tensor's per-channel requantization scale and
    (when ``eq_alpha`` is set) the stack equalization basis — activation
    input scales stay dynamic at runtime. Returns a pytree of arrays, so
    ``stofnet_apply_int8`` can take it as a jit argument.

    ``quant_stack=True`` / ``stack_layers=(i, ...)`` additionally build s8
    twins of all / the chosen k=7 stack convs — off by default so the
    serving pytree ships exactly one copy of each stack kernel.

    ``eq_alpha`` (0..1) applies SmoothQuant-style channel equalization to
    the quantized stack convs: per input channel c,
    ``s_c = amax_c^alpha / wmax_c^(1-alpha)`` with ``amax`` the calibrated
    activation absmax and ``wmax`` the kernel's per-Cin absmax; the conv
    computes exactly ``conv(h / s, w * s)``, shifting activation outlier
    range into the weights BEFORE each is rounded. alpha=1 is the
    documented-catastrophic full fold (module docstring); fractional alpha
    balances the two rounding errors.

    ``bias_correct=True`` adds each quantized stack conv's calibrated mean
    rounding error back into its bias (`_stack_bias_deltas`): zero runtime
    cost, cancels the systematic per-channel error component.
    """
    p = variables["params"]
    q: dict = {"f32": {}}
    for name in ["conv1", "conv_last"] + [f"conv{i}" for i in
                                          range(2, num_blocks)]:
        k, b = _kb(p, name)
        q["f32"][name] = {"kernel": k, "bias": b}

    if semi_global_scale != 1:
        k, b = _kb(p, "semi_global_block.expand_conv")
        q["f32"]["expand"] = {"kernel": k, "bias": b}
        k, b = _kb(p, "semi_global_block.contract_conv")
        wq, ws = quantize_weight(k)
        pre = _prepool_absmax(variables, calib_x)
        # all-zero (dead) channel guard, same convention as absmax_scale:
        # a zero pre-pool channel requantizes as a no-op instead of 0-div
        pre = jnp.where(pre > 0, pre, INT8_MAX)
        pre_scale = pre * PRE_SCALE_HEADROOM / INT8_MAX
        q["contract"] = {"wq": wq, "wscale": ws, "bias": b,
                         "pre_scale": pre_scale.astype(jnp.float32)}

    chosen = _norm_stack_layers(quant_stack, stack_layers, num_blocks)
    if chosen:
        amax = (_stack_input_absmax(variables, calib_x, num_blocks,
                                    semi_global_scale)
                if eq_alpha is not None else None)
        q["stack"] = {}
        for i in chosen:
            k, b = _kb(p, f"conv{i}")
            layer = {"bias": b}
            if eq_alpha is not None:
                a = jnp.maximum(amax[f"conv{i}"][0], 1e-12)  # (1, Cin)
                wmax = jnp.maximum(
                    jnp.max(jnp.abs(k), axis=(0, 2))[None, :], 1e-12)
                s = a ** eq_alpha / wmax ** (1.0 - eq_alpha)
                s = jnp.where((a > 1e-10) & (wmax > 1e-10), s, 1.0)
                layer["inv_eq"] = (1.0 / s)[None].astype(jnp.float32)
                k = k * s[0][None, :, None]
            wq, ws = quantize_weight(k)
            layer.update(wq=wq, wscale=ws)
            q["stack"][f"conv{i}"] = layer
        if bias_correct:
            deltas = _stack_bias_deltas(variables, calib_x, q, chosen,
                                        num_blocks, semi_global_scale)
            for i in chosen:
                lay = q["stack"][f"conv{i}"]
                lay["bias"] = lay["bias"] + deltas[f"conv{i}"]
    return q


def _dyn_quant(h: jnp.ndarray):
    """Dynamic PER-WAVEFORM symmetric s8 (scale (B, 1, 1) = row absmax/127):
    one per-row reduce + an elementwise pass, both fusable into the
    producing/consuming convs' epilogues. Per-row rather than per-tensor so
    each waveform's codes — and therefore its decode — are independent of
    whatever it is co-batched with (a quiet waveform next to a loud one
    must not collapse onto a few codes)."""
    hf = h.astype(jnp.float32)
    scale = absmax_scale(hf, axis=(1, 2))
    return quantize(hf, scale), scale


def _qconv(h: jnp.ndarray, layer: dict, impl: str) -> jnp.ndarray:
    """Dynamic-quantize the activation, run the s8 conv, dequantize: the
    input scale is a runtime (B, 1, 1) row scalar, the weight scale per
    output channel, so the epilogue is one fused multiply-add. When the
    layer carries an equalization vector (quantize_stofnet eq_alpha), the
    input is rescaled per channel before rounding — exact in real
    arithmetic because the stored kernel was pre-multiplied by the
    inverse."""
    hf = h.astype(jnp.float32)
    if "inv_eq" in layer:
        hf = hf * layer["inv_eq"]
    scale = absmax_scale(hf, axis=(1, 2))
    xq = quantize(hf, scale)
    acc = conv1d_same_int8(xq, layer["wq"], impl=impl)
    return (acc.astype(jnp.float32) * (scale * layer["wscale"])
            + layer["bias"])


@partial(jax.jit, static_argnames=_QCONFIG + ("dtype", "impl",
                                              "quant_stack", "stack_layers"))
def stofnet_apply_int8(
    q: dict,
    x: jnp.ndarray,
    upsample_factor: int = 4,
    num_blocks: int = 13,
    semi_global_scale: int = 80,
    dtype: Optional[Any] = jnp.bfloat16,
    impl: str = "conv",
    quant_stack: bool = False,
    stack_layers: Optional[tuple] = None,
) -> jnp.ndarray:
    """StofNet forward, (B, 1, L) -> (B, 1, L*r), int8 SGB contract conv.

    ``impl`` picks the s8 conv lowering (ops/int8.py): ``"conv"`` (one
    integer convolution) or ``"dots"`` (K shifted s8 matmuls).
    ``quant_stack=True`` / ``stack_layers=(i, ...)`` also runs all / the
    chosen of conv2..conv{num_blocks-1} in int8 (must match the set the
    pytree was built with) — experimental; see the module docstring for
    why it is off by default.
    """
    h = jnp.transpose(x, (0, 2, 1))
    if dtype is not None:
        h = h.astype(dtype)
    f32 = q["f32"]
    h = jax.nn.relu(_conv1d_same(h, f32["conv1"]["kernel"],
                                 f32["conv1"]["bias"], dtype))

    if semi_global_scale != 1:
        c = q["contract"]
        xq, s_in = _dyn_quant(h)
        acc = conv1d_same_int8(xq, c["wq"], impl=impl)
        # requantize the pre-pool tensor to s8 IN the conv epilogue: the
        # (B, L, feat) tensor hits HBM as s8 (half the bf16 bytes)
        m = s_in * c["wscale"] / c["pre_scale"]
        qpre = jnp.clip(jnp.round(acc.astype(jnp.float32) * m
                                  + c["bias"] / c["pre_scale"]),
                        -127, 127).astype(jnp.int8)
        rows = qpre.shape[1] // semi_global_scale
        qp = jnp.max(qpre[:, : rows * semi_global_scale].reshape(
            qpre.shape[0], rows, semi_global_scale, qpre.shape[2]), axis=2)
        pooled = qp.astype(jnp.float32) * c["pre_scale"]  # dequant the max
        pooled = jnp.where(pooled >= 0, pooled, 0.01 * pooled)  # leaky
        if dtype is not None:
            pooled = pooled.astype(dtype)
        s = _conv1d_same(pooled, f32["expand"]["kernel"],
                         f32["expand"]["bias"], dtype)
        s = jax.nn.leaky_relu(s, 0.01)
        s = jnp.repeat(s, semi_global_scale, axis=1)
        pad = max(0, h.shape[1] - s.shape[1])
        s = jnp.pad(s, ((0, 0), (pad // 2, pad // 2), (0, 0)))
        h = h + s

    chosen = _norm_stack_layers(quant_stack, stack_layers, num_blocks)

    def stack_conv(h, i):
        if i in chosen:
            y = _qconv(h, q["stack"][f"conv{i}"], impl)
        else:
            y = _conv1d_same(h, f32[f"conv{i}"]["kernel"],
                             f32[f"conv{i}"]["bias"], dtype)
        return y.astype(dtype) if dtype is not None else y

    residual_layers = set(range(3, num_blocks - 1, 2))
    res = res1 = h
    for i in range(2, num_blocks - 1):
        y = stack_conv(h, i)
        if i in residual_layers:
            h = res + y
            res = h
        else:
            h = jax.nn.leaky_relu(y, 0.01)

    h = res1 + stack_conv(h, num_blocks - 1)

    h = _conv1d_same(h, f32["conv_last"]["kernel"], f32["conv_last"]["bias"],
                     dtype)
    h = jnp.transpose(h, (0, 2, 1))
    return sample_shuffle(h, upsample_factor).astype(jnp.float32)
