"""HBM-optimal StofNet inference path with Pallas-fused hot blocks.

Parity target: /root/reference/models/stofnet.py:42-67 (the StofNet
forward: conv1 -> SemiGlobalBlock :80-117 -> conv2..12 residual stack ->
conv_last -> SampleShuffle1D), reproduced functionally over the imported
parameter tree.

``stofnet_apply_fused(variables, x, ...)`` reproduces
``StofNet(...).apply(variables, x)`` exactly, but routes the
SemiGlobalBlock's contract conv + 80x max-pool through the Pallas kernel
(ops/pallas/sgb_kernel.py), which keeps the (B, L, 512) pre-pool tensor in
VMEM tiles instead of HBM. That tensor is the model's dominant memory
traffic (16 MB/waveform round trip) and its OOM cliff (B>=2048 at L=8k).

This path is inference-oriented; training normally uses the flax module.
For training at batches where XLA's forward OOMs (B>=2048, L=8k), the SGB
op has a differentiable fused variant with a custom VJP —
ops/pallas/sgb_kernel.py:sgb_contract_pool_trainable.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

from stofnet_tpu.ops.shuffle import sample_shuffle
from stofnet_tpu.ops.packed_conv import (
    conv1d_blocked, conv1d_same as _conv1d_same, conv1d_same_packed,
)
from stofnet_tpu.ops.pallas.sgb_kernel import (
    sgb_contract_pool,
    sgb_contract_pool_trainable,
)
from stofnet_tpu.ops.pallas.sgb_dma_kernel import (
    dma_supported,
    sgb_contract_pool_dma,
)


@partial(jax.jit, static_argnames=("upsample_factor", "num_blocks",
                                   "semi_global_scale", "dtype",
                                   "interpret", "fused_stack", "trainable",
                                   "sgb_impl"))
def stofnet_apply_fused(
    variables: Any,
    x: jnp.ndarray,
    upsample_factor: int = 4,
    num_blocks: int = 13,
    semi_global_scale: int = 80,
    dtype: Optional[Any] = jnp.bfloat16,
    interpret: bool = False,
    fused_stack: bool = True,
    trainable: bool = False,
    sgb_impl: str = "tile",
) -> jnp.ndarray:
    """StofNet forward, (B, 1, L) -> (B, 1, L*r), with fused SGB contract.

    ``sgb_impl`` selects the fused SGB kernel: ``"tile"`` is the
    auto-pipelined BlockSpec kernel (sgb_kernel.py, the memory-cliff /
    trainable path), ``"dma"`` the manual-DMA packed-pair kernel
    (sgb_dma_kernel.py, the fast inference path — r3 measurements in its
    docstring; falls back to tile when the shape is unsupported).

    ``trainable=True`` routes the SGB through the custom-VJP variant
    (``sgb_contract_pool_trainable``) and forces the differentiable XLA
    conv stack, so ``jax.grad`` works end-to-end while the (B, L, 512)
    pre-pool tensor still never materializes in either pass — the
    large-batch training path (bench.py --oom-demo train keys).
    """
    p = variables["params"]
    h = jnp.transpose(x, (0, 2, 1))
    if dtype is not None:
        h = h.astype(dtype)

    h = jax.nn.relu(_conv1d_same(h, jnp.asarray(p["conv1"]["kernel"]),
                                 jnp.asarray(p["conv1"]["bias"]), dtype))

    if trainable:
        fused_stack = False  # conv_stack_fused carries no VJP

    if semi_global_scale != 1:
        sgb = p["semi_global_block"]
        ck = jnp.asarray(sgb["contract_conv"]["kernel"])
        cb = jnp.asarray(sgb["contract_conv"]["bias"])
        if trainable:  # custom_vjp: nondiff args must be positional
            pooled = sgb_contract_pool_trainable(h, ck, cb, 0.01, interpret)
        elif sgb_impl == "dma" and dma_supported(h.shape[1], h.shape[2]):
            pooled = sgb_contract_pool_dma(h, ck, cb, interpret=interpret)
        else:
            pooled = sgb_contract_pool(h, ck, cb, interpret=interpret)
        s = _conv1d_same(pooled, jnp.asarray(sgb["expand_conv"]["kernel"]),
                         jnp.asarray(sgb["expand_conv"]["bias"]), dtype)
        s = jax.nn.leaky_relu(s, 0.01)
        s = jnp.repeat(s, semi_global_scale, axis=1)
        pad = max(0, h.shape[1] - s.shape[1])
        s = jnp.pad(s, ((0, 0), (pad // 2, pad // 2), (0, 0)))
        h = h + s

    if fused_stack and num_blocks == 13:
        from stofnet_tpu.ops.pallas.conv_stack_kernel import conv_stack_fused

        h = conv_stack_fused(h, p, interpret=interpret)  # (B, L, r) f32
    else:
        residual_layers = set(range(3, num_blocks - 1, 2))
        res = res1 = h
        for i in range(2, num_blocks - 1):
            y = _conv1d_same(h, jnp.asarray(p[f"conv{i}"]["kernel"]),
                             jnp.asarray(p[f"conv{i}"]["bias"]), dtype)
            if i in residual_layers:
                h = res + y
                res = h
            else:
                h = jax.nn.leaky_relu(y, 0.01)

        y = _conv1d_same(h, jnp.asarray(p[f"conv{num_blocks - 1}"]["kernel"]),
                         jnp.asarray(p[f"conv{num_blocks - 1}"]["bias"]), dtype)
        h = res1 + y

        h = _conv1d_same(h, jnp.asarray(p["conv_last"]["kernel"]),
                         jnp.asarray(p["conv_last"]["bias"]), dtype)
    h = jnp.transpose(h, (0, 2, 1))
    return sample_shuffle(h, upsample_factor).astype(jnp.float32)


@partial(jax.jit, static_argnames=("upsample_factor", "num_blocks",
                                   "semi_global_scale", "dtype", "pack"))
def stofnet_apply_packed(
    variables: Any,
    x: jnp.ndarray,
    upsample_factor: int = 4,
    num_blocks: int = 13,
    semi_global_scale: int = 80,
    dtype: Optional[Any] = jnp.bfloat16,
    pack: int = 2,
) -> jnp.ndarray:
    """StofNet forward with position-packed convs (ops/packed_conv.py).

    Pure-XLA MXU-utilization rewrite: the ten k=7 Cout=64 convs (and conv1 /
    conv_last) fill all 128 output lanes by computing ``pack`` consecutive
    positions per matmul row. Math identical to ``StofNet.apply`` up to
    accumulation order; callers parity-gate decoded coords (bench.py).
    The SGB contract conv (Cout=512) already saturates the MXU and stays
    plain.
    """
    p = variables["params"]

    def conv(h, name, pk):
        node = p
        for part in name.split("."):
            node = node[part]
        kernel = jnp.asarray(node["kernel"])
        bias = jnp.asarray(node["bias"])
        if dtype is not None:
            h, kernel, bias = (h.astype(dtype), kernel.astype(dtype),
                               bias.astype(dtype))
        return conv1d_same_packed(h, kernel, bias, pack=pk)

    h = jnp.transpose(x, (0, 2, 1))
    if dtype is not None:
        h = h.astype(dtype)
    L = h.shape[1]

    h = jax.nn.relu(conv(h, "conv1", pack))

    if semi_global_scale != 1:
        s = conv(h, "semi_global_block.contract_conv", 1)
        s = jax.nn.leaky_relu(s, 0.01)
        s = lax.reduce_window(s, -jnp.inf, lax.max,
                              (1, semi_global_scale, 1),
                              (1, semi_global_scale, 1), "VALID")
        s = conv(s, "semi_global_block.expand_conv", 1)
        s = jax.nn.leaky_relu(s, 0.01)
        s = jnp.repeat(s, semi_global_scale, axis=1)
        pad = max(0, L - s.shape[1])
        s = jnp.pad(s, ((0, 0), (pad // 2, pad // 2), (0, 0)))
        h = h + s

    # enter the blocked domain ONCE: convs 2..12 chain without repacking
    # (elementwise leaky-ReLU / residual adds are layout-agnostic)
    pk = pack if pack > 1 and L % pack == 0 else 1
    nf = h.shape[-1]
    if pk > 1:
        h = h.reshape(h.shape[0], L // pk, pk * nf)

    def conv_blocked(hb, name):
        node = p
        for part in name.split("."):
            node = node[part]
        kernel = jnp.asarray(node["kernel"])
        bias = jnp.asarray(node["bias"])
        if dtype is not None:
            hb, kernel, bias = (hb.astype(dtype), kernel.astype(dtype),
                                bias.astype(dtype))
        if pk == 1:
            return conv1d_same_packed(hb, kernel, bias, pack=1)
        return conv1d_blocked(hb, kernel, bias, pk)

    residual_layers = set(range(3, num_blocks - 1, 2))
    res = res1 = h
    for i in range(2, num_blocks - 1):
        y = conv_blocked(h, f"conv{i}")
        if i in residual_layers:
            h = res + y
            res = h
        else:
            h = jax.nn.leaky_relu(y, 0.01)
    h = res1 + conv_blocked(h, f"conv{num_blocks - 1}")
    if pk > 1:
        h = h.reshape(h.shape[0], L, nf)

    # conv_last has Cout = upsample_factor (4): pack as many positions as
    # fill the lanes and divide L
    pk_last = 1
    for cand in (32, 16, 8, 4, 2):
        if L % cand == 0:
            pk_last = cand
            break
    h = conv(h, "conv_last", pk_last)

    h = jnp.transpose(h, (0, 2, 1))
    return sample_shuffle(h, upsample_factor).astype(jnp.float32)
