"""SincNet — the COMPLETE reference configuration space.

Parity target: /root/reference/models/sincnet.py:256-497. The driver only
instantiates one configuration (main.py:145-157, covered by
``models/sincnet.py``); this module reproduces the rest of the file's
option space so a reference user loses nothing by switching:

  - ``act_fun`` zoo (:256-276): relu / tanh / sigmoid / leaky_relu(0.2) /
    elu / softmax (= LogSoftmax over dim 1) / linear (= LeakyReLU(1),
    i.e. identity).
  - custom ``LayerNorm`` (:279-291): gamma*(x-mean)/(std+eps)+beta over the
    LAST axis, with torch's unbiased std.
  - ``MLP`` head (:294-387): per-layer dropout, act zoo, optional
    layer/batch norm (input and per layer), bias disabled under any norm,
    U(±sqrt(0.01/(fan_in+fan_out))) weight init, and the reference's exact
    sequential-if control flow (both-norms-true applies ``wx`` twice).
  - ``SincNet`` CNN (:390-497) full options: ``cnn_max_pool_len`` strides,
    per-layer dropout, act zoo, input layer/batch norm, ``use_sinc`` toggle,
    ``get_pad`` same-padding semantics (:35-55, left = pad//2) before a
    VALID conv, and final ``view(B, 1, -1)`` flatten.

Known-broken upstream (reproduced as a WORKING equivalent, golden test
impossible because the reference crashes): the CNN's per-layer
``cnn_use_laynorm`` path indexes ``self.ln[i]`` but the append that would
populate it is commented out (:440), so any ``cnn_use_laynorm[i]=True``
raises IndexError in the reference. We implement the commented-out intent —
``LayerNorm([N_filt, L_pooled])`` (per-element affine, last-axis
normalization) plus the layer-0 ``abs()`` — and document it here, like the
reference's dead AttentionBlock (utils/attention_block.py).

TPU notes: every option lowers to fused XLA elementwise/reduce ops around
the MXU convs; LogSoftmax/LayerNorm are single-pass fusions. Channel-first
(B, C, L) layout is kept so torch checkpoints import structurally.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from stofnet_tpu.models.init import torch_bias_init, torch_kernel_init
from stofnet_tpu.models.sincnet import SincConv


def act_fun(act_type: str):
    """Reference act_fun zoo (sincnet.py:256-276), as jnp functions.

    'softmax' is torch nn.LogSoftmax(dim=1); 'linear' is LeakyReLU(1) which
    is the identity.
    """
    table = {
        "relu": jax.nn.relu,
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        "leaky_relu": lambda x: nn.leaky_relu(x, 0.2),
        "elu": jax.nn.elu,
        "softmax": lambda x: jax.nn.log_softmax(x, axis=1),
        "linear": lambda x: x,
    }
    return table[act_type]


class RefLayerNorm(nn.Module):
    """The reference's custom LayerNorm (sincnet.py:279-291).

    Normalizes over the LAST axis using torch's unbiased std (ddof=1) and
    adds eps to the std (not the variance). ``features`` may be an int or a
    shape tuple (the affine params broadcast over the trailing axes).
    """

    features: Any
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        shape = ((self.features,) if isinstance(self.features, int)
                 else tuple(self.features))
        gamma = self.param("gamma", lambda rng: jnp.ones(shape, jnp.float32))
        beta = self.param("beta", lambda rng: jnp.zeros(shape, jnp.float32))
        mean = x.mean(-1, keepdims=True)
        std = x.std(-1, keepdims=True, ddof=1)
        return gamma * (x - mean) / (std + self.eps) + beta


class _Linear(nn.Module):
    """Linear with the MLP's uniform init (sincnet.py:345-348); kernel is
    stored (in, out) so the structural .pth importer round-trips.

    Note the reference sets ``add_bias=False`` under a norm but then
    UNCONDITIONALLY re-assigns ``wx[i].bias = Parameter(zeros)`` (:349),
    so a trainable zero-init bias always exists — reproduced here.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = float(np.sqrt(0.01 / (fan_in + self.features)))

        def kernel_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", kernel_init, (fan_in, self.features))
        bias = self.param("bias",
                          lambda rng: jnp.zeros((self.features,),
                                                jnp.float32))
        return x @ kernel + bias


class _Conv1dValid(nn.Module):
    """VALID Conv1d on (B, C, L), torch default init; kernel stored (K,I,O)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[1]
        kernel = self.param("kernel", torch_kernel_init,
                            (self.kernel_size, in_ch, self.features))
        bias = self.param("bias", torch_bias_init(self.kernel_size * in_ch),
                          (self.features,))
        y = lax.conv_general_dilated(
            x, jnp.transpose(kernel, (2, 1, 0)), window_strides=(1,),
            padding=[(0, 0)], dimension_numbers=("NCH", "OIH", "NCH"))
        return y + bias[None, :, None]


def _get_pad(size: int, kernel_size: int, stride: int = 1,
             dilation: int = 1) -> Tuple[int, int]:
    """Reference get_pad (sincnet.py:35-55): (left, right), left = pad//2."""
    pad = (((size + stride - 1) // stride - 1) * stride
           + kernel_size - size) * dilation
    return pad // 2, pad - pad // 2


def _max_pool1d(x, pool: int):
    """torch F.max_pool1d: kernel = stride = pool, floor (drop remainder)."""
    if pool == 1:
        return x
    usable = (x.shape[-1] // pool) * pool
    return lax.reduce_window(
        x[..., :usable], -jnp.inf, lax.max,
        window_dimensions=(1, 1, pool), window_strides=(1, 1, pool),
        padding="VALID")


def _batchnorm(name: str, features_axis: int, train: bool):
    # torch BatchNorm1d(momentum=0.05) -> flax momentum 0.95; eps matches.
    return nn.BatchNorm(use_running_average=not train, momentum=0.95,
                        epsilon=1e-5, axis=features_axis, name=name)


class MLP(nn.Module):
    """Reference MLP head (sincnet.py:294-387) on (B, input_dim) features."""

    options: Dict[str, Any]

    @nn.compact
    def __call__(self, x, train: bool = False):
        o = self.options
        fc_lay: Sequence[int] = o["fc_lay"]

        if o.get("fc_use_laynorm_inp"):
            x = RefLayerNorm(int(o["input_dim"]), name="ln_inp")(x)
        if o.get("fc_use_batchnorm_inp"):
            x = _batchnorm("bn_inp", -1, train)(x)

        for i in range(len(fc_lay)):
            use_ln = bool(o["fc_use_laynorm"][i])
            use_bn = bool(o["fc_use_batchnorm"][i])
            act = act_fun(o["fc_act"][i])
            drop = nn.Dropout(rate=float(o["fc_drop"][i]),
                              deterministic=not train)
            wx = _Linear(fc_lay[i], name=f"wx{i}")
            linear = o["fc_act"][i] == "linear"

            # Exact reference control flow (:360-386): sequential ifs; when
            # both norms are requested the second branch re-applies wx to
            # the first branch's output (only shape-valid for equal widths).
            if not linear:
                if use_ln:
                    x = drop(act(RefLayerNorm(fc_lay[i], name=f"ln{i}")(
                        wx(x))))
                if use_bn:
                    x = drop(act(_batchnorm(f"bn{i}", -1, train)(wx(x))))
                if not use_ln and not use_bn:
                    x = drop(act(wx(x)))
            else:
                if use_ln:
                    x = drop(RefLayerNorm(fc_lay[i], name=f"ln{i}")(wx(x)))
                if use_bn:
                    x = drop(_batchnorm(f"bn{i}", -1, train)(wx(x)))
                if not use_ln and not use_bn:
                    x = drop(wx(x))
        return x


class SincNetFull(nn.Module):
    """Reference SincNet CNN (sincnet.py:390-497), full option dict.

    Input: (B, input_dim) or (B, 1, L); output (B, 1, C_last * L_last)
    exactly like the reference's final ``view(batch, 1, -1)``.
    """

    options: Dict[str, Any]

    @nn.compact
    def __call__(self, x, train: bool = False):
        o = self.options
        n_filt: Sequence[int] = o["cnn_N_filt"]
        len_filt: Sequence[int] = o["cnn_len_filt"]
        pool_len: Sequence[int] = o["cnn_max_pool_len"]

        if o.get("cnn_use_laynorm_inp"):
            x = RefLayerNorm(int(o["input_dim"]), name="ln_inp")(x)
        if o.get("cnn_use_batchnorm_inp"):
            # torch BatchNorm1d on 2-D (B, D): per-feature stats.
            x = _batchnorm("bn_inp", -1, train)(x)

        batch = x.shape[0]
        x = x.reshape(batch, 1, -1)

        for i in range(len(n_filt)):
            use_ln = bool(o["cnn_use_laynorm"][i])
            use_bn = bool(o["cnn_use_batchnorm"][i])
            act = act_fun(o["cnn_act"][i])
            drop = nn.Dropout(rate=float(o["cnn_drop"][i]),
                              deterministic=not train)

            left, right = _get_pad(x.shape[-1], int(len_filt[i]))
            xp = jnp.pad(x, ((0, 0), (0, 0), (left, right)))

            if i == 0 and o.get("use_sinc", True):
                h = SincConv(int(n_filt[0]), int(len_filt[0]),
                             float(o["fs"]), pad=False, name="conv0")(xp)
            else:
                h = _Conv1dValid(int(n_filt[i]), int(len_filt[i]),
                                 name=f"conv{i}")(xp)

            if use_ln:
                # Upstream this path crashes (ln list never populated,
                # :440 commented out); working equivalent of the intent.
                if i == 0:
                    h = jnp.abs(h)
                h = _max_pool1d(h, int(pool_len[i]))
                h = RefLayerNorm((h.shape[1], h.shape[2]), name=f"ln{i}")(h)
                x = drop(act(h))
            elif use_bn:
                h = _max_pool1d(h, int(pool_len[i]))
                h = _batchnorm(f"bn{i}", 1, train)(h)
                x = drop(act(h))
            else:
                x = drop(act(_max_pool1d(h, int(pool_len[i]))))

        return x.reshape(batch, 1, -1)


def rewrite_torch_key(key: str) -> str:
    """torch state-dict names -> our flax scopes.

    'conv.0.low_hz_' -> 'conv0.low_hz_'; 'conv.{i}.*' -> 'conv{i}.*';
    'bn.{i}.*' -> 'bn{i}.*'; 'wx.{i}.*' -> 'wx{i}.*'; 'ln.{i}.*' -> 'ln{i}.*';
    input norms 'bn0.*' / 'ln0.*' -> 'bn_inp.*' / 'ln_inp.*'.
    """
    parts = key.split(".")
    if parts[0] in ("conv", "bn", "wx", "ln") and len(parts) > 2 and \
            parts[1].isdigit():
        return f"{parts[0]}{parts[1]}." + ".".join(parts[2:])
    if parts[0] == "bn0":
        return "bn_inp." + ".".join(parts[1:])
    if parts[0] == "ln0":
        return "ln_inp." + ".".join(parts[1:])
    return key


def rewrite_flax_key(key: str) -> str:
    """Inverse of :func:`rewrite_torch_key` (for .pth export)."""
    head, rest = key.split(".", 1)
    if head == "bn_inp":
        return "bn0." + rest
    if head == "ln_inp":
        return "ln0." + rest
    for prefix in ("conv", "bn", "wx", "ln"):
        if head.startswith(prefix) and head[len(prefix):].isdigit():
            return f"{prefix}.{head[len(prefix):]}." + rest
    return key


def export_torch_state(variables: Dict[str, Any], options: Dict[str, Any],
                       mlp: bool = False) -> Dict[str, np.ndarray]:
    """flax variables -> reference-named torch state dict (numpy values)."""
    from stofnet_tpu.models.torch_import import params_to_state_dict

    sd = params_to_state_dict(variables, batchnorm_modules(options, mlp=mlp))
    return {rewrite_flax_key(k): v for k, v in sd.items()}


def batchnorm_modules(options: Dict[str, Any], mlp: bool = False):
    """BatchNorm scope names for the structural importer."""
    mods = []
    if options.get("fc_use_batchnorm_inp" if mlp else "cnn_use_batchnorm_inp"):
        mods.append("bn_inp")
    flags = options["fc_use_batchnorm"] if mlp else options["cnn_use_batchnorm"]
    mods.extend(f"bn{i}" for i, on in enumerate(flags) if on)
    return tuple(mods)


def import_torch_state(sd: Dict[str, np.ndarray], options: Dict[str, Any],
                       mlp: bool = False) -> Dict[str, Any]:
    """Convert a reference SincNet/MLP state dict to flax variables."""
    from stofnet_tpu.models.torch_import import state_dict_to_params

    renamed = {rewrite_torch_key(k): v for k, v in sd.items()}
    return state_dict_to_params(renamed, batchnorm_modules(options, mlp=mlp))
