"""Import reference PyTorch ``.pth`` state dicts into flax parameter trees.

The reference ships trained checkpoints (/root/reference/ckpts) that are the
only available ground-truth artifacts (datasets are absent from the
snapshot); loading them verbatim is how we prove numerical parity.

Key mapping is purely structural:
  - torch ``a.b.weight`` of a Conv1d (O, I, K) -> params[a][b]['kernel'] (K, I, O)
  - torch ``a.b.weight`` of a Linear (O, I)    -> params[a][b]['kernel'] (I, O)
  - ``.bias`` copies through
  - BatchNorm1d weight/bias -> scale/bias; running stats -> batch_stats tree

torch is only needed to unpickle the file; it is imported lazily so the TPU
runtime never depends on it.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth state dict into plain numpy arrays (host-side, torch-cpu)."""
    import torch  # lazy: only used for unpickling

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _assign(tree: Dict[str, Any], scope: Tuple[str, ...], leaf: str, value):
    node = tree
    for s in scope:
        node = node.setdefault(s, {})
    node[leaf] = value


def state_dict_to_params(
    sd: Dict[str, np.ndarray],
    batchnorm_modules: Tuple[str, ...] = (),
) -> Dict[str, Any]:
    """Convert a torch state dict into {'params': ..., 'batch_stats': ...}.

    Args:
        sd: torch name -> numpy array.
        batchnorm_modules: dotted module prefixes that are BatchNorm1d (their
            weight/bias map to scale/bias instead of a conv/linear kernel).
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def is_bn(mod: str) -> bool:
        return any(mod == b or mod.startswith(b + ".") for b in batchnorm_modules)

    for key, val in sd.items():
        *scope, leaf = key.split(".")
        mod = ".".join(scope)
        if leaf == "num_batches_tracked":
            continue
        if leaf in ("running_mean", "running_var"):
            name = "mean" if leaf == "running_mean" else "var"
            _assign(batch_stats, tuple(scope), name, val)
        elif is_bn(mod):
            name = "scale" if leaf == "weight" else "bias"
            _assign(params, tuple(scope), name, val)
        elif leaf == "weight":
            if val.ndim == 3:  # Conv1d (O, I, K) -> (K, I, O)
                _assign(params, tuple(scope), "kernel", np.transpose(val, (2, 1, 0)))
            elif val.ndim == 2:  # Linear (O, I) -> (I, O)
                _assign(params, tuple(scope), "kernel", np.transpose(val, (1, 0)))
            else:  # 1-D parameter tensors (e.g. SincConv low_hz_/band_hz_)
                _assign(params, tuple(scope), "kernel", val)
        else:
            _assign(params, tuple(scope), leaf, val)

    out: Dict[str, Any] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def _flatten(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def params_to_state_dict(
    variables: Dict[str, Any],
    batchnorm_modules: Tuple[str, ...] = (),
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`state_dict_to_params`: flax variables -> torch-name
    state dict (numpy values; torch layout for kernels).

    Completes the interop round trip so reference users can take weights
    trained here back into the torch pipeline (main.py:172-177 loads plain
    state dicts).
    """
    sd: Dict[str, np.ndarray] = {}

    def is_bn(scope: Tuple[str, ...]) -> bool:
        mod = ".".join(scope)
        return any(mod == b or mod.startswith(b + ".")
                   for b in batchnorm_modules)

    for (*scope, leaf), val in _flatten(variables.get("params", {})):
        scope = tuple(scope)
        val = np.asarray(val)
        mod = ".".join(scope)
        if is_bn(scope):
            name = "weight" if leaf == "scale" else "bias"
            sd[f"{mod}.{name}"] = val
        elif leaf == "kernel":
            if val.ndim == 3:  # (K, I, O) -> Conv1d (O, I, K)
                sd[f"{mod}.weight"] = np.transpose(val, (2, 1, 0))
            elif val.ndim == 2:  # (I, O) -> Linear (O, I)
                sd[f"{mod}.weight"] = np.transpose(val, (1, 0))
            else:
                sd[f"{mod}.weight"] = val
        else:  # raw named parameters (SincConv low_hz_/band_hz_, LN gamma)
            sd[f"{mod}.{leaf}"] = val
    for (*scope, leaf), val in _flatten(variables.get("batch_stats", {})):
        mod = ".".join(scope)
        name = "running_mean" if leaf == "mean" else "running_var"
        sd[f"{mod}.{name}"] = np.asarray(val)
        sd.setdefault(f"{mod}.num_batches_tracked", np.asarray(0))
    return sd


def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write a numpy state dict as a torch-loadable .pth."""
    import torch  # lazy

    torch.save({k: torch.from_numpy(np.array(v, np.float32, copy=True))
                if np.asarray(v).ndim else torch.tensor(int(v))
                for k, v in sd.items()}, path)


def import_stofnet(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a StofNet .pth; returns (variables, config_overrides).

    The FULL architecture is inferred from tensor shapes (torch Conv1d
    weight layout (O, I, K)), so arbitrary-config checkpoints — e.g. ones
    exported from this framework's own option space — round-trip without
    sidecar metadata: ``upsample_factor`` (conv_last out-channels),
    ``num_features`` (conv1 out-channels), ``num_blocks`` (highest conv{i}
    index + 1), ``kernel_sizes`` (conv1/conv2/conv_last K dims), and
    ``semi_global_scale`` (contract-conv width / num_features * 10 — the
    reference's feat_scale = max(1, scale // 10), models/stofnet.py:85;
    exact for the decade scales everyone uses, while scales 11-19 are
    shape-ambiguous and infer as 10: pass semi_global_scale explicitly for
    those). The no-SGB ablation (26-tensor checkpoints such as
    clean-serenity / breezy-violet) reports ``semi_global_scale=1``.

    Only non-default values are emitted (plus ``upsample_factor``, always),
    so default-architecture checkpoints keep the historical
    ``{"upsample_factor": N}`` shape that downstream consumers
    (models/fused.py, models/int8.py pipelines) accept as kwargs.
    """
    sd = load_torch_state_dict(path)
    has_sgb = any(k.startswith("semi_global_block.") for k in sd)
    variables = state_dict_to_params(sd)

    o_last, _, k_last = sd["conv_last.weight"].shape
    o1, _, k1 = sd["conv1.weight"].shape
    conv_ids = [int(k[4:].split(".")[0]) for k in sd
                if k.startswith("conv") and k.endswith(".weight")
                and k[4:].split(".")[0].isdigit()]
    num_blocks = max(conv_ids) + 1
    k_mid = int(sd["conv2.weight"].shape[-1]) if "conv2.weight" in sd else 7

    overrides: Dict[str, Any] = {"upsample_factor": int(o_last)}
    if int(o1) != 64:
        overrides["num_features"] = int(o1)
    if num_blocks != 13:
        overrides["num_blocks"] = int(num_blocks)
    if [int(k1), k_mid, int(k_last)] != [9, 7, 3]:
        overrides["kernel_sizes"] = [int(k1), k_mid, int(k_last)]
    if not has_sgb:
        overrides["semi_global_scale"] = 1
    else:
        feat_scale = (sd["semi_global_block.contract_conv.weight"].shape[0]
                      // int(o1))
        scale = max(feat_scale, 1) * 10
        if scale != 80:
            overrides["semi_global_scale"] = int(scale)
    return variables, overrides
