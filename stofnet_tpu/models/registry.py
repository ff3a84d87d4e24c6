"""Model registry: config-name dispatch + checkpoint import.

Replaces the reference driver's if/elif chain (main.py:133-167) and its
in-flight config mutations with one table. ``build_model`` returns
(model, config_updates) where config_updates mirrors the reference's
driver-side overrides (e.g. sincnet forces upsample_factor=1, unet folds the
upsample factor into rf_scale, gradpeak forces evaluate=True).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from stofnet_tpu.models.stofnet import StofNet
from stofnet_tpu.models.edsr1d import EDSR1D
from stofnet_tpu.models.espcn1d import ESPCN1D
from stofnet_tpu.models.zonzini import ZonziniNetSmall, ZonziniNetLarge
from stofnet_tpu.models.sincnet import SincNet
from stofnet_tpu.models.wave_unet import WaveUnet
from stofnet_tpu.models.kuleshov import Kuleshov
from stofnet_tpu.models.gradpeak import GradPeak
from stofnet_tpu.models import (
    edsr1d as _edsr, zonzini as _zonzini, sincnet as _sincnet,
    wave_unet as _waveunet, kuleshov as _kuleshov,
)
from stofnet_tpu.models.torch_import import (
    load_torch_state_dict, params_to_state_dict, save_torch_state_dict,
    state_dict_to_params,
)

MODEL_NAMES = ("stofnet", "zonzini", "kuleshov", "edsr", "espcn", "sincnet",
               "unet", "gradpeak")


def build_model(
    name: str,
    dataset_kind: str = "chirp",  # "chirp" | "pala" | "rat"
    upsample_factor: int = 4,
    sample_num: Optional[int] = None,
    rf_scale_factor: int = 10,
    fs: Optional[float] = None,
    th: Optional[float] = None,
    dtype: Any = None,
    semi_global_scale: int = 80,
    n_layers: Optional[int] = None,  # unet depth; None = 2 if chirp else 10
) -> Tuple[Any, Dict[str, Any]]:
    name = name.lower()
    chirp = dataset_kind == "chirp"
    updates: Dict[str, Any] = {}

    if name == "stofnet":
        return StofNet(upsample_factor=upsample_factor,
                       semi_global_scale=semi_global_scale,
                       dtype=dtype), updates
    if name == "zonzini":
        cls = ZonziniNetSmall if chirp else ZonziniNetLarge
        return cls(dtype=dtype), updates
    if name == "kuleshov":
        n = sample_num * rf_scale_factor
        return Kuleshov(input_length=n, output_length=n * upsample_factor,
                        dtype=dtype), updates
    if name == "edsr":
        return EDSR1D(upscale_factor=upsample_factor, dtype=dtype), updates
    if name == "espcn":
        return ESPCN1D(upscale_factor=upsample_factor, dtype=dtype), updates
    if name == "sincnet":
        updates["upsample_factor"] = 1  # main.py:144
        return SincNet(sample_rate=float(fs) * rf_scale_factor,
                       dtype=dtype), updates
    if name == "unet":
        # driver folds upsampling into input interpolation (main.py:44-46)
        updates["rf_scale_factor"] = rf_scale_factor * upsample_factor
        updates["upsample_factor"] = 1
        if n_layers is None:
            n_layers = 2 if chirp else 10  # main.py:160
        return WaveUnet(n_layers=int(n_layers), channels_interval=16,
                        dtype=dtype), updates
    if name == "gradpeak":
        updates["evaluate"] = True  # main.py:165
        echo_max = 1 if chirp else None
        return GradPeak(threshold=th, rescale_factor=rf_scale_factor,
                        echo_max=echo_max, onset_opt=chirp), updates
    raise ValueError(f"unknown model '{name}' (known: {MODEL_NAMES})")


def _interop_spec(name: str, n_layers: int = 2):
    """(torch->flax rewrite, flax->torch rewrite, bn modules) per model."""
    if name == "edsr":
        return _edsr.rewrite_torch_key, _edsr.rewrite_flax_key, ()
    if name == "zonzini":
        return _zonzini.rewrite_torch_key, _zonzini.rewrite_flax_key, ()
    if name == "sincnet":
        return (_sincnet.rewrite_torch_key, _sincnet.rewrite_flax_key,
                _sincnet.BATCHNORM_MODULES)
    if name == "unet":
        return (_waveunet.rewrite_torch_key, _waveunet.rewrite_flax_key,
                _waveunet.batchnorm_modules(n_layers))
    if name == "kuleshov":
        return None, None, _kuleshov.BATCHNORM_MODULES
    return None, None, ()


def import_checkpoint(name: str, path: str, n_layers: int = 2):
    """Load a reference .pth into the flax variables tree for model ``name``."""
    name = name.lower()
    sd = load_torch_state_dict(path)
    rewrite, _, bn = _interop_spec(name, n_layers)
    if rewrite is not None:
        sd = {rewrite(k): v for k, v in sd.items()}
    return state_dict_to_params(sd, batchnorm_modules=bn)


def export_checkpoint(name: str, variables, path: str,
                      n_layers: int = 2) -> str:
    """Write flax variables as a reference-compatible torch .pth state dict
    (the reverse interop: weights trained here load into the reference's
    main.py:172-177 checkpoint lookup)."""
    name = name.lower()
    _, unrewrite, bn = _interop_spec(name, n_layers)
    sd = params_to_state_dict(variables, batchnorm_modules=bn)
    if unrewrite is not None:
        sd = {unrewrite(k): v for k, v in sd.items()}
    save_torch_state_dict(sd, path)
    return path
