"""Model zoo + registry.

Replaces the reference driver's if/elif dispatch (main.py:133-167) with a
registry keyed by the same config names, so ``model=stofnet`` etc. resolve
identically.
"""

from stofnet_tpu.models.stofnet import StofNet, SemiGlobalBlock
from stofnet_tpu.models.edsr1d import EDSR1D
from stofnet_tpu.models.espcn1d import ESPCN1D
from stofnet_tpu.models.zonzini import ZonziniNetSmall, ZonziniNetLarge
from stofnet_tpu.models.sincnet import SincNet, SincConv
from stofnet_tpu.models.sincnet_full import MLP as SincMLP, SincNetFull
from stofnet_tpu.models.wave_unet import WaveUnet
from stofnet_tpu.models.kuleshov import Kuleshov
from stofnet_tpu.models.gradpeak import GradPeak
from stofnet_tpu.models.int8 import quantize_stofnet, stofnet_apply_int8
from stofnet_tpu.models.registry import (
    MODEL_NAMES,
    build_model,
    export_checkpoint,
    import_checkpoint,
)

__all__ = [
    "StofNet",
    "SemiGlobalBlock",
    "EDSR1D",
    "ESPCN1D",
    "ZonziniNetSmall",
    "ZonziniNetLarge",
    "SincNet",
    "SincConv",
    "SincNetFull",
    "SincMLP",
    "WaveUnet",
    "Kuleshov",
    "GradPeak",
    "quantize_stofnet",
    "stofnet_apply_int8",
    "MODEL_NAMES",
    "build_model",
    "export_checkpoint",
    "import_checkpoint",
]
