"""Model zoo + registry.

Replaces the reference driver's if/elif dispatch (main.py:133-167) with a
registry keyed by the same config names, so ``model=stofnet`` etc. resolve
identically.
"""

from stofnet_tpu.models.stofnet import StofNet, SemiGlobalBlock

__all__ = ["StofNet", "SemiGlobalBlock"]
