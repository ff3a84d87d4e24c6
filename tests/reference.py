"""Access to the read-only reference implementation for golden tests.

The reference (hahnec/stofnet, PyTorch) is mounted at /root/reference. Tests
import its modules to generate golden outputs and compare our JAX
implementations against them. Nothing from the reference is vendored into
this repo; it is only loaded at test time, and tests degrade to skips when
the reference tree is unavailable.
"""

import sys
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def available() -> bool:
    return REFERENCE_ROOT.is_dir()


def add_to_path():
    p = str(REFERENCE_ROOT)
    if p not in sys.path:
        sys.path.insert(0, p)


def ckpt_path(prefix: str):
    """Find a reference checkpoint by name prefix (main.py:174 semantics)."""
    ckpts = REFERENCE_ROOT / "ckpts"
    if not ckpts.is_dir():
        return None
    for fn in sorted(ckpts.iterdir()):
        if fn.name.startswith(prefix.split("_")[0]):
            return fn
    return None


def sample_stofnet_config(rng):
    """One random draw from the StofNet option space (models/stofnet.py:11).

    Shared by tests/test_model_stofnet.py::test_forward_parity_config_space
    and scripts/fuzz_parity.py's config-space family so the two campaigns'
    sampling rules cannot drift. Returns (cfg_kwargs, in_channels, length);
    lengths are multiples of semi_global_scale when the SGB is on (the
    reference crashes on odd residual padding otherwise — both frameworks
    reject those, pinned separately)."""
    cfg = dict(
        upsample_factor=int(rng.choice([1, 2, 4, 8])),
        num_features=int(rng.choice([8, 16, 32, 64])),
        num_blocks=int(rng.choice([4, 5, 6, 9, 13])),
        kernel_sizes=[int(rng.choice([5, 9, 11])),
                      int(rng.choice([3, 5, 7])),
                      int(rng.choice([1, 3, 5]))],
        semi_global_scale=int(rng.choice([1, 10, 20, 80])),
    )
    cin = int(rng.choice([1, 2]))
    sgs = cfg["semi_global_scale"]
    length = (sgs * int(rng.integers(4, 10)) if sgs > 1
              else int(rng.integers(50, 400)))
    return cfg, cin, length
