"""Checkpoint I/O: orbax for native checkpoints + reference .pth import.

Improves on the reference (main.py:172-177,423-430: state-dict only, written
once at end-of-run, no resume) with full training-state checkpoints
(params + optimizer state + step) that support mid-run resume, while
remaining able to load every shipped reference ``.pth`` via the importers.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional


def save_checkpoint(path: str | Path, state: Dict[str, Any]) -> Path:
    """Save a pytree-of-arrays checkpoint (orbax StandardCheckpointer)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def load_checkpoint(path: str | Path,
                    target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def find_checkpoint(ckpt_dir: str | Path, model_file: str) -> Optional[Path]:
    """Prefix-match ``model_file`` against ckpt_dir entries.

    Two passes: first the FULL ``model_file`` string (so array-member
    checkpoints sharing a run-name first token — ``{run}_seed3008`` vs
    ``{run}_seed3009`` — stay addressable), then the reference's
    first-token-before-``_`` prefix (main.py:174). The fallback keeps
    every lookup that works in the reference working here.
    """
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return None
    entries = sorted(ckpt_dir.iterdir())
    for prefix in (str(model_file), str(model_file).split("_")[0]):
        for fn in entries:
            if fn.name.startswith(prefix):
                return fn
    return None


def load_model_variables(model_name: str, path: str | Path,
                         n_layers: int = 2) -> Dict[str, Any]:
    """Load model variables from either a torch .pth or an orbax directory."""
    path = Path(path)
    if path.is_file() and path.suffix == ".pth":
        from stofnet_tpu.models.registry import import_checkpoint

        if model_name.lower() == "stofnet":
            from stofnet_tpu.models.torch_import import import_stofnet

            variables, _ = import_stofnet(str(path))
            return variables
        return import_checkpoint(model_name, str(path), n_layers=n_layers)
    restored = load_checkpoint(path)
    return restored["variables"] if "variables" in restored else restored
