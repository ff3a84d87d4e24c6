"""Config system: YAML defaults + ``key=value`` CLI override merge.

Mirrors the reference's OmegaConf usage (main.py:30-34): a YAML file defines
defaults, CLI dot-list args override them (values parsed as YAML, so
``th=Null`` -> None, ``th=0.5`` -> float, ``sequences=[1,2]`` -> list), and
``${var}`` strings interpolate other top-level keys.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Iterable, Optional

import yaml

_INTERP = re.compile(r"\$\{([^}]+)\}")


class Config(dict):
    """dict with attribute access (cfg.model == cfg['model'])."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def copy(self) -> "Config":
        return Config(dict.copy(self))


def _interpolate(value: Any, root: Dict[str, Any]) -> Any:
    if isinstance(value, str):
        def sub(m: re.Match) -> str:
            key = m.group(1)
            return str(root.get(key, m.group(0)))

        out = _INTERP.sub(sub, value)
        return out
    return value


def convert_to_dot_notation(d: Dict[str, Any]) -> Config:
    """Attribute-style access over a plain dict (the reference's
    utils/dict_dot.py helper)."""
    return Config(d)


def load_config(path: str | Path) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config(raw)
    for k, v in list(cfg.items()):
        cfg[k] = _interpolate(v, cfg)
    return cfg


def merge_cli(cfg: Config, argv: Optional[Iterable[str]] = None) -> Config:
    """Apply ``key=value`` overrides; values parse as YAML scalars."""
    import sys

    args = list(argv) if argv is not None else sys.argv[1:]
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"expected key=value, got {arg!r}")
        key, _, val = arg.partition("=")
        cfg[key.strip()] = yaml.safe_load(val) if val != "" else None
    for k, v in list(cfg.items()):
        cfg[k] = _interpolate(v, cfg)
    return cfg
