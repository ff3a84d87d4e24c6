"""Config system: YAML defaults + ``key=value`` CLI override merge.

Mirrors the reference's OmegaConf usage (main.py:30-34): a YAML file defines
defaults, CLI dot-list args override them (values parsed as YAML, so
``th=Null`` -> None, ``th=0.5`` -> float, ``sequences=[1,2]`` -> list), and
``${var}`` strings interpolate other top-level keys. Like OmegaConf,
interpolation is resolved against the post-merge values: overriding a
referenced key on the CLI propagates into dependents (raw templates are
kept alongside the resolved values), a whole-value ``${key}`` preserves the
referenced value's native type, and chains (a -> b -> c) resolve
recursively with a cycle guard.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Iterable, Optional, Tuple

import yaml

_INTERP = re.compile(r"\$\{([^}]+)\}")


class Config(dict):
    """dict with attribute access (cfg.model == cfg['model']).

    Assignments after ``load_config`` are recorded into the raw-template
    overlay too, so a later ``merge_cli`` re-resolve keeps programmatic
    mutations instead of silently reverting keys that exist in the YAML
    back to their file values. NB: when merge_cli installs the resolved
    view via ``cfg.update``, those writes land in the PREVIOUS _templates
    dict, which merge_cli then replaces wholesale with the raw templates —
    the replacement MUST stay after the update (re-resolution of ``${}``
    depends on templates staying raw).
    """

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __setitem__(self, name: str, value: Any) -> None:
        dict.__setitem__(self, name, value)
        t = self.__dict__.get("_templates")
        if t is not None:
            t[name] = value

    def update(self, *args, **kwargs) -> None:  # type: ignore[override]
        # route through __setitem__ (C-level dict.update would not)
        for k, v in dict(*args, **kwargs).items():
            self[k] = v

    def copy(self) -> "Config":
        c = Config(dict.copy(self))
        object.__setattr__(c, "_templates",
                           dict(getattr(self, "_templates", {})))
        return c


def _resolve(value: Any, root: Dict[str, Any],
             seen: Tuple[str, ...] = ()) -> Any:
    """Resolve ``${key}`` interpolations recursively; a whole-value
    interpolation returns the referenced value's native type."""
    if not isinstance(value, str):
        return value
    whole = _INTERP.fullmatch(value)
    if whole:
        key = whole.group(1)
        if key in root and key not in seen:
            return _resolve(root[key], root, seen + (key,))
        return value

    def sub(m: re.Match) -> str:
        key = m.group(1)
        if key in root and key not in seen:
            return str(_resolve(root[key], root, seen + (key,)))
        return m.group(0)

    return _INTERP.sub(sub, value)


def convert_to_dot_notation(d: Dict[str, Any]) -> Config:
    """Attribute-style access over a plain dict (the reference's
    utils/dict_dot.py helper)."""
    return Config(d)


def load_config(path: str | Path) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config({k: _resolve(v, raw) for k, v in raw.items()})
    object.__setattr__(cfg, "_templates", dict(raw))
    return cfg


def merge_cli(cfg: Config, argv: Optional[Iterable[str]] = None) -> Config:
    """Apply ``key=value`` overrides, then re-resolve every interpolation
    from the raw templates (OmegaConf's lazy semantics: an override of a
    referenced key propagates into dependent values)."""
    import sys

    args = list(argv) if argv is not None else sys.argv[1:]
    templates = dict(getattr(cfg, "_templates", None) or dict(cfg))
    # keys mutated after load (no template recorded) carry their value over
    for k, v in cfg.items():
        templates.setdefault(k, v)
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"expected key=value, got {arg!r}")
        key, _, val = arg.partition("=")
        templates[key.strip()] = yaml.safe_load(val) if val != "" else None
    cfg.clear()
    cfg.update({k: _resolve(v, templates) for k, v in templates.items()})
    object.__setattr__(cfg, "_templates", templates)
    return cfg
