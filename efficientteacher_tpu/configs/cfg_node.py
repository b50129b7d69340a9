"""Hierarchical, freezable configuration nodes.

Plays the role of the vendored YACS tree in the reference
(reference: configs/yacs.py), but is a fresh, minimal implementation:
a nested attribute dict with YAML merge, dotted-path CLI overrides and
a freeze bit. The public surface used by the framework is:

    cfg = get_cfg()                    # deep-copied default tree
    cfg.merge_from_file("x.yaml")      # overlay a YAML file
    cfg.merge_from_list(["a.b", 1])    # dotted CLI overrides
    cfg.freeze()                       # make immutable
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List

import yaml

_VALID_SCALARS = (int, float, bool, str, type(None))


class CfgNode(dict):
    """An attribute-accessible dict with recursive merge + freeze."""

    _FROZEN_KEY = "__frozen__"

    def __init__(self, init: Dict[str, Any] | None = None):
        super().__init__()
        object.__setattr__(self, "_frozen", False)
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(f"CfgNode is frozen; cannot set {name!r}")
        self[name] = value

    def __setitem__(self, key: str, value: Any) -> None:
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(f"CfgNode is frozen; cannot set {key!r}")
        super().__setitem__(key, value)

    # -- freeze --------------------------------------------------------------
    def freeze(self) -> "CfgNode":
        object.__setattr__(self, "_frozen", True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()
        return self

    def defrost(self) -> "CfgNode":
        object.__setattr__(self, "_frozen", False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()
        return self

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, "_frozen")

    def clone(self) -> "CfgNode":
        out = CfgNode()
        for k, v in self.items():
            out[k] = v.clone() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return out

    # -- merging --------------------------------------------------------------
    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        _merge(other, self, [])

    def merge_from_file(self, path: str) -> None:
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        _merge(CfgNode(loaded), self, [])

    def merge_from_list(self, opts: List[Any]) -> None:
        if len(opts) % 2 != 0:
            raise ValueError(f"override list must be key/value pairs, got {opts}")
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"unknown config key: {key}")
            node[leaf] = _coerce(value, node[leaf], key)

    # -- io -------------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return {
            k: (v.to_dict() if isinstance(v, CfgNode) else v) for k, v in self.items()
        }

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def __str__(self) -> str:  # pragma: no cover - debugging aid
        return self.dump()


def _merge(src: CfgNode, dst: CfgNode, path: List[str]) -> None:
    for key, value in src.items():
        full = ".".join(path + [key])
        if key not in dst:
            # Tolerate unknown keys from user YAMLs (the reference's yacs is
            # strict, but its config zoo contains a few stale keys; we accept
            # and carry them so those YAMLs load unmodified).
            dst[key] = value.clone() if isinstance(value, CfgNode) else value
            continue
        if isinstance(value, CfgNode) and isinstance(dst[key], CfgNode):
            _merge(value, dst[key], path + [key])
        else:
            dst[key] = _coerce(value, dst[key], full)


def _coerce(value: Any, old: Any, key: str) -> Any:
    """Coerce a replacement value to the type of the existing default."""
    if isinstance(value, CfgNode) or isinstance(old, CfgNode):
        if isinstance(value, dict) and isinstance(old, dict):
            return value
        raise TypeError(f"cannot replace node/leaf at {key}")
    if old is None or value is None:
        return value
    if isinstance(value, str) and not isinstance(old, str):
        value = _parse_literal(value)
    if isinstance(old, bool) and isinstance(value, int) and not isinstance(value, bool):
        return bool(value)
    if isinstance(old, float) and isinstance(value, int):
        return float(value)
    if isinstance(old, int) and isinstance(value, float) and value.is_integer():
        return int(value)
    if type(value) is type(old) or isinstance(value, _VALID_SCALARS):
        return value
    raise TypeError(f"type mismatch at {key}: {type(value)} vs {type(old)}")


def _parse_literal(s: str) -> Any:
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s
