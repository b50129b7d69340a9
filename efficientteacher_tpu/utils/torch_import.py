"""Torch checkpoint interop: load reference .pt weights into flax pytrees.

The reference saves pickled fp16 nn.Module objects, preferring the `ema`
entry on load (reference trainer/trainer.py:475-481, attempt_load at
models/backbone/experimental.py:90-128). This importer:

  1. unpickles the .pt without the reference package installed by stubbing
     missing modules (models.*, utils.*, torchvision, ...) with plain classes
     — nn.Module instances pickle via __dict__, so the parameter/buffer/
     module dicts survive into the stubs;
  2. extracts a flat name->tensor state_dict by walking _parameters /
     _buffers / _modules (or uses the dict directly when the entry already
     is a state_dict);
  3. maps reference names onto our flax tree:
       backbone.stage2_2.cv1.conv.weight -> params/backbone/stage2_2/cv1/
       conv/kernel (OIHW->HWIO), bn weight/bias -> scale/bias,
       running_mean/var -> batch_stats, `m.0` -> `m_0`,
       implicit (1,C,1,1) -> (1,1,1,C); anchors/anchor_grid buffers dropped.

Mirrors the name-map role of scripts/mula_convertor/convert_pt_to_efficient.py.
"""

from __future__ import annotations

import io
import pickle
import sys
import types
from typing import Dict, Tuple

import numpy as np


class _Stub:
    """Placeholder for any un-importable class inside the pickle."""

    def __init__(self, *a, **k):
        pass


class _StubModule(types.ModuleType):
    def __getattr__(self, name):
        cls = type(name, (_Stub,), {"__module__": self.__name__})
        setattr(self, name, cls)
        return cls


_STUB_PREFIXES = (
    "models", "utils", "torchvision", "configs", "trainer", "deploy",
)


def _install_stubs():
    """Meta-path finder serving stub modules for un-importable packages."""
    import importlib.abc
    import importlib.machinery

    class Loader(importlib.abc.Loader):
        def create_module(self, spec):
            return _StubModule(spec.name)

        def exec_module(self, module):
            pass

    class Finder(importlib.abc.MetaPathFinder):
        def find_spec(self, fullname, path=None, target=None):
            top = fullname.split(".")[0]
            if top not in _STUB_PREFIXES:
                return None
            return importlib.machinery.ModuleSpec(
                fullname, Loader(), is_package=True
            )

    finder = Finder()
    sys.meta_path.insert(0, finder)
    return finder


def load_torch_state_dict(path: str, prefer_ema: bool = True) -> Dict[str, np.ndarray]:
    """Flat reference-style state_dict {torch_name: np.ndarray} from a .pt."""
    import torch

    finder = _install_stubs()
    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        try:
            sys.meta_path.remove(finder)
        except ValueError:
            pass

    if isinstance(ckpt, dict):
        entry = None
        if prefer_ema and ckpt.get("ema") is not None:
            entry = ckpt["ema"]
        elif ckpt.get("model") is not None:
            entry = ckpt["model"]
        else:
            entry = ckpt
    else:
        entry = ckpt

    if isinstance(entry, dict) and all(
        hasattr(v, "shape") or np.isscalar(v) for v in entry.values()
    ):
        sd = entry  # already a state_dict
    else:
        sd = _extract_state_dict(entry)
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().float().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def _extract_state_dict(obj, prefix: str = "") -> Dict[str, object]:
    """Walk an unpickled (possibly stubbed) nn.Module object tree."""
    out: Dict[str, object] = {}
    d = getattr(obj, "__dict__", {}) or {}
    for name, t in (d.get("_parameters") or {}).items():
        if t is not None:
            out[prefix + name] = t
    for name, t in (d.get("_buffers") or {}).items():
        if t is not None:
            out[prefix + name] = t
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            out.update(_extract_state_dict(child, prefix + name + "."))
    return out


# reference RepConv (v7 neck) holds conv/bn in a plain Sequential, so its
# keys are rbr_dense.0 / rbr_dense.1 (models/backbone/common.py RepConv);
# our flax block names the two layers explicitly
_SEQ_RENAMES = {
    "rbr_dense_0": "rbr_dense_conv",
    "rbr_dense_1": "rbr_dense_bn",
    "rbr_1x1_0": "rbr_1x1_conv",
    "rbr_1x1_1": "rbr_1x1_bn",
}

# reference ScaleLayer modules (LinearAddBlock, common.py:1650-1678) store
# their per-channel scale as <name>.weight; our flax block keeps the vector
# as a direct param leaf named <name>
_SCALE_LAYERS = ("scale_conv", "scale_1x1", "scale_identity")

# module attributes whose names LITERALLY contain _<digit> in the reference
# source (grep `self.\w+_\d+ =` over models/{backbone,neck,head}) — the
# exporter must NOT split these into Sequential-style `.digit` indices the
# way it inverts flax `m_0` -> torch `m.0`
_LITERAL_UNDERSCORE = frozenset(
    [f"ERBlock_{i}" for i in range(2, 6)]
    + [f"c_{i}" for i in range(4)]
    + [f"elan_{i}" for i in range(4)]
    + [f"stage{s}_{i}" for s in range(2, 6) for i in (1, 2)]
    + ["stem_1", "stem_3"]
)


def map_torch_name(key: str, ndim: int) -> Tuple[Tuple[str, ...], str, str]:
    """Reference torch name -> (flax path, leaf name, collection).

    Returns collection in {params, batch_stats, drop}."""
    parts = key.split(".")
    # merge numeric list indices into flax-style names: m.0 -> m_0
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    merged = [_SEQ_RENAMES.get(p, p) for p in merged]
    # v6-style RepVGGBlock names its cells (rbr_dense.conv / rbr_dense.bn,
    # reference conv_bn at common.py:982) — fuse into the same flax names
    fused = []
    for p in merged:
        if fused and fused[-1] in ("rbr_dense", "rbr_1x1") and p in (
            "conv", "bn"
        ):
            fused[-1] = f"{fused[-1]}_{p}"
        else:
            fused.append(p)
    merged = fused
    leaf = merged[-1]
    path = merged[:-1]
    if (leaf == "weight" and ndim == 1 and path
            and path[-1] in _SCALE_LAYERS):
        return tuple(path[:-1]), path[-1], "params"
    if leaf in ("anchors", "anchor_grid", "num_batches_tracked", "stride",
                "proj"):
        return tuple(path), leaf, "drop"
    if path and path[-1] == "proj_conv":
        # DFL projection conv: a CONSTANT arange kernel (reference
        # yolov6_head.py); our heads compute the projection arithmetically
        return tuple(path), leaf, "drop"
    if leaf == "running_mean":
        return tuple(path), "mean", "batch_stats"
    if leaf == "running_var":
        return tuple(path), "var", "batch_stats"
    if leaf == "weight":
        if ndim == 1:
            return tuple(path), "scale", "params"  # BN weight
        return tuple(path), "kernel", "params"      # conv / linear
    if leaf == "bias":
        return tuple(path), "bias", "params"
    if leaf == "implicit":
        return tuple(path), "implicit", "params"
    return tuple(path), leaf, "params"


def convert_tensor(name: str, arr: np.ndarray) -> np.ndarray:
    """Torch layout -> flax layout."""
    if arr.ndim == 4:
        if name == "implicit":
            return arr.reshape(1, 1, 1, -1)
        return arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if arr.ndim == 2:
        return arr.T  # linear
    return arr


def state_dict_to_flax(sd: Dict[str, np.ndarray]):
    """Flat torch state_dict -> {'params': tree, 'batch_stats': tree}."""
    params: dict = {}
    batch_stats: dict = {}
    for key, arr in sd.items():
        path, leaf, coll = map_torch_name(key, np.ndim(arr))
        if coll == "drop":
            continue
        tree = params if coll == "params" else batch_stats
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = convert_tensor(leaf, np.asarray(arr, np.float32))
    return {"params": params, "batch_stats": batch_stats}


def load_torch_weights(path: str, spec=None, prefer_ema: bool = True):
    """Full pipeline: .pt file -> flax variables dict (numpy leaves)."""
    sd = load_torch_state_dict(path, prefer_ema=prefer_ema)
    return state_dict_to_flax(sd)


def export_to_torch_state_dict(params, batch_stats) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax trees -> reference-style flat state_dict
    (the convert_efficient_to_yolov5 direction of the mula convertor)."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, path, coll):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k], coll)
            return
        arr = np.asarray(node)
        inv_seq = {v: k for k, v in _SEQ_RENAMES.items()}
        parts = []
        for p in path[:-1]:
            p = inv_seq.get(p, p)
            # m_0 -> m.0, EXCEPT reference modules literally named with
            # underscores (stage2_1, ERBlock_5, elan_0, ...)
            if ("_" in p and p.rsplit("_", 1)[-1].isdigit()
                    and p not in _LITERAL_UNDERSCORE):
                stem, idx = p.rsplit("_", 1)
                parts.extend([stem, idx])
            else:
                parts.append(p)
        leaf = path[-1]
        if coll == "batch_stats":
            leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
        elif leaf in _SCALE_LAYERS and arr.ndim == 1:
            # flax scale vector leaf -> reference ScaleLayer <name>.weight
            parts.append(leaf)
            leaf = "weight"
        else:
            leaf = {"scale": "weight", "kernel": "weight"}.get(leaf, leaf)
        if arr.ndim == 4:
            if path[-1] == "implicit":
                arr = arr.reshape(1, -1, 1, 1)
            else:
                arr = arr.transpose(3, 2, 0, 1)
        elif arr.ndim == 2:
            arr = arr.T
        out[".".join(parts + [leaf])] = arr

    walk(params, [], "params")
    walk(batch_stats, [], "batch_stats")
    return out
