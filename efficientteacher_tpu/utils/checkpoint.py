"""Checkpoint save/load.

Replaces the reference's pickled-nn.Module torch checkpoints
(reference trainer/trainer.py:474-491: {epoch, best_fitness, model fp16,
ema fp16, updates, optimizer}) with a msgpack state-dict format
(flax.serialization) plus a JSON sidecar. Loading prefers the `ema` entry
like the reference's attempt_load (models/backbone/experimental.py:97);
`strip_optimizer` keeps only eval state (reference utils/general.py:1201).
Torch-weight interop lives in utils/torch_import.py.
"""

from __future__ import annotations

import json
import os
import threading
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_np(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str | Path,
    *,
    params,
    batch_stats,
    ema_params=None,
    ema_batch_stats=None,
    ema_updates: int = 0,
    opt_state=None,
    epoch: int = -1,
    best_fitness: float = 0.0,
    cfg_yaml: Optional[str] = None,
    half: bool = True,
):
    """Write a checkpoint. With half=True model/ema tensors are stored fp16
    (mirroring the reference's .half() save, trainer.py:475-481)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    cast = (lambda t: jax.tree.map(
        lambda x: np.asarray(x, np.float16)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x),
        t)) if half else _to_np
    payload: Dict[str, Any] = {
        "model": {"params": cast(params), "batch_stats": cast(batch_stats)},
    }
    if ema_params is not None:
        payload["ema"] = {
            "params": cast(ema_params),
            "batch_stats": cast(ema_batch_stats),
        }
    if opt_state is not None:
        # flax structs (SGDState) -> plain nested dicts for msgpack
        payload["optimizer"] = _to_np(
            serialization.to_state_dict(opt_state)
        )
    blob = serialization.msgpack_serialize(payload)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(blob)
    os.replace(tmp, path)
    meta = {
        "epoch": int(epoch),
        "best_fitness": float(best_fitness),
        "ema_updates": int(ema_updates),
        "has_ema": ema_params is not None,
        "has_optimizer": opt_state is not None,
    }
    if cfg_yaml is not None:
        meta["cfg"] = cfg_yaml
    path.with_suffix(path.suffix + ".json").write_text(json.dumps(meta))


class AsyncCheckpointer:
    """Non-blocking checkpoint writes for the training loop.

    `save()` snapshots every device array with an on-device copy
    (`jnp.array` — an async-dispatched HBM copy, so the snapshot is immune
    to the train step's buffer donation overwriting the live state) and
    returns immediately; the device->host pull, fp16 casts, msgpack
    serialization and the file write all run on a background thread. One
    save is in flight at a time — a new `save()` first joins the previous
    one, and `wait()` joins + re-raises any background failure.

    TPU-native replacement for the reference's in-loop torch.save
    (trainer/trainer.py:474-491), which serializes the full state dict on
    the training thread every epoch.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._exc: Optional[BaseException] = None

    def save(self, path: str | Path, **kwargs) -> None:
        self.wait()
        snap = jax.tree.map(
            lambda x: jnp.array(x) if isinstance(x, jax.Array) else x,
            kwargs)

        def run():
            try:
                save_checkpoint(path, **snap)
            except BaseException as e:  # surfaced by the next wait()/save()
                self._exc = e

        self._thread = threading.Thread(
            target=run, name="ckpt-writer", daemon=True)
        self._thread.start()

    def wait(self) -> None:
        t, self._thread = self._thread, None
        if t is not None:
            t.join()
        if self._exc is not None:
            e, self._exc = self._exc, None
            raise RuntimeError("async checkpoint save failed") from e


def load_checkpoint(path: str | Path) -> Dict[str, Any]:
    """Read a checkpoint into numpy pytrees + meta."""
    path = Path(path)
    payload = serialization.msgpack_restore(path.read_bytes())
    meta_path = path.with_suffix(path.suffix + ".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    payload["meta"] = meta
    return payload


def load_eval_variables(path: str | Path, prefer_ema: bool = True,
                        dtype=jnp.float32) -> Dict[str, Any]:
    """Variables dict for model.apply, preferring the EMA entry
    (reference attempt_load semantics, experimental.py:97)."""
    ckpt = load_checkpoint(path)
    src = ckpt.get("ema") if (prefer_ema and "ema" in ckpt) else ckpt["model"]
    cast = lambda t: jax.tree.map(lambda x: jnp.asarray(x, dtype), t)
    return {"params": cast(src["params"]),
            "batch_stats": cast(src["batch_stats"])}


def intersect_trees(src, dst):
    """Shape-matched partial copy for warm starts (reference intersect_dicts,
    trainer.py:132-144). Returns (merged_tree, n_copied, n_total)."""
    copied = 0
    total = 0

    def merge(s, d):
        nonlocal copied, total
        if isinstance(d, dict):
            out = {}
            for k, v in d.items():
                out[k] = merge(s.get(k) if isinstance(s, dict) else None, v)
            return out
        total += 1
        if s is not None and np.shape(s) == np.shape(d):
            copied += 1
            return jnp.asarray(np.asarray(s), jnp.asarray(d).dtype)
        return d

    merged = merge(src or {}, dst)
    return merged, copied, total


def strip_optimizer(path: str | Path):
    """Drop optimizer state; promote EMA to model (reference
    utils/general.py:1201-1216)."""
    ckpt = load_checkpoint(path)
    meta = ckpt.pop("meta", {})
    model = ckpt.get("ema") or ckpt["model"]
    save_checkpoint(
        Path(path),
        params=model["params"],
        batch_stats=model["batch_stats"],
        epoch=-1,
        best_fitness=meta.get("best_fitness", 0.0),
        half=True,
    )
