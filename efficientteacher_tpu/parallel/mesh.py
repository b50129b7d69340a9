"""Device mesh + sharding helpers.

TPU-native replacement for the reference's DDP/NCCL runtime (SURVEY.md §2.8):
a 1-D `dp` mesh over which batches are sharded and parameters replicated.
Gradient reduction is inserted by XLA (GSPMD) inside the jitted train step —
no explicit allreduce, and the reference's `loss *= WORLD_SIZE` correction
(trainer.py:425-426) has no equivalent because the loss is computed globally.

BatchNorm under this scheme reduces over the *global* batch axis, i.e.
SyncBN semantics always (the reference's opt-in sync_bn, trainer.py:85-87);
per-replica BN is deliberately not supported.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]).reshape(n), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, axis: str = "dp") -> Any:
    """Place host arrays with the leading dim sharded over the dp axis."""
    s = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
