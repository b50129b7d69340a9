"""Multi-host (multi-process) runtime initialization.

The BASELINE target platform (v5p-16) is a multi-host slice: one Python
process per host, each seeing only its local chips; JAX stitches them into
one global device set after jax.distributed.initialize(). This module is
the reference's `init_process_group` analogue (reference train.py:52-59 DDP
setup) done the JAX way:

  - `maybe_initialize()` is called once from the train CLI. On Cloud TPU
    pods the coordinator is auto-detected; elsewhere it reads the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    Single-process runs are untouched (no env -> no-op).
  - `make_global_batch(mesh, tree)` turns each process's LOCAL batch shard
    into the dp-sharded GLOBAL jax.Array
    (jax.make_array_from_process_local_data); with one process it is plain
    device_put. The train step itself is identical either way — GSPMD
    inserts the cross-host collectives over ICI.
  - `is_main_process()` guards host-0-only side effects (checkpoint
    writes, loggers) — the reference's RANK in (-1, 0) checks.

Data sharding: loaders slice their sample lists per process
(`process_slice`), so the global batch is the concatenation of the
per-host loader outputs; cfg batch_size stays GLOBAL and
create_dataloader divides by process_count.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

LOGGER = logging.getLogger(__name__)

_ENV_COORD = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")


def maybe_initialize() -> bool:
    """jax.distributed.initialize() when a multi-process launch is
    detected; returns True if the runtime is (now) multi-process.

    Must run before anything initializes the XLA backend, so the env is
    inspected FIRST — jax.* introspection only happens on paths that have
    already initialized."""
    coord = next((os.environ[k] for k in _ENV_COORD if k in os.environ),
                 None)
    n = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID") or os.environ.get("PROCESS_ID")
    if coord and n is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(n),
            process_id=int(pid),
        )
        LOGGER.info("jax.distributed: process %d/%d, %d global devices",
                    jax.process_index(), jax.process_count(),
                    len(jax.devices()))
        return True
    if os.environ.get("JAX_AUTO_DISTRIBUTED") == "1":
        # Cloud TPU pod: coordinator auto-detected from the TPU metadata
        jax.distributed.initialize()
        return jax.process_count() > 1
    return jax.process_count() > 1  # already initialized by the launcher


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_slice(items: list) -> list:
    """This process's strided share of a (identically-ordered) sample list."""
    pc = jax.process_count()
    if pc == 1:
        return items
    return items[jax.process_index()::pc]


def per_process_batch(global_batch: int) -> int:
    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{pc} processes"
        )
    return global_batch // pc


def to_host(x) -> np.ndarray:
    """Device output -> full host numpy array. Single-process: plain copy.
    Multi-host: every process gathers the full batch-sharded array (the
    reference's LabelMatch all_gather of per-rank score lists,
    utils/labelmatch.py:100-117 / SURVEY §5.8)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def make_global_batch(mesh, tree: Any, axis: str = "dp",
                      specs: Any = None) -> Any:
    """Local per-host batch shards -> global dp-sharded jax.Arrays.

    `specs` optionally overrides the PartitionSpec per leaf — a flat list
    in `jax.tree.leaves(tree)` order (PartitionSpec is a tuple subclass,
    so it cannot ride inside a mapped tree), e.g. [P("dp", "sp"),
    P("dp"), P("dp")] for (images, labels, mask) on a spatial mesh."""
    leaves, treedef = jax.tree.flatten(tree)
    if specs is None:
        specs = [P(axis)] * len(leaves)
    assert len(specs) == len(leaves), "one PartitionSpec per leaf"
    if jax.process_count() == 1:
        out = [jax.device_put(x, NamedSharding(mesh, sp))
               for x, sp in zip(leaves, specs)]
    else:
        out = [jax.make_array_from_process_local_data(
                   NamedSharding(mesh, sp), np.asarray(x))
               for x, sp in zip(leaves, specs)]
    return jax.tree.unflatten(treedef, out)
