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


# ---------------------------------------------------------------------------
# 2-D dp x sp mesh: data parallelism + GSPMD spatial partitioning.
#
# When the per-chip batch is too small to fill the MXU (large images, huge
# models, or more chips than batch), shard the image HEIGHT axis across an
# `sp` mesh axis as well: params stay replicated, every conv becomes a
# spatially-partitioned conv and XLA inserts the halo exchanges
# (collective-permutes of kernel_h-1 boundary rows over ICI) automatically.
# This is pure GSPMD — no manual shard_map/ppermute halo code — and is the
# TPU answer to scaling past dp (the reference has no analogue; its DDP
# replicates whole batches, train.py:52-59).
#
# Semantics: identical math to dp-only. BN reduces over (N, H, W) — a sum
# sharded over H is still the global sum; loss/assigner lattices operate on
# feature maps whose H is sharded the same way. Verified numerically vs the
# single-device step in tests/test_spatial_mesh.py.
# ---------------------------------------------------------------------------


def make_mesh_2d(dp: Optional[int] = None, sp: int = 1,
                 axes=("dp", "sp")) -> Mesh:
    """A (dp, sp) mesh over the first dp*sp visible devices. `dp=None`
    uses all devices / sp."""
    devs = jax.devices()
    if dp is None:
        dp = len(devs) // sp
    n = dp * sp
    if n > len(devs):
        raise ValueError(f"mesh {dp}x{sp} needs {n} devices, "
                         f"have {len(devs)}")
    return Mesh(np.array(devs[:n]).reshape(dp, sp), axes)


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC images: batch over dp, height over sp (replicated on a 1-D
    mesh)."""
    if "sp" in mesh.axis_names and mesh.shape.get("sp", 1) > 1:
        return NamedSharding(mesh, P("dp", "sp"))
    return NamedSharding(mesh, P("dp"))


def shard_images(mesh: Mesh, images: Any, max_stride: int = 32) -> Any:
    """Place an NHWC image batch with N over dp and H over sp.

    Warns when the deepest feature map (H / max_stride) would have fewer
    than 2 rows per sp shard: GSPMD's windowed-op halo exchange degrades
    when the halo exceeds the shard (measured: exact at >=2 rows/shard,
    diverges at 1 — tests/test_spatial_mesh.py)."""
    sp = mesh.shape.get("sp", 1)
    h = images.shape[1]
    if sp > 1 and h // max_stride // sp < 2:
        import warnings

        warnings.warn(
            f"spatial sharding sp={sp} leaves {h // max_stride // sp} "
            f"row(s) per shard at stride {max_stride}; need >=2 for "
            f"numerically-safe halo exchange (img {h}px). Reduce sp or "
            "raise img_size.", stacklevel=2)
    return jax.device_put(images, image_sharding(mesh))
