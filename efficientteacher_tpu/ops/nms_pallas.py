"""Pallas TPU kernel for greedy NMS suppression.

The XLA formulation in ops/nms.py round-trips tile keep-masks through the
fori_loop carry; this kernel keeps the ENTIRE candidate set in VMEM
(K=2048 boxes = 32 KB, masks = 8 KB — far under the ~16 MB budget) and runs
the tiled greedy sweep as one fused program per image:

  for each tile (sequential, dependency-ordered):
    1. suppress by all previously-resolved tiles (tile x tile IoU on the VPU)
    2. resolve within-tile order by fixpoint iteration of
       a[j] <- base[j] and not any_i(a[i] and iou[i,j] > t, i < j)

Layout notes (TPU tiling): boxes travel as coordinate planes (B, 4, K) so
every per-coordinate slice is a full-lane vector; masks carry a dummy
middle dim so their trailing block dims are (1, K). Batch images map onto
the pallas grid. Exact same keep-mask semantics as ops.nms.greedy_nms_keep
(the torchvision-greedy contract); property-tested against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_iou(c_a, c_b):
    """Pairwise IoU from coordinate tuples: c_a/c_b = (x1, y1, x2, y2),
    each (T,) -> (Ta, Tb)."""
    ax1, ay1, ax2, ay2 = c_a
    bx1, by1, bx2, by2 = c_b
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    iw = jnp.clip(
        jnp.minimum(ax2[:, None], bx2[None, :])
        - jnp.maximum(ax1[:, None], bx1[None, :]),
        0.0, None,
    )
    ih = jnp.clip(
        jnp.minimum(ay2[:, None], by2[None, :])
        - jnp.maximum(ay1[:, None], by1[None, :]),
        0.0, None,
    )
    inter = iw * ih
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, iou_thres: float,
                tile: int, k: int, stop_at: int | None):
    tri = jnp.triu(jnp.ones((tile, tile), dtype=jnp.float32), 1)

    # Bound the sweep by the LAST valid row: all-padding tiles' greedy
    # result IS their `valid` initialization (written below), so skipping
    # them is exact for any mask. Critical for sparse candidate fields,
    # where `cnt < stop_at` alone never exits and the sweep grinds every
    # tile of the max_nms buffer (208 ms/batch at b32@640 eval — the r4
    # serving claim/record gap, scripts/profile_eval.py r5 attribution).
    v = valid_ref[0, :, :]                               # (1, k) f32 0/1
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    last_valid = jnp.max(jnp.where(v > 0.0, idx, -1))
    valid_tiles = (last_valid + tile) // tile            # 0 when none valid

    def load_coords(row0):
        return tuple(
            boxes_ref[0, c, pl.ds(row0, tile)] for c in range(4)
        )

    # initialize keep with validity (tiles are resolved in order below)
    keep_ref[0, 0, :] = valid_ref[0, 0, :]

    def outer(ti, _):
        row0 = pl.multiple_of(ti * tile, tile)
        tb = load_coords(row0)
        base = keep_ref[0, 0, pl.ds(row0, tile)]

        def cross(tj, acc):
            prev0 = pl.multiple_of(tj * tile, tile)
            pb = load_coords(prev0)
            pk = keep_ref[0, 0, pl.ds(prev0, tile)]
            iou = _tile_iou(pb, tb)
            hit = (iou > iou_thres).astype(jnp.float32) * pk[:, None]
            return acc * (1.0 - jnp.clip(hit.max(0), 0.0, 1.0))

        base = jax.lax.fori_loop(0, ti, cross, base)

        iou = _tile_iou(tb, tb)
        sup = (iou > iou_thres).astype(jnp.float32) * tri

        def fix_cond(state):
            _, changed, it = state
            return changed & (it < tile)

        def fix_body(state):
            act, _, it = state
            hit = jnp.clip((sup * act[:, None]).max(0), 0.0, 1.0)
            new = base * (1.0 - hit)
            return new, jnp.any(new != act), it + 1

        act, _, _ = jax.lax.while_loop(
            fix_cond, fix_body, (base, jnp.bool_(True), jnp.int32(0))
        )
        keep_ref[0, 0, pl.ds(row0, tile)] = act
        return jnp.sum(act).astype(jnp.float32)

    if stop_at is None:
        jax.lax.fori_loop(0, valid_tiles, lambda ti, c: c + outer(ti, c),
                          0.0)
    else:
        # early exit once stop_at rows are kept (same contract as
        # ops.nms.greedy_nms_keep stop_at: exact for the first stop_at kept
        # rows; later tiles keep their `valid` initialization)
        def cond(state):
            ti, cnt = state
            return (ti < valid_tiles) & (cnt < float(stop_at))

        def body(state):
            ti, cnt = state
            return ti + 1, cnt + outer(ti, cnt)

        jax.lax.while_loop(cond, body, (jnp.int32(0), 0.0))


@functools.partial(jax.jit, static_argnames=("iou_thres", "tile", "stop_at"))
def greedy_nms_keep_pallas(
    boxes: jnp.ndarray,  # (B, K, 4) score-sorted xyxy (class-offset applied)
    valid: jnp.ndarray,  # (B, K) bool
    iou_thres: float,
    tile: int = 256,
    stop_at: int | None = None,
) -> jnp.ndarray:
    """Batched exact-greedy keep masks, one pallas program per image."""
    b, k, _ = boxes.shape
    assert k % tile == 0, f"K={k} must be a multiple of tile={tile}"
    planes = jnp.transpose(boxes.astype(jnp.float32), (0, 2, 1))  # (B, 4, K)
    out = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thres=float(iou_thres),
                          tile=tile, k=k, stop_at=stop_at),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
    )(planes, valid.astype(jnp.float32)[:, None, :])
    return out[:, 0, :] > 0.5
