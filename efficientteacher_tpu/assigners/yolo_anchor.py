"""YOLOv5 anchor assignment, dense-masked for TPU.

Re-expresses the reference's ragged `build_targets`
(reference: models/assigner/yolo_anchor_assigner.py:319-372) as fixed-shape
masked tensors so it jits: every (target, neighbor-cell, anchor) triple is a
slot in a (B, M, 5, na) lattice with a validity mask, instead of a
filter-and-5x-repeat list. Mathematically equivalent:

  - anchor gate: max(wh/anchor, anchor/wh).max(-1) < anchor_t
    (reference line 341-343)
  - neighbor expansion: center cell always, plus left/top/right/bottom cell
    when the box center is within 0.5 of that cell boundary and >1 from the
    image edge (reference lines 346-353, offsets table line 328-332)
  - per-candidate regression target: (gxy - cell_ij, gwh), class, anchor wh

Targets arrive padded: labels (B, M, 5+) rows [cls, cx, cy, w, h, ...extra]
normalized to [0, 1], with label_mask (B, M). Extra columns (pseudo-label
scores for the SSOD path, reference build_uc_targets_aug) ride along
untouched.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# candidate cell offsets in (dx, dy) applied as gij = floor(gxy - off)
# (reference offsets table, yolo_anchor_assigner.py:328-332, g = 0.5)
_OFFSETS = np.array(
    [[0.0, 0.0], [0.5, 0.0], [0.0, 0.5], [-0.5, 0.0], [0.0, -0.5]], np.float32
)
NUM_NEIGHBORS = 5


class DenseAssignment(NamedTuple):
    """Per-scale dense assignment. K = M * 5 * na candidate slots."""

    valid: jnp.ndarray      # (B, K) bool - real positive
    flat_cell: jnp.ndarray  # (B, K) int32 - (gj * nx + gi) * na + a, OOB-safe
    txy: jnp.ndarray        # (B, K, 2) - target xy offset within cell (-0.5..1.5)
    twh: jnp.ndarray        # (B, K, 2) - target wh in grid units
    tcls: jnp.ndarray       # (B, K) int32
    anchor_wh: jnp.ndarray  # (B, K, 2) - anchor wh in grid units
    extra: jnp.ndarray      # (B, K, E) - passthrough extra target columns


def assign_scale(
    labels: jnp.ndarray,
    label_mask: jnp.ndarray,
    grid_hw: Tuple[int, int],
    anchors_grid: jnp.ndarray,
    anchor_t: float,
    single_targets: bool = False,
) -> DenseAssignment:
    """Dense build_targets for one scale.

    labels: (B, M, 5+E) [cls, cx, cy, w, h, extra...] normalized.
    anchors_grid: (na, 2) anchor wh in grid units for this scale.
    """
    ny, nx = grid_hw
    b, m = labels.shape[0], labels.shape[1]
    na = anchors_grid.shape[0]
    e = labels.shape[-1] - 5

    cls = labels[..., 0]
    gxy = labels[..., 1:3] * jnp.array([nx, ny], jnp.float32)  # grid xy
    gwh = labels[..., 3:5] * jnp.array([nx, ny], jnp.float32)  # grid wh
    extra = labels[..., 5:]

    # anchor ratio gate (B, M, na)
    r = gwh[:, :, None, :] / anchors_grid[None, None, :, :]
    ratio = jnp.maximum(r, 1.0 / r).max(-1)
    anchor_ok = ratio < anchor_t

    # neighbor-cell validity (B, M, 5)
    gxi = jnp.array([nx, ny], jnp.float32) - gxy  # inverse coords
    fx, fy = gxy[..., 0] % 1.0, gxy[..., 1] % 1.0
    ix, iy = gxi[..., 0] % 1.0, gxi[..., 1] % 1.0
    ones = jnp.ones_like(fx, bool)
    cell_ok = jnp.stack(
        [
            ones,
            (fx < 0.5) & (gxy[..., 0] > 1.0),   # left
            (fy < 0.5) & (gxy[..., 1] > 1.0),   # top
            (ix < 0.5) & (gxi[..., 0] > 1.0),   # right
            (iy < 0.5) & (gxi[..., 1] > 1.0),   # bottom
        ],
        axis=-1,
    )
    if single_targets:
        cell_ok = cell_ok & jnp.array([True] + [False] * 4)[None, None, :]

    off = jnp.asarray(_OFFSETS)  # (5, 2)
    gij = jnp.floor(gxy[:, :, None, :] - off[None, None, :, :])  # (B, M, 5, 2)
    gi = jnp.clip(gij[..., 0], 0, nx - 1)
    gj = jnp.clip(gij[..., 1], 0, ny - 1)
    txy = gxy[:, :, None, :] - jnp.stack([gi, gj], axis=-1)  # (B, M, 5, 2)

    # combine to (B, M, 5, na) lattice
    valid = (
        label_mask[:, :, None, None]
        & cell_ok[:, :, :, None]
        & anchor_ok[:, :, None, :]
    )
    flat_cell = (
        (gj[..., None] * nx + gi[..., None]) * na
        + jnp.arange(na, dtype=jnp.float32)[None, None, None, :]
    ).astype(jnp.int32)

    k = m * NUM_NEIGHBORS * na
    bc = lambda x, tail: jnp.broadcast_to(
        x, (b, m, NUM_NEIGHBORS, na) + tail
    ).reshape((b, k) + tail)
    return DenseAssignment(
        valid=valid.reshape(b, k),
        flat_cell=flat_cell.reshape(b, k),
        txy=bc(txy[:, :, :, None, :], (2,)),
        twh=bc(gwh[:, :, None, None, :], (2,)),
        tcls=bc(cls[:, :, None, None].astype(jnp.int32), ()),
        anchor_wh=bc(
            jnp.broadcast_to(anchors_grid[None, None, None], (b, m, NUM_NEIGHBORS, na, 2)),
            (2,),
        ),
        extra=bc(extra[:, :, None, None, :], (e,)),
    )


def assign_all_scales(
    labels: jnp.ndarray,
    label_mask: jnp.ndarray,
    grid_shapes: Sequence[Tuple[int, int]],
    anchors_grid: np.ndarray,
    anchor_t: float,
    single_targets: bool = False,
) -> Tuple[DenseAssignment, ...]:
    """Run dense assignment for every detection scale.

    anchors_grid: (nl, na, 2) in grid units (anchors_px / stride).
    """
    return tuple(
        assign_scale(
            labels,
            label_mask,
            grid_shapes[i],
            jnp.asarray(anchors_grid[i], jnp.float32),
            anchor_t,
            single_targets,
        )
        for i in range(len(grid_shapes))
    )
