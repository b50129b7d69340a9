"""Task-Aligned assignment (TAL / PPYOLOE style), dense for TPU.

Parity with reference models/assigner/tal_assigner.py:13-158 and the
nanodet_utils helpers (select_candidates_in_gts :206, select_highest_overlaps
:227):
  - align metric = score[gt_cls]^alpha * IoU^beta (alpha 1, beta 6)
  - candidates: anchor centers strictly inside the GT box
  - top-k (13) candidates per GT by metric; anchors appearing in several GT
    top-k lists resolved to the highest-IoU GT
  - target score = onehot(cls) * (metric * max_overlap / max_metric per GT)
  - the reference's duplicate-index drop quirk (select_topk_candidates'
    `where(count > 1, 0, count)`) is preserved
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import box_iou


class TALResult(NamedTuple):
    target_labels: jnp.ndarray  # (B, N) int32
    target_bboxes: jnp.ndarray  # (B, N, 4) xyxy pixels
    target_scores: jnp.ndarray  # (B, N, nc)
    fg_mask: jnp.ndarray        # (B, N) bool


def _assign_one(scores, boxes, anc_points, gt_cls, gt_boxes, gt_mask,
                nc, top_k, alpha, beta, eps):
    """scores (N, nc) in [0,1]; boxes/gt_boxes xyxy pixels; anc (N, 2)."""
    m = gt_boxes.shape[0]
    n = boxes.shape[0]

    overlaps = box_iou(gt_boxes, boxes)                       # (M, N)
    overlaps = jnp.where(gt_mask[:, None], overlaps, 0.0)
    cls_score = jnp.take_along_axis(
        scores.T, gt_cls[:, None], axis=0
    )                                                          # (M, N)
    align = (cls_score ** alpha) * (overlaps ** beta)

    # anchors inside gt boxes
    lt_ok = (anc_points[None, :, :] - gt_boxes[:, None, 0:2]).min(-1) > eps
    rb_ok = (gt_boxes[:, None, 2:4] - anc_points[None, :, :]).min(-1) > eps
    in_gts = lt_ok & rb_ok & gt_mask[:, None]

    metric = align * in_gts
    k = min(top_k, n)
    topk_vals, topk_idx = jax.lax.top_k(metric, k)             # (M, k)
    valid = gt_mask[:, None] & jnp.ones((m, k), bool)
    # count occurrences (reference one_hot(...).sum then drop count>1)
    counts = jnp.zeros((m, n), jnp.int32)
    counts = jax.vmap(
        lambda c, idx, v: c.at[idx].add(v.astype(jnp.int32), mode="drop")
    )(counts, topk_idx, valid)
    is_in_topk = jnp.where(counts > 1, 0, counts).astype(bool)
    mask_pos = is_in_topk & in_gts                              # (M, N)

    # resolve multi-GT anchors: the reference replaces the whole column with
    # one_hot(argmax of overlaps over ALL GT rows) — which can hand the anchor
    # to a GT that never claimed it (nanodet_utils.select_highest_overlaps
    # :239-246, a mirrored quirk; padded rows have overlap 0 so never win
    # unless all overlaps are 0, in which case row 0 wins, as in torch argmax)
    claims = mask_pos.sum(0)
    multi = claims > 1
    best_gt_all = jnp.argmax(overlaps, axis=0)                  # (N,)
    col = jnp.arange(m)[:, None] == best_gt_all[None, :]        # (M, N)
    mask_pos = jnp.where(multi[None, :], col, mask_pos)

    fg = mask_pos.any(0)
    target_gt = jnp.argmax(mask_pos, axis=0)
    t_labels = jnp.where(fg, gt_cls[target_gt], nc)
    t_boxes = gt_boxes[target_gt]
    onehot = jax.nn.one_hot(jnp.clip(t_labels, 0, nc - 1), nc)
    onehot = onehot * fg[:, None]

    # normalized scores (reference :117-123)
    align_pos = align * mask_pos
    pos_max_metric = align_pos.max(-1, keepdims=True)           # (M, 1)
    pos_max_overlap = (overlaps * mask_pos).max(-1, keepdims=True)
    norm = (align_pos * pos_max_overlap / (pos_max_metric + eps)).max(0)
    t_scores = onehot * norm[:, None]
    return t_labels.astype(jnp.int32), t_boxes, t_scores, fg


@functools.partial(
    jax.jit, static_argnames=("nc", "top_k", "alpha", "beta", "eps")
)
def tal_assign(
    pd_scores: jnp.ndarray,   # (B, N, nc) sigmoid scores
    pd_bboxes: jnp.ndarray,   # (B, N, 4) xyxy pixels
    anc_points: jnp.ndarray,  # (N, 2) pixels
    gt_labels: jnp.ndarray,   # (B, M) int32
    gt_bboxes: jnp.ndarray,   # (B, M, 4) xyxy pixels
    gt_mask: jnp.ndarray,     # (B, M)
    *,
    nc: int,
    top_k: int = 13,
    alpha: float = 1.0,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> TALResult:
    out = jax.vmap(
        functools.partial(_assign_one, nc=nc, top_k=top_k, alpha=alpha,
                          beta=beta, eps=eps),
        in_axes=(0, 0, None, 0, 0, 0),
    )(pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, gt_mask)
    return TALResult(*out)
