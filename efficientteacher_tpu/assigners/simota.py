"""SimOTA dynamic-k assignment, dense-masked for TPU.

Parity with reference models/assigner/simota_assigner.py:35-372:
  - candidate gate: anchor center inside a GT box OR within the
    center_radius(2.5)*stride square around a GT center (:289-346)
  - cost = cls_weight * BCE(sqrt(sigmoid(cls)*sigmoid(obj)), onehot) +
    iou_weight(3) * (-log iou) + 1e5 * (candidate but not in both)
    (:241-271)
  - dynamic k per GT = clamp(int(sum of top-10 candidate IoUs), 1) (:349-354)
  - per-GT lowest-cost top-k selection; anchors claimed by multiple GTs go to
    the lowest-cost GT (:356-365)
  - targets: cls onehot * matched IoU, obj = fg mask (or IoU when iou_obj),
    reg = matched GT box (:165-190)

Dense deltas: padded (M) GT rows with a mask instead of per-image ragged
loops; non-candidate anchors get a 1e9 penalty instead of being sliced out
(mathematically equivalent given the per-GT top-k never reaches them unless
fewer than k candidates exist — matching the reference's behavior where
dynamic_ks <= #candidates).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou


class SimOTAResult(NamedTuple):
    fg_mask: jnp.ndarray        # (B, N) bool
    matched_gt: jnp.ndarray     # (B, N) int32 (valid where fg)
    matched_iou: jnp.ndarray    # (B, N) float (0 where not fg)
    num_fg: jnp.ndarray         # () int32 total over batch


def _pairwise_iou_xywh(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """(M, 4) x (N, 4) xywh -> (M, N)."""
    return bbox_iou(gt[:, None, :], pred[None, :, :], x1y1x2y2=False)


def _assign_one(
    gt_boxes, gt_cls, gt_mask, pred_boxes, cls_logits, obj_logits,
    centers, strides, nc, top_k, center_radius, iou_weight, cls_weight,
):
    m = gt_boxes.shape[0]
    n = pred_boxes.shape[0]

    # candidate gates (M, N)
    lt = gt_boxes[:, None, :2] - 0.5 * gt_boxes[:, None, 2:4]
    rb = gt_boxes[:, None, :2] + 0.5 * gt_boxes[:, None, 2:4]
    d_box = jnp.concatenate(
        [centers[None] - lt, rb - centers[None]], axis=-1
    )
    in_boxes = (d_box.min(-1) > 0.0) & gt_mask[:, None]
    c_lt = gt_boxes[:, None, :2] - center_radius * strides[None, :, None]
    c_rb = gt_boxes[:, None, :2] + center_radius * strides[None, :, None]
    d_ctr = jnp.concatenate(
        [centers[None] - c_lt, c_rb - centers[None]], axis=-1
    )
    in_centers = (d_ctr.min(-1) > 0.0) & gt_mask[:, None]
    fg_anchor = in_boxes.any(0) | in_centers.any(0)          # (N,)
    in_both = in_boxes & in_centers                          # (M, N)

    iou = _pairwise_iou_xywh(gt_boxes, pred_boxes)           # (M, N)
    iou = jnp.where(gt_mask[:, None], iou, 0.0)

    # cls cost
    p = jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits)  # (N, nc)
    q = jnp.sqrt(jnp.clip(p, 1e-12, 1.0))[None]                  # (1, N, nc)
    y = jax.nn.one_hot(gt_cls, nc)[:, None, :]                   # (M, 1, nc)
    bce = -(y * jnp.log(q) + (1.0 - y) * jnp.log1p(-jnp.clip(q, 0, 1 - 1e-7)))
    cls_cost = bce.sum(-1)                                       # (M, N)

    cost = (
        cls_weight * cls_cost
        + iou_weight * (-jnp.log(iou + 1e-8))
        + 100000.0 * (~in_both)
        + 1e9 * (~fg_anchor)[None, :]
        + 1e12 * (~gt_mask)[:, None]
    )

    # dynamic k from top-10 candidate IoUs
    iou_cand = jnp.where(fg_anchor[None, :], iou, 0.0)
    k_cand = min(top_k, n)
    topk_ious, _ = jax.lax.top_k(iou_cand, k_cand)               # (M, k)
    dynamic_k = jnp.clip(topk_ious.sum(-1).astype(jnp.int32), 1, k_cand)

    # per-GT lowest-cost top-k -> matching matrix via scatter
    neg_cost_topv, topk_idx = jax.lax.top_k(-cost, k_cand)       # (M, k)
    rank = jnp.arange(k_cand)[None, :]
    chosen = (rank < dynamic_k[:, None]) & gt_mask[:, None]      # (M, k)
    mm = jnp.zeros((m, n), bool)
    mm = jax.vmap(lambda row, idx, ch: row.at[idx].set(ch, mode="drop"))(
        mm, topk_idx, chosen
    )

    # conflict resolution: anchor claimed by >1 GT goes to min-cost GT
    claims = mm.sum(0)                                           # (N,)
    best_gt = jnp.argmin(jnp.where(mm, cost, jnp.inf), axis=0)   # (N,)
    keep = (claims <= 1) | (
        jnp.arange(m)[:, None] == best_gt[None, :]
    )
    mm = mm & keep

    fg = mm.any(0)
    matched_gt = jnp.argmax(mm, axis=0).astype(jnp.int32)
    matched_iou = (mm * iou).sum(0)
    return fg, matched_gt, matched_iou


@functools.partial(
    jax.jit,
    static_argnames=("nc", "top_k", "center_radius", "iou_weight",
                     "cls_weight"),
)
def simota_assign(
    gt_boxes: jnp.ndarray,   # (B, M, 4) xywh absolute pixels
    gt_cls: jnp.ndarray,     # (B, M) int32
    gt_mask: jnp.ndarray,    # (B, M) bool
    pred_boxes: jnp.ndarray, # (B, N, 4) xywh absolute (decoded, stop-grad)
    cls_logits: jnp.ndarray, # (B, N, nc)
    obj_logits: jnp.ndarray, # (B, N, 1)
    centers: jnp.ndarray,    # (N, 2) anchor centers in pixels
    strides: jnp.ndarray,    # (N,) per-anchor stride
    *,
    nc: int,
    top_k: int = 10,
    center_radius: float = 2.5,
    iou_weight: float = 3.0,
    cls_weight: float = 1.0,
) -> SimOTAResult:
    fg, mgt, miou = jax.vmap(
        functools.partial(
            _assign_one, nc=nc, top_k=top_k, center_radius=center_radius,
            iou_weight=iou_weight, cls_weight=cls_weight,
        ),
        in_axes=(0, 0, 0, 0, 0, 0, None, None),
    )(gt_boxes, gt_cls, gt_mask, pred_boxes, cls_logits, obj_logits,
      centers, strides)
    return SimOTAResult(fg, mgt, miou, fg.sum())
