"""YOLOX loss (ComputeFastXLoss), dense-masked.

Parity with reference models/loss/yolox_loss.py:20-179:
  - decode raw maps to absolute boxes: xy = (reg + grid)*stride,
    wh = exp(reg)*stride (:140-151); GT normalized xywh scaled by the input
    resolution (:126-132)
  - SimOTA assignment on stop-gradient decodes (:70-77)
  - losses, each .sum()/num_fg (:103-118):
      iou: IOUloss (giou default) on fg pairs * box_loss_weight(5)
      obj: BCE over ALL anchors vs fg mask * obj_loss_weight(1)
      cls: BCE on fg vs onehot * matched-IoU * cls_loss_weight(1)
      l1 (when use_l1, enabled for the last no_aug_epochs): |reg_raw - t|
  - iou_obj option: obj target becomes the matched IoU (:166-176)
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..assigners.simota import simota_assign
from ..ops.boxes import bbox_iou
from .common import bce_with_logits


@dataclasses.dataclass(frozen=True)
class YoloXLossConfig:
    nc: int
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0)
    iou_type: str = "giou"
    reg_weight: float = 5.0
    obj_weight: float = 1.0
    cls_weight: float = 1.0
    iou_obj: bool = False
    use_l1: bool = False
    top_k: int = 10

    @classmethod
    def from_cfg(cls, cfg, use_l1: bool = False):
        return cls(
            nc=int(cfg.Dataset.nc),
            strides=tuple(float(s) for s in cfg.Model.Head.strides),
            iou_type=str(cfg.Loss.iou_type),
            reg_weight=float(cfg.Loss.box_loss_weight),
            obj_weight=float(cfg.Loss.obj_loss_weight),
            cls_weight=float(cfg.Loss.cls_loss_weight),
            iou_obj=bool(cfg.Loss.iou_obj),
            use_l1=use_l1,
        )


def _grids(preds: Sequence[jnp.ndarray], strides):
    """Anchor centers (N, 2) px, per-anchor stride (N,), grid offsets (N, 2)."""
    centers, strd, shifts = [], [], []
    for p, s in zip(preds, strides):
        ny, nx = p.shape[1], p.shape[2]
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0).reshape(-1)
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1).reshape(-1)
        shifts.append(jnp.stack([gx, gy], -1))
        centers.append((jnp.stack([gx, gy], -1) + 0.5) * s)
        strd.append(jnp.full((ny * nx,), s, jnp.float32))
    return (
        jnp.concatenate(centers, 0),
        jnp.concatenate(strd, 0),
        jnp.concatenate(shifts, 0),
    )


def compute_yolox_loss(
    preds: Sequence[jnp.ndarray],  # (B, ny, nx, 1, 5+nc) raw [xywh, obj, cls]
    labels: jnp.ndarray,           # (B, M, 5) [cls, xywhn]
    label_mask: jnp.ndarray,       # (B, M)
    img_size: int,
    lc: YoloXLossConfig,
):
    """Returns (loss, {iou, obj, cls[, l1], loss})."""
    b = preds[0].shape[0]
    nc = lc.nc
    flat = [
        p.astype(jnp.float32).reshape(b, -1, 5 + nc) for p in preds
    ]
    raw = jnp.concatenate(flat, axis=1)  # (B, N, 5+nc)
    centers, strides, shifts = _grids(preds, lc.strides)

    xy = (raw[..., 0:2] + shifts[None]) * strides[None, :, None]
    wh = jnp.exp(raw[..., 2:4]) * strides[None, :, None]
    boxes = jnp.concatenate([xy, wh], axis=-1)  # absolute xywh
    obj_logits = raw[..., 4:5]
    cls_logits = raw[..., 5:]

    gt_cls = labels[..., 0].astype(jnp.int32)
    gt_boxes = labels[..., 1:5] * float(img_size)  # normalized -> pixels

    asn = simota_assign(
        gt_boxes, gt_cls, label_mask,
        jax.lax.stop_gradient(boxes),
        jax.lax.stop_gradient(cls_logits),
        jax.lax.stop_gradient(obj_logits),
        centers, strides,
        nc=nc, top_k=lc.top_k,
    )
    num_fg = jnp.maximum(asn.num_fg.astype(jnp.float32), 1.0)
    fg = asn.fg_mask

    # gather matched GT per anchor
    reg_t = jnp.take_along_axis(
        gt_boxes, asn.matched_gt[..., None], axis=1
    )  # (B, N, 4)
    cls_t_idx = jnp.take_along_axis(gt_cls, asn.matched_gt, axis=1)
    cls_t = jax.nn.one_hot(cls_t_idx, nc)
    if lc.iou_obj:
        obj_t = asn.matched_iou
    else:
        cls_t = cls_t * asn.matched_iou[..., None]
        obj_t = fg.astype(jnp.float32)

    kw = {"giou": dict(GIoU=True), "diou": dict(DIoU=True),
          "ciou": dict(CIoU=True), "siou": dict(SIoU=True),
          "iou": {}}[lc.iou_type]
    iou = bbox_iou(boxes, reg_t, x1y1x2y2=False, **kw)
    loss_iou = jnp.sum((1.0 - iou) * fg) / num_fg

    loss_obj = jnp.sum(bce_with_logits(obj_logits[..., 0], obj_t)) / num_fg
    loss_cls = jnp.sum(
        bce_with_logits(cls_logits, cls_t) * fg[..., None]
    ) / num_fg

    total = (
        lc.reg_weight * loss_iou
        + lc.obj_weight * loss_obj
        + lc.cls_weight * loss_cls
    )
    parts = {
        "iou": lc.reg_weight * loss_iou,
        "obj": lc.obj_weight * loss_obj,
        "cls": lc.cls_weight * loss_cls,
    }
    if lc.use_l1:
        # l1 target in grid units (reference get_l1_target)
        t_xy = reg_t[..., 0:2] / strides[None, :, None] - shifts[None]
        t_wh = jnp.log(reg_t[..., 2:4] / strides[None, :, None] + 1e-8)
        l1 = jnp.abs(raw[..., 0:4] - jnp.concatenate([t_xy, t_wh], -1))
        loss_l1 = jnp.sum(l1 * fg[..., None]) / num_fg
        total = total + loss_l1
        parts["l1"] = loss_l1
    parts["loss"] = total
    return total, parts
