"""YOLOX loss (ComputeFastXLoss), dense-masked.

Parity with reference models/loss/yolox_loss.py:20-179:
  - decode raw maps to absolute boxes: xy = (reg + grid)*stride,
    wh = exp(reg)*stride (:140-151); GT normalized xywh scaled by the input
    resolution (:126-132)
  - SimOTA assignment on stop-gradient decodes (:70-77)
  - losses, each .sum()/num_fg (:103-118):
      iou: IOUloss (giou default; the reference's OWN nonstandard variant,
           see _iou_loss) on fg pairs * box_loss_weight(5)
      obj: BCE over ALL anchors vs fg mask * obj_loss_weight(1)
      cls: BCE on fg vs onehot * matched-IoU * cls_loss_weight(1)
      l1: |reg_raw - t| — NOTE the reference ALWAYS adds this term
          (yolox_loss.py:107,122: self.use_l1 is stored but never checked in
          __call__); we keep it behind use_l1 as upstream YOLOX intends and
          parity-test with use_l1=True
  - iou_obj option: obj target becomes the matched IoU (:166-176)

External parity: tests/test_reference_parity_anchor_free.py runs the ACTUAL
reference ComputeFastXLoss/SimOTAAssigner on identical inputs.
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


def _iou_loss(pred: jnp.ndarray, target: jnp.ndarray, iou_type: str):
    """Elementwise IOUloss on xywh boxes — exact rewrite of the reference's
    own variant (models/loss/loss.py:726-859), which differs from the
    utils/metrics.py bbox_iou family: 'iou' returns 1 - iou^2 (:759), 'giou'
    penalizes (area_c - INTERSECTION)/area_c and clamps to [-1, 1] (:771-773),
    'diou'/'ciou' clamp likewise (:790, :815)."""
    p_tl = pred[..., :2] - pred[..., 2:4] / 2
    p_br = pred[..., :2] + pred[..., 2:4] / 2
    t_tl = target[..., :2] - target[..., 2:4] / 2
    t_br = target[..., :2] + target[..., 2:4] / 2
    tl = jnp.maximum(p_tl, t_tl)
    br = jnp.minimum(p_br, t_br)
    area_p = jnp.prod(pred[..., 2:4], -1)
    area_g = jnp.prod(target[..., 2:4], -1)
    area_i = jnp.prod(jnp.clip(br - tl, 0, None), -1)
    iou = area_i / (area_p + area_g - area_i + 1e-16)

    if iou_type == "iou":
        return 1.0 - iou**2
    c_tl = jnp.minimum(p_tl, t_tl)
    c_br = jnp.maximum(p_br, t_br)
    if iou_type == "giou":
        area_c = jnp.prod(c_br - c_tl, -1)
        giou = iou - (area_c - area_i) / jnp.clip(area_c, 1e-16, None)
        return 1.0 - jnp.clip(giou, -1.0, 1.0)
    if iou_type in ("diou", "ciou"):
        convex_dis = ((c_br[..., 0] - c_tl[..., 0]) ** 2
                      + (c_br[..., 1] - c_tl[..., 1]) ** 2 + 1e-7)
        center_dis = ((pred[..., 0] - target[..., 0]) ** 2
                      + (pred[..., 1] - target[..., 1]) ** 2)
        if iou_type == "diou":
            diou = iou - center_dis / convex_dis
            return 1.0 - jnp.clip(diou, -1.0, 1.0)
        import math

        v = (4 / math.pi**2) * (
            jnp.arctan(target[..., 2] / jnp.clip(target[..., 3], 1e-7, None))
            - jnp.arctan(pred[..., 2] / jnp.clip(pred[..., 3], 1e-7, None))
        ) ** 2
        alpha = jax.lax.stop_gradient(v / ((1 + 1e-7) - iou + v))
        ciou = iou - (center_dis / convex_dis + alpha * v)
        return 1.0 - jnp.clip(ciou, -1.0, 1.0)
    if iou_type == "siou":
        loss = 1.0 - bbox_iou(pred, target, x1y1x2y2=False, SIoU=True)
        return loss
    raise NotImplementedError(iou_type)


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

    iou_loss = _iou_loss(boxes, reg_t, lc.iou_type)
    loss_iou = jnp.sum(iou_loss * fg) / num_fg

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
