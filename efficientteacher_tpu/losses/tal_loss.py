"""TAL loss for the YOLOv6/YOLOv8 heads: cls BCE + IoU + DFL.

The reference ships a broken ComputeTalLoss (missing yolo_atss_assigner /
gfocal_loss imports, models/loss/tal_loss.py:11-14; the trainer also refuses
to run it, trainer.py:320-327 — SURVEY.md §2.11). This is the working
reconstruction from the pieces that ARE present (TaskAlignedAssigner,
dist2bbox/bbox2dist in models/module/nanodet_utils.py:92-133, DFL projection
in yolov6_head.py:94-96) plus the standard TAL loss formulation those pieces
implement:

  - assignment: TaskAlignedAssigner (alpha 1, beta 6, topk cfg.Loss.top_k)
  - cls: BCE(cls_logits, target_scores), sum / max(sum(target_scores), 1)
  - box: (1 - GIoU) weighted by the anchor's target-score sum, same norm
  - dfl: distribution focal loss over the ltrb bins in stride units, same
    norm, weight cfg.Loss.dfl_loss_weight; box weight cfg.Loss.box_loss_weight
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..assigners.tal import tal_assign
from ..ops.boxes import bbox_iou
from .common import bce_with_logits


@dataclasses.dataclass(frozen=True)
class TALLossConfig:
    nc: int
    reg_max: int = 16
    use_dfl: bool = True
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0)
    iou_type: str = "giou"
    box_weight: float = 2.5
    dfl_weight: float = 0.5
    cls_weight: float = 1.0
    top_k: int = 13

    @classmethod
    def from_cfg(cls, cfg):
        return cls(
            nc=int(cfg.Dataset.nc),
            reg_max=int(cfg.Loss.reg_max),
            use_dfl=bool(cfg.Loss.use_dfl),
            strides=tuple(float(s) for s in cfg.Model.Head.strides),
            iou_type=str(cfg.Loss.iou_type),
            box_weight=float(cfg.Loss.box_loss_weight),
            dfl_weight=float(cfg.Loss.dfl_loss_weight),
            cls_weight=float(cfg.Loss.qfl_loss_weight),
            top_k=int(cfg.Loss.top_k),
        )


def _anchor_points(preds, strides, offset=0.5):
    pts, strd = [], []
    for p, s in zip(preds, strides):
        ny, nx = p.shape[1], p.shape[2]
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0).reshape(-1)
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1).reshape(-1)
        pts.append(jnp.stack([(gx + offset) * s, (gy + offset) * s], -1))
        strd.append(jnp.full((ny * nx,), s, jnp.float32))
    return jnp.concatenate(pts, 0), jnp.concatenate(strd, 0)


def dfl_project(reg_dist: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """(..., 4*(reg_max+1)) bin logits -> (..., 4) expected ltrb distances
    (the proj_conv of yolov6_head.py:94-96)."""
    shape = reg_dist.shape[:-1]
    bins = reg_dist.reshape(shape + (4, reg_max + 1))
    probs = jax.nn.softmax(bins, axis=-1)
    proj = jnp.arange(reg_max + 1, dtype=jnp.float32)
    return (probs * proj).sum(-1)


def _dfl_loss(reg_dist, target_ltrb, reg_max):
    """Distribution focal loss: CE against the two adjacent integer bins."""
    shape = reg_dist.shape[:-1]
    bins = reg_dist.reshape(shape + (4, reg_max + 1))
    logp = jax.nn.log_softmax(bins, axis=-1)
    t = jnp.clip(target_ltrb, 0.0, reg_max - 0.01)
    tl = jnp.floor(t).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - t
    wr = 1.0 - wl
    lp_l = jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    lp_r = jnp.take_along_axis(logp, tr[..., None], axis=-1)[..., 0]
    return -(wl * lp_l + wr * lp_r).mean(-1)  # mean over ltrb


def compute_tal_loss(
    preds: Sequence[jnp.ndarray],  # (B, ny, nx, 1, 4*(reg_max+1)+nc)
    labels: jnp.ndarray,           # (B, M, 5) [cls, xywhn]
    label_mask: jnp.ndarray,
    img_size: int,
    lc: TALLossConfig,
):
    b = preds[0].shape[0]
    nbins = 4 * (lc.reg_max + 1)
    flat = [p.astype(jnp.float32).reshape(b, -1, nbins + lc.nc) for p in preds]
    raw = jnp.concatenate(flat, axis=1)
    reg_dist = raw[..., :nbins]
    cls_logits = raw[..., nbins:]

    anc, strides = _anchor_points(preds, lc.strides)
    ltrb = dfl_project(reg_dist, lc.reg_max) if lc.use_dfl \
        else reg_dist[..., :4]
    ltrb_px = ltrb * strides[None, :, None]
    pred_xyxy = jnp.concatenate(
        [anc[None] - ltrb_px[..., 0:2], anc[None] + ltrb_px[..., 2:4]],
        axis=-1,
    )

    gt_cls = labels[..., 0].astype(jnp.int32)
    cxy = labels[..., 1:3] * float(img_size)
    wh = labels[..., 3:5] * float(img_size)
    gt_xyxy = jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)

    asn = tal_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(cls_logits)),
        jax.lax.stop_gradient(pred_xyxy),
        anc, gt_cls, gt_xyxy, label_mask,
        nc=lc.nc, top_k=lc.top_k,
    )
    score_sum = jnp.maximum(asn.target_scores.sum(), 1.0)
    fg = asn.fg_mask

    loss_cls = bce_with_logits(cls_logits, asn.target_scores).sum() / score_sum

    kw = {"giou": dict(GIoU=True), "diou": dict(DIoU=True),
          "ciou": dict(CIoU=True), "siou": dict(SIoU=True),
          "iou": {}}[lc.iou_type]
    iou = bbox_iou(pred_xyxy, asn.target_bboxes, **kw)
    w = asn.target_scores.sum(-1)
    loss_box = jnp.sum((1.0 - iou) * w * fg) / score_sum

    parts = {}
    total = lc.cls_weight * loss_cls + lc.box_weight * loss_box
    if lc.use_dfl:
        t_ltrb = jnp.concatenate(
            [anc[None] - asn.target_bboxes[..., 0:2],
             asn.target_bboxes[..., 2:4] - anc[None]],
            axis=-1,
        ) / strides[None, :, None]
        ldfl = jnp.sum(_dfl_loss(reg_dist, t_ltrb, lc.reg_max) * w * fg) \
            / score_sum
        total = total + lc.dfl_weight * ldfl
        parts["dfl"] = lc.dfl_weight * ldfl
    parts.update({
        "cls": lc.cls_weight * loss_cls,
        "box": lc.box_weight * loss_box,
        "loss": total,
    })
    return total, parts
