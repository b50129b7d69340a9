"""Supervised YOLOv5 loss (ComputeLoss) — dense-masked, jittable.

Parity with reference models/loss/loss.py:93-215 `ComputeLoss.default_loss`:
  - CIoU box loss, mean over positives (loss.py:165-172)
  - objectness BCE against iou-valued soft targets with per-scale balance
    [4.0, 1.0, 0.4] (loss.py:117, 174-196)
  - class BCE with smooth-eps pos/neg targets (loss.py:182-186)
  - weight scaling: box*3/nl, cls*nc/80*3/nl, obj as-is (loss.py:122-124)
  - optional focal wrapping when fl_gamma > 0 (loss.py:112-114)
  - returns (loss * batch_size, {box, obj, cls, loss}) (loss.py:208-212)

Shape deltas vs reference (mathematically equivalent):
  - predictions are NHWC-style (B, ny, nx, na, no); positives are the dense
    (B, K) candidate lattice of `assign_all_scales` with a validity mask
  - tobj scatter uses max-reduction on duplicate cells (the reference's
    last-write-wins order is arbitrary; max is deterministic and matches its
    `sort_obj_iou` intent, loss.py:176-180)
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..assigners.yolo_anchor import DenseAssignment, assign_all_scales
from ..ops.boxes import bbox_iou
from .common import (
    bce_with_logits,
    focal_bce_with_logits,
    landmarks_loss,
    masked_mean,
    smooth_bce,
)


@dataclasses.dataclass(frozen=True)
class YoloV5LossConfig:
    nc: int
    nl: int = 3
    anchor_t: float = 4.0
    box_w: float = 0.05
    obj_w: float = 1.0
    cls_w: float = 0.5
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    fl_gamma: float = 0.0
    label_smoothing: float = 0.0
    single_targets: bool = False
    gr: float = 1.0
    balance: Tuple[float, ...] = (4.0, 1.0, 0.4)
    num_keypoints: int = 0
    kp_w: float = 10.0

    @classmethod
    def from_cfg(cls, cfg, nl: int = 3):
        nc = 1 if cfg.single_cls else cfg.Dataset.nc
        balance = (4.0, 1.0, 0.4) if nl == 3 else (4.0, 1.0, 0.25, 0.06, 0.02)[:nl]
        return cls(
            nc=nc,
            nl=nl,
            anchor_t=float(cfg.Loss.anchor_t),
            box_w=float(cfg.Loss.box) * 3.0 / nl,
            obj_w=float(cfg.Loss.obj),
            cls_w=float(cfg.Loss.cls) * nc / 80.0 * 3.0 / nl,
            cls_pw=float(cfg.Loss.cls_pw),
            obj_pw=float(cfg.Loss.obj_pw),
            fl_gamma=float(cfg.Loss.fl_gamma),
            label_smoothing=float(cfg.Loss.label_smoothing),
            single_targets=bool(cfg.Loss.single_targets),
            num_keypoints=int(cfg.Dataset.np),
            kp_w=float(cfg.Loss.kp_loss_weight),
        )


def _bce(logits, targets, pw, gamma):
    if gamma > 0:
        return focal_bce_with_logits(logits, targets, gamma, pos_weight=pw)
    return bce_with_logits(logits, targets, pw)


def decode_pred_boxes(ps: jnp.ndarray, anchor_wh: jnp.ndarray) -> jnp.ndarray:
    """Positive-sample box decode in grid units (reference loss.py:166-169)."""
    pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
    pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 * anchor_wh
    return jnp.concatenate([pxy, pwh], axis=-1)


def _gather_positives(p: jnp.ndarray, asn: DenseAssignment) -> jnp.ndarray:
    """Gather per-candidate predictions: p (B, ny, nx, na, no) indexed by the
    flattened cell ids (B, K) -> (B, K, no)."""
    b, ny, nx, na, no = p.shape
    p_flat = p.reshape(b, ny * nx * na, no)
    return jnp.take_along_axis(p_flat, asn.flat_cell[..., None], axis=1)


def compute_loss(
    preds: Sequence[jnp.ndarray],
    labels: jnp.ndarray,
    label_mask: jnp.ndarray,
    anchors_grid: np.ndarray,
    lc: YoloV5LossConfig,
):
    """Dense ComputeLoss.

    preds: per-scale raw maps (B, ny, nx, na, no), f32 recommended.
    labels: (B, M, 5) [cls, cx, cy, w, h] normalized; label_mask: (B, M).
    anchors_grid: (nl, na, 2) grid-unit anchors.
    Returns (loss * B, dict) mirroring the reference contract.
    """
    grid_shapes = [(p.shape[1], p.shape[2]) for p in preds]
    assignments = assign_all_scales(
        labels, label_mask, grid_shapes, anchors_grid, lc.anchor_t,
        lc.single_targets,
    )
    cp, cn = smooth_bce(lc.label_smoothing)

    lbox = 0.0
    lobj = 0.0
    lcls = 0.0
    lmark = 0.0
    npk = lc.num_keypoints
    for i, (p, asn) in enumerate(zip(preds, assignments)):
        p = p.astype(jnp.float32)
        b, ny, nx, na, no = p.shape
        ps = _gather_positives(p, asn)  # (B, K, no)

        # box: CIoU against (txy, twh), masked mean over positives
        pbox = decode_pred_boxes(ps, asn.anchor_wh)
        tbox = jnp.concatenate([asn.txy, asn.twh], axis=-1)
        iou = bbox_iou(pbox, tbox, x1y1x2y2=False, CIoU=True)  # (B, K)
        lbox = lbox + masked_mean(1.0 - iou, asn.valid)

        # objectness: scatter iou-valued soft targets into the full map
        score_iou = jax.lax.stop_gradient(jnp.clip(iou, 0.0, None))
        tobj_val = (1.0 - lc.gr) + lc.gr * score_iou
        flat = jnp.where(asn.valid, asn.flat_cell, ny * nx * na)  # OOB drop
        tobj = jnp.zeros((b, ny * nx * na), jnp.float32)
        tobj = jax.vmap(lambda t, f, v: t.at[f].max(v, mode="drop"))(
            tobj, flat, tobj_val
        )
        obj_logits = p[..., 4].reshape(b, ny * nx * na)
        obji = jnp.mean(_bce(obj_logits, tobj, lc.obj_pw, lc.fl_gamma))
        lobj = lobj + obji * lc.balance[i]

        # keypoints: wing loss on anchor-scaled offsets vs cell-relative
        # targets (reference loss.py:175-179; targets ride in asn.extra as
        # normalized coords * grid - cell, see assigner keypoint docs)
        if npk > 0:
            ny_, nx_ = p.shape[1], p.shape[2]
            gain = jnp.array([nx_, ny_], jnp.float32)
            kp_t = asn.extra[..., : 2 * npk].reshape(
                asn.extra.shape[0], asn.extra.shape[1], npk, 2
            ) * gain
            # cell origin = gxy - txy (gxy = txy + cell index)
            # recover cell index from flat_cell
            na_ = p.shape[3]
            cell_flat = asn.flat_cell // na_
            gi = (cell_flat % nx_).astype(jnp.float32)
            gj = (cell_flat // nx_).astype(jnp.float32)
            cell_xy = jnp.stack([gi, gj], -1)[:, :, None, :]
            kp_rel = kp_t - cell_xy
            visible = (asn.extra[..., : 2 * npk].reshape(kp_t.shape) > 0)
            visible = visible & asn.valid[:, :, None, None]
            pk = ps[..., 5 + lc.nc :].reshape(kp_t.shape)
            pk = pk * asn.anchor_wh[:, :, None, :]
            lmark = lmark + landmarks_loss(pk, kp_rel, visible)

        # classification (only when multi-class)
        if lc.nc > 1:
            tcls_onehot = jax.nn.one_hot(asn.tcls, lc.nc, dtype=jnp.float32)
            t = tcls_onehot * cp + (1.0 - tcls_onehot) * cn
            cls_loss = _bce(ps[..., 5 : 5 + lc.nc], t, lc.cls_pw, lc.fl_gamma)
            # mean over classes then masked mean over positives = torch
            # BCE(reduction='mean') over the ragged (n, nc) matrix
            lcls = lcls + masked_mean(cls_loss.mean(-1), asn.valid)

    bs = preds[0].shape[0]
    lbox = lbox * lc.box_w
    lobj = lobj * lc.obj_w
    lcls = lcls * lc.cls_w
    parts = {"box": lbox, "obj": lobj, "cls": lcls}
    total = lbox + lobj + lcls
    if lc.num_keypoints > 0:
        lmark = lmark * lc.kp_w
        parts["kp"] = lmark
        total = total + lmark
    loss = total * bs
    parts["loss"] = loss
    return loss, parts
