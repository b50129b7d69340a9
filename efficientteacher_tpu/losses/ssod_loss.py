"""SSOD Pseudo Label Assigner loss (ComputeStudentMatchLoss), dense-masked.

Parity with reference models/loss/ssod/ssod_loss.py:25-299:
  - select_targets (:130-192): per-class threshold split of teacher labels
    [cls, xywh, conf, obj_conf, cls_conf]:
      conf >= thr_high[cls]                      -> reliable
      thr_low[cls] <= conf < thr_high[cls]       -> uncertain
        and within uncertain: obj_conf >= .99    -> uncertain-obj (box loss)
                              cls_conf >= .99    -> uncertain-cls (cls loss)
  - default_loss (:213-296): reliable targets get full CIoU + iou-soft obj +
    cls BCE; uncertain targets write their score into tobj (or -1 ignore
    when ignore_obj), obj BCE masked to tobj >= 0 cells; optional uncertain
    box/cls terms behind pseudo_label_with_bbox/cls
  - weights: box/obj from SSOD.{box,obj}_loss_weight unscaled, cls scaled
    nc/80*3/nl (ssod_loss.py:50-56); gr = 1.0
  - assignment uses single-center-cell when not uncertain_aug
    (ssod_loss.py:66-68)

Dense form: one masked assignment over all pseudo labels (score columns ride
through the lattice as `extra`), category masks applied per candidate slot —
replacing the reference's per-box host Python loop (the SURVEY §3.2 hot-loop
bottleneck).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..assigners.yolo_anchor import assign_all_scales
from ..ops.boxes import bbox_iou
from .common import bce_with_logits, focal_bce_with_logits, masked_mean, smooth_bce
from .yolov5_loss import _gather_positives, decode_pred_boxes


@dataclasses.dataclass(frozen=True)
class SSODLossConfig:
    nc: int
    nl: int = 3
    anchor_t: float = 4.0
    box_w: float = 0.05
    obj_w: float = 1.0
    cls_w: float = 0.5
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    focal_loss: float = 0.0
    label_smoothing: float = 0.0
    uncertain_aug: bool = False
    ignore_obj: bool = False
    pseudo_label_with_obj: bool = False
    pseudo_label_with_bbox: bool = False
    pseudo_label_with_cls: bool = False
    gr: float = 1.0
    balance: Tuple[float, ...] = (4.0, 1.0, 0.4)

    @classmethod
    def from_cfg(cls, cfg, nl: int = 3):
        nc = cfg.Dataset.nc
        return cls(
            nc=nc,
            nl=nl,
            anchor_t=float(cfg.Loss.anchor_t),
            box_w=float(cfg.SSOD.box_loss_weight),
            obj_w=float(cfg.SSOD.obj_loss_weight),
            cls_w=float(cfg.SSOD.cls_loss_weight) * nc / 80.0 * 3.0 / nl,
            cls_pw=float(cfg.Loss.cls_pw),
            obj_pw=float(cfg.Loss.obj_pw),
            focal_loss=float(cfg.SSOD.focal_loss),
            label_smoothing=float(cfg.Loss.label_smoothing),
            uncertain_aug=bool(cfg.SSOD.uncertain_aug),
            ignore_obj=bool(cfg.SSOD.ignore_obj),
            pseudo_label_with_obj=bool(cfg.SSOD.pseudo_label_with_obj),
            pseudo_label_with_bbox=bool(cfg.SSOD.pseudo_label_with_bbox),
            pseudo_label_with_cls=bool(cfg.SSOD.pseudo_label_with_cls),
        )


def compute_ssod_loss(
    preds: Sequence[jnp.ndarray],
    pseudo_labels: jnp.ndarray,  # (B, Mp, 8) [cls,xywhn,conf,obj_conf,cls_conf]
    pseudo_mask: jnp.ndarray,    # (B, Mp)
    thr_high: jnp.ndarray,       # (nc,) per-class high thresholds
    thr_low: jnp.ndarray,        # (nc,)
    anchors_grid: np.ndarray,
    lc: SSODLossConfig,
):
    """Returns (loss * B, {ss_box, ss_obj, ss_cls})."""
    cls_idx = pseudo_labels[..., 0].astype(jnp.int32)
    conf = pseudo_labels[..., 5]
    obj_conf = pseudo_labels[..., 6]
    cls_conf = pseudo_labels[..., 7]

    th = thr_high[cls_idx]
    tl = thr_low[cls_idx]
    reliable = pseudo_mask & (conf >= th)
    uncertain = pseudo_mask & ~reliable & (conf >= tl)
    # uncertain-obj/cls subsets are only collected under
    # pseudo_label_with_obj (reference select_targets, ssod_loss.py:157-166)
    if lc.pseudo_label_with_obj:
        uc_obj = uncertain & (obj_conf >= 0.99)
        uc_cls = uncertain & (cls_conf >= 0.99)
    else:
        uc_obj = jnp.zeros_like(uncertain)
        uc_cls = jnp.zeros_like(uncertain)
    uc_score = jnp.where(lc.pseudo_label_with_obj, obj_conf, conf)

    # single dense assignment; score/category data rides in `extra`
    extra = jnp.stack(
        [
            uc_score,
            reliable.astype(jnp.float32),
            uncertain.astype(jnp.float32),
            uc_obj.astype(jnp.float32),
            uc_cls.astype(jnp.float32),
        ],
        axis=-1,
    )
    labels_ext = jnp.concatenate([pseudo_labels[..., :5], extra], axis=-1)
    grid_shapes = [(p.shape[1], p.shape[2]) for p in preds]
    assignments = assign_all_scales(
        labels_ext, pseudo_mask, grid_shapes, anchors_grid, lc.anchor_t,
        single_targets=not lc.uncertain_aug,
    )
    cp, cn = smooth_bce(lc.label_smoothing)

    def cls_bce(logits, t):
        return bce_with_logits(logits, t, lc.cls_pw)

    def obj_bce(logits, t):
        if lc.focal_loss > 0:
            return focal_bce_with_logits(logits, t, 1.5, pos_weight=lc.obj_pw)
        return bce_with_logits(logits, t, lc.obj_pw)

    lbox = 0.0
    lobj = 0.0
    lcls = 0.0
    for i, (p, asn) in enumerate(zip(preds, assignments)):
        p = p.astype(jnp.float32)
        b, ny, nx, na, no = p.shape
        ncell = ny * nx * na
        ps = _gather_positives(p, asn)  # (B, K, no)
        k_score = asn.extra[..., 0]
        k_rel = asn.valid & (asn.extra[..., 1] > 0.5)
        k_uc = asn.valid & (asn.extra[..., 2] > 0.5)
        k_uc_obj = asn.valid & (asn.extra[..., 3] > 0.5)
        k_uc_cls = asn.valid & (asn.extra[..., 4] > 0.5)

        pbox = decode_pred_boxes(ps, asn.anchor_wh)
        tbox = jnp.concatenate([asn.txy, asn.twh], axis=-1)
        iou = bbox_iou(pbox, tbox, x1y1x2y2=False, CIoU=True)  # (B, K)

        # reliable: box + cls + iou-soft obj targets
        lbox = lbox + masked_mean(1.0 - iou, k_rel)
        tcls_onehot = jax.nn.one_hot(asn.tcls, lc.nc, dtype=jnp.float32)
        tmat = tcls_onehot * cp + (1.0 - tcls_onehot) * cn
        if lc.nc > 1:
            ce = cls_bce(ps[..., 5 : 5 + lc.nc], tmat).mean(-1)
            lcls = lcls + masked_mean(ce, k_rel)

        if lc.pseudo_label_with_bbox:
            lbox = lbox + masked_mean(1.0 - iou, k_uc_obj)
        if lc.pseudo_label_with_cls and lc.nc > 1:
            ce_uc = cls_bce(ps[..., 5 : 5 + lc.nc], tmat).mean(-1)
            lcls = lcls + masked_mean(ce_uc, k_uc_cls)

        # tobj map: reliable -> max(iou); uncertain overwrites with score/-1
        score_iou = jax.lax.stop_gradient(jnp.clip(iou, 0.0, None))
        rel_val = (1.0 - lc.gr) + lc.gr * score_iou
        flat_rel = jnp.where(k_rel, asn.flat_cell, ncell)
        tobj = jnp.zeros((b, ncell), jnp.float32)
        tobj = jax.vmap(lambda t, f, v: t.at[f].max(v, mode="drop"))(
            tobj, flat_rel, rel_val
        )
        # uncertain cells override (reference scatters uc after reliable,
        # ssod_loss.py:240-248)
        flat_uc = jnp.where(k_uc, asn.flat_cell, ncell)
        uc_flag = jnp.zeros((b, ncell), bool)
        uc_flag = jax.vmap(lambda t, f: t.at[f].set(True, mode="drop"))(
            uc_flag, flat_uc
        )
        if lc.ignore_obj:
            tobj = jnp.where(uc_flag, -1.0, tobj)  # ignore region
        else:
            uc_map = jnp.zeros((b, ncell), jnp.float32)
            uc_map = jax.vmap(lambda t, f, v: t.at[f].max(v, mode="drop"))(
                uc_map, flat_uc, jax.lax.stop_gradient(k_score)
            )
            tobj = jnp.where(uc_flag, uc_map, tobj)

        obj_logits = p[..., 4].reshape(b, ncell)
        valid_cells = tobj >= 0.0
        obji = masked_mean(obj_bce(obj_logits, jnp.clip(tobj, 0.0, None)),
                           valid_cells)
        lobj = lobj + obji * lc.balance[i]

    bs = preds[0].shape[0]
    lbox = lbox * lc.box_w
    lobj = lobj * lc.obj_w
    lcls = lcls * lc.cls_w
    loss = (lbox + lobj + lcls) * bs
    return loss, {"ss_box": lbox, "ss_obj": lobj, "ss_cls": lcls}


def compute_ssod_ota_loss(
    preds: Sequence[jnp.ndarray],
    pseudo_labels: jnp.ndarray,  # (B, Mp, 8) [cls,xywhn,conf,obj_conf,cls_conf]
    pseudo_mask: jnp.ndarray,    # (B, Mp)
    thr_high: jnp.ndarray,
    thr_low: jnp.ndarray,
    anchors_grid: np.ndarray,
    strides: Sequence[float],
    img_size: int,
    lc: SSODLossConfig,
    top_k: int = 10,
):
    """SSOD OTA branch (reference ssod_loss.py:296-345 ota_loss with
    targets.shape[1] > 6): reliable and uncertain pseudo labels each get an
    independent SimOTA dynamic-k assignment over the find-3-positive
    candidate lattice; reliable matches take box/cls + iou-soft obj targets,
    uncertain matches write their pseudo score into tobj (or -1 when
    ignore_obj) and the obj BCE is masked to tobj >= 0."""
    from .yolov5_ota_loss import (ota_box_targets, ota_candidates,
                                  simota_match)

    cls_idx = pseudo_labels[..., 0].astype(jnp.int32)
    conf = pseudo_labels[..., 5]
    obj_conf = pseudo_labels[..., 6]
    reliable = pseudo_mask & (conf >= thr_high[cls_idx])
    uncertain = pseudo_mask & ~reliable & (conf >= thr_low[cls_idx])
    uc_score = jnp.where(lc.pseudo_label_with_obj, obj_conf, conf)

    # one candidate lattice over all pseudo labels; subset flags ride as
    # extra columns so each slot knows its source target's category
    extra = jnp.stack(
        [uc_score, reliable.astype(jnp.float32),
         uncertain.astype(jnp.float32)],
        axis=-1,
    )
    labels_ext = jnp.concatenate([pseudo_labels[..., :5], extra], axis=-1)
    grid_shapes = [(p.shape[1], p.shape[2]) for p in preds]
    assignments = assign_all_scales(
        labels_ext, pseudo_mask, grid_shapes, anchors_grid, lc.anchor_t,
        single_targets=not lc.uncertain_aug,
    )
    cand = ota_candidates(preds, assignments, strides)
    slot_rel = jnp.concatenate(
        [a.valid & (a.extra[..., 1] > 0.5) for a in assignments], axis=1
    )
    slot_uc = jnp.concatenate(
        [a.valid & (a.extra[..., 2] > 0.5) for a in assignments], axis=1
    )

    labels5 = pseudo_labels[..., :5]
    gt_cls = cls_idx
    gt_box_px = labels5[..., 1:5] * float(img_size)
    fg_r, match_r = simota_match(gt_box_px, gt_cls, reliable, cand,
                                 slot_rel, lc.nc, top_k)
    fg_u, match_u = simota_match(gt_box_px, gt_cls, uncertain, cand,
                                 slot_uc, lc.nc, top_k)

    cp, cn = smooth_bce(lc.label_smoothing)

    def obj_bce(logits, t):
        if lc.focal_loss > 0:
            return focal_bce_with_logits(logits, t, 1.5, pos_weight=lc.obj_pw)
        return bce_with_logits(logits, t, lc.obj_pw)

    lbox = 0.0
    lobj = 0.0
    lcls = 0.0
    offset = 0
    for i, (p, asn) in enumerate(zip(preds, assignments)):
        p = p.astype(jnp.float32)
        bsz, ny, nx, na, no = p.shape
        ncell = ny * nx * na
        k_i = cand.k_sizes[i]
        fg_ri = jax.lax.dynamic_slice_in_dim(fg_r, offset, k_i, axis=1)
        mt_ri = jax.lax.dynamic_slice_in_dim(match_r, offset, k_i, axis=1)
        fg_ui = jax.lax.dynamic_slice_in_dim(fg_u, offset, k_i, axis=1)
        mt_ui = jax.lax.dynamic_slice_in_dim(match_u, offset, k_i, axis=1)
        offset += k_i

        # reliable: CIoU box + cls against the MATCHED pseudo label
        t_rel = ota_box_targets(labels5, mt_ri, asn, ny, nx, na)
        pbox = cand.pbox_grid_all[i]
        iou = bbox_iou(pbox, t_rel, x1y1x2y2=False, CIoU=True)
        lbox = lbox + masked_mean(1.0 - iou, fg_ri)
        if lc.nc > 1:
            mcls = jnp.take_along_axis(gt_cls, mt_ri, axis=1)
            onehot = jax.nn.one_hot(mcls, lc.nc)
            t = onehot * cp + (1.0 - onehot) * cn
            ce = bce_with_logits(cand.ps_all[i][..., 5 : 5 + lc.nc], t,
                                 lc.cls_pw).mean(-1)
            lcls = lcls + masked_mean(ce, fg_ri)

        # tobj: reliable iou targets, then uncertain score/-1 overrides
        score_iou = jax.lax.stop_gradient(jnp.clip(iou, 0.0, None))
        flat_rel = jnp.where(fg_ri, asn.flat_cell, ncell)
        tobj = jnp.zeros((bsz, ncell), jnp.float32)
        tobj = jax.vmap(lambda t_, f, v: t_.at[f].max(v, mode="drop"))(
            tobj, flat_rel, (1.0 - lc.gr) + lc.gr * score_iou
        )
        flat_uc = jnp.where(fg_ui, asn.flat_cell, ncell)
        uc_flag = jnp.zeros((bsz, ncell), bool)
        uc_flag = jax.vmap(lambda t_, f: t_.at[f].set(True, mode="drop"))(
            uc_flag, flat_uc
        )
        if lc.ignore_obj:
            tobj = jnp.where(uc_flag, -1.0, tobj)
        else:
            uc_val = jnp.take_along_axis(uc_score, mt_ui, axis=1)
            uc_map = jnp.zeros((bsz, ncell), jnp.float32)
            uc_map = jax.vmap(lambda t_, f, v: t_.at[f].max(v, mode="drop"))(
                uc_map, flat_uc, jax.lax.stop_gradient(uc_val)
            )
            tobj = jnp.where(uc_flag, uc_map, tobj)

        obj_logits = p[..., 4].reshape(bsz, ncell)
        obji = masked_mean(obj_bce(obj_logits, jnp.clip(tobj, 0.0, None)),
                           tobj >= 0.0)
        lobj = lobj + obji * lc.balance[i]

    bs = preds[0].shape[0]
    lbox = lbox * lc.box_w
    lobj = lobj * lc.obj_w
    lcls = lcls * lc.cls_w
    loss = (lbox + lobj + lcls) * bs
    return loss, {"ss_box": lbox, "ss_obj": lobj, "ss_cls": lcls}
