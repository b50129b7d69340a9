"""OTA loss for anchor-based heads (ComputeLoss.ota_loss), dense-masked.

Parity with reference models/loss/loss.py ota_loss + the assigner's
build_ota_targets (models/assigner/yolo_anchor_assigner.py:104-234),
verified NUMERICALLY against the live reference in
tests/test_reference_parity.py. The reference runs TWO passes and sums:
  1. SimOTA pass — find_3_positive candidates pooled across scales; per
     image dynamic-k: cost = BCE(sqrt(sigmoid(cls)*sigmoid(e2e)), onehot)
     + 3*(-log IoU); k from top-`top_k` IoU sums; multi-claimed candidates
     go to the min-cost GT. Matched candidates get CIoU box + cls BCE;
     the obj BCE of THIS pass reads pi[..., -1] (the reference's
     'p_obj_e2e' quirk — the last class channel, not obj).
  2. the classic build_targets pass (the default ComputeLoss body) added
     on top, obj BCE on the real obj channel.
Reference quirk NOT mirrored: GT boxes in the SimOTA cost are scaled by a
hardcoded 640 (yolo_anchor_assigner.py '* 640 #TODO'); we use the true
img_size (identical at 640, correct elsewhere).

Selected by cfg.Loss.assigner_type == 'SimOTA' with an anchor head
(the yolov7s-simota zoo config). The pooled-candidate / SimOTA pieces are
factored out so the SSOD OTA branch (losses/ssod_loss.py
compute_ssod_ota_loss, reference ssod_loss.py:296-345 — single-pass, real
obj channel) reuses them.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..assigners.yolo_anchor import assign_all_scales
from ..ops.boxes import bbox_iou
from .common import bce_with_logits, masked_mean, smooth_bce
from .yolov5_loss import YoloV5LossConfig, _gather_positives, decode_pred_boxes


class OTACandidates(NamedTuple):
    """Pooled per-slot candidate predictions across scales."""

    ps_all: list          # per-scale (B, K_i, no) gathered raw predictions
    pbox_grid_all: list   # per-scale (B, K_i, 4) decoded boxes, cell-relative
    pbox_px: jnp.ndarray  # (B, K, 4) decoded boxes in image pixels
    ps: jnp.ndarray       # (B, K, no)
    k_sizes: list         # K_i per scale


def ota_candidates(preds, assignments, strides) -> OTACandidates:
    """Decode every candidate slot of the find-3-positive lattice to image
    pixels (the 'pre_gen_gains' pooling in reference loss.py:219-227)."""
    ps_all, pbox_grid_all, pbox_px_all, k_sizes = [], [], [], []
    for i, (p, asn) in enumerate(zip(preds, assignments)):
        p = p.astype(jnp.float32)
        ps = _gather_positives(p, asn)               # (B, K_i, no)
        pbox = decode_pred_boxes(ps, asn.anchor_wh)  # grid units, cell-rel
        na_ = p.shape[3]
        nx_ = p.shape[2]
        cell_flat = asn.flat_cell // na_
        gi = (cell_flat % nx_).astype(jnp.float32)
        gj = (cell_flat // nx_).astype(jnp.float32)
        abs_xy = (pbox[..., :2] + jnp.stack([gi, gj], -1)) * strides[i]
        abs_wh = pbox[..., 2:4] * strides[i]
        ps_all.append(ps)
        pbox_grid_all.append(pbox)
        pbox_px_all.append(jnp.concatenate([abs_xy, abs_wh], -1))
        k_sizes.append(asn.valid.shape[1])
    return OTACandidates(
        ps_all=ps_all,
        pbox_grid_all=pbox_grid_all,
        pbox_px=jnp.concatenate(pbox_px_all, axis=1),
        ps=jnp.concatenate(ps_all, axis=1),
        k_sizes=k_sizes,
    )


def simota_match(gt_box_px, gt_cls, gt_mask, cand: OTACandidates,
                 cand_valid, nc: int, top_k: int = 10, cost_obj=None):
    """Per-image SimOTA dynamic-k matching over pooled candidates
    (reference yolo_anchor_assigner.py build_ota_targets SimOTA core).

    cost_obj: per-slot logits multiplied into the cls cost. Defaults to the
    obj channel (the build_ota_targets_with_score variant, :440-470); the
    supervised build_ota_targets instead feeds fg_pred[:, -1]
    ('p_obj_e2e', :156-200) — pass that explicitly for that path.

    Returns (fg (B, K) bool, matched (B, K) int32 gt index)."""
    k_total = cand_valid.shape[1]
    kk = min(top_k, k_total)
    m = gt_mask.shape[1]
    if cost_obj is None:
        cost_obj = cand.ps[..., 4]

    def assign_one(gt_box, gt_c, gt_m, boxes, valid, obj_logit, cls_logit):
        iou = bbox_iou(gt_box[:, None, :], boxes[None, :, :],
                       x1y1x2y2=False)                      # (M, K)
        iou = jnp.where(gt_m[:, None] & valid[None, :], iou, 0.0)
        p = jax.nn.sigmoid(cls_logit) * jax.nn.sigmoid(obj_logit)[:, None]
        q = jnp.sqrt(jnp.clip(p, 1e-12, 1.0))[None]
        y = jax.nn.one_hot(gt_c, nc)[:, None, :]
        bce = -(y * jnp.log(q)
                + (1.0 - y) * jnp.log1p(-jnp.clip(q, 0, 1 - 1e-7)))
        cost = bce.sum(-1) + 3.0 * (-jnp.log(iou + 1e-8))
        cost = cost + 1e9 * (~valid)[None, :] + 1e12 * (~gt_m)[:, None]

        topk_ious, _ = jax.lax.top_k(iou, kk)
        dyn_k = jnp.clip(topk_ious.sum(-1).astype(jnp.int32), 1, kk)
        _, top_idx = jax.lax.top_k(-cost, kk)
        rank = jnp.arange(kk)[None, :]
        chosen = (rank < dyn_k[:, None]) & gt_m[:, None]
        mm = jnp.zeros((m, k_total), bool)
        mm = jax.vmap(lambda row, idx, ch: row.at[idx].set(ch, mode="drop"))(
            mm, top_idx, chosen
        )
        claims = mm.sum(0)
        best = jnp.argmin(jnp.where(mm, cost, jnp.inf), axis=0)
        mm = mm & ((claims <= 1)
                   | (jnp.arange(m)[:, None] == best[None, :]))
        fg = mm.any(0)
        matched = jnp.argmax(mm, axis=0).astype(jnp.int32)
        return fg, matched

    return jax.vmap(assign_one)(
        gt_box_px, gt_cls, gt_mask, cand.pbox_px, cand_valid,
        cost_obj, cand.ps[..., 5 : 5 + nc],
    )


def ota_box_targets(labels, matched_i, asn, ny, nx, na):
    """Matched-GT regression target in grid units, cell-relative
    (reference loss.py:230-238 selected_tbox)."""
    gxy = jnp.take_along_axis(labels[..., 1:3], matched_i[..., None],
                              axis=1) * jnp.array([nx, ny], jnp.float32)
    gwh = jnp.take_along_axis(labels[..., 3:5], matched_i[..., None],
                              axis=1) * jnp.array([nx, ny], jnp.float32)
    cell_flat = asn.flat_cell // na
    gi = (cell_flat % nx).astype(jnp.float32)
    gj = (cell_flat // nx).astype(jnp.float32)
    return jnp.concatenate([gxy - jnp.stack([gi, gj], -1), gwh], axis=-1)


def compute_ota_loss(
    preds: Sequence[jnp.ndarray],
    labels: jnp.ndarray,       # (B, M, 5) [cls, xywhn]
    label_mask: jnp.ndarray,   # (B, M)
    anchors_grid: np.ndarray,  # (nl, na, 2)
    strides: Sequence[float],
    img_size: int,
    lc: YoloV5LossConfig,
    top_k: int = 10,
):
    grid_shapes = [(p.shape[1], p.shape[2]) for p in preds]
    assignments = assign_all_scales(
        labels, label_mask, grid_shapes, anchors_grid, lc.anchor_t,
        lc.single_targets,
    )
    b = preds[0].shape[0]
    nc = lc.nc

    cand = ota_candidates(preds, assignments, strides)
    valid = jnp.concatenate([a.valid for a in assignments], axis=1)
    gt_cls = labels[..., 0].astype(jnp.int32)
    gt_box_px = labels[..., 1:5] * float(img_size)
    # reference quirk compat: the supervised build_ota_targets multiplies
    # its cls cost by sigmoid(fg_pred[:, -1]) ('p_obj_e2e',
    # yolo_anchor_assigner.py:156-200), NOT the obj channel
    fg, matched = simota_match(gt_box_px, gt_cls, label_mask, cand, valid,
                               nc, top_k, cost_obj=cand.ps[..., -1])

    cp, cn = smooth_bce(lc.label_smoothing)
    lbox = 0.0
    lobj = 0.0
    lcls = 0.0
    offset = 0
    for i, (p, asn) in enumerate(zip(preds, assignments)):
        p = p.astype(jnp.float32)
        bsz, ny, nx, na, no = p.shape
        k_i = cand.k_sizes[i]
        fg_i = jax.lax.dynamic_slice_in_dim(fg, offset, k_i, axis=1)
        matched_i = jax.lax.dynamic_slice_in_dim(matched, offset, k_i, axis=1)
        offset += k_i

        t_rel = ota_box_targets(labels, matched_i, asn, ny, nx, na)
        pbox = cand.pbox_grid_all[i]
        iou = bbox_iou(pbox, t_rel, x1y1x2y2=False, CIoU=True)
        lbox = lbox + masked_mean(1.0 - iou, fg_i)

        score_iou = jax.lax.stop_gradient(jnp.clip(iou, 0.0, None))
        flat = jnp.where(fg_i, asn.flat_cell, ny * nx * na)
        tobj = jnp.zeros((bsz, ny * nx * na), jnp.float32)
        tobj = jax.vmap(lambda t, f, v: t.at[f].max(v, mode="drop"))(
            tobj, flat, (1.0 - lc.gr) + lc.gr * score_iou
        )
        # reference quirk: the OTA pass's obj BCE reads pi[..., -1]
        # ('obji = self.BCEobj(pi[...,-1], tobj)' in loss.py ota_loss)
        obji = jnp.mean(bce_with_logits(
            p[..., -1].reshape(bsz, -1), tobj, lc.obj_pw
        ))
        lobj = lobj + obji * lc.balance[i]

        if nc > 1:
            mcls = jnp.take_along_axis(gt_cls, matched_i, axis=1)
            onehot = jax.nn.one_hot(mcls, nc)
            t = onehot * cp + (1.0 - onehot) * cn
            ce = bce_with_logits(cand.ps_all[i][..., 5 : 5 + nc], t,
                                 lc.cls_pw).mean(-1)
            lcls = lcls + masked_mean(ce, fg_i)

    lbox = lbox * lc.box_w
    lobj = lobj * lc.obj_w
    lcls = lcls * lc.cls_w

    # pass 2: the classic build_targets loss added on top (reference
    # ota_loss runs the default-assigner loop after the SimOTA one)
    from .yolov5_loss import compute_loss as _classic_loss

    _, classic = _classic_loss(preds, labels, label_mask, anchors_grid, lc)
    lbox = lbox + classic["box"]
    lobj = lobj + classic["obj"]
    lcls = lcls + classic["cls"]
    loss = (lbox + lobj + lcls) * b
    return loss, {"box": lbox, "obj": lobj, "cls": lcls, "loss": loss}
