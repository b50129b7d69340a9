"""FairPseudoLabel: teacher detections -> strong-view pseudo labels, fully
on-device.

Replaces the reference's host loop (utils/self_supervised_utils.py:54-245:
per-image numpy NMS output handling, affine warp by M, box_candidates filter,
flip flags) with one vmapped fixed-shape program, so the SSOD hot loop never
leaves the TPU (the BASELINE.json north-star requirement).

Per image (reference create_pseudo_label_online_with_gt, :194-245 and
online_label_transform :414-454):
  1. teacher decoded preds on the WEAK view -> class-aware NMS keeping
     [xyxy, conf, cls, obj_conf, cls_conf] (non_max_suppression_ssod)
  2. warp each box's 4 corners by the recorded M (weak->strong), take the
     enclosing box, clip to the image
  3. box_candidates filter (w/h > 2px, area ratio > 0.1 vs the s-scaled
     original, aspect < 20)
  4. normalize to [0,1] xywh, apply flip flags (ud: y->1-y, lr: x->1-x)

Output: (B, max_pl, 8) [cls, cx, cy, w, h, conf, obj_conf, cls_conf] + mask,
plus `invalid` flag (True when no label survived anywhere — the trainer
zeroes the unsupervised loss, reference ssod_trainer.py:640-648).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.nms import batched_nms


class PseudoLabels(NamedTuple):
    labels: jnp.ndarray   # (B, max_pl, 8)
    mask: jnp.ndarray     # (B, max_pl) bool
    invalid: jnp.ndarray  # () bool - nothing survived in the whole batch
    # pre-warp NMS detections: LabelMatch accumulates EVERY NMS detection's
    # (conf, cls), not only those surviving the M-warp/box_candidates filter
    # (reference utils/labelmatch.py create_pseudo_label_online_with_gt
    # harvests scores before online_label_transform, :283-299)
    nms_conf: jnp.ndarray   # (B, max_pl)
    nms_cls: jnp.ndarray    # (B, max_pl)
    nms_valid: jnp.ndarray  # (B, max_pl) bool


def _warp_one_image(det, valid, m_s, img_size: float):
    """det (D, 8) [xyxy, conf, cls, obj_conf, cls_conf] in weak-view pixels;
    m_s (13,) [idx, M(9), s, ud, lr]. Returns (D, 8) [cls, xywhn, conf,
    obj_conf, cls_conf] + mask."""
    M = m_s[1:10].reshape(3, 3)
    s = m_s[10]
    flip_ud = m_s[11] > 0.5
    flip_lr = m_s[12] > 0.5

    boxes = det[:, :4]
    # 4 corners (D, 4, 3)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    ones = jnp.ones_like(x1)
    corners = jnp.stack(
        [
            jnp.stack([x1, y1, ones], -1),
            jnp.stack([x2, y2, ones], -1),
            jnp.stack([x1, y2, ones], -1),
            jnp.stack([x2, y1, ones], -1),
        ],
        axis=1,
    )
    warped = corners @ M.T  # (D, 4, 3)
    wxy = warped[..., :2] / jnp.maximum(warped[..., 2:3], 1e-9)
    nx1 = jnp.clip(wxy[..., 0].min(1), 0, img_size)
    ny1 = jnp.clip(wxy[..., 1].min(1), 0, img_size)
    nx2 = jnp.clip(wxy[..., 0].max(1), 0, img_size)
    ny2 = jnp.clip(wxy[..., 1].max(1), 0, img_size)

    # box_candidates (reference augmentations.py:417): old scaled by s
    ow = (x2 - x1) * s
    oh = (y2 - y1) * s
    nw = nx2 - nx1
    nh = ny2 - ny1
    ar = jnp.maximum(nw / (nh + 1e-16), nh / (nw + 1e-16))
    keep = (
        valid
        & (nw > 2)
        & (nh > 2)
        & (nw * nh / (ow * oh + 1e-16) > 0.1)
        & (ar < 20)
    )

    cx = (nx1 + nx2) / 2 / img_size
    cy = (ny1 + ny2) / 2 / img_size
    bw = nw / img_size
    bh = nh / img_size
    cx = jnp.where(flip_lr, 1.0 - cx, cx)
    cy = jnp.where(flip_ud, 1.0 - cy, cy)

    labels = jnp.stack(
        [det[:, 5], cx, cy, bw, bh, det[:, 4], det[:, 6], det[:, 7]], axis=-1
    )
    return labels, keep


@functools.partial(
    jax.jit,
    static_argnames=("img_size", "max_pl", "nc", "multi_label",
                     "conf_thres", "iou_thres"),
)
def create_pseudo_labels(
    teacher_decoded: jnp.ndarray,
    m_s: jnp.ndarray,
    *,
    img_size: int,
    nc: int,
    conf_thres: float = 0.3,
    iou_thres: float = 0.6,
    max_pl: int = 100,
    multi_label: bool = False,
) -> PseudoLabels:
    """teacher_decoded: (B, N, 5+nc) decoded teacher preds on the weak view.
    m_s: (B, 13) transform records."""
    out = batched_nms(
        teacher_decoded,
        nc=nc,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        multi_label=multi_label,
        max_det=max_pl,
        max_nms=2048,
        ssod=True,
    )
    labels, keep = jax.vmap(
        functools.partial(_warp_one_image, img_size=float(img_size))
    )(out.detections, out.valid, m_s)
    labels = jnp.where(keep[..., None], labels, 0.0)
    return PseudoLabels(
        labels=labels, mask=keep, invalid=~jnp.any(keep),
        nms_conf=out.detections[..., 4], nms_cls=out.detections[..., 5],
        nms_valid=out.valid,
    )


def _class_agnostic_merge(dets, valids, max_pl: int, iou_thres: float):
    """Merge per-teacher (B, D, 8) detection sets: re-sort by conf and
    class-agnostic re-NMS (reference multi-teacher merge,
    utils/self_supervised_utils.py:249-313)."""
    from .. import ops  # noqa: F401  (docs pointer)
    from ..ops.nms import greedy_nms_keep
    from .pseudo_label import PseudoLabels  # self-import safe

    merged = jnp.concatenate(dets, axis=1)    # (B, D_total, 8)
    vmerged = jnp.concatenate(valids, axis=1)

    def one(det, valid):
        score = jnp.where(valid, det[:, 4], -1.0)
        d = det.shape[0]
        k = max(128, 1 << (d - 1).bit_length())
        order = jnp.argsort(-score)
        det_s = det[order]
        valid_s = score[order] > 0
        pad = k - d
        if pad:
            det_s = jnp.pad(det_s, ((0, pad), (0, 0)))
            valid_s = jnp.pad(valid_s, (0, pad))
        keep = greedy_nms_keep(det_s[:, :4], valid_s, iou_thres,
                               tile=min(256, k))
        slots = jnp.cumsum(keep) - 1
        # dropped/overflow rows keep an out-of-range sentinel so mode='drop'
        # discards them — clipping would scatter 0.0 into slot max_pl-1 and
        # could zero the last valid detection (same scheme as
        # ops/nms.py _compact_keep)
        slots = jnp.where(keep & (slots < max_pl), slots, max_pl)
        out = jnp.zeros((max_pl, det.shape[-1]), det.dtype)
        out = out.at[slots].set(det_s, mode="drop")
        n = jnp.minimum(keep.sum(), max_pl)
        return out, jnp.arange(max_pl) < n

    return jax.vmap(one)(merged, vmerged)


def create_pseudo_labels_multi(
    teacher_decoded_list,
    class_maps,
    m_s: jnp.ndarray,
    *,
    img_size: int,
    nc: int,
    conf_thres: float = 0.3,
    iou_thres: float = 0.6,
    max_pl: int = 100,
    multi_label: bool = False,
) -> PseudoLabels:
    """Multi-teacher FairPseudoLabel (reference self_supervised_utils.py:
    249-313): each teacher's decoded predictions are NMS'd separately, the
    extra teachers' class indices remapped into the main class space
    (class_maps[i]: (nc_i,) int32, -1 drops the class), then all sets merge
    under a class-agnostic re-NMS before the usual M-warp.

    teacher_decoded_list[0] is the main (EMA) teacher; class_maps[0] may be
    None (identity)."""
    dets, valids = [], []
    for t, (decoded, cmap) in enumerate(zip(teacher_decoded_list, class_maps)):
        nc_t = decoded.shape[-1] - 5
        out = batched_nms(
            decoded, nc=nc_t, conf_thres=conf_thres, iou_thres=iou_thres,
            multi_label=multi_label, max_det=max_pl, max_nms=2048, ssod=True,
        )
        det, valid = out.detections, out.valid
        if cmap is not None:
            cmap = jnp.asarray(cmap, jnp.int32)
            cls = det[..., 5].astype(jnp.int32)
            new_cls = cmap[jnp.clip(cls, 0, cmap.shape[0] - 1)]
            valid = valid & (new_cls >= 0)
            det = det.at[..., 5].set(new_cls.astype(det.dtype))
        dets.append(det)
        valids.append(valid)

    merged, mvalid = _class_agnostic_merge(dets, valids, max_pl, iou_thres)
    labels, keep = jax.vmap(
        functools.partial(_warp_one_image, img_size=float(img_size))
    )(merged, mvalid, m_s)
    labels = jnp.where(keep[..., None], labels, 0.0)
    return PseudoLabels(
        labels=labels, mask=keep, invalid=~jnp.any(keep),
        nms_conf=merged[..., 4], nms_cls=merged[..., 5], nms_valid=mvalid,
    )
