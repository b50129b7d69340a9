"""Box geometry primitives (pure jnp, fully jittable, broadcasting).

Semantics match the reference's geometry helpers so decode / loss /
mAP numbers are bit-comparable:
  - coordinate converters: reference utils/general.py:549-700
  - bbox_iou (elementwise, GIoU/DIoU/CIoU/SIoU): utils/metrics.py:207-249,
    models/loss/loss.py:726-859
  - box_iou (pairwise NxM): utils/metrics.py:252-274
  - scale_coords / clip_coords letterbox math: utils/general.py:702-777

All functions are shape-polymorphic over leading batch dims and are used
inside jitted train/eval steps, so no Python branching on array values.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# coordinate conversions
# ---------------------------------------------------------------------------

def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Reference utils/general.py:575."""
    cx, cy, w, h = jnp.split(x[..., :4], 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Reference utils/general.py:563."""
    x1, y1, x2, y2 = jnp.split(x[..., :4], 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def xywhn2xyxy(x, w=640.0, h=640.0, padw=0.0, padh=0.0):
    """Normalized (cx,cy,w,h) -> pixel (x1,y1,x2,y2). Reference utils/general.py:585."""
    cx, cy, bw, bh = jnp.split(x[..., :4], 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x, w=640.0, h=640.0, clip=False, eps=0.0):
    """Pixel (x1,y1,x2,y2) -> normalized (cx,cy,w,h). Reference utils/general.py:648."""
    if clip:
        x = clip_coords(x, (h, w))
    x1, y1, x2, y2 = jnp.split(x[..., :4], 4, axis=-1)
    return jnp.concatenate(
        [
            ((x1 + x2) / 2) / w,
            ((y1 + y2) / 2) / h,
            (x2 - x1) / w,
            (y2 - y1) / h,
        ],
        axis=-1,
    )


def xyn2xy(x, w=640.0, h=640.0, padw=0.0, padh=0.0):
    """Normalized points -> pixel points. Reference utils/general.py:663."""
    return jnp.stack([w * x[..., 0] + padw, h * x[..., 1] + padh], axis=-1)


def clip_coords(boxes: jnp.ndarray, shape) -> jnp.ndarray:
    """Clip xyxy boxes to image bounds (h, w). Reference utils/general.py:767."""
    h, w = shape[0], shape[1]
    lo = jnp.array([0.0, 0.0, 0.0, 0.0], dtype=boxes.dtype)
    hi = jnp.array([w, h, w, h], dtype=boxes.dtype)
    clipped = jnp.clip(boxes[..., :4], lo, hi)
    if boxes.shape[-1] > 4:
        clipped = jnp.concatenate([clipped, boxes[..., 4:]], axis=-1)
    return clipped


def scale_coords(img1_shape, coords, img0_shape, ratio_pad=None):
    """Rescale xyxy coords from letterboxed `img1_shape` (h, w) back to the
    native `img0_shape`. Reference utils/general.py:702-718."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    shift = jnp.array([pad[0], pad[1], pad[0], pad[1]], dtype=coords.dtype)
    out = (coords[..., :4] - shift) / gain
    out = clip_coords(out, img0_shape)
    if coords.shape[-1] > 4:
        out = jnp.concatenate([out, coords[..., 4:]], axis=-1)
    return out


def scale_coords_landmarks(img1_shape, coords, img0_shape, num_points,
                           ratio_pad=None):
    """Rescale interleaved landmark columns [x0 y0 x1 y1 ...] from the
    letterboxed `img1_shape` (h, w) back to native `img0_shape`.
    Reference utils/general.py:717-750 scale_coords_landmarks: each
    coordinate is pad-shifted, gain-divided, then clamped to the native
    image individually (landmarks clamp per-coordinate, unlike boxes)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    n2 = num_points * 2
    pts = coords[..., :n2].reshape(coords.shape[:-1] + (num_points, 2))
    shift = jnp.array([pad[0], pad[1]], dtype=coords.dtype)
    hi = jnp.array([img0_shape[1], img0_shape[0]], dtype=coords.dtype)
    pts = jnp.clip((pts - shift) / gain, 0.0, hi)
    out = pts.reshape(coords.shape[:-1] + (n2,))
    if coords.shape[-1] > n2:
        out = jnp.concatenate([out, coords[..., n2:]], axis=-1)
    return out


# ---------------------------------------------------------------------------
# IoU family
# ---------------------------------------------------------------------------

def bbox_iou(
    box1,
    box2,
    x1y1x2y2: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    SIoU: bool = False,
    eps: float = 1e-7,
):
    """Elementwise IoU between broadcastable box arrays (..., 4).

    Matches reference utils/metrics.py:207-249 (incl. the `+eps` on heights
    only, and the stop-gradient alpha in CIoU) and the SIoU variant of
    models/loss/loss.py:726-859.
    """
    if x1y1x2y2:
        b1_x1, b1_y1, b1_x2, b1_y2 = (box1[..., i] for i in range(4))
        b2_x1, b2_y1, b2_x2, b2_y2 = (box2[..., i] for i in range(4))
    else:
        b1_x1 = box1[..., 0] - box1[..., 2] / 2
        b1_x2 = box1[..., 0] + box1[..., 2] / 2
        b1_y1 = box1[..., 1] - box1[..., 3] / 2
        b1_y2 = box1[..., 1] + box1[..., 3] / 2
        b2_x1 = box2[..., 0] - box2[..., 2] / 2
        b2_x2 = box2[..., 0] + box2[..., 2] / 2
        b2_y1 = box2[..., 1] - box2[..., 3] / 2
        b2_y2 = box2[..., 1] + box2[..., 3] / 2

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * \
        jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None)

    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if not (GIoU or DIoU or CIoU or SIoU):
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if CIoU or DIoU:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 +
                (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
        if DIoU:
            return iou - rho2 / c2
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        # NaN guard the reference lacks: when iou rounds to exactly 1+eps in
        # f32 the denominator cancels to 0 and 0/0 would poison the loss.
        den = v - iou + (1 + eps)
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        alpha = jax.lax.stop_gradient(v / den)
        return iou - (rho2 / c2 + v * alpha)
    if SIoU:
        # SCYLLA-IoU (reference models/loss/loss.py SIoU branch).
        s_cw = (b2_x1 + b2_x2 - b1_x1 - b1_x2) * 0.5
        s_ch = (b2_y1 + b2_y2 - b1_y1 - b1_y2) * 0.5
        sigma = jnp.sqrt(s_cw**2 + s_ch**2) + eps
        sin_alpha_1 = jnp.abs(s_cw) / sigma
        sin_alpha_2 = jnp.abs(s_ch) / sigma
        threshold = 2**0.5 / 2
        sin_alpha = jnp.where(sin_alpha_1 > threshold, sin_alpha_2, sin_alpha_1)
        angle_cost = jnp.cos(jnp.arcsin(sin_alpha) * 2 - math.pi / 2)
        rho_x = (s_cw / (cw + eps)) ** 2
        rho_y = (s_ch / (ch + eps)) ** 2
        gamma = angle_cost - 2
        distance_cost = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
        omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = (1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4
        return iou - 0.5 * (distance_cost + shape_cost)
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area  # GIoU


def box_iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Pairwise IoU: (N,4) x (M,4) xyxy -> (N,M). Reference utils/metrics.py:252."""
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = jnp.minimum(box1[:, None, 2:4], box2[None, :, 2:4])
    inter = jnp.clip(rb - lt, 0, None).prod(-1)
    return inter / (area1[:, None] + area2[None, :] - inter + eps)


def bbox_ioa(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Intersection over box2 area. box1 (4,), box2 (N,4), xyxy.
    Reference utils/metrics.py:277-297."""
    inter = jnp.clip(
        jnp.minimum(box1[2], box2[:, 2]) - jnp.maximum(box1[0], box2[:, 0]), 0, None
    ) * jnp.clip(
        jnp.minimum(box1[3], box2[:, 3]) - jnp.maximum(box1[1], box2[:, 1]), 0, None
    )
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1]) + eps
    return inter / area2


def wh_iou(wh1: jnp.ndarray, wh2: jnp.ndarray) -> jnp.ndarray:
    """IoU of width-height pairs ignoring position: (N,2) x (M,2) -> (N,M).
    Reference utils/metrics.py:300-305."""
    inter = jnp.minimum(wh1[:, None, :], wh2[None, :, :]).prod(-1)
    return inter / (wh1.prod(-1)[:, None] + wh2.prod(-1)[None, :] - inter)


# IoU-loss dispatch table used by YOLOX/TAL losses
# (reference models/loss/loss.py:726-859 IOUloss modes).
def iou_loss(pred, target, iou_type: str = "giou", x1y1x2y2: bool = True):
    kw = {"giou": dict(GIoU=True), "diou": dict(DIoU=True),
          "ciou": dict(CIoU=True), "siou": dict(SIoU=True), "iou": {}}[iou_type]
    return 1.0 - bbox_iou(pred, target, x1y1x2y2=x1y1x2y2, **kw)
