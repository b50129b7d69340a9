"""Equivalence tests: dense-masked assigner/loss vs a naive ragged
re-implementation of the reference algorithm (build_targets semantics of
reference yolo_anchor_assigner.py:319-372 and default_loss of loss.py:141-215).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.assigners.yolo_anchor import assign_scale
from efficientteacher_tpu.losses.yolov5_loss import (
    YoloV5LossConfig,
    compute_loss,
)

ANCHORS_GRID = np.array(
    [
        [[1.25, 1.625], [2.0, 3.75], [4.125, 2.875]],
        [[1.875, 3.8125], [3.875, 2.8125], [3.6875, 7.4375]],
        [[3.625, 2.8125], [4.875, 6.1875], [11.65625, 10.1875]],
    ],
    np.float32,
)


def naive_build_targets(labels_list, grid_hw, anchors, anchor_t=4.0):
    """Ragged reference algorithm: returns set of positives
    (b, a, gj, gi, tx, ty, tw, th, cls)."""
    ny, nx = grid_hw
    out = []
    off = [(0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (-0.5, 0.0), (0.0, -0.5)]
    for b, rows in enumerate(labels_list):
        for cls, cx, cy, w, h in rows:
            gx, gy = cx * nx, cy * ny
            gw, gh = w * nx, h * ny
            for a, (aw, ah) in enumerate(anchors):
                r = max(gw / aw, aw / gw, gh / ah, ah / gh)
                if not r < anchor_t:
                    continue
                conds = [
                    True,
                    (gx % 1.0 < 0.5) and (gx > 1.0),
                    (gy % 1.0 < 0.5) and (gy > 1.0),
                    ((nx - gx) % 1.0 < 0.5) and ((nx - gx) > 1.0),
                    ((ny - gy) % 1.0 < 0.5) and ((ny - gy) > 1.0),
                ]
                for j, ok in enumerate(conds):
                    if not ok:
                        continue
                    ox, oy = off[j]
                    gi = int(np.clip(np.floor(gx - ox), 0, nx - 1))
                    gj = int(np.clip(np.floor(gy - oy), 0, ny - 1))
                    out.append(
                        (b, a, gj, gi, gx - gi, gy - gj, gw, gh, int(cls))
                    )
    return out


def make_labels(rng, b, m, n_per_img):
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    labels_list = []
    for bi in range(b):
        rows = []
        n = n_per_img[bi]
        for k in range(n):
            cls = rng.integers(0, 8)
            cx, cy = rng.uniform(0.05, 0.95, 2)
            w, h = rng.uniform(0.02, 0.4, 2)
            rows.append((cls, cx, cy, w, h))
            labels[bi, k] = [cls, cx, cy, w, h]
            mask[bi, k] = True
        labels_list.append(rows)
    return labels, mask, labels_list


def test_dense_assignment_matches_naive():
    rng = np.random.default_rng(5)
    b, m = 3, 16
    labels, mask, labels_list = make_labels(rng, b, m, [5, 0, 16])
    for si, grid in enumerate([(12, 12), (6, 6), (4, 4)]):
        asn = assign_scale(
            jnp.asarray(labels), jnp.asarray(mask), grid,
            jnp.asarray(ANCHORS_GRID[si]), 4.0,
        )
        valid = np.asarray(asn.valid)
        flat = np.asarray(asn.flat_cell)
        txy = np.asarray(asn.txy)
        twh = np.asarray(asn.twh)
        tcls = np.asarray(asn.tcls)
        got = set()
        ny, nx = grid
        na = 3
        for bi in range(b):
            for k in np.nonzero(valid[bi])[0]:
                cell = flat[bi, k]
                a = cell % na
                gi = (cell // na) % nx
                gj = cell // (na * nx)
                got.add(
                    (bi, int(a), int(gj), int(gi),
                     round(float(txy[bi, k, 0]) + gi, 4),
                     round(float(txy[bi, k, 1]) + gj, 4),
                     round(float(twh[bi, k, 0]), 4),
                     round(float(twh[bi, k, 1]), 4),
                     int(tcls[bi, k]))
                )
        want = set(
            (bb, a, gj, gi, round(gx, 4), round(gy, 4), round(gw, 4),
             round(gh, 4), c)
            for bb, a, gj, gi, gx, gy, gw, gh, c in (
                (t[0], t[1], t[2], t[3], t[3] + t[4], t[2] + t[5], t[6],
                 t[7], t[8])
                for t in naive_build_targets(
                    labels_list, grid, ANCHORS_GRID[si])
            )
        )
        assert got == want, f"scale {si}: {len(got)} vs {len(want)} positives"


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_bce(logits, t):
    return -(t * np.log(_np_sigmoid(logits) + 1e-12)
             + (1 - t) * np.log(1 - _np_sigmoid(logits) + 1e-12))


def _np_ciou(box1, box2):
    """CIoU of xywh boxes, numpy mirror of ops.boxes.bbox_iou."""
    eps = 1e-7
    b1x1, b1x2 = box1[0] - box1[2] / 2, box1[0] + box1[2] / 2
    b1y1, b1y2 = box1[1] - box1[3] / 2, box1[1] + box1[3] / 2
    b2x1, b2x2 = box2[0] - box2[2] / 2, box2[0] + box2[2] / 2
    b2y1, b2y2 = box2[1] - box2[3] / 2, box2[1] + box2[3] / 2
    inter = max(0, min(b1x2, b2x2) - max(b1x1, b2x1)) * max(
        0, min(b1y2, b2y2) - max(b1y1, b2y1))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = max(b1x2, b2x2) - min(b1x1, b2x1)
    ch = max(b1y2, b2y2) - min(b1y1, b2y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2
            + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / np.pi**2) * (np.arctan(w2 / h2) - np.arctan(w1 / h1)) ** 2
    alpha = v / (v - iou + 1 + eps)
    return iou - (rho2 / c2 + v * alpha)


def naive_loss(preds, labels_list, anchors, lc):
    """Ragged default_loss mirror (reference loss.py:141-215)."""
    lbox = lobj = lcls = 0.0
    grids = [(p.shape[1], p.shape[2]) for p in preds]
    for i, p in enumerate(preds):
        ny, nx = grids[i]
        pos = naive_build_targets(labels_list, grids[i], anchors[i], lc.anchor_t)
        tobj = np.zeros(p.shape[:4], np.float32)
        ious, cls_losses = [], []
        for (b, a, gj, gi, tx, ty, tw, th, c) in pos:
            ps = p[b, gj, gi, a]
            pxy = _np_sigmoid(ps[:2]) * 2 - 0.5
            pwh = (_np_sigmoid(ps[2:4]) * 2) ** 2 * anchors[i][a]
            iou = _np_ciou(
                np.concatenate([pxy, pwh]),
                np.array([tx, ty, tw, th]),  # tx/ty already cell-relative
            )
            ious.append(1.0 - iou)
            tobj[b, gj, gi, a] = max(tobj[b, gj, gi, a], max(iou, 0.0))
            t = np.full(lc.nc, 0.0)
            t[c] = 1.0
            cls_losses.append(_np_bce(ps[5:5 + lc.nc], t).mean())
        if ious:
            lbox += np.mean(ious)
            lcls += np.mean(cls_losses)
        lobj += _np_bce(p[..., 4], tobj).mean() * lc.balance[i]
    bs = preds[0].shape[0]
    return (lbox * lc.box_w + lobj * lc.obj_w + lcls * lc.cls_w) * bs


def test_compute_loss_matches_naive():
    rng = np.random.default_rng(7)
    b, m, nc, na = 2, 16, 8, 3
    labels, mask, labels_list = make_labels(rng, b, m, [4, 7])
    no = 5 + nc
    preds = [
        rng.normal(0, 1, (b, g, g, na, no)).astype(np.float32)
        for g in (12, 6, 4)
    ]
    lc = YoloV5LossConfig(nc=nc, box_w=0.05 * 3 / 3, obj_w=1.0,
                          cls_w=0.5 * nc / 80.0)
    loss, parts = compute_loss(
        [jnp.asarray(p) for p in preds], jnp.asarray(labels),
        jnp.asarray(mask), ANCHORS_GRID, lc,
    )
    want = naive_loss(preds, labels_list, ANCHORS_GRID, lc)
    assert float(loss) == pytest.approx(want, rel=2e-3)
    assert np.isfinite(float(loss))


def test_loss_zero_targets():
    b, m, nc, na = 2, 8, 8, 3
    preds = [jnp.zeros((b, g, g, na, 5 + nc)) for g in (8, 4, 2)]
    lc = YoloV5LossConfig(nc=nc)
    loss, parts = compute_loss(
        preds, jnp.zeros((b, m, 5)), jnp.zeros((b, m), bool),
        ANCHORS_GRID, lc,
    )
    assert np.isfinite(float(loss))
    assert float(parts["box"]) == 0.0
    assert float(parts["cls"]) == 0.0
    assert float(parts["obj"]) > 0.0  # BCE of zero-logits vs zero targets


def test_loss_gradients_flow():
    rng = np.random.default_rng(9)
    b, m, nc, na = 2, 8, 8, 3
    labels, mask, _ = make_labels(rng, b, m, [3, 5])
    lc = YoloV5LossConfig(nc=nc)

    def f(preds):
        loss, _ = compute_loss(
            preds, jnp.asarray(labels), jnp.asarray(mask), ANCHORS_GRID, lc
        )
        return loss

    preds = [
        jnp.asarray(rng.normal(0, 1, (b, g, g, na, 5 + nc)).astype(np.float32))
        for g in (8, 4, 2)
    ]
    grads = jax.grad(f)(preds)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
