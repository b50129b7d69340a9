"""SSOD components: on-device pseudo-label creation, SSOD loss threshold
split, LabelMatch, and an end-to-end mean-teacher smoke run."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.losses.ssod_loss import (
    SSODLossConfig,
    compute_ssod_loss,
)
from efficientteacher_tpu.ssod.labelmatch import LabelMatch, gmm_policy
from efficientteacher_tpu.ssod.pseudo_label import create_pseudo_labels

ANCHORS_GRID = np.array(
    [
        [[1.25, 1.625], [2.0, 3.75], [4.125, 2.875]],
        [[1.875, 3.8125], [3.875, 2.8125], [3.6875, 7.4375]],
        [[3.625, 2.8125], [4.875, 6.1875], [11.65625, 10.1875]],
    ],
    np.float32,
)


def _teacher_pred(boxes_conf, n=400, nc=4, img=128):
    """Raw decoded (1, n, 5+nc): a few strong boxes + noise floor."""
    rng = np.random.default_rng(0)
    pred = np.zeros((1, n, 5 + nc), np.float32)
    pred[0, :, 0:2] = rng.uniform(0, img, (n, 2))
    pred[0, :, 2:4] = rng.uniform(4, 30, (n, 2))
    pred[0, :, 4] = 0.01
    pred[0, :, 5:] = 0.1
    for i, (cx, cy, w, h, conf, cls) in enumerate(boxes_conf):
        pred[0, i] = 0
        pred[0, i, 0:4] = [cx, cy, w, h]
        pred[0, i, 4] = conf
        pred[0, i, 5 + cls] = 0.95
    return pred


def test_pseudo_labels_identity_transform():
    img = 128
    pred = _teacher_pred([(64, 64, 40, 30, 0.9, 1), (30, 100, 20, 20, 0.8, 2)])
    m_s = np.zeros((1, 13), np.float32)
    m_s[0, 1:10] = np.eye(3).reshape(-1)
    m_s[0, 10] = 1.0
    pl = create_pseudo_labels(
        jnp.asarray(pred), jnp.asarray(m_s), img_size=img, nc=4,
        conf_thres=0.3, iou_thres=0.5, max_pl=20,
    )
    mask = np.asarray(pl.mask)[0]
    labels = np.asarray(pl.labels)[0]
    assert mask.sum() == 2
    assert not bool(pl.invalid)
    got = labels[mask]
    # sorted by conf: first is the 0.9*0.95 box at (64,64)
    assert got[0, 0] == 1  # class
    np.testing.assert_allclose(got[0, 1:5], [0.5, 0.5, 40 / 128, 30 / 128],
                               atol=0.01)
    np.testing.assert_allclose(got[0, 5], 0.9 * 0.95, atol=1e-3)
    np.testing.assert_allclose(got[0, 6], 0.9, atol=1e-3)   # obj_conf


def test_pseudo_labels_affine_and_flip():
    img = 128
    pred = _teacher_pred([(40, 40, 30, 24, 0.9, 0)])
    # M: scale 1.5 about origin; fliplr flag set
    M = np.diag([1.5, 1.5, 1.0]).astype(np.float32)
    m_s = np.zeros((1, 13), np.float32)
    m_s[0, 1:10] = M.reshape(-1)
    m_s[0, 10] = 1.5
    m_s[0, 12] = 1.0  # fliplr
    pl = create_pseudo_labels(
        jnp.asarray(pred), jnp.asarray(m_s), img_size=img, nc=4,
        conf_thres=0.3, iou_thres=0.5, max_pl=10,
    )
    labels = np.asarray(pl.labels)[0][np.asarray(pl.mask)[0]]
    assert len(labels) == 1
    # warped center (60, 60) -> normalized 60/128, then x flipped
    np.testing.assert_allclose(labels[0, 1], 1 - 60 / 128, atol=0.01)
    np.testing.assert_allclose(labels[0, 2], 60 / 128, atol=0.01)
    np.testing.assert_allclose(labels[0, 3], 45 / 128, atol=0.01)


def test_pseudo_labels_empty():
    pred = _teacher_pred([])
    pred[..., 4] = 0.01  # all below threshold
    m_s = np.zeros((1, 13), np.float32)
    m_s[0, 1:10] = np.eye(3).reshape(-1)
    m_s[0, 10] = 1.0
    pl = create_pseudo_labels(
        jnp.asarray(pred), jnp.asarray(m_s), img_size=128, nc=4,
        conf_thres=0.3, iou_thres=0.5, max_pl=10,
    )
    assert bool(pl.invalid)
    assert not np.asarray(pl.mask).any()


def _pseudo_batch(nc=4):
    """2 images with labels spanning reliable/uncertain/below-low."""
    labels = np.zeros((2, 8, 8), np.float32)
    mask = np.zeros((2, 8), bool)
    rows = [
        # cls, cx, cy, w, h, conf, obj_conf, cls_conf
        (0, 0.5, 0.5, 0.2, 0.2, 0.9, 0.95, 0.995),   # reliable
        (1, 0.3, 0.3, 0.15, 0.2, 0.45, 0.995, 0.5),  # uncertain + uc_obj
        (2, 0.7, 0.7, 0.2, 0.15, 0.44, 0.5, 0.995),  # uncertain + uc_cls
        (3, 0.2, 0.8, 0.1, 0.1, 0.1, 0.2, 0.2),      # below low -> dropped
    ]
    for bi in range(2):
        for k, r in enumerate(rows):
            labels[bi, k] = r
            mask[bi, k] = True
    return jnp.asarray(labels), jnp.asarray(mask)


def test_ssod_loss_threshold_split():
    nc, na = 4, 3
    rng = np.random.default_rng(3)
    preds = [
        jnp.asarray(rng.normal(0, 1, (2, g, g, na, 5 + nc)).astype(np.float32))
        for g in (8, 4, 2)
    ]
    labels, mask = _pseudo_batch(nc)
    thr_high = jnp.full((nc,), 0.6)
    thr_low = jnp.full((nc,), 0.35)
    lc = SSODLossConfig(
        nc=nc, box_w=0.05, obj_w=1.0, cls_w=0.5 * nc / 80,
        pseudo_label_with_obj=True, pseudo_label_with_bbox=True,
        pseudo_label_with_cls=True, uncertain_aug=True,
    )
    loss, parts = compute_ssod_loss(
        preds, labels, mask, thr_high, thr_low, ANCHORS_GRID, lc
    )
    assert np.isfinite(float(loss))
    assert float(parts["ss_box"]) > 0
    assert float(parts["ss_obj"]) > 0

    # gradients flow
    def f(ps):
        l, _ = compute_ssod_loss(ps, labels, mask, thr_high, thr_low,
                                 ANCHORS_GRID, lc)
        return l

    grads = jax.grad(f)(preds)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    assert sum(float(jnp.abs(g).sum()) for g in grads) > 0


def test_ssod_loss_ignore_obj():
    """ignore_obj=True: uncertain cells are excluded from the obj BCE."""
    nc, na = 4, 3
    rng = np.random.default_rng(11)
    preds = [
        jnp.asarray(rng.normal(0, 1, (2, g, g, na, 5 + nc)).astype(np.float32))
        for g in (8, 4, 2)
    ]
    labels, mask = _pseudo_batch(nc)
    thr_high = jnp.full((nc,), 0.6)
    thr_low = jnp.full((nc,), 0.35)
    l_soft, _ = compute_ssod_loss(
        preds, labels, mask, thr_high, thr_low, ANCHORS_GRID,
        SSODLossConfig(nc=nc, ignore_obj=False),
    )
    l_ign, _ = compute_ssod_loss(
        preds, labels, mask, thr_high, thr_low, ANCHORS_GRID,
        SSODLossConfig(nc=nc, ignore_obj=True),
    )
    assert np.isfinite(float(l_soft)) and np.isfinite(float(l_ign))
    assert float(l_soft) != float(l_ign)


def test_gmm_policy():
    rng = np.random.default_rng(0)
    lo = rng.normal(0.2, 0.03, 200)
    hi = rng.normal(0.9, 0.03, 200)
    thr = gmm_policy(np.concatenate([lo, hi]), given_gt_thr=0.0)
    assert 0.4 < thr < 0.95
    # too few scores -> fallback
    assert gmm_policy(np.array([0.5, 0.6]), given_gt_thr=0.37) == 0.37


def test_labelmatch_epoch_update():
    cfg = get_cfg()
    cfg.Dataset.nc = 2
    lm = LabelMatch(cfg, target_data_len=100, label_num_per_img=5,
                    cls_ratio_gt=np.array([0.5, 0.5]))
    rng = np.random.default_rng(1)
    scores = np.concatenate([rng.normal(0.25, 0.05, 300),
                             rng.normal(0.85, 0.05, 300)])
    cls = np.zeros(600)
    lm.collect(scores, cls)
    lm.update_epoch_cls_thr(0)
    assert lm.cls_thr_high[0] > 0.4          # GMM found the high cluster
    assert lm.cls_thr_high[1] == lm.ignore_thres_high  # no data -> default
    assert lm.cls_thr_low[0] >= lm.ignore_thres_low


def test_quality_no_gt():
    from efficientteacher_tpu.ssod.quality import check_pseudo_label

    labels = np.zeros((1, 4, 8), np.float32)
    mask = np.zeros((1, 4), bool)
    labels[0, 0] = [0, 0.5, 0.5, 0.2, 0.2, 0.9, 0.95, 0.9]
    labels[0, 1] = [1, 0.3, 0.3, 0.1, 0.1, 0.4, 0.45, 0.3]
    mask[0, :2] = True
    q = check_pseudo_label(labels, mask)
    assert q["pse_num"] == 2.0
    assert q["conf_agree"] == 0.5
    assert 0.4 < q["mean_conf"] < 0.9
    empty = check_pseudo_label(labels, np.zeros((1, 4), bool))
    assert empty["pse_num"] == 0.0


def test_ssod_ota_loss():
    """SSOD.use_ota branch (reference ssod_loss.py:296-345): SimOTA
    assignment of reliable/uncertain pseudo labels, uncertain scores into
    tobj, gradients flow; ignore_obj removes uncertain cells."""
    from efficientteacher_tpu.losses.ssod_loss import compute_ssod_ota_loss

    nc, na = 4, 3
    rng = np.random.default_rng(5)
    preds = [
        jnp.asarray(rng.normal(0, 1, (2, g, g, na, 5 + nc)).astype(np.float32))
        for g in (8, 4, 2)
    ]
    labels, mask = _pseudo_batch(nc)
    thr_high = jnp.full((nc,), 0.6)
    thr_low = jnp.full((nc,), 0.35)
    lc = SSODLossConfig(
        nc=nc, box_w=0.05, obj_w=1.0, cls_w=0.5 * nc / 80,
        pseudo_label_with_obj=True, uncertain_aug=True,
    )
    strides = (16.0, 32.0, 64.0)  # 128px image, 8/4/2 grids
    loss, parts = compute_ssod_ota_loss(
        preds, labels, mask, thr_high, thr_low, ANCHORS_GRID, strides, 128,
        lc,
    )
    assert np.isfinite(float(loss))
    assert float(parts["ss_box"]) > 0
    assert float(parts["ss_obj"]) > 0
    assert float(parts["ss_cls"]) > 0

    def f(ps):
        l, _ = compute_ssod_ota_loss(
            ps, labels, mask, thr_high, thr_low, ANCHORS_GRID, strides, 128,
            lc,
        )
        return l

    grads = jax.grad(f)(preds)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    assert sum(float(jnp.abs(g).sum()) for g in grads) > 0

    # ignore_obj: the obj loss changes (uncertain cells leave the BCE)
    lc_ign = SSODLossConfig(
        nc=nc, box_w=0.05, obj_w=1.0, cls_w=0.5 * nc / 80,
        pseudo_label_with_obj=True, uncertain_aug=True, ignore_obj=True,
    )
    _, parts_ign = compute_ssod_ota_loss(
        preds, labels, mask, thr_high, thr_low, ANCHORS_GRID, strides, 128,
        lc_ign,
    )
    assert float(parts_ign["ss_obj"]) != float(parts["ss_obj"])
