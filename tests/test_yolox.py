"""YOLOX head, SimOTA assignment, and ComputeFastXLoss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.assigners.simota import simota_assign
from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.losses.yolox_loss import (
    YoloXLossConfig,
    compute_yolox_loss,
)
from efficientteacher_tpu.models import Model
from efficientteacher_tpu.models.spec import spec_from_cfg


def yolox_cfg(width=0.25, depth=0.34, nc=4, img=64):
    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloX"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = width
    cfg.Model.depth_multiple = depth
    cfg.Model.anchors = [1]
    cfg.Loss.type = "ComputeXLoss"
    cfg.Dataset.nc = nc
    cfg.Dataset.img_size = img
    return cfg


def test_yolox_head_shapes():
    cfg = yolox_cfg()
    model = Model(spec=spec_from_cfg(cfg))
    assert model.model_type == "yolox"
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    decoded, raw = model.apply(variables, x, train=False)
    no = 5 + 4
    assert raw[0].shape == (2, 8, 8, 1, no)
    assert raw[2].shape == (2, 2, 2, 1, no)
    assert decoded.shape == (2, 8 * 8 + 4 * 4 + 2 * 2, no)
    d = np.asarray(decoded)
    assert (d[..., 2:4] > 0).all()            # wh = exp(.) * stride > 0
    assert (d[..., 4] >= 0).all() and (d[..., 4] <= 1).all()
    # prior-prob bias: fresh obj probability ~0.01
    assert d[..., 4].mean() < 0.05


def test_simota_assigns_center_anchor():
    """A single GT box must claim anchors near its center at the right scale."""
    nc, n = 4, 8 * 8 + 4 * 4 + 2 * 2
    img = 64.0
    # build per-anchor geometry for grids 8/4/2, strides 8/16/32
    centers, strides = [], []
    for g, s in ((8, 8), (4, 16), (2, 32)):
        gy, gx = np.mgrid[0:g, 0:g]
        centers.append(np.stack([(gx.ravel() + 0.5) * s,
                                 (gy.ravel() + 0.5) * s], -1))
        strides.append(np.full(g * g, s, np.float32))
    centers = jnp.asarray(np.concatenate(centers).astype(np.float32))
    strides = jnp.asarray(np.concatenate(strides))

    gt_boxes = jnp.asarray([[[32.0, 32.0, 24.0, 24.0]]])
    gt_cls = jnp.asarray([[2]], jnp.int32)
    gt_mask = jnp.asarray([[True]])
    rng = np.random.default_rng(0)
    pred = jnp.asarray(
        np.concatenate([np.asarray(centers), np.full((n, 2), 20)], -1)[None]
        .astype(np.float32)
    )  # predicted boxes centered at each anchor
    cls_logits = jnp.asarray(rng.normal(0, 0.1, (1, n, nc)).astype(np.float32))
    obj_logits = jnp.zeros((1, n, 1))

    res = simota_assign(gt_boxes, gt_cls, gt_mask, pred, cls_logits,
                        obj_logits, centers, strides, nc=nc)
    fg = np.asarray(res.fg_mask)[0]
    assert fg.sum() >= 1
    # all assigned anchors are inside/near the GT box
    c = np.asarray(centers)[fg]
    assert (np.abs(c - 32).max(-1) < 40).all()
    assert np.asarray(res.matched_gt)[0][fg].max() == 0


def test_simota_empty_gt():
    nc, n = 4, 84
    res = simota_assign(
        jnp.zeros((1, 3, 4)), jnp.zeros((1, 3), jnp.int32),
        jnp.zeros((1, 3), bool), jnp.ones((1, n, 4)),
        jnp.zeros((1, n, nc)), jnp.zeros((1, n, 1)),
        jnp.ones((n, 2)), jnp.ones((n,)), nc=nc,
    )
    assert int(res.num_fg) == 0
    assert not np.asarray(res.fg_mask).any()


def _labels(rng, b, m, nc):
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    for bi in range(b):
        for k in range(3):
            labels[bi, k] = [rng.integers(0, nc), *rng.uniform(0.3, 0.7, 2),
                             *rng.uniform(0.2, 0.5, 2)]
            mask[bi, k] = True
    return jnp.asarray(labels), jnp.asarray(mask)


def test_yolox_loss_finite_and_grads():
    nc = 4
    rng = np.random.default_rng(1)
    preds = [
        jnp.asarray(rng.normal(0, 0.5, (2, g, g, 1, 5 + nc)).astype(np.float32))
        for g in (8, 4, 2)
    ]
    labels, mask = _labels(rng, 2, 8, nc)
    lc = YoloXLossConfig(nc=nc)
    loss, parts = compute_yolox_loss(preds, labels, mask, 64, lc)
    assert np.isfinite(float(loss))
    assert float(parts["iou"]) > 0 and float(parts["obj"]) > 0

    grads = jax.grad(
        lambda ps: compute_yolox_loss(ps, labels, mask, 64, lc)[0]
    )(preds)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    assert sum(float(jnp.abs(g).sum()) for g in grads) > 0

    # l1 branch
    lc1 = YoloXLossConfig(nc=nc, use_l1=True)
    loss1, parts1 = compute_yolox_loss(preds, labels, mask, 64, lc1)
    assert "l1" in parts1 and np.isfinite(float(loss1))


def test_yolox_loss_zero_targets():
    nc = 4
    preds = [jnp.zeros((2, g, g, 1, 5 + nc)) for g in (8, 4, 2)]
    loss, parts = compute_yolox_loss(
        preds, jnp.zeros((2, 8, 5)), jnp.zeros((2, 8), bool), 64,
        YoloXLossConfig(nc=nc),
    )
    assert np.isfinite(float(loss))
    assert float(parts["iou"]) == 0.0
