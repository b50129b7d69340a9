"""TAL assigner, DFL loss, and v6/v8 heads."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.assigners.tal import tal_assign
from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.losses.tal_loss import (
    TALLossConfig,
    compute_tal_loss,
    dfl_project,
)
from efficientteacher_tpu.models import Model
from efficientteacher_tpu.models.spec import spec_from_cfg


def tal_cfg(head="YoloV6", nc=4, img=64, reg_max=8):
    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = head
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.25
    cfg.Model.depth_multiple = 0.34
    cfg.Model.anchors = [1]
    cfg.Loss.type = "ComputeTalLoss"
    cfg.Loss.reg_max = reg_max
    cfg.Dataset.nc = nc
    cfg.Dataset.img_size = img
    return cfg


@pytest.mark.parametrize("head", ["YoloV6", "YoloV8"])
def test_tal_head_shapes(head):
    cfg = tal_cfg(head)
    model = Model(spec=spec_from_cfg(cfg))
    assert model.model_type == "tal"
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    decoded, raw = model.apply(variables, x, train=False)
    nbins = 4 * (8 + 1)
    assert raw[0].shape == (2, 8, 8, 1, nbins + 4)
    assert decoded.shape == (2, 84, 5 + 4)
    d = np.asarray(decoded)
    assert (d[..., 4] == 1).all()                 # obj column is ones
    assert (d[..., 5:] >= 0).all() and (d[..., 5:] <= 1).all()
    assert (d[..., 2:4] >= 0).all()               # wh non-negative


def test_dfl_project():
    reg_max = 8
    # put all mass on bin 3 for every side -> distance 3
    logits = np.full((1, 4 * (reg_max + 1)), -20.0, np.float32)
    for side in range(4):
        logits[0, side * (reg_max + 1) + 3] = 20.0
    out = np.asarray(dfl_project(jnp.asarray(logits), reg_max))
    np.testing.assert_allclose(out, 3.0, atol=1e-3)


def test_tal_assign_center():
    nc = 4
    # anchors on an 8x8 grid, stride 8 (64px image)
    gy, gx = np.mgrid[0:8, 0:8]
    anc = jnp.asarray(
        np.stack([(gx.ravel() + 0.5) * 8, (gy.ravel() + 0.5) * 8], -1)
        .astype(np.float32)
    )
    n = 64
    gt = jnp.asarray([[[20.0, 20.0, 44.0, 44.0]]])  # xyxy
    gt_cls = jnp.asarray([[2]], jnp.int32)
    gt_mask = jnp.asarray([[True]])
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.uniform(0.1, 0.9, (1, n, nc)).astype(np.float32))
    boxes = jnp.concatenate([anc - 10, anc + 10], -1)[None]

    res = tal_assign(scores, boxes, anc, gt_cls, gt, gt_mask, nc=nc)
    fg = np.asarray(res.fg_mask)[0]
    assert fg.sum() >= 1
    centers = np.asarray(anc)[fg]
    assert (centers > 20).all() and (centers < 44).all()  # inside gt
    assert (np.asarray(res.target_labels)[0][fg] == 2).all()
    ts = np.asarray(res.target_scores)[0]
    assert ts[fg].sum() > 0
    assert ts[~fg].sum() == 0


def test_tal_assign_empty():
    nc, n = 4, 16
    res = tal_assign(
        jnp.ones((1, n, nc)) * 0.5, jnp.ones((1, n, 4)), jnp.ones((n, 2)),
        jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 2, 4)),
        jnp.zeros((1, 2), bool), nc=nc,
    )
    assert not np.asarray(res.fg_mask).any()
    assert np.asarray(res.target_scores).sum() == 0


def _labels(rng, b, m, nc):
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    for bi in range(b):
        for k in range(3):
            labels[bi, k] = [rng.integers(0, nc), *rng.uniform(0.3, 0.7, 2),
                             *rng.uniform(0.2, 0.5, 2)]
            mask[bi, k] = True
    return jnp.asarray(labels), jnp.asarray(mask)


def test_tal_loss_finite_and_grads():
    nc, reg_max = 4, 8
    nbins = 4 * (reg_max + 1)
    rng = np.random.default_rng(2)
    preds = [
        jnp.asarray(
            rng.normal(0, 0.5, (2, g, g, 1, nbins + nc)).astype(np.float32))
        for g in (8, 4, 2)
    ]
    labels, mask = _labels(rng, 2, 8, nc)
    lc = TALLossConfig(nc=nc, reg_max=reg_max)
    loss, parts = compute_tal_loss(preds, labels, mask, 64, lc)
    assert np.isfinite(float(loss))
    assert {"cls", "box", "dfl"} <= set(parts)

    grads = jax.grad(
        lambda ps: compute_tal_loss(ps, labels, mask, 64, lc)[0]
    )(preds)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    assert sum(float(jnp.abs(g).sum()) for g in grads) > 0


def test_tal_loss_zero_targets():
    nc, reg_max = 4, 8
    nbins = 4 * (reg_max + 1)
    preds = [jnp.zeros((2, g, g, 1, nbins + nc)) for g in (8, 4, 2)]
    loss, _ = compute_tal_loss(
        preds, jnp.zeros((2, 8, 5)), jnp.zeros((2, 8), bool), 64,
        TALLossConfig(nc=nc, reg_max=reg_max),
    )
    assert np.isfinite(float(loss))
