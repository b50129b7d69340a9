"""Keypoint (np>0) path: dataset columns, head channels, wing loss."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.data.datasets import LoadImagesAndLabels
from efficientteacher_tpu.losses.common import landmarks_loss, wing_loss
from efficientteacher_tpu.losses.yolov5_loss import (
    YoloV5LossConfig,
    compute_loss,
)
from efficientteacher_tpu.models import Model
from efficientteacher_tpu.models.spec import spec_from_cfg

ANCHORS_GRID = np.array(
    [
        [[1.25, 1.625], [2.0, 3.75], [4.125, 2.875]],
        [[1.875, 3.8125], [3.875, 2.8125], [3.6875, 7.4375]],
        [[3.625, 2.8125], [4.875, 6.1875], [11.65625, 10.1875]],
    ],
    np.float32,
)


def test_wing_loss_shape_and_values():
    p = jnp.asarray([0.0, 5.0, 20.0])
    t = jnp.asarray([0.0, 0.0, 0.0])
    out = np.asarray(wing_loss(p, t))
    assert out[0] == 0.0
    assert out[1] > 0 and out[2] > out[1]
    # large-error branch is linear: d - C
    assert out[2] == pytest.approx(20.0 - (10 - 10 * np.log(1 + 10 / 2)),
                                   rel=1e-5)


def test_dataset_keypoint_columns(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    img = np.full((100, 100, 3), 90, np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "a.jpg"), img)
    # 2 keypoints: one visible at box center, one invisible
    (tmp_path / "labels" / "a.txt").write_text(
        "0 0.5 0.5 0.4 0.4 0.5 0.5 -1 -1\n"
    )
    ds = LoadImagesAndLabels(
        str(tmp_path / "images"), img_size=64, nc=1, max_targets=4,
        num_keypoints=2,
    )
    img_out, labels, mask, _ = ds[0]
    assert labels.shape == (4, 9)
    row = labels[mask][0]
    np.testing.assert_allclose(row[5:7], [0.5, 0.5], atol=0.02)
    assert row[7] < 0 and row[8] < 0  # invisible preserved


def test_keypoint_model_and_loss():
    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Dataset.nc = 2
    cfg.Dataset.np = 3
    cfg.Dataset.img_size = 64
    spec = spec_from_cfg(cfg)
    model = Model(spec=spec)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    decoded, raw = model.apply(variables, x, train=False)
    no = 5 + 2 + 6  # nc + 2*np + 5 (coherent channel count)
    assert raw[0].shape[-1] == no

    # loss with keypoint columns: need 2*np label cols -> loss reads extra
    rng = np.random.default_rng(0)
    labels = np.zeros((1, 8, 5 + 6), np.float32)
    mask = np.zeros((1, 8), bool)
    labels[0, 0] = [1, 0.5, 0.5, 0.3, 0.3, 0.45, 0.45, 0.55, 0.55, -1, -1]
    mask[0, 0] = True
    # build fake preds with enough channels for 3 kp pairs
    no_loss = 5 + 2 + 6
    preds = [
        jnp.asarray(rng.normal(0, 0.5, (1, g, g, 3, no_loss)).astype(np.float32))
        for g in (8, 4, 2)
    ]
    lc = YoloV5LossConfig(nc=2, num_keypoints=3, kp_w=10.0)
    loss, parts = compute_loss(preds, jnp.asarray(labels), jnp.asarray(mask),
                               ANCHORS_GRID, lc)
    assert "kp" in parts
    assert np.isfinite(float(loss))
    grads = jax.grad(
        lambda ps: compute_loss(ps, jnp.asarray(labels), jnp.asarray(mask),
                                ANCHORS_GRID, lc)[0]
    )(preds)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
