"""Anchor-based OTA loss (the yolov7s-simota path)."""

import numpy as np
import jax
import jax.numpy as jnp

from efficientteacher_tpu.losses.yolov5_loss import YoloV5LossConfig
from efficientteacher_tpu.losses.yolov5_ota_loss import compute_ota_loss

ANCHORS_GRID = np.array(
    [
        [[1.25, 1.625], [2.0, 3.75], [4.125, 2.875]],
        [[1.875, 3.8125], [3.875, 2.8125], [3.6875, 7.4375]],
        [[3.625, 2.8125], [4.875, 6.1875], [11.65625, 10.1875]],
    ],
    np.float32,
)


def _labels(rng, b, m, nc):
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    for bi in range(b):
        for k in range(3):
            labels[bi, k] = [rng.integers(0, nc), *rng.uniform(0.3, 0.7, 2),
                             *rng.uniform(0.2, 0.5, 2)]
            mask[bi, k] = True
    return jnp.asarray(labels), jnp.asarray(mask)


def test_ota_loss_finite_and_grads():
    nc, na = 4, 3
    rng = np.random.default_rng(0)
    preds = [
        jnp.asarray(rng.normal(0, 0.5, (2, g, g, na, 5 + nc)).astype(np.float32))
        for g in (8, 4, 2)
    ]
    labels, mask = _labels(rng, 2, 8, nc)
    lc = YoloV5LossConfig(nc=nc)
    loss, parts = compute_ota_loss(
        preds, labels, mask, ANCHORS_GRID, (8.0, 16.0, 32.0), 64, lc
    )
    assert np.isfinite(float(loss))
    assert float(parts["box"]) > 0 and float(parts["obj"]) > 0

    grads = jax.grad(
        lambda ps: compute_ota_loss(ps, labels, mask, ANCHORS_GRID,
                                    (8.0, 16.0, 32.0), 64, lc)[0]
    )(preds)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    assert sum(float(jnp.abs(g).sum()) for g in grads) > 0


def test_ota_loss_zero_targets():
    nc, na = 4, 3
    preds = [jnp.zeros((2, g, g, na, 5 + nc)) for g in (8, 4, 2)]
    loss, parts = compute_ota_loss(
        preds, jnp.zeros((2, 8, 5)), jnp.zeros((2, 8), bool), ANCHORS_GRID,
        (8.0, 16.0, 32.0), 64, YoloV5LossConfig(nc=nc),
    )
    assert np.isfinite(float(loss))
    assert float(parts["box"]) == 0.0
