import numpy as np
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.ops import (
    bbox_iou,
    box_iou,
    wh_iou,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywh,
    xyxy2xywhn,
    scale_coords,
)

rng = np.random.default_rng(0)


def random_xyxy(n):
    xy = rng.uniform(0, 600, (n, 2))
    wh = rng.uniform(1, 40, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_roundtrip_conversions():
    boxes = random_xyxy(64)
    back = np.asarray(xywh2xyxy(xyxy2xywh(jnp.asarray(boxes))))
    np.testing.assert_allclose(back, boxes, rtol=1e-5, atol=1e-3)

    n = rng.uniform(0.1, 0.9, (16, 4)).astype(np.float32)
    px = xywhn2xyxy(jnp.asarray(n), w=640, h=640)
    back_n = np.asarray(xyxy2xywhn(px, w=640, h=640))
    np.testing.assert_allclose(back_n, n, rtol=1e-5, atol=1e-5)


def naive_iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua


def test_box_iou_matches_naive():
    a, b = random_xyxy(20), random_xyxy(30)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    for i in range(0, 20, 7):
        for j in range(0, 30, 11):
            assert got[i, j] == pytest.approx(naive_iou(a[i], b[j]), abs=1e-5)


def test_bbox_iou_identity_and_variants():
    a = jnp.asarray(random_xyxy(10))
    self_iou = np.asarray(bbox_iou(a, a))
    np.testing.assert_allclose(self_iou, 1.0, atol=1e-4)
    # CIoU/GIoU/DIoU of identical boxes -> 1; disjoint boxes -> <= 0
    for kw in (dict(GIoU=True), dict(DIoU=True), dict(CIoU=True), dict(SIoU=True)):
        v = np.asarray(bbox_iou(a, a, **kw))
        np.testing.assert_allclose(v, 1.0, atol=1e-3)
    b1 = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b2 = jnp.asarray([[100.0, 100.0, 110.0, 110.0]])
    assert float(bbox_iou(b1, b2)[0]) == 0.0
    assert float(bbox_iou(b1, b2, GIoU=True)[0]) < 0.0


def test_bbox_iou_xywh_input():
    # x1y1x2y2=False interprets BOTH inputs as (cx, cy, w, h)
    xyxy_a = jnp.asarray([[10.0, 10.0, 30.0, 50.0]])
    xyxy_b = jnp.asarray([[15.0, 20.0, 35.0, 60.0]])
    xywh_a = jnp.asarray([[20.0, 30.0, 20.0, 40.0]])
    xywh_b = jnp.asarray([[25.0, 40.0, 20.0, 40.0]])
    want = float(bbox_iou(xyxy_a, xyxy_b)[0])
    got = float(bbox_iou(xywh_a, xywh_b, x1y1x2y2=False)[0])
    assert got == pytest.approx(want, abs=1e-5)


def test_wh_iou():
    wh = jnp.asarray([[10.0, 10.0], [20.0, 20.0]])
    m = np.asarray(wh_iou(wh, wh))
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] == pytest.approx(100.0 / 400.0)


def test_scale_coords_letterbox_roundtrip():
    # native 480x640 image letterboxed into 640x640
    img0 = (480, 640)
    img1 = (640, 640)
    gain = min(img1[0] / img0[0], img1[1] / img0[1])  # 1.0
    pad = ((img1[1] - img0[1] * gain) / 2, (img1[0] - img0[0] * gain) / 2)
    native = jnp.asarray([[100.0, 50.0, 200.0, 150.0]])
    lb = native * gain + jnp.asarray([pad[0], pad[1], pad[0], pad[1]])
    back = np.asarray(scale_coords(img1, lb, img0))
    np.testing.assert_allclose(back, np.asarray(native), atol=1e-4)
