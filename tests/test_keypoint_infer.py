"""Keypoint INFERENCE path, externally parity-anchored.

The training side (dataset keypoint columns, WingLoss) is covered by
test_keypoints.py; this file covers getting keypoints OUT of a model:

  - non_max_suppression_lmk_and_bbox (reference utils/general.py:778-885):
    keypoint columns ride through NMS, candidate gate is obj>conf only —
    row-for-row against the ACTUAL reference implementation.
  - scale_coords_landmarks (reference utils/general.py:717-750):
    per-coordinate pad/gain/clamp — numeric parity.
  - end-to-end: keypoint model forward -> decode -> keypoint NMS ->
    validator OKS scoring (reference val.py:333, :363-366). The reference's
    own eval decode ZEROES keypoint channels (models/head/yolov5_head.py:72
    `y = torch.full_like(x, 0)` assigns only class_range) — keypoint
    inference is dead upstream, so decode correctness is proven against the
    LOSS parameterization (raw*anchor = cell-relative offset) instead:
    a hand-built raw map must decode to the known absolute keypoints.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from efficientteacher_tpu.configs import get_cfg  # noqa: E402
from efficientteacher_tpu.models import Model  # noqa: E402
from efficientteacher_tpu.models.heads.yolov5 import (  # noqa: E402
    decode_yolov5_scale,
)
from efficientteacher_tpu.models.spec import spec_from_cfg  # noqa: E402
from efficientteacher_tpu.ops import boxes as our_boxes  # noqa: E402
from efficientteacher_tpu.ops import nms as our_nms  # noqa: E402

from ref_compat import load_reference  # noqa: E402


def _random_kp_preds(rng, B=2, N=250, nc=8, npk=3, img=640):
    """Prediction layout the reference lmk NMS expects:
    [xywh, obj, nc cls, 2*npk keypoints, 1 trailing col]."""
    xy = rng.uniform(60, img - 60, (B, N, 2))
    wh = rng.uniform(8, 120, (B, N, 2))
    obj = rng.uniform(0, 1, (B, N, 1))
    cls = rng.uniform(0, 1, (B, N, nc))
    kps = rng.uniform(0, img, (B, N, 2 * npk))
    extra = rng.uniform(0, 1, (B, N, 1))
    return np.concatenate([xy, wh, obj, cls, kps, extra], -1).astype(
        np.float32)


@pytest.mark.parametrize("multi_label", [False, True])
def test_lmk_nms_parity(multi_label):
    """ops/nms.py non_max_suppression_lmk_and_bbox vs reference
    utils/general.py:778 on identical preds: same rows kept, keypoint
    columns carried verbatim."""
    ns = load_reference()
    rng = np.random.default_rng(21)
    npk = 3
    pred = _random_kp_preds(rng, npk=npk)
    conf, iou = 0.25, 0.5

    want = ns.general.non_max_suppression_lmk_and_bbox(
        torch.from_numpy(pred), conf_thres=conf, iou_thres=iou,
        num_points=npk, multi_label=multi_label,
    )
    got = our_nms.non_max_suppression_lmk_and_bbox(
        jnp.asarray(pred), conf_thres=conf, iou_thres=iou,
        num_points=npk, multi_label=multi_label,
    )
    dets = np.asarray(got.detections)
    valid = np.asarray(got.valid)
    for bi in range(pred.shape[0]):
        w = want[bi].numpy()
        g = dets[bi][valid[bi]]
        assert len(g) == len(w), f"image {bi}: {len(g)} vs {len(w)} kept"
        np.testing.assert_allclose(g[:, 4], w[:, 4], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(g[:, :4], w[:, :4], rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(g[:, 5].astype(int),
                                      w[:, 5].astype(int))
        # keypoint + trailing columns ride along unchanged
        np.testing.assert_allclose(g[:, 6:], w[:, 6:], rtol=1e-5, atol=1e-4)


def test_scale_coords_landmarks_parity():
    """ops/boxes.scale_coords_landmarks vs reference utils/general.py:717
    (explicit ratio_pad and recomputed-gain forms)."""
    ns = load_reference()
    rng = np.random.default_rng(22)
    npk = 4
    coords = rng.uniform(-20, 700, (12, 2 * npk)).astype(np.float32)
    img1, img0 = (640, 640), (480, 320)

    for ratio_pad in (None, ((0.75, 0.75), (40.0, 10.0))):
        want = torch.from_numpy(coords.copy())
        ns.general.scale_coords_landmarks(img1, want, img0, npk,
                                          ratio_pad=ratio_pad)
        got = our_boxes.scale_coords_landmarks(
            img1, jnp.asarray(coords), img0, npk, ratio_pad=ratio_pad)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-5, atol=1e-4)


def test_keypoint_decode_inverts_loss_parameterization():
    """The loss trains raw*anchor as the keypoint offset from the assigned
    cell (losses/yolov5_loss.py, reference loss.py:175-179). The eval
    decode must invert that: a raw map with kp channel = offset/anchor
    decodes to the intended absolute pixels."""
    rng = np.random.default_rng(23)
    na, nc, npk, ny = 3, 2, 2, 4
    stride = 8.0
    anchors_px = jnp.asarray(rng.uniform(8, 32, (na, 2)).astype(np.float32))
    no = 5 + nc + 2 * npk
    raw = np.full((1, ny, ny, na, no), -8.0, np.float32)  # sigmoids ~ 0

    # choose an absolute keypoint target and back out the raw channel
    cell = np.array([2, 1], np.float32)                   # (gx, gy)
    kp_px = np.array([[21.0, 11.5], [9.0, 30.0]], np.float32)  # (npk, 2)
    a = 1
    # loss-side anchors are grid units (anchors_px / stride): raw * a_gu =
    # kp_rel  =>  raw = (kp_px - cell_px) / anchors_px
    offs = (kp_px - cell * stride) / np.asarray(anchors_px)[a]
    raw[0, int(cell[1]), int(cell[0]), a, 5 + nc:] = offs.reshape(-1)

    out = decode_yolov5_scale(jnp.asarray(raw), stride, anchors_px, nc)
    out = np.asarray(out).reshape(1, na, ny, ny, no)
    got = out[0, a, int(cell[1]), int(cell[0]), 5 + nc:].reshape(npk, 2)
    np.testing.assert_allclose(got, kp_px, rtol=1e-5, atol=1e-3)


class _OneBatchLoader:
    def __init__(self, batch):
        self.batch = batch

    def __iter__(self):
        return iter([self.batch])


def test_keypoint_val_e2e(tmp_path):
    """Keypoint model -> decode -> lmk NMS -> validator with OKS matching
    (reference val.py:333 + :363-366): runs end-to-end, detections carry
    2*np columns, both val_kp modes return finite metrics, and the COCO
    JSON export sees only the 6 box columns (keypoint cols must not leak
    into its `*xyxy, conf, cls` unpack)."""
    from efficientteacher_tpu.eval import validator

    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Dataset.nc = 2
    cfg.Dataset.np = 2
    cfg.Dataset.img_size = 64
    spec = spec_from_cfg(cfg)
    model = Model(spec=spec, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)

    npk = 2
    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    labels = np.zeros((2, 4, 5 + 2 * npk), np.float32)
    mask = np.zeros((2, 4), bool)
    labels[0, 0] = [0, 0.5, 0.5, 0.4, 0.4, 0.45, 0.45, -1, -1]
    labels[1, 0] = [1, 0.3, 0.6, 0.3, 0.3, 0.3, 0.6, 0.35, 0.65]
    mask[0, 0] = mask[1, 0] = True
    batch = {"images": images, "labels": labels, "mask": mask,
             "shapes": [None, None]}

    # the infer program emits keypoint columns
    infer = validator.make_infer_fn(model, nc=2, conf_thres=0.001,
                                    iou_thres=0.6, max_det=30, max_nms=512,
                                    norm_scale=255.0,
                                    compute_dtype=jnp.float32,
                                    num_points=npk)
    out = infer(variables, jnp.asarray(images))
    assert out.detections.shape[-1] == 6 + 2 * npk

    for val_kp in (False, True):
        json_path = str(tmp_path / f"preds_{val_kp}.json")
        (mp, mr, map50, map_), maps, cls_thr = validator.run(
            model, variables, _OneBatchLoader(batch), nc=2,
            conf_thres=0.001, iou_thres=0.6, max_det=30, max_nms=512,
            compute_dtype=jnp.float32, num_points=npk, val_kp=val_kp,
            save_json=json_path,
        )[:3]
        for v in (mp, mr, map50, map_):
            assert np.isfinite(v)
        import json

        preds = json.load(open(json_path))
        assert preds, "keypoint model produced no JSON detections"
        for p in preds:
            assert len(p["bbox"]) == 4
            assert 0 <= p["category_id"] < 2  # cls, not a keypoint coord
            assert 0.0 <= p["score"] <= 1.0
