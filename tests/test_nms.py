import numpy as np
import jax.numpy as jnp

from efficientteacher_tpu.ops import batched_nms
from efficientteacher_tpu.ops.nms import greedy_nms_keep


def naive_greedy_nms(boxes, scores, iou_thres):
    """Reference-order greedy NMS (the torchvision.ops.nms contract)."""
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            if scores[j] <= scores[i] and _iou(boxes[i], boxes[j]) > iou_thres:
                if j != i:
                    suppressed[j] = True
    return keep


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def test_greedy_keep_matches_naive():
    rng = np.random.default_rng(1)
    n, k = 300, 512  # pad to tile size
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)

    order = np.argsort(-scores)
    sorted_boxes = boxes[order]
    padded = np.zeros((k, 4), np.float32)
    padded[:n] = sorted_boxes
    valid = np.zeros(k, bool)
    valid[:n] = True

    keep = np.asarray(
        greedy_nms_keep(jnp.asarray(padded), jnp.asarray(valid), 0.5, tile=128)
    )
    got = set(order[np.nonzero(keep[:n])[0]])
    want = set(naive_greedy_nms(boxes, scores, 0.5))
    assert got == want


def test_greedy_keep_density_bound_exact():
    """The sweep's last-valid-row bound (the r5 serving fix: a sparse
    candidate field must not grind every tile of the max_nms buffer) stays
    EXACT at any density, for prefix and non-prefix valid masks, with and
    without stop_at — including the all-padding case."""
    rng = np.random.default_rng(7)
    k, tile = 2048, 256
    for n_valid in (0, 1, 9, 180, 700):
        for trial in range(2):
            boxes = np.zeros((k, 4), np.float32)
            xy = rng.uniform(0, 300, (n_valid, 2))
            wh = rng.uniform(10, 90, (n_valid, 2))
            boxes[:n_valid] = np.concatenate([xy, xy + wh], -1)
            valid = np.zeros(k, bool)
            valid[:n_valid] = True
            if trial == 1 and n_valid > 4:  # holes: contract is ANY mask
                valid[rng.choice(n_valid, n_valid // 3, replace=False)] = 0
            # oracle on the valid rows only (greedy in row order)
            ref = np.zeros(k, bool)
            live = np.nonzero(valid)[0]
            for i in live:
                ref[i] = True
                for j in live[live < i]:
                    if ref[j] and _iou(boxes[j], boxes[i]) > 0.5:
                        ref[i] = False
                        break
            for stop_at in (None, 25):
                keep = np.asarray(greedy_nms_keep(
                    jnp.asarray(boxes), jnp.asarray(valid), 0.5,
                    tile=tile, stop_at=stop_at))
                if stop_at is None:
                    np.testing.assert_array_equal(keep, ref)
                else:  # exact for the first stop_at kept rows
                    lim = np.cumsum(keep) <= stop_at
                    np.testing.assert_array_equal(keep[lim], ref[lim])
                assert not keep[~valid].any()


def _make_pred(rng, b, n, nc):
    pred = np.zeros((b, n, 5 + nc), np.float32)
    pred[..., 0:2] = rng.uniform(50, 600, (b, n, 2))   # cx, cy
    pred[..., 2:4] = rng.uniform(10, 60, (b, n, 2))    # w, h
    pred[..., 4] = rng.uniform(0, 1, (b, n))           # obj
    pred[..., 5:] = rng.uniform(0, 1, (b, n, nc))      # cls
    return pred


def test_batched_nms_shapes_and_ordering():
    rng = np.random.default_rng(2)
    pred = _make_pred(rng, 2, 400, 6)
    out = batched_nms(
        jnp.asarray(pred), nc=6, conf_thres=0.4, iou_thres=0.5,
        max_nms=512, max_det=50,
    )
    assert out.detections.shape == (2, 50, 6)
    assert out.valid.shape == (2, 50)
    det = np.asarray(out.detections)
    val = np.asarray(out.valid)
    for bi in range(2):
        nv = val[bi].sum()
        conf = det[bi, :nv, 4]
        assert np.all(np.diff(conf) <= 1e-6)        # sorted desc
        assert np.all(det[bi, nv:] == 0)            # zero padding
        cls = det[bi, :nv, 5]
        assert np.all((cls >= 0) & (cls < 6))


def test_batched_nms_class_separation():
    """Identical overlapping boxes of different classes must both survive."""
    pred = np.zeros((1, 8, 5 + 3), np.float32)
    pred[0, :, 0:2] = 100.0
    pred[0, :, 2:4] = 50.0
    pred[0, :, 4] = 0.9
    pred[0, 0, 5] = 0.9   # class 0
    pred[0, 1, 6] = 0.8   # class 1 same place
    out = batched_nms(
        jnp.asarray(pred), nc=3, conf_thres=0.25, iou_thres=0.45,
        max_nms=256, max_det=10,
    )
    val = np.asarray(out.valid)[0]
    det = np.asarray(out.detections)[0]
    classes = set(det[val, 5].astype(int).tolist())
    assert {0, 1} <= classes


def test_batched_nms_ssod_columns():
    rng = np.random.default_rng(3)
    pred = _make_pred(rng, 1, 200, 4)
    out = batched_nms(
        jnp.asarray(pred), nc=4, conf_thres=0.3, iou_thres=0.5,
        max_nms=256, max_det=30, ssod=True,
    )
    assert out.detections.shape == (1, 30, 8)
    det = np.asarray(out.detections)[0]
    val = np.asarray(out.valid)[0]
    if val.any():
        # conf = obj_conf * cls_conf (columns 4 = 6 * 7)
        np.testing.assert_allclose(
            det[val, 4], det[val, 6] * det[val, 7], rtol=1e-5
        )


def test_batched_nms_multilabel():
    pred = np.zeros((1, 4, 5 + 3), np.float32)
    pred[0, 0, 0:2] = 100.0
    pred[0, 0, 2:4] = 40.0
    pred[0, 0, 4] = 0.95
    pred[0, 0, 5] = 0.9
    pred[0, 0, 6] = 0.8  # second label above threshold on the same anchor
    out = batched_nms(
        jnp.asarray(pred), nc=3, conf_thres=0.25, iou_thres=0.45,
        multi_label=True, max_nms=256, max_det=10,
    )
    val = np.asarray(out.valid)[0]
    assert val.sum() == 2


def test_batched_nms_approx_topk_matches_exact_head():
    """Serving knob (ops/nms.py approx_topk): only the lowest-conf tail
    of the candidate set may differ from exact selection, so the
    high-confidence kept rows must be identical."""
    rng = np.random.default_rng(7)
    pred = _make_pred(rng, 2, 3000, 8)
    kw = dict(nc=8, conf_thres=0.001, iou_thres=0.6, multi_label=True,
              max_nms=1024, max_det=100)
    exact = batched_nms(jnp.asarray(pred), **kw)
    approx = batched_nms(jnp.asarray(pred), approx_topk=True, **kw)
    de, da = np.asarray(exact.detections), np.asarray(approx.detections)
    ve, va = np.asarray(exact.valid), np.asarray(approx.valid)
    for b in range(2):
        # the top kept rows (well above the selection tail) agree
        ne, na = ve[b].sum(), va[b].sum()
        head = min(ne, na, 20)
        assert head > 0
        np.testing.assert_allclose(de[b, :head], da[b, :head], rtol=1e-6)
