import numpy as np
import pytest

from efficientteacher_tpu.eval.keypoint_metrics import (
    kp_ap,
    oks,
    process_batch_kp,
)


def test_oks_perfect_and_far():
    gt = np.array([[[10.0, 10.0], [20.0, 20.0]]])
    same = oks(gt.copy(), gt)
    assert same[0, 0] > 0.99
    far = oks(gt + 100, gt)
    assert far[0, 0] < 0.01
    # reference oks_iou has NO visibility masking (utils/metrics.py:481):
    # an invisible (-1, -1) GT point contributes its raw distance, so a
    # prediction perfect on the visible point scores well below 1
    gt_inv = gt.copy()
    gt_inv[0, 1] = -1
    assert oks(gt, gt_inv)[0, 0] < 0.99


def test_process_batch_kp_and_ap():
    thr = np.linspace(0.5, 0.95, 10)
    gt = np.array([[[10.0, 10.0], [20.0, 20.0]]])
    pred = np.concatenate([gt, gt + 200])  # one perfect, one far
    correct = process_batch_kp(
        pred, np.array([0.9, 0.8]), np.array([0.0, 0.0]),
        gt, np.array([0.0]), thr,
    )
    assert correct[0].all() and not correct[1].any()
    stats = [(correct, np.array([0.9, 0.8]), np.array([0.0, 0.0]),
              np.array([0.0]))]
    ap = kp_ap(stats)
    assert 0.3 < ap <= 1.0


def test_oks_parity_vs_reference():
    """Numeric parity vs the real reference oks_iou
    (utils/metrics.py:453-482): same pairwise OKS matrix to 1e-5."""
    torch = pytest.importorskip("torch")
    import importlib

    from ref_compat import load_reference

    load_reference()
    ref_metrics = importlib.import_module("utils.metrics")

    rng = np.random.default_rng(0)
    num_points = 4
    g, p = 5, 7
    gt_kps = rng.uniform(0, 640, (g, num_points, 2)).astype(np.float32)
    # a couple of invisible markers, stored as the dataset stores them
    gt_kps[1, 2] = -1.0
    pred_kps = rng.uniform(0, 640, (p, num_points, 2)).astype(np.float32)

    # reference layout: labels (G, 5 + 2*np), detections rows end with
    # [..., kp columns ..., trailing col] (metrics.py:454-455)
    labels = np.concatenate(
        [np.zeros((g, 5), np.float32), gt_kps.reshape(g, -1)], 1)
    dets = np.concatenate(
        [np.zeros((p, 6), np.float32), pred_kps.reshape(p, -1),
         np.zeros((p, 1), np.float32)], 1)
    ref = ref_metrics.oks_iou(
        torch.from_numpy(labels), torch.from_numpy(dets), num_points)
    ref = np.asarray(ref, np.float32)

    ours = oks(pred_kps, gt_kps)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
