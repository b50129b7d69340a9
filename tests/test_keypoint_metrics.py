import numpy as np

from efficientteacher_tpu.eval.keypoint_metrics import (
    kp_ap,
    oks,
    process_batch_kp,
)


def test_oks_perfect_and_far():
    gt = np.array([[[10.0, 10.0], [20.0, 20.0]]])
    areas = np.array([400.0])
    same = oks(gt.copy(), gt, areas)
    assert same[0, 0] > 0.99
    far = oks(gt + 100, gt, areas)
    assert far[0, 0] < 0.01
    # invisible points excluded
    gt_inv = gt.copy()
    gt_inv[0, 1] = -1
    assert oks(gt, gt_inv, areas)[0, 0] > 0.99


def test_process_batch_kp_and_ap():
    thr = np.linspace(0.5, 0.95, 10)
    gt = np.array([[[10.0, 10.0], [20.0, 20.0]]])
    pred = np.concatenate([gt, gt + 200])  # one perfect, one far
    correct = process_batch_kp(
        pred, np.array([0.9, 0.8]), np.array([0.0, 0.0]),
        gt, np.array([0.0]), np.array([400.0]), thr,
    )
    assert correct[0].all() and not correct[1].any()
    stats = [(correct, np.array([0.9, 0.8]), np.array([0.0, 0.0]),
              np.array([0.0]))]
    ap = kp_ap(stats)
    assert 0.3 < ap <= 1.0
