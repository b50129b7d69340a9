import numpy as np
import pytest

from efficientteacher_tpu.eval.metrics import (
    ap_per_class,
    compute_ap,
    fitness,
    process_batch,
)


def test_fitness():
    r = np.array([[0.5, 0.5, 0.6, 0.4]])
    assert fitness(r)[0] == pytest.approx(0.1 * 0.6 + 0.9 * 0.4)


def test_compute_ap_perfect():
    ap, _, _ = compute_ap(np.array([1.0]), np.array([1.0]))
    assert ap == pytest.approx(1.0, abs=0.01)


def test_process_batch_exact_match():
    iouv = np.linspace(0.5, 0.95, 10)
    det = np.array([[10, 10, 50, 50, 0.9, 1]])
    lab = np.array([[1, 10, 10, 50, 50]])
    correct = process_batch(det, lab, iouv)
    assert correct.all()  # IoU 1.0 passes every threshold
    # wrong class
    lab2 = np.array([[2, 10, 10, 50, 50]])
    assert not process_batch(det, lab2, iouv).any()
    # partial overlap passes only low thresholds
    det3 = np.array([[10, 10, 50, 50, 0.9, 1]])
    lab3 = np.array([[1, 18, 10, 58, 50]])  # IoU = 32/48 ~ 0.667
    c3 = process_batch(det3, lab3, iouv)
    assert c3[0, 0] and not c3[0, -1]


def test_process_batch_dedup():
    """Two detections on one GT: only the higher-IoU one is TP."""
    iouv = np.array([0.5])
    det = np.array([
        [10, 10, 50, 50, 0.9, 1],    # IoU 1.0
        [12, 12, 52, 52, 0.8, 1],    # overlapping duplicate
    ])
    lab = np.array([[1, 10, 10, 50, 50]])
    correct = process_batch(det, lab, iouv)
    assert correct.sum() == 1 and correct[0, 0]


def test_ap_per_class_sanity():
    """Perfect detector on 2 classes -> AP 1.0; all-FP detector -> AP 0."""
    n = 50
    rng = np.random.default_rng(0)
    tp = np.ones((n, 10), bool)
    conf = rng.uniform(0.5, 1.0, n)
    cls = rng.integers(0, 2, n).astype(float)
    p, r, ap, f1, classes, cls_thr = ap_per_class(tp, conf, cls, cls)
    assert ap.shape == (2, 10)
    np.testing.assert_allclose(ap, 1.0, atol=0.02)
    assert len(cls_thr) == 2

    tp0 = np.zeros((n, 10), bool)
    p0, r0, ap0, _, _, _ = ap_per_class(tp0, conf, cls, cls)
    np.testing.assert_allclose(ap0, 0.0, atol=1e-6)
