import numpy as np

from efficientteacher_tpu.data.autoanchor import (
    check_anchor_order,
    kmean_anchors,
    _wh_metric,
)


def test_anchor_order():
    a = np.array([[[100, 100]] * 3, [[50, 50]] * 3, [[10, 10]] * 3],
                 np.float32)
    out = check_anchor_order(a, [8, 16, 32])
    assert out[0].prod(-1).mean() < out[-1].prod(-1).mean()


def test_kmeans_recovers_clusters():
    rng = np.random.default_rng(0)
    centers = np.array([[10, 12], [40, 30], [120, 100]])
    wh = np.concatenate([
        c * rng.uniform(0.9, 1.1, (300, 2)) for c in centers
    ])
    k = kmean_anchors(wh, n=3, gen=200, seed=0)
    # every cluster center is matched well by some anchor
    m = _wh_metric(centers.astype(float), k)
    assert (m > 0.7).all(), (k, m)
