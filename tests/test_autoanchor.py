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


def test_trainer_autoanchor_wiring(tmp_path):
    """Reference trainer.py:104-120: `noautoanchor: False` must actually run
    check_anchors at train start — a deliberately mis-anchored config gets
    evolved anchors that measurably improve BPR, the evolved values re-enter
    BOTH the static loss lattice (anchors_grid) and the model spec (head
    decode), and training still runs."""
    import cv2
    import jax.numpy as jnp

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.data.autoanchor import _wh_metric
    from efficientteacher_tpu.train.trainer import Trainer

    root = tmp_path / "data"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rng = np.random.default_rng(1)
    paths = []
    for i in range(8):
        img = np.full((160, 160, 3), 70, np.uint8)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        bw, bh = rng.uniform(0.06, 0.12, 2)  # small boxes
        x1, y1 = int((cx - bw / 2) * 160), int((cy - bh / 2) * 160)
        x2, y2 = int((cx + bw / 2) * 160), int((cy + bh / 2) * 160)
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), -1)
        p = root / "images" / f"i{i:02d}.jpg"
        cv2.imwrite(str(p), img)
        (root / "labels" / f"i{i:02d}.txt").write_text(
            f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n")
        paths.append(str(p))
    (root / "train.txt").write_text("\n".join(paths))

    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    # absurdly large anchors for 6-15 px boxes
    cfg.Model.anchors = [[200, 200, 250, 250, 300, 300],
                         [320, 320, 340, 340, 360, 360],
                         [380, 380, 400, 400, 420, 420]]
    cfg.Loss.type = "ComputeLoss"
    cfg.noautoanchor = False
    cfg.Dataset.train = str(root / "train.txt")
    cfg.Dataset.val = ""
    cfg.Dataset.nc = 1
    cfg.Dataset.img_size = 128
    cfg.Dataset.batch_size = 8
    cfg.Dataset.max_targets = 8
    cfg.epochs = 1
    cfg.hyp.warmup_epochs = 0
    cfg.hyp.mosaic = 0.0
    cfg.project = str(tmp_path / "runs")
    cfg.name = "aa"
    cfg.freeze()

    bad = np.asarray(cfg.Model.anchors, np.float32).reshape(3, 3, 2)
    trainer = Trainer(cfg, compute_dtype=jnp.float32)

    evolved = np.asarray(trainer.spec.anchors, np.float32).reshape(3, 3, 2)
    assert not np.allclose(evolved, bad), "anchors were not evolved"
    # BPR measurably improves on the actual dataset geometry
    from efficientteacher_tpu.data.autoanchor import dataset_wh

    wh = dataset_wh(trainer.dataset, cfg.Dataset.img_size)
    bpr_bad = float((_wh_metric(wh, bad.reshape(-1, 2)) > 1 / 4.0).mean())
    bpr_new = float((_wh_metric(wh, evolved.reshape(-1, 2)) > 1 / 4.0).mean())
    assert bpr_new > bpr_bad
    assert bpr_new > 0.9
    # the static loss lattice got the evolved anchors (per-stride units)
    s = np.asarray(trainer.spec.strides, np.float32)[:, None, None]
    np.testing.assert_allclose(trainer.anchors_grid, evolved / s, rtol=1e-6)
    trainer.train()  # jits + trains with the evolved anchors
