"""Plots, profiler, loggers smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp

from efficientteacher_tpu.utils.callbacks import Callbacks
from efficientteacher_tpu.utils.loggers import Loggers
from efficientteacher_tpu.utils.plots import (
    plot_images,
    plot_labels,
    plot_results,
)
from efficientteacher_tpu.utils.profile import count_params, profile_fn


def test_plots(tmp_path):
    labels = [np.array([[0, 0.5, 0.5, 0.2, 0.3], [1, 0.3, 0.4, 0.1, 0.1]])]
    plot_labels(labels, nc=2, save_dir=tmp_path)
    assert (tmp_path / "labels.png").exists()

    images = np.random.default_rng(0).integers(0, 255, (4, 64, 64, 3),
                                               np.uint8)
    lab = np.zeros((4, 3, 6), np.float32)
    lab[:, 0] = [1, 0.5, 0.5, 0.4, 0.4, 0.9]
    mask = np.zeros((4, 3), bool)
    mask[:, 0] = True
    plot_images(images, lab, mask, tmp_path / "batch.png", with_scores=True)
    assert (tmp_path / "batch.png").exists()

    csv_file = tmp_path / "results.csv"
    csv_file.write_text("epoch,a,b\n0,1.0,2.0\n1,0.5,1.5\n")
    plot_results(csv_file)
    assert (tmp_path / "results.png").exists()


def test_profile_fn():
    f = lambda x: jnp.sum(x * 2)
    stats = profile_fn(f, jnp.ones((128, 128)), iters=3, warmup=1)
    assert stats["mean_ms"] > 0
    assert count_params({"a": jnp.ones((3, 4)), "b": jnp.ones(5)}) == 17


def test_loggers_csv_and_bus(tmp_path):
    lg = Loggers(tmp_path, include=("csv",))
    cb = Callbacks()
    lg.register(cb)
    cb.run("on_fit_epoch_end",
           {"train/box_loss": 0.5, "metrics/mAP_0.5": 0.3}, 0)
    cb.run("on_fit_epoch_end",
           {"train/box_loss": 0.4, "metrics/mAP_0.5": 0.4}, 1)
    cb.run("on_train_end")
    rows = (tmp_path / "results.csv").read_text().strip().splitlines()
    assert len(rows) == 3
    assert rows[0].startswith("epoch,")


def test_loggers_tensorboard(tmp_path):
    """TB writer produces event files (TF ships in this image)."""
    import pytest

    try:
        import tensorflow  # noqa: F401
    except ImportError:
        pytest.skip("tensorflow absent")
    lg = Loggers(tmp_path, include=("csv", "tb"))
    if lg.tb is None:
        pytest.skip("tb writer unavailable")
    lg.on_fit_epoch_end({"metrics/mAP_0.5": 0.1}, 0)
    lg.on_train_end()
    events = list((tmp_path / "tb").glob("events.*"))
    assert events


def test_general_helpers():
    import numpy as np

    from efficientteacher_tpu.utils.general import (
        check_img_size,
        increment_path,
        init_seeds,
        labels_to_class_weights,
    )

    labels = [np.array([[0, 0, 0, 0, 0]] * 9), np.array([[1, 0, 0, 0, 0]])]
    w = labels_to_class_weights(labels, nc=2)
    assert w[1] > w[0]  # rare class upweighted
    assert abs(w.sum() - 1.0) < 1e-6
    assert check_img_size(100, 32) == 128
    key = init_seeds(3)
    assert key.shape == (2,)


def test_curve_family_and_confusion(tmp_path):
    """PR/F1/P/R curve family from ap_per_class(plot_dir=...) and the
    confusion-matrix heatmap (reference utils/metrics.py:312-360,176-199)."""
    from efficientteacher_tpu.eval.metrics import ap_per_class
    from efficientteacher_tpu.utils.plots import plot_confusion_matrix

    rng = np.random.default_rng(0)
    n = 200
    tp = rng.random((n, 10)) > 0.4
    conf = rng.random(n)
    pred_cls = rng.integers(0, 3, n)
    target_cls = rng.integers(0, 3, 50)
    ap_per_class(tp, conf, pred_cls, target_cls,
                 plot_dir=tmp_path, names=["a", "b", "c"])
    for f in ("PR_curve.png", "F1_curve.png", "P_curve.png", "R_curve.png"):
        assert (tmp_path / f).exists(), f

    m = np.zeros((4, 4))
    m[0, 0], m[1, 2], m[3, 1] = 10, 3, 2
    plot_confusion_matrix(m, tmp_path / "cm.png", names=["a", "b", "c"])
    assert (tmp_path / "cm.png").exists()


def test_pseudo_vs_gt_plot(tmp_path):
    from efficientteacher_tpu.utils.plots import plot_pseudo_vs_gt

    imgs = np.random.default_rng(1).integers(
        0, 255, (2, 64, 64, 3), np.uint8
    )
    pl = np.zeros((2, 4, 8), np.float32)
    plm = np.zeros((2, 4), bool)
    pl[0, 0] = [1, 0.5, 0.5, 0.3, 0.3, 0.9, 0.95, 0.9]
    plm[0, 0] = True
    gt = np.zeros((2, 4, 5), np.float32)
    gtm = np.zeros((2, 4), bool)
    gt[0, 0] = [1, 0.52, 0.48, 0.3, 0.3]
    gtm[0, 0] = True
    plot_pseudo_vs_gt(imgs, pl, plm, gt, gtm, tmp_path / "pg.png")
    assert (tmp_path / "pg.png").exists()


def test_feature_visualization(tmp_path):
    from efficientteacher_tpu.utils.plots import feature_visualization

    feats = [np.random.default_rng(0).random((1, 8 // (2 ** i),
                                              8 // (2 ** i), 16))
             for i in range(2)]
    feature_visualization(feats, tmp_path / "fv.png", max_maps=8)
    assert (tmp_path / "fv_p3.png").exists()
    assert (tmp_path / "fv_p4.png").exists()
