"""Auxiliary external parity anchors: eval metrics and the EMA chain
against the live reference implementations (tests/ref_compat.py)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_compat import REF_ROOT, load_reference  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not present"
)


def _random_stats(rng, n=400, nc=6, n_iou=10):
    tp = rng.random((n, n_iou))
    # monotone: tp at looser IoU implies tp at stricter-ordered columns
    tp = np.sort(tp, axis=1)[:, ::-1] > 0.45
    conf = rng.random(n)
    pred_cls = rng.integers(0, nc, n)
    target_cls = rng.integers(0, nc, 150)
    return tp.astype(np.float64), conf, pred_cls, target_cls


def test_ap_per_class_parity():
    """eval/metrics.ap_per_class vs reference utils/metrics.py:22-80 on the
    same (tp, conf, pred_cls, target_cls)."""
    import importlib

    load_reference()
    ref_metrics = importlib.import_module("utils.metrics")
    from efficientteacher_tpu.eval.metrics import ap_per_class

    rng = np.random.default_rng(0)
    tp, conf, pred_cls, target_cls = _random_stats(rng)
    rp, rr, rap, rf1, rcls = ref_metrics.ap_per_class(
        tp, conf, pred_cls, target_cls, names={i: str(i) for i in range(6)}
    )[:5]
    op, orr, oap, of1, ocls, _ = ap_per_class(tp, conf, pred_cls, target_cls)
    np.testing.assert_array_equal(ocls, rcls)
    np.testing.assert_allclose(oap, rap, atol=1e-6, err_msg="AP matrix")
    np.testing.assert_allclose(op, rp, atol=1e-6)
    np.testing.assert_allclose(orr, rr, atol=1e-6)
    np.testing.assert_allclose(of1, rf1, atol=1e-6)


def test_process_batch_parity():
    """TP matrix matching vs reference val.py:123-146 process_batch."""
    import importlib.util

    load_reference()
    spec = importlib.util.spec_from_file_location(
        "ref_val", os.path.join(REF_ROOT, "val.py")
    )
    ref_metrics = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_metrics)
    from efficientteacher_tpu.eval.metrics import process_batch

    rng = np.random.default_rng(1)
    iouv_np = np.linspace(0.5, 0.95, 10)
    det = np.zeros((12, 6), np.float32)
    det[:, 0:2] = rng.uniform(0, 500, (12, 2))
    det[:, 2:4] = det[:, 0:2] + rng.uniform(10, 120, (12, 2))
    det[:, 4] = np.sort(rng.random(12))[::-1]
    det[:, 5] = rng.integers(0, 4, 12)
    labels = np.zeros((6, 5), np.float32)
    labels[:, 0] = rng.integers(0, 4, 6)
    labels[:, 1:3] = det[:6, 0:2] + rng.uniform(-8, 8, (6, 2))
    labels[:, 3:5] = labels[:, 1:3] + rng.uniform(10, 120, (6, 2))
    want = ref_metrics.process_batch(
        torch.from_numpy(det), torch.from_numpy(labels),
        torch.from_numpy(iouv_np.astype(np.float32)),
    )
    want = want.numpy() if hasattr(want, "numpy") else np.asarray(want)
    got = process_batch(det, labels, iouv_np)
    np.testing.assert_array_equal(got.astype(bool), want.astype(bool))


def test_ema_chain_parity():
    """train_state.ema_update vs reference ModelEMA
    (utils/torch_utils.py:308-340): identical ramp decay and identical
    parameter trajectory over several updates."""
    from efficientteacher_tpu.train.train_state import EMAState, ema_update

    load_reference()
    import importlib

    tu = importlib.import_module("utils.torch_utils")

    m = torch.nn.Sequential(
        torch.nn.Linear(4, 8), torch.nn.ReLU(), torch.nn.Linear(8, 2)
    )
    ema = tu.ModelEMA(m, decay=0.9999, updates=0)

    params0 = {
        str(i): p.detach().numpy().copy()
        for i, p in enumerate(m.parameters())
    }
    state = EMAState(
        params=params0,
        batch_stats={},
        updates=jnp.int32(0),
    )
    g = torch.Generator().manual_seed(0)
    for step in range(5):
        with torch.no_grad():
            for p in m.parameters():
                p += torch.randn(p.shape, generator=g) * 0.1
        ema.update(m)
        cur = {
            str(i): p.detach().numpy()
            for i, p in enumerate(m.parameters())
        }
        state = ema_update(state, cur, {}, 0.9999, ramp=True)
    for i, p in enumerate(ema.ema.parameters()):
        np.testing.assert_allclose(
            np.asarray(state.params[str(i)]), p.detach().numpy(),
            rtol=1e-5, atol=1e-7, err_msg=f"ema param {i} after 5 updates",
        )


def test_labelmatch_thresholds_parity():
    """LabelMatch GMM-high / percentile-low thresholds vs the real
    reference utils/labelmatch.py (gmm_policy :138-189 +
    update_epoch_cls_thr :191-240) on identical per-class score lists."""
    import importlib

    load_reference()
    ref_lm_mod = importlib.import_module("utils.labelmatch")
    ns_cfg = importlib.import_module("configs.defaults").get_cfg()
    ns_cfg.Dataset.nc = 4
    ns_cfg.SSOD.ignore_thres_high = 0.6
    ns_cfg.SSOD.ignore_thres_low = 0.2
    ns_cfg.SSOD.resample_high_percent = 0.25
    ns_cfg.SSOD.resample_low_percent = 0.99

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.ssod.labelmatch import LabelMatch

    cfg = get_cfg()
    cfg.Dataset.nc = 4
    cfg.SSOD.ignore_thres_high = 0.6
    cfg.SSOD.ignore_thres_low = 0.2
    cfg.SSOD.resample_high_percent = 0.25
    cfg.SSOD.resample_low_percent = 0.99

    lnpi = 2.0
    ratio = np.full(4, 0.25)
    ref = ref_lm_mod.LabelMatch(ns_cfg, target_data_len=100,
                                label_num_per_img=lnpi, cls_ratio_gt=ratio)
    ours = LabelMatch(cfg, target_data_len=100, label_num_per_img=lnpi,
                      cls_ratio_gt=ratio)

    rng = np.random.default_rng(5)
    for epoch in range(2):
        per_cls = [
            np.concatenate([rng.uniform(0.7, 0.99, 40),
                            rng.uniform(0.05, 0.3, 60)]),  # bimodal
            rng.uniform(0.3, 0.9, 12),                     # small unimodal
            np.array([]),                                  # empty
            rng.uniform(0.0, 1.0, 3),                      # < 4 scores
        ]
        for c, scores in enumerate(per_cls):
            ref.score_list_epoch[c] = list(scores)
            ours.score_list_epoch[c] = list(scores)
        ref.update_epoch_cls_thr(epoch)
        ours.update_epoch_cls_thr(epoch)
        np.testing.assert_allclose(
            np.asarray(ours.cls_thr_high, np.float64),
            np.asarray(ref.cls_thr_high, np.float64), atol=1e-6,
            err_msg=f"epoch {epoch} thr_high",
        )
        np.testing.assert_allclose(
            np.asarray(ours.cls_thr_low, np.float64),
            np.asarray(ref.cls_thr_low, np.float64), atol=1e-6,
            err_msg=f"epoch {epoch} thr_low",
        )


def test_domain_losses_parity():
    """losses/domain_loss.py vs the real DomainLoss/TargetLoss (reference
    models/loss/loss.py:312-421) on identical GRL discriminator maps
    (.cuda() no-op'd by ref_compat on this CPU torch)."""
    import importlib

    from efficientteacher_tpu.losses.domain_loss import (
        domain_loss, target_loss,
    )

    load_reference()
    loss_mod = importlib.import_module("models.loss.loss")
    ref_d = loss_mod.DomainLoss()
    ref_t = loss_mod.TargetLoss()

    rng = np.random.default_rng(3)
    feats_nchw = [
        rng.standard_normal((2, 2, g, g)).astype(np.float32)
        for g in (16, 8, 4)
    ]
    want_d = float(ref_d([torch.from_numpy(f) for f in feats_nchw]))
    want_t = float(ref_t([torch.from_numpy(f) for f in feats_nchw]))

    feats_nhwc = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_nchw]
    got_d = float(domain_loss(feats_nhwc))
    got_t = float(target_loss(feats_nhwc))
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got_t, want_t, rtol=1e-5, atol=1e-7)


def test_fitness_parity():
    """fitness() weights 0.1*mAP50 + 0.9*mAP (reference utils/metrics.py
    :16-19)."""
    import importlib

    load_reference()
    ref_metrics = importlib.import_module("utils.metrics")
    from efficientteacher_tpu.eval.metrics import fitness

    x = np.array([[0.5, 0.6, 0.7, 0.4]])
    np.testing.assert_allclose(fitness(x), ref_metrics.fitness(x),
                               atol=1e-8)


def test_oks_parity():
    """eval/keypoint_metrics.oks vs reference utils/metrics.py:453-482
    oks_iou: sigmas=0.1, e = d^2/(2*sigma)^2/area/2 with area = the GT
    keypoint-hull bbox (poly2hbb), unmasked mean over all keypoints —
    the formula oks() now implements natively (ADVICE r3 #2)."""
    import importlib

    from efficientteacher_tpu.eval.keypoint_metrics import oks

    load_reference()
    ref_metrics = importlib.import_module("utils.metrics")

    rng = np.random.default_rng(6)
    G, P, npk = 3, 5, 4
    gt_kps = rng.uniform(50, 300, (G, npk, 2)).astype(np.float32)
    pred_kps = rng.uniform(50, 300, (P, npk, 2)).astype(np.float32)

    # reference layout: labels[:, 5:5+2np] flat xy, detections[:, -1-2np:-1]
    labels = np.zeros((G, 5 + 2 * npk), np.float32)
    labels[:, 5:] = gt_kps.reshape(G, -1)
    dets = np.zeros((P, 6 + 2 * npk + 1), np.float32)
    dets[:, -1 - 2 * npk:-1] = pred_kps.reshape(P, -1)
    want = ref_metrics.oks_iou(torch.from_numpy(labels),
                               torch.from_numpy(dets), npk)

    got = oks(pred_kps, gt_kps)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_lr_schedule_parity():
    """one_cycle / linear LR lambdas match the reference's exactly over
    every epoch (utils/general.py:480-482, trainer/trainer.py:243-245)."""
    import importlib
    import math

    from efficientteacher_tpu.train.optim import linear_lf, one_cycle

    load_reference()
    ref_general = importlib.import_module("utils.general")

    epochs, lrf = 300, 0.1
    ref_cos = ref_general.one_cycle(1, lrf, epochs)
    ref_lin = (lambda x: (1 - x / (epochs - 1)) * (1.0 - lrf) + lrf)
    our_cos = one_cycle(1, lrf, epochs)
    our_lin = linear_lf(lrf, epochs)
    for e in range(epochs):
        assert math.isclose(our_cos(e), ref_cos(e), rel_tol=1e-12), e
        assert math.isclose(our_lin(e), ref_lin(e), rel_tol=1e-12), e


def test_box_and_utils_parity():
    """Box conversions, letterbox-undo, check_img_size and class weights vs
    reference utils/general.py on identical inputs."""
    import importlib

    load_reference()
    rg = importlib.import_module("utils.general")
    from efficientteacher_tpu.eval.validator import _scale_to_native
    from efficientteacher_tpu.ops import boxes as ob
    from efficientteacher_tpu.utils.general import (
        check_img_size, labels_to_class_weights,
    )

    rng = np.random.default_rng(8)
    x = rng.uniform(0, 600, (20, 4)).astype(np.float32)
    x[:, 2:] = x[:, :2] + rng.uniform(1, 40, (20, 2))
    np.testing.assert_allclose(np.asarray(ob.xyxy2xywh(jnp.asarray(x))),
                               rg.xyxy2xywh(x), rtol=1e-6)
    xn = rng.uniform(0.05, 0.95, (20, 4)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(ob.xywh2xyxy(jnp.asarray(xn))),
                               rg.xywh2xyxy(xn), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ob.xywhn2xyxy(jnp.asarray(xn), 640, 480, 8, 4)),
        rg.xywhn2xyxy(xn, 640, 480, 8, 4), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ob.xyxy2xywhn(jnp.asarray(x), 640, 640)),
        rg.xyxy2xywhn(x, 640, 640), rtol=1e-5,
    )

    # scale_coords (letterbox undo): reference clips via clip_coords
    coords = rng.uniform(0, 640, (10, 4)).astype(np.float32)
    coords[:, 2:] = np.maximum(coords[:, 2:], coords[:, :2])
    want = rg.scale_coords((640, 640), torch.from_numpy(coords.copy()),
                           (480, 600)).numpy()
    got = _scale_to_native(coords.copy(), (640, 640), (480, 600))
    np.testing.assert_allclose(got, want, atol=1e-3)

    assert check_img_size(641) == rg.check_img_size(641)
    assert check_img_size(640) == rg.check_img_size(640)

    labels = [rng.integers(0, 5, (rng.integers(1, 6), 5)).astype(np.float32)
              for _ in range(8)]
    want_w = rg.labels_to_class_weights(labels, 5)
    want_w = want_w.numpy() if hasattr(want_w, "numpy") else want_w
    got_w = labels_to_class_weights(labels, 5)
    np.testing.assert_allclose(np.asarray(got_w, np.float64),
                               np.asarray(want_w, np.float64), rtol=1e-5)
