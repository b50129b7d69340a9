"""EXTERNAL parity anchors: the actual reference torch package.

Every other parity test in this suite checks against oracles re-derived
from *reading* the reference; a shared misreading would pass silently.
These tests instead instantiate the real reference code (torch CPU) via
tests/ref_compat.py and compare numerically:

  - Model forward (reference models/detector/yolo.py:45): random-init
    reference weights exported through utils/torch_import.py must give the
    same raw per-scale maps AND the same eval decode in flax.
  - ComputeLoss (reference models/loss/loss.py:93): identical (pred,
    targets) must give the same box/obj/cls components.
  - non_max_suppression (reference utils/general.py:994): identical
    decoded predictions must keep the same rows.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from efficientteacher_tpu.configs import get_cfg  # noqa: E402
from efficientteacher_tpu.losses.yolov5_loss import (  # noqa: E402
    YoloV5LossConfig, compute_loss,
)
from efficientteacher_tpu.models import build_model  # noqa: E402
from efficientteacher_tpu.models.spec import spec_from_cfg  # noqa: E402
from efficientteacher_tpu.ops import nms as our_nms  # noqa: E402
from efficientteacher_tpu.utils.checkpoint import intersect_trees  # noqa: E402
from efficientteacher_tpu.utils.torch_import import (  # noqa: E402
    state_dict_to_flax,
)

from ref_compat import REF_ROOT, build_ref_model, load_reference  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not present"
)


def _perturb_bn_stats(model, seed=1):
    """Randomize BN running stats so batch_stats mapping is observable."""
    g = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.5, 0.5, generator=g)
            mod.running_var.uniform_(0.5, 2.0, generator=g)


def _to_flax_variables(ref_model):
    sd = {
        k: v.detach().cpu().float().numpy()
        for k, v in ref_model.state_dict().items()
    }
    return state_dict_to_flax(sd)


def _build_ours(yaml_rel: str):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REF_ROOT, "configs", yaml_rel))
    spec = spec_from_cfg(cfg)
    return build_model(spec, ssod=False), spec, cfg


def _forward_parity(yaml_rel: str, img: int = 64, atol: float = 2e-4,
                    compare_raw: bool = True):
    ref_model, _ = build_ref_model(yaml_rel)
    _perturb_bn_stats(ref_model)
    model, spec, _ = _build_ours(yaml_rel)

    tree = _to_flax_variables(ref_model)
    x = jnp.zeros((1, img, img, 3))
    init = model.init(jax.random.PRNGKey(0), x, train=False)
    params, c1, t1 = intersect_trees(tree["params"], init["params"])
    stats, c2, t2 = intersect_trees(tree["batch_stats"], init["batch_stats"])
    # every flax leaf must be fed from the torch state_dict — no silent
    # fallback to random init
    assert c1 == t1, f"params matched {c1}/{t1}"
    assert c2 == t2, f"batch_stats matched {c2}/{t2}"

    rng = np.random.default_rng(0)
    xn = rng.standard_normal((1, 3, img, img), np.float32)
    with torch.no_grad():
        out = ref_model(torch.from_numpy(xn))
    t_dec, t_raw = out[0], out[1]

    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    o_dec, o_raw = model.apply(
        variables, jnp.asarray(xn.transpose(0, 2, 3, 1)), train=False
    )

    if compare_raw:  # anchor heads: (B, na, ny, nx, no) raw maps
        assert len(o_raw) == len(t_raw)
        for i, (tr, orr) in enumerate(zip(t_raw, o_raw)):
            want = tr.numpy()
            got = np.asarray(orr, np.float32).transpose(0, 3, 1, 2, 4)
            np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4,
                                       err_msg=f"raw scale {i}")
    np.testing.assert_allclose(
        np.asarray(o_dec, np.float32), t_dec.numpy(), atol=atol * 10,
        rtol=1e-4, err_msg="eval decode",
    )


def test_forward_parity_yolov5s():
    _forward_parity("sup/public/yolov5s_coco.yaml")


def test_forward_parity_yolov5l():
    _forward_parity("sup/public/yolov5l_coco.yaml")


def test_forward_parity_yolov7l():
    """IDetect head: implicit add/mul layers ride through the importer."""
    _forward_parity("sup/public/yolov7l_coco.yaml")


def test_forward_parity_yolox():
    """Anchor-free decoupled head (stems/cls/reg/obj branches)."""
    _forward_parity("sup/public/yolox_coco.yaml", compare_raw=False)


def test_forward_parity_yolov6s():
    """EfficientRep backbone + RepPAN + DFL head decode."""
    _forward_parity("sup/public/yolov6s_coco_repopt.yaml",
                    compare_raw=False)


def test_forward_parity_yolov8m():
    """C2f backbone + v8 DFL head decode."""
    _forward_parity("sup/public/yolov8m_coco.yaml", compare_raw=False)


def test_loss_parity_yolov5():
    """Identical (pred, targets) through both ComputeLoss implementations
    (reference models/loss/loss.py:138-209 default_loss)."""
    yaml_rel = "sup/public/yolov5s_coco.yaml"
    ref_model, ref_cfg = build_ref_model(yaml_rel)
    ns = load_reference()
    ref_loss = ns.ComputeLoss(ref_model, ref_cfg)

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REF_ROOT, "configs", yaml_rel))
    spec = spec_from_cfg(cfg)
    lc = YoloV5LossConfig.from_cfg(cfg, nl=spec.nl)
    s = np.asarray(spec.strides, np.float32)[:, None, None]
    anchors_grid = (
        np.asarray(spec.anchors, np.float32).reshape(spec.nl, -1, 2) / s
    )

    B, img, nc, na = 2, 64, cfg.Dataset.nc, 3
    no = nc + 5
    rng = np.random.default_rng(3)
    preds_t, preds_j = [], []
    for st in spec.strides:
        g = img // int(st)
        raw = rng.standard_normal((B, na, g, g, no)).astype(np.float32) * 0.7
        preds_t.append(torch.from_numpy(raw))
        preds_j.append(jnp.asarray(raw.transpose(0, 2, 3, 1, 4)))

    # well-separated boxes (scatter collisions resolve differently: torch
    # last-write vs our max — identical when cells are unique)
    targets = np.array(
        [
            [0, 3, 0.25, 0.25, 0.20, 0.30],
            [0, 17, 0.75, 0.60, 0.40, 0.35],
            [1, 0, 0.50, 0.30, 0.10, 0.10],
            [1, 42, 0.20, 0.80, 0.55, 0.25],
            [1, 9, 0.85, 0.15, 0.08, 0.22],
        ],
        np.float32,
    )
    want_total, want = ref_loss(preds_t, torch.from_numpy(targets))

    M = 8
    labels = np.zeros((B, M, 5), np.float32)
    mask = np.zeros((B, M), bool)
    for bi in range(B):
        rows = targets[targets[:, 0] == bi][:, 1:]
        labels[bi, : len(rows)] = rows
        mask[bi, : len(rows)] = True

    got_total, got = compute_loss(
        preds_j, jnp.asarray(labels), jnp.asarray(mask), anchors_grid, lc
    )
    for k in ("box", "obj", "cls"):
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=2e-4, atol=1e-6,
            err_msg=f"loss component {k}",
        )
    np.testing.assert_allclose(
        float(got_total), float(want_total), rtol=2e-4, atol=1e-6
    )


def _random_decoded_preds(rng, B=2, N=300, nc=20, img=640):
    xy = rng.uniform(60, img - 60, (B, N, 2))
    wh = rng.uniform(8, 120, (B, N, 2))
    obj = rng.uniform(0, 1, (B, N, 1))
    cls = rng.uniform(0, 1, (B, N, nc))
    return np.concatenate([xy, wh, obj, cls], -1).astype(np.float32)


@pytest.mark.parametrize("multi_label", [False, True])
def test_nms_parity(multi_label):
    """ops/nms.py vs reference utils/general.py:994 on identical preds."""
    ns = load_reference()
    rng = np.random.default_rng(11)
    pred = _random_decoded_preds(rng)
    conf, iou = 0.25, 0.5

    want = ns.general.non_max_suppression(
        torch.from_numpy(pred), conf_thres=conf, iou_thres=iou,
        multi_label=multi_label,
    )
    got = our_nms.non_max_suppression(
        jnp.asarray(pred), conf_thres=conf, iou_thres=iou,
        multi_label=multi_label,
    )
    dets = np.asarray(got.detections)
    valid = np.asarray(got.valid)
    for bi in range(pred.shape[0]):
        w = want[bi].numpy()
        g = dets[bi][valid[bi]]
        assert len(g) == len(w), f"image {bi}: {len(g)} vs {len(w)} kept"
        # same descending-conf order
        np.testing.assert_allclose(g[:, 4], w[:, 4], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(g[:, :4], w[:, :4], rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(g[:, 5].astype(int),
                                      w[:, 5].astype(int))


@pytest.mark.parametrize("multi_label", [False, True])
def test_nms_parity_classes_filter(multi_label):
    """`classes=[...]` filter (reference utils/general.py:1049-1051): only
    the listed class indices survive, same rows as upstream."""
    ns = load_reference()
    rng = np.random.default_rng(13)
    pred = _random_decoded_preds(rng, B=2, N=300, nc=20)
    classes = [1, 4, 7]

    want = ns.general.non_max_suppression(
        torch.from_numpy(pred), conf_thres=0.25, iou_thres=0.5,
        classes=classes, multi_label=multi_label,
    )
    got = our_nms.non_max_suppression(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.5,
        classes=classes, multi_label=multi_label,
    )
    dets = np.asarray(got.detections)
    valid = np.asarray(got.valid)
    for bi in range(pred.shape[0]):
        w = want[bi].numpy()
        g = dets[bi][valid[bi]]
        assert len(g) == len(w), f"image {bi}: {len(g)} vs {len(w)} kept"
        assert set(np.unique(g[:, 5]).astype(int)) <= set(classes)
        np.testing.assert_allclose(g[:, 4], w[:, 4], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(g[:, :4], w[:, :4], rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(g[:, 5].astype(int),
                                      w[:, 5].astype(int))


def test_nms_parity_ssod_columns():
    """non_max_suppression_ssod (reference utils/general.py:887) carries
    [xyxy, conf, cls, obj_conf, cls_conf]."""
    ns = load_reference()
    rng = np.random.default_rng(12)
    pred = _random_decoded_preds(rng, B=1, N=200, nc=8)
    want = ns.general.non_max_suppression_ssod(
        torch.from_numpy(pred), conf_thres=0.2, iou_thres=0.5
    )
    got = our_nms.non_max_suppression_ssod(
        jnp.asarray(pred), conf_thres=0.2, iou_thres=0.5
    )
    dets = np.asarray(got.detections)[0][np.asarray(got.valid)[0]]
    w = want[0].numpy()
    assert len(dets) == len(w)
    np.testing.assert_allclose(dets[:, :4], w[:, :4], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(dets[:, 6], w[:, 6], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dets[:, 7], w[:, 7], rtol=1e-5, atol=1e-5)


def _crowded_decoded_preds(rng, B, N, nc, img=640, clusters=150):
    """Decoded preds where boxes pile up in clusters so NMS has real
    suppression work and (anchor, class) candidates far exceed 4096."""
    centers = rng.uniform(80, img - 80, (clusters, 2))
    sizes = rng.uniform(24, 70, (clusters, 2))
    which = rng.integers(0, clusters, (B, N))
    xy = centers[which] + rng.normal(0, 2.5, (B, N, 2))
    wh = sizes[which] * rng.uniform(0.95, 1.05, (B, N, 2))
    obj = rng.uniform(0.05, 0.9, (B, N, 1))
    cls = rng.uniform(0.0, 0.9, (B, N, nc))
    return np.concatenate([xy, wh, obj, cls], -1).astype(np.float32)


@pytest.mark.parametrize(
    "n,nc,clusters,min_cand",
    [(1200, 8, 150, 4096),    # ~9.6k candidates: above the old 4096 cap,
                              # below the reference's 30000 — the regression
                              # the cap fix closes (VERDICT r2 Weak #3)
     (2200, 16, 60, 30000)],  # >30k candidates: both sides truncate at the
                              # reference's max_nms=30000 identically
                              # (tight clusters keep the pure-python shim
                              # under the reference's 10s NMS time limit)
)
def test_nms_parity_crowded_val_settings(n, nc, clusters, min_cand):
    """Row-for-row parity vs reference utils/general.py:994 at the val
    contract (conf 0.001, iou 0.6, multi_label) on crowded images whose
    candidate count exceeds 4096."""
    ns = load_reference()
    rng = np.random.default_rng(21)
    pred = _crowded_decoded_preds(rng, B=2, N=n, nc=nc, clusters=clusters)
    n_cand = int((pred[..., 4:5] * pred[..., 5:] > 0.001).sum(axis=(1, 2)).min())
    assert n_cand > min_cand, f"test not crowded enough: {n_cand}"

    # one reference call per image: its internal 10 s time limit
    # (general.py:1020) is per CALL, and the pure-python torchvision shim
    # needs the full budget for each crowded image
    want = [
        ns.general.non_max_suppression(
            torch.from_numpy(pred[bi:bi + 1]), conf_thres=0.001,
            iou_thres=0.6, multi_label=True,
        )[0]
        for bi in range(pred.shape[0])
    ]
    got = our_nms.non_max_suppression(
        jnp.asarray(pred), conf_thres=0.001, iou_thres=0.6, multi_label=True,
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


def test_ssod_loss_parity():
    """compute_ssod_loss vs the real ComputeStudentMatchLoss
    (reference models/loss/ssod/ssod_loss.py:26-295) on identical
    (pred, pseudo targets)."""
    from efficientteacher_tpu.losses.ssod_loss import (
        SSODLossConfig, compute_ssod_loss,
    )

    yaml_rel = "sup/public/yolov5s_coco.yaml"
    ref_model, ref_cfg = build_ref_model(yaml_rel)
    ref_cfg.defrost()
    ref_cfg.SSOD.uncertain_aug = True
    ref_cfg.SSOD.pseudo_label_with_obj = True
    ref_cfg.SSOD.pseudo_label_with_bbox = True
    ref_cfg.SSOD.pseudo_label_with_cls = True
    ref_cfg.SSOD.ignore_obj = False
    ref_cfg.SSOD.focal_loss = 0
    ref_cfg.SSOD.ignore_thres_high = 0.6
    ref_cfg.SSOD.ignore_thres_low = 0.3
    ref_cfg.freeze()
    import importlib

    ssod_mod = importlib.import_module("models.loss.ssod.ssod_loss")
    ref_loss = ssod_mod.ComputeStudentMatchLoss(ref_model, ref_cfg)

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REF_ROOT, "configs", yaml_rel))
    cfg.SSOD.uncertain_aug = True
    cfg.SSOD.pseudo_label_with_obj = True
    cfg.SSOD.pseudo_label_with_bbox = True
    cfg.SSOD.pseudo_label_with_cls = True
    cfg.SSOD.ignore_obj = False
    cfg.SSOD.focal_loss = 0
    spec = spec_from_cfg(cfg)
    lc = SSODLossConfig.from_cfg(cfg, nl=spec.nl)
    s = np.asarray(spec.strides, np.float32)[:, None, None]
    anchors_grid = (
        np.asarray(spec.anchors, np.float32).reshape(spec.nl, -1, 2) / s
    )

    B, img, nc, na = 2, 64, cfg.Dataset.nc, 3
    no = nc + 5
    rng = np.random.default_rng(7)
    preds_t, preds_j = [], []
    for st in spec.strides:
        g = img // int(st)
        raw = rng.standard_normal((B, na, g, g, no)).astype(np.float32) * 0.6
        preds_t.append(torch.from_numpy(raw))
        preds_j.append(jnp.asarray(raw.transpose(0, 2, 3, 1, 4)))

    # [img, cls, xywhn, conf, obj_conf, cls_conf]: reliable / uncertain
    # (+obj, +cls variants) / below-low, well-separated cells
    rows = np.array(
        [
            [0, 3, 0.25, 0.25, 0.20, 0.30, 0.90, 0.95, 0.40],   # reliable
            [0, 17, 0.75, 0.60, 0.35, 0.30, 0.45, 0.995, 0.50],  # uc + obj
            [1, 0, 0.50, 0.30, 0.12, 0.12, 0.42, 0.50, 0.997],   # uc + cls
            [1, 42, 0.20, 0.80, 0.50, 0.25, 0.35, 0.995, 0.995],  # uc both
            [1, 9, 0.85, 0.15, 0.08, 0.20, 0.10, 0.20, 0.20],    # dropped
        ],
        np.float32,
    )
    want_total, want = ref_loss(preds_t, torch.from_numpy(rows))

    M = 8
    labels = np.zeros((B, M, 8), np.float32)
    mask = np.zeros((B, M), bool)
    for bi in range(B):
        sel = rows[rows[:, 0] == bi][:, 1:]
        labels[bi, : len(sel)] = sel
        mask[bi, : len(sel)] = True
    thr_high = jnp.full((nc,), 0.6)
    thr_low = jnp.full((nc,), 0.3)
    got_total, got = compute_ssod_loss(
        preds_j, jnp.asarray(labels), jnp.asarray(mask), thr_high, thr_low,
        anchors_grid, lc,
    )
    for k in ("ss_box", "ss_obj", "ss_cls"):
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=3e-4, atol=1e-6,
            err_msg=f"ssod component {k}",
        )
    np.testing.assert_allclose(float(got_total), float(want_total),
                               rtol=3e-4, atol=1e-6)


def test_ota_loss_parity():
    """compute_ota_loss vs the real ComputeLoss.ota_loss (reference
    models/loss/loss.py:213-303 with assigner_type=SimOTA)."""
    from efficientteacher_tpu.losses.yolov5_ota_loss import compute_ota_loss

    yaml_rel = "sup/public/yolov5s_coco.yaml"
    ref_model, ref_cfg = build_ref_model(yaml_rel)
    ref_cfg.defrost()
    ref_cfg.Loss.assigner_type = "SimOTA"
    ref_cfg.freeze()
    ns = load_reference()
    ref_loss = ns.ComputeLoss(ref_model, ref_cfg)

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REF_ROOT, "configs", yaml_rel))
    spec = spec_from_cfg(cfg)
    lc = YoloV5LossConfig.from_cfg(cfg, nl=spec.nl)
    s = np.asarray(spec.strides, np.float32)[:, None, None]
    anchors_grid = (
        np.asarray(spec.anchors, np.float32).reshape(spec.nl, -1, 2) / s
    )

    # img must be 640: the reference scales GT boxes by a HARDCODED 640
    # (yolo_anchor_assigner.py:128 'txywh = this_target[:, 2:6] * 640 #TODO')
    # while predictions use the true grid; our impl uses the real img_size,
    # so the two agree exactly at 640
    B, img, nc, na = 2, 640, cfg.Dataset.nc, 3
    no = nc + 5
    rng = np.random.default_rng(9)
    preds_t, preds_j = [], []
    for st in spec.strides:
        g = img // int(st)
        raw = rng.standard_normal((B, na, g, g, no)).astype(np.float32) * 0.5
        preds_t.append(torch.from_numpy(raw))
        preds_j.append(jnp.asarray(raw.transpose(0, 2, 3, 1, 4)))

    targets = np.array(
        [
            [0, 3, 0.30, 0.30, 0.25, 0.30],
            [0, 17, 0.75, 0.65, 0.30, 0.30],
            [1, 0, 0.45, 0.25, 0.15, 0.15],
            [1, 42, 0.20, 0.80, 0.45, 0.25],
        ],
        np.float32,
    )
    want_total, want = ref_loss(preds_t, torch.from_numpy(targets))

    M = 8
    labels = np.zeros((B, M, 5), np.float32)
    mask = np.zeros((B, M), bool)
    for bi in range(B):
        sel = targets[targets[:, 0] == bi][:, 1:]
        labels[bi, : len(sel)] = sel
        mask[bi, : len(sel)] = True
    got_total, got = compute_ota_loss(
        preds_j, jnp.asarray(labels), jnp.asarray(mask), anchors_grid,
        spec.strides, img, lc, top_k=int(cfg.Loss.top_k),
    )
    for k in ("box", "obj", "cls"):
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=1e-3, atol=1e-6,
            err_msg=f"ota component {k}",
        )


def test_ssod_ota_loss_parity():
    """compute_ssod_ota_loss vs the real ComputeStudentMatchLoss.ota_loss
    (reference ssod_loss.py:296-345 with use_ota=True; the assigner is
    built WITHOUT top_k, i.e. ctor default 1).

    NOTE: the reference branch is BROKEN UPSTREAM — ssod_loss.py:302-303
    passes with_pseudo_scores= (plural) to YOLOAnchorAssigner.forward which
    only accepts with_pseudo_score (yolo_anchor_assigner.py:34-37), so
    SSOD.use_ota crashes with a TypeError in the reference. The oracle here
    is the reference with ONLY that keyword repaired (an adapter around its
    own assigner) — the same treatment SURVEY §2.11 gives other
    dead-on-arrival reference paths."""
    from efficientteacher_tpu.losses.ssod_loss import (
        SSODLossConfig, compute_ssod_ota_loss,
    )

    yaml_rel = "sup/public/yolov5s_coco.yaml"
    ref_model, ref_cfg = build_ref_model(yaml_rel)
    ref_cfg.defrost()
    ref_cfg.SSOD.use_ota = True
    ref_cfg.SSOD.uncertain_aug = True
    ref_cfg.SSOD.pseudo_label_with_obj = True
    ref_cfg.SSOD.ignore_obj = False
    ref_cfg.SSOD.focal_loss = 0
    ref_cfg.SSOD.ignore_thres_high = 0.6
    ref_cfg.SSOD.ignore_thres_low = 0.3
    ref_cfg.freeze()
    import importlib

    ssod_mod = importlib.import_module("models.loss.ssod.ssod_loss")
    ref_loss = ssod_mod.ComputeStudentMatchLoss(ref_model, ref_cfg)
    orig_assigner = ref_loss.assigner

    def adapter(p, targets, **kw):
        if "with_pseudo_scores" in kw:
            kw["with_pseudo_score"] = kw.pop("with_pseudo_scores")
        return orig_assigner(p, targets, **kw)

    ref_loss.assigner = adapter

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REF_ROOT, "configs", yaml_rel))
    cfg.SSOD.uncertain_aug = True
    cfg.SSOD.pseudo_label_with_obj = True
    cfg.SSOD.ignore_obj = False
    cfg.SSOD.focal_loss = 0
    spec = spec_from_cfg(cfg)
    lc = SSODLossConfig.from_cfg(cfg, nl=spec.nl)
    s = np.asarray(spec.strides, np.float32)[:, None, None]
    anchors_grid = (
        np.asarray(spec.anchors, np.float32).reshape(spec.nl, -1, 2) / s
    )

    # img must be 640: the reference OTA cost scales GT by a hardcoded 640
    B, img, nc, na = 2, 640, cfg.Dataset.nc, 3
    no = nc + 5
    rng = np.random.default_rng(21)
    preds_t, preds_j = [], []
    for st in spec.strides:
        g = img // int(st)
        raw = rng.standard_normal((B, na, g, g, no)).astype(np.float32) * 0.5
        preds_t.append(torch.from_numpy(raw))
        preds_j.append(jnp.asarray(raw.transpose(0, 2, 3, 1, 4)))

    rows = np.array(
        [
            [0, 3, 0.25, 0.25, 0.20, 0.30, 0.90, 0.95, 0.40],   # reliable
            [0, 17, 0.75, 0.60, 0.35, 0.30, 0.45, 0.995, 0.50],  # uncertain
            [1, 0, 0.50, 0.30, 0.12, 0.12, 0.42, 0.50, 0.997],   # uncertain
            [1, 42, 0.20, 0.80, 0.50, 0.25, 0.80, 0.9, 0.9],     # reliable
            [1, 9, 0.85, 0.15, 0.08, 0.20, 0.10, 0.20, 0.20],    # dropped
        ],
        np.float32,
    )
    want_total, want = ref_loss(preds_t, torch.from_numpy(rows))

    M = 8
    labels = np.zeros((B, M, 8), np.float32)
    mask = np.zeros((B, M), bool)
    for bi in range(B):
        sel = rows[rows[:, 0] == bi][:, 1:]
        labels[bi, : len(sel)] = sel
        mask[bi, : len(sel)] = True
    thr_high = jnp.full((nc,), 0.6)
    thr_low = jnp.full((nc,), 0.3)
    got_total, got = compute_ssod_ota_loss(
        preds_j, jnp.asarray(labels), jnp.asarray(mask), thr_high, thr_low,
        anchors_grid, spec.strides, img, lc, top_k=1,
    )
    for k in ("ss_box", "ss_obj", "ss_cls"):
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=1e-3, atol=1e-6,
            err_msg=f"ssod ota component {k}",
        )
    np.testing.assert_allclose(float(got_total), float(want_total),
                               rtol=1e-3, atol=1e-6)


def test_loss_parity_focal_smoothing():
    """ComputeLoss with focal loss + label smoothing enabled (reference
    FocalLoss wrapper loss.py:60-91 + smooth_BCE)."""
    yaml_rel = "sup/public/yolov5s_coco.yaml"
    ref_model, ref_cfg = build_ref_model(yaml_rel)
    ref_cfg.defrost()
    ref_cfg.Loss.fl_gamma = 1.5
    ref_cfg.Loss.label_smoothing = 0.1
    ref_cfg.Loss.cls_pw = 0.8
    ref_cfg.Loss.obj_pw = 1.2
    ref_cfg.freeze()
    ns = load_reference()
    ref_loss = ns.ComputeLoss(ref_model, ref_cfg)

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REF_ROOT, "configs", yaml_rel))
    cfg.Loss.fl_gamma = 1.5
    cfg.Loss.label_smoothing = 0.1
    cfg.Loss.cls_pw = 0.8
    cfg.Loss.obj_pw = 1.2
    spec = spec_from_cfg(cfg)
    lc = YoloV5LossConfig.from_cfg(cfg, nl=spec.nl)
    s = np.asarray(spec.strides, np.float32)[:, None, None]
    anchors_grid = (
        np.asarray(spec.anchors, np.float32).reshape(spec.nl, -1, 2) / s
    )

    B, img, nc, na = 2, 64, cfg.Dataset.nc, 3
    no = nc + 5
    rng = np.random.default_rng(31)
    preds_t, preds_j = [], []
    for st in spec.strides:
        g = img // int(st)
        raw = rng.standard_normal((B, na, g, g, no)).astype(np.float32) * 0.7
        preds_t.append(torch.from_numpy(raw))
        preds_j.append(jnp.asarray(raw.transpose(0, 2, 3, 1, 4)))
    targets = np.array(
        [
            [0, 5, 0.30, 0.35, 0.22, 0.28],
            [1, 11, 0.70, 0.55, 0.30, 0.40],
        ],
        np.float32,
    )
    want_total, want = ref_loss(preds_t, torch.from_numpy(targets))
    M = 4
    labels = np.zeros((B, M, 5), np.float32)
    mask = np.zeros((B, M), bool)
    for bi in range(B):
        rows = targets[targets[:, 0] == bi][:, 1:]
        labels[bi, : len(rows)] = rows
        mask[bi, : len(rows)] = True
    got_total, got = compute_loss(
        preds_j, jnp.asarray(labels), jnp.asarray(mask), anchors_grid, lc
    )
    for k in ("box", "obj", "cls"):
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=3e-4, atol=1e-6,
            err_msg=f"focal loss component {k}",
        )


def test_ssod_loss_parity_ignore_obj():
    """compute_ssod_loss with ignore_obj=True (uncertain cells leave the
    obj BCE) and pseudo_label_with_obj=False (uncertain score = conf)."""
    from efficientteacher_tpu.losses.ssod_loss import (
        SSODLossConfig, compute_ssod_loss,
    )

    yaml_rel = "sup/public/yolov5s_coco.yaml"
    ref_model, ref_cfg = build_ref_model(yaml_rel)
    ref_cfg.defrost()
    ref_cfg.SSOD.uncertain_aug = True
    ref_cfg.SSOD.pseudo_label_with_obj = False
    ref_cfg.SSOD.pseudo_label_with_bbox = False
    ref_cfg.SSOD.pseudo_label_with_cls = False
    ref_cfg.SSOD.ignore_obj = True
    ref_cfg.SSOD.focal_loss = 0
    ref_cfg.SSOD.ignore_thres_high = 0.6
    ref_cfg.SSOD.ignore_thres_low = 0.3
    ref_cfg.freeze()
    import importlib

    ssod_mod = importlib.import_module("models.loss.ssod.ssod_loss")
    ref_loss = ssod_mod.ComputeStudentMatchLoss(ref_model, ref_cfg)

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REF_ROOT, "configs", yaml_rel))
    cfg.SSOD.uncertain_aug = True
    cfg.SSOD.pseudo_label_with_obj = False
    cfg.SSOD.pseudo_label_with_bbox = False
    cfg.SSOD.pseudo_label_with_cls = False
    cfg.SSOD.ignore_obj = True
    cfg.SSOD.focal_loss = 0
    spec = spec_from_cfg(cfg)
    lc = SSODLossConfig.from_cfg(cfg, nl=spec.nl)
    s = np.asarray(spec.strides, np.float32)[:, None, None]
    anchors_grid = (
        np.asarray(spec.anchors, np.float32).reshape(spec.nl, -1, 2) / s
    )

    B, img, nc, na = 2, 64, cfg.Dataset.nc, 3
    no = nc + 5
    rng = np.random.default_rng(33)
    preds_t, preds_j = [], []
    for st in spec.strides:
        g = img // int(st)
        raw = rng.standard_normal((B, na, g, g, no)).astype(np.float32) * 0.6
        preds_t.append(torch.from_numpy(raw))
        preds_j.append(jnp.asarray(raw.transpose(0, 2, 3, 1, 4)))
    rows = np.array(
        [
            [0, 3, 0.25, 0.25, 0.20, 0.30, 0.90, 0.95, 0.40],
            [0, 17, 0.75, 0.60, 0.35, 0.30, 0.45, 0.995, 0.50],
            [1, 0, 0.50, 0.30, 0.12, 0.12, 0.42, 0.50, 0.997],
            [1, 9, 0.85, 0.15, 0.08, 0.20, 0.10, 0.20, 0.20],
        ],
        np.float32,
    )
    want_total, want = ref_loss(preds_t, torch.from_numpy(rows))
    M = 8
    labels = np.zeros((B, M, 8), np.float32)
    mask = np.zeros((B, M), bool)
    for bi in range(B):
        sel = rows[rows[:, 0] == bi][:, 1:]
        labels[bi, : len(sel)] = sel
        mask[bi, : len(sel)] = True
    got_total, got = compute_ssod_loss(
        preds_j, jnp.asarray(labels), jnp.asarray(mask),
        jnp.full((nc,), 0.6), jnp.full((nc,), 0.3), anchors_grid, lc,
    )
    for k in ("ss_box", "ss_obj", "ss_cls"):
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=3e-4, atol=1e-6,
            err_msg=f"ignore_obj component {k}",
        )


def test_nms_parity_agnostic():
    """Class-agnostic NMS (reference general.py:994 agnostic=True)."""
    ns = load_reference()
    rng = np.random.default_rng(13)
    pred = _random_decoded_preds(rng, B=1, N=250, nc=10)
    want = ns.general.non_max_suppression(
        torch.from_numpy(pred), conf_thres=0.25, iou_thres=0.5,
        agnostic=True,
    )
    got = our_nms.non_max_suppression(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.5, agnostic=True,
    )
    dets = np.asarray(got.detections)[0][np.asarray(got.valid)[0]]
    w = want[0].numpy()
    assert len(dets) == len(w)
    np.testing.assert_allclose(dets[:, 4], w[:, 4], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dets[:, :4], w[:, :4], rtol=1e-4, atol=1e-3)


def test_pseudo_label_pipeline_parity():
    """The on-device pseudo-label path (ssod/pseudo_label.py: NMS ->
    M-warp -> box_candidates -> flips) vs the real reference
    FairPseudoLabel.create_pseudo_label_online_with_gt
    (utils/self_supervised_utils.py:194-246) on identical decoded teacher
    predictions and M_s records."""
    import importlib

    from efficientteacher_tpu.ssod.pseudo_label import create_pseudo_labels

    load_reference()
    ssu = importlib.import_module("utils.self_supervised_utils")
    ns = load_reference()
    ref_cfg = ns.get_cfg()
    ref_cfg.SSOD.nms_conf_thres = 0.3
    ref_cfg.SSOD.nms_iou_thres = 0.5
    ref_cfg.SSOD.multi_label = False
    ref_cfg.Dataset.np = 0
    fair = ssu.FairPseudoLabel(ref_cfg)

    B, N, nc, img = 2, 200, 6, 128
    rng = np.random.default_rng(41)
    pred = np.zeros((B, N, 5 + nc), np.float32)
    pred[..., 0:2] = rng.uniform(20, img - 20, (B, N, 2))
    pred[..., 2:4] = rng.uniform(8, 50, (B, N, 2))
    pred[..., 4] = rng.uniform(0, 0.25, (B, N))  # mostly below conf
    pred[..., 5:] = rng.uniform(0, 1, (B, N, nc))
    # a few confident well-separated detections per image
    for bi in range(B):
        for k, (cx, cy) in enumerate([(30, 30), (90, 40), (60, 95)]):
            pred[bi, k, 0:4] = [cx + 3 * bi, cy, 24, 30]
            pred[bi, k, 4] = 0.85 + 0.03 * k
            pred[bi, k, 5:] = 0.05
            pred[bi, k, 5 + (k + bi) % nc] = 0.9

    # per-image affine + flips (the M_s contract)
    m_s = np.zeros((B, 13), np.float32)
    from efficientteacher_tpu.data.augment import build_affine
    import random as _random

    host_rng = _random.Random(7)
    for bi in range(B):
        M, sc = build_affine(img, img, degrees=0.0, translate=0.1,
                             scale=0.3, shear=0.0, perspective=0.0,
                             rng=host_rng)
        m_s[bi, 0] = bi
        m_s[bi, 1:10] = M.reshape(-1)
        m_s[bi, 10] = sc
        m_s[bi, 11] = float(bi % 2)        # flipud on image 1
        m_s[bi, 12] = float((bi + 1) % 2)  # fliplr on image 0

    t_imgs = torch.zeros((B, 3, img, img))
    want_rows, invalid = fair.create_pseudo_label_online_with_gt(
        torch.from_numpy(pred.copy()), t_imgs, torch.from_numpy(m_s),
        t_imgs,
    )
    assert not invalid
    want_rows = np.asarray(want_rows, np.float32)  # [img, cls, xywhn, ...]

    pl = create_pseudo_labels(
        jnp.asarray(pred), jnp.asarray(m_s), img_size=img, nc=nc,
        conf_thres=0.3, iou_thres=0.5, max_pl=16, multi_label=False,
    )
    labels = np.asarray(pl.labels)
    mask = np.asarray(pl.mask)
    for bi in range(B):
        w = want_rows[want_rows[:, 0] == bi]
        g = labels[bi][mask[bi]]
        assert len(g) == len(w), f"img {bi}: {len(g)} vs {len(w)} pseudo"
        w = w[np.argsort(-w[:, 6])]
        g = g[np.argsort(-g[:, 5])]
        np.testing.assert_array_equal(g[:, 0].astype(int),
                                      w[:, 1].astype(int))
        np.testing.assert_allclose(g[:, 1:5], w[:, 2:6], atol=2e-3,
                                   err_msg=f"img {bi} xywhn")
        np.testing.assert_allclose(g[:, 5], w[:, 6], atol=1e-4)   # conf
        np.testing.assert_allclose(g[:, 6], w[:, 7], atol=1e-4)   # obj
        np.testing.assert_allclose(g[:, 7], w[:, 8], atol=1e-4)   # cls


def test_multi_teacher_pseudo_label_parity():
    """create_pseudo_labels_multi vs the real
    FairPseudoLabel.create_pseudo_label_online_with_extra_teachers
    (self_supervised_utils.py:249-313): per-teacher NMS, class remap,
    class-agnostic merge NMS, then the M-warp path.

    NOTE: this reference branch also CRASHES upstream — it feeds 6-column
    plain-NMS rows into output_to_target_ssod's 8-column unpack
    (plots.py:489). The oracle here is the reference with its NMS swapped
    for non_max_suppression_ssod (the 8-column variant the rest of its own
    pipeline expects), which is exactly our implementation's reading.

    The remap dict covers every teacher class (where our -1-drops and the
    reference's keep-original behaviors coincide; for uncovered classes we
    deliberately DROP while the reference leaks the foreign index)."""
    import importlib

    from efficientteacher_tpu.ssod.pseudo_label import (
        create_pseudo_labels_multi,
    )

    ns = load_reference()
    ssu = importlib.import_module("utils.self_supervised_utils")
    ref_cfg = ns.get_cfg()
    ref_cfg.SSOD.nms_conf_thres = 0.3
    ref_cfg.SSOD.nms_iou_thres = 0.5
    ref_cfg.SSOD.multi_label = False
    ref_cfg.Dataset.np = 0
    fair = ssu.FairPseudoLabel(ref_cfg)
    # minimal upstream repair: the 8-column NMS the downstream unpack needs
    orig_nms = ssu.non_max_suppression
    ssu.non_max_suppression = (
        lambda *a, labels=(), **k: ssu.non_max_suppression_ssod(*a, **k)
    )

    B, N, nc, nc_t, img = 2, 120, 6, 2, 128
    rng = np.random.default_rng(51)

    def mk(nc_, boxes):
        pred = np.zeros((B, N, 5 + nc_), np.float32)
        pred[..., 0:2] = rng.uniform(20, img - 20, (B, N, 2))
        pred[..., 2:4] = rng.uniform(8, 40, (B, N, 2))
        pred[..., 4] = rng.uniform(0, 0.2, (B, N))
        pred[..., 5:] = rng.uniform(0, 1, (B, N, nc_))
        for bi, rows in enumerate(boxes):
            for k, (cx, cy, conf, cls) in enumerate(rows):
                pred[bi, k, 0:4] = [cx, cy, 26, 30]
                pred[bi, k, 4] = conf
                pred[bi, k, 5:] = 0.05
                pred[bi, k, 5 + cls] = 0.9
        return pred

    main = mk(nc, [[(30, 30, 0.9, 1), (95, 40, 0.85, 4)],
                   [(60, 60, 0.88, 2)]])
    # extra teacher overlaps main box 0 of image 0 (merge NMS must pick
    # one) and adds a fresh box in image 1
    extra = mk(nc_t, [[(32, 31, 0.95, 0)],
                      [(100, 100, 0.8, 1)]])
    cmap = {0: 3, 1: 0}  # teacher cls -> main cls, full coverage

    m_s = np.zeros((B, 13), np.float32)
    from efficientteacher_tpu.data.augment import build_affine
    import random as _random

    host_rng = _random.Random(3)
    for bi in range(B):
        M, sc = build_affine(img, img, degrees=0.0, translate=0.05,
                             scale=0.2, shear=0.0, perspective=0.0,
                             rng=host_rng)
        m_s[bi] = [bi, *M.reshape(-1), sc, 0.0, float(bi % 2)]

    t_imgs = torch.zeros((B, 3, img, img))
    want_rows, _, invalid = fair.create_pseudo_label_online_with_extra_teachers(
        torch.from_numpy(main.copy()), [torch.from_numpy(extra.copy())],
        t_imgs, torch.from_numpy(m_s), [cmap], RANK=-2,
    )
    ssu.non_max_suppression = orig_nms
    assert not invalid
    want_rows = np.asarray(want_rows, np.float32)  # [img, cls, xywhn, conf]

    cmap_arr = np.full(nc_t, -1, np.int32)
    for k, v in cmap.items():
        cmap_arr[k] = v
    pl = create_pseudo_labels_multi(
        [jnp.asarray(main), jnp.asarray(extra)], [None, cmap_arr],
        jnp.asarray(m_s), img_size=img, nc=nc, conf_thres=0.3,
        iou_thres=0.5, max_pl=16, multi_label=False,
    )
    labels = np.asarray(pl.labels)
    mask = np.asarray(pl.mask)
    for bi in range(B):
        w = want_rows[want_rows[:, 0] == bi]
        g = labels[bi][mask[bi]]
        assert len(g) == len(w), f"img {bi}: {len(g)} vs {len(w)}"
        w = w[np.argsort(-w[:, 6])]
        g = g[np.argsort(-g[:, 5])]
        np.testing.assert_array_equal(g[:, 0].astype(int),
                                      w[:, 1].astype(int))
        np.testing.assert_allclose(g[:, 1:5], w[:, 2:6], atol=2e-3)
        np.testing.assert_allclose(g[:, 5], w[:, 6], atol=1e-4)
