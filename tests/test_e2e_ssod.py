"""End-to-end SSOD smoke: burn-in -> teacher seeding -> mean-teacher epochs
with on-device pseudo labels, through the full SSODTrainer lifecycle."""

import numpy as np
import cv2
import pytest

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.train.ssod_trainer import SSODTrainer


@pytest.fixture(scope="module")
def ssod_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("ssod")
    for sub in ("images", "labels", "unlabeled"):
        (root / sub).mkdir()
    rng = np.random.default_rng(0)
    labeled, unlabeled = [], []
    for i in range(12):
        img = np.full((140, 140, 3), 70, np.uint8)
        cx, cy = rng.uniform(0.35, 0.65, 2)
        bw, bh = rng.uniform(0.25, 0.4, 2)
        cv2.rectangle(
            img,
            (int((cx - bw / 2) * 140), int((cy - bh / 2) * 140)),
            (int((cx + bw / 2) * 140), int((cy + bh / 2) * 140)),
            (0, 0, 255), -1,
        )
        if i < 8:
            p = root / "images" / f"l{i}.jpg"
            cv2.imwrite(str(p), img)
            (root / "labels" / f"l{i}.txt").write_text(
                f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n"
            )
            labeled.append(str(p))
        else:
            p = root / "unlabeled" / f"u{i}.jpg"
            cv2.imwrite(str(p), img)
            unlabeled.append(str(p))
    (root / "train.txt").write_text("\n".join(labeled))
    (root / "target.txt").write_text("\n".join(unlabeled * 2))
    return root


def test_ssod_trainer_e2e(ssod_data, tmp_path):
    import jax.numpy as jnp

    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Loss.type = "ComputeLoss"
    cfg.SSOD.train_domain = True
    cfg.SSOD.nms_conf_thres = 0.1
    cfg.SSOD.max_pseudo_labels = 16
    cfg.SSOD.teacher_loss_weight = 0.5
    cfg.SSOD.epoch_adaptor = True
    cfg.SSOD.fixed_accumulate = True  # batch 4 would otherwise accumulate 16
    cfg.hyp.burn_epochs = 1
    cfg.Dataset.train = str(ssod_data / "train.txt")
    cfg.Dataset.val = ""
    cfg.Dataset.target = str(ssod_data / "target.txt")
    cfg.Dataset.nc = 1
    cfg.Dataset.img_size = 128
    cfg.Dataset.batch_size = 4
    cfg.Dataset.max_targets = 16
    cfg.epochs = 3
    cfg.hyp.warmup_epochs = 0
    cfg.hyp.mosaic = 0.5
    cfg.noval = True
    cfg.project = str(tmp_path / "runs")
    cfg.name = "ssod_smoke"
    cfg.freeze()

    trainer = SSODTrainer(cfg, compute_dtype=jnp.float32)
    trainer.train()

    assert trainer.teacher_seeded
    # teacher EMA advanced during mean-teacher epochs
    assert int(trainer.state.semi_ema.updates) > 0
    assert int(trainer.state.ema.updates) > 0
    # checkpoint carries the teacher as `ema`
    from efficientteacher_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(trainer.save_dir / "weights" / "last.ckpt")
    assert "ema" in ckpt
    assert ckpt["meta"]["epoch"] == 2


def test_ssod_trainer_with_extra_teacher(ssod_data, tmp_path):
    """extra_teachers checkpoint loads, class-remaps, and the multi-teacher
    step trains end-to-end."""
    import jax
    import jax.numpy as jnp

    from efficientteacher_tpu.models import build_model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.utils.checkpoint import save_checkpoint

    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Loss.type = "ComputeLoss"
    cfg.SSOD.train_domain = True
    cfg.SSOD.nms_conf_thres = 0.1
    cfg.SSOD.max_pseudo_labels = 16
    cfg.SSOD.fixed_accumulate = True
    cfg.hyp.burn_epochs = 0
    cfg.Dataset.train = str(ssod_data / "train.txt")
    cfg.Dataset.val = ""
    cfg.Dataset.target = str(ssod_data / "target.txt")
    cfg.Dataset.nc = 1
    cfg.Dataset.names = ["thing"]
    cfg.Dataset.img_size = 128
    cfg.Dataset.batch_size = 4
    cfg.Dataset.max_targets = 16
    cfg.epochs = 1
    cfg.hyp.warmup_epochs = 0
    cfg.hyp.mosaic = 0.0
    cfg.noval = True
    cfg.nosave = True
    cfg.project = str(tmp_path / "runs")
    cfg.name = "mt"

    # build an extra-teacher checkpoint (same arch, its own class list)
    spec = spec_from_cfg(cfg)
    tm = build_model(spec, ssod=True, dtype=jnp.float32)
    tv = tm.init(jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 3)),
                 train=False)
    tpath = tmp_path / "teacher.ckpt"
    save_checkpoint(tpath, params=tv["params"],
                    batch_stats=tv["batch_stats"], half=False)
    cfg.SSOD.extra_teachers = [str(tpath)]
    cfg.SSOD.extra_teachers_class_names = [["thing"]]
    cfg.freeze()

    from efficientteacher_tpu.train.ssod_trainer import SSODTrainer

    t = SSODTrainer(cfg, compute_dtype=jnp.float32)
    # burn_epochs=0: teacher seeded immediately, multi-teacher step used
    t.train()
    assert t.teacher_seeded
    assert int(t.state.step) >= 1


def test_ssod_burn_in_with_da_loss(ssod_data, tmp_path):
    """Burn-in with domain-adaptation losses: GRL discriminators train
    against weak target images (train_without_unlabeled_da path)."""
    import jax.numpy as jnp

    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Loss.type = "ComputeLoss"
    cfg.SSOD.train_domain = True
    cfg.SSOD.with_da_loss = True
    cfg.SSOD.da_loss_weights = 0.1
    cfg.SSOD.fixed_accumulate = True
    cfg.hyp.burn_epochs = 1
    cfg.Dataset.train = str(ssod_data / "train.txt")
    cfg.Dataset.val = ""
    cfg.Dataset.target = str(ssod_data / "target.txt")
    cfg.Dataset.nc = 1
    cfg.Dataset.img_size = 128
    cfg.Dataset.batch_size = 4
    cfg.Dataset.max_targets = 16
    cfg.epochs = 1
    cfg.hyp.warmup_epochs = 0
    cfg.hyp.mosaic = 0.0
    cfg.noval = True
    cfg.nosave = True
    cfg.project = str(tmp_path / "runs")
    cfg.name = "da"
    cfg.freeze()

    from efficientteacher_tpu.train.ssod_trainer import SSODTrainer

    t = SSODTrainer(cfg, compute_dtype=jnp.float32)
    t.train()
    # DA losses appeared in the meters
    assert "d_loss" in t.meter.meters and "t_loss" in t.meter.meters
    assert np.isfinite(t.meter.meters["d_loss"].avg)


@pytest.fixture(scope="module")
def ssod_margin_data(tmp_path_factory):
    """Semi-supervised split where pseudo-labels add signal: 6 labeled
    (oversampled x8 for steps/epoch), 24 unlabeled, 16 val."""
    root = tmp_path_factory.mktemp("ssod_margin")
    rng = np.random.default_rng(5)
    for sub in ("images", "labels", "unlabeled", "val/images", "val/labels"):
        (root / sub).mkdir(parents=True, exist_ok=True)

    def draw():
        img = np.full((140, 140, 3), 70, np.uint8)
        rows = []
        for _ in range(int(rng.integers(1, 3))):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            bw, bh = rng.uniform(0.18, 0.4, 2)
            cv2.rectangle(
                img,
                (int((cx - bw / 2) * 140), int((cy - bh / 2) * 140)),
                (int((cx + bw / 2) * 140), int((cy + bh / 2) * 140)),
                (40, 40, 230), -1)
            rows.append(f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        return img, "\n".join(rows)

    lab, unlab, val = [], [], []
    for i in range(6):
        img, rows = draw()
        p = root / "images" / f"l{i}.jpg"
        cv2.imwrite(str(p), img)
        (root / "labels" / f"l{i}.txt").write_text(rows + "\n")
        lab.append(str(p))
    for i in range(24):
        img, _ = draw()
        p = root / "unlabeled" / f"u{i}.jpg"
        cv2.imwrite(str(p), img)
        unlab.append(str(p))
    for i in range(16):
        img, rows = draw()
        p = root / "val" / "images" / f"v{i}.jpg"
        cv2.imwrite(str(p), img)
        (root / "val" / "labels" / f"v{i}.txt").write_text(rows + "\n")
        val.append(str(p))
    (root / "train_x8.txt").write_text("\n".join(lab * 8))
    (root / "target.txt").write_text("\n".join(unlab))
    (root / "val.txt").write_text("\n".join(val))
    return root


@pytest.mark.slow
@pytest.mark.parametrize("device_aug", [False, True])
def test_mean_teacher_improves_over_burn_in(ssod_margin_data, tmp_path,
                                            device_aug):
    """The north-star property (+1.45 mAP on COCO, BASELINE.md): the
    mean-teacher phase must measurably improve the teacher over its own
    burn-in — and the on-device augmentation path (VERDICT r2 Next #6)
    must preserve that margin despite its strong-view AutoAugment/cutout
    schedule trade (ops/augment_device.py docstring).

    Calibrated margins: host-aug +0.120 mAP, device-aug +0.178 mAP
    (burn 24 epochs/192 steps, ssod 40 epochs/160 steps, ema_rate 0.95
    so the teacher tracks within the short run)."""
    import jax.numpy as jnp

    from efficientteacher_tpu.data.datasets import (
        BatchLoader, LoadImagesAndLabels,
    )
    from efficientteacher_tpu.eval import validator

    BURN, TOTAL = 24, 64
    root = ssod_margin_data
    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Loss.type = "ComputeLoss"
    cfg.SSOD.train_domain = True
    cfg.SSOD.nms_conf_thres = 0.25
    cfg.SSOD.max_pseudo_labels = 16
    cfg.SSOD.teacher_loss_weight = 1.0
    cfg.SSOD.fixed_accumulate = True
    cfg.SSOD.ema_rate = 0.95
    cfg.hyp.burn_epochs = BURN
    cfg.Dataset.train = str(root / "train_x8.txt")
    cfg.Dataset.val = ""
    cfg.Dataset.target = str(root / "target.txt")
    cfg.Dataset.nc = 1
    cfg.Dataset.img_size = 128
    cfg.Dataset.batch_size = 6
    cfg.Dataset.max_targets = 16
    cfg.Dataset.device_aug = device_aug
    cfg.epochs = TOTAL
    cfg.hyp.warmup_epochs = 0
    cfg.hyp.mosaic = 0.5
    cfg.noval = True
    cfg.nosave = True
    cfg.project = str(tmp_path / "runs")
    cfg.name = f"margin_{int(device_aug)}"
    cfg.freeze()
    trainer = SSODTrainer(cfg, compute_dtype=jnp.float32)

    val_ds = LoadImagesAndLabels(str(root / "val.txt"), img_size=128, nc=1,
                                 max_targets=16)
    val_loader = BatchLoader(val_ds, 8, shuffle=False, drop_last=False)
    scores = {}

    def eval_teacher(tag):
        src = (trainer.state.semi_ema if trainer.teacher_seeded
               else trainer.state.ema)
        res, _, _ = validator.run(
            trainer.model,
            {"params": src.params, "batch_stats": src.batch_stats},
            val_loader, nc=1, compute_dtype=jnp.float32)
        scores[tag] = res

    def on_fit_epoch_end(metrics, epoch):
        if epoch == BURN - 1:
            eval_teacher("burn")
        elif epoch == TOTAL - 1:
            eval_teacher("final")

    trainer.callbacks.register_action("on_fit_epoch_end",
                                      callback=on_fit_epoch_end)
    trainer.train()

    b, f = scores["burn"], scores["final"]
    assert b[2] > 0.2, f"burn-in teacher did not train: mAP50 {b[2]:.3f}"
    margin = f[3] - b[3]
    assert margin > 0.04, (
        f"mean-teacher did not improve (device_aug={device_aug}): "
        f"burn mAP {b[3]:.3f} -> final {f[3]:.3f} (margin {margin:+.3f})")


def test_labelmatch_e2e_through_trainer(ssod_data, tmp_path):
    """LabelMatch driven end-to-end through SSODTrainer (VERDICT r4 #4):
    per-batch score collection (train/ssod_trainer.py:342-349) ->
    after_epoch threshold refresh (:366-376) -> refreshed per-class
    thresholds re-entering the jitted step as traced arrays WITHOUT a
    recompile. Reference flow: trainer/ssod_trainer.py:320-323,
    utils/labelmatch.py:191-240 + :283-299."""
    import jax.numpy as jnp

    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Loss.type = "ComputeLoss"
    cfg.SSOD.train_domain = True
    cfg.SSOD.pseudo_label_type = "LabelMatch"
    # a permissive NMS floor so the barely-trained teacher emits detections
    # for the score harvest; thresholds then move off these inits
    cfg.SSOD.nms_conf_thres = 0.001
    cfg.SSOD.ignore_thres_high = 0.3
    cfg.SSOD.ignore_thres_low = 0.0
    cfg.SSOD.max_pseudo_labels = 16
    cfg.SSOD.teacher_loss_weight = 0.5
    cfg.SSOD.epoch_adaptor = True
    cfg.SSOD.fixed_accumulate = True
    cfg.hyp.burn_epochs = 1
    cfg.Dataset.train = str(ssod_data / "train.txt")
    cfg.Dataset.val = ""
    cfg.Dataset.target = str(ssod_data / "target.txt")
    cfg.Dataset.nc = 1
    cfg.Dataset.img_size = 128
    cfg.Dataset.batch_size = 4
    cfg.Dataset.max_targets = 16
    cfg.epochs = 4  # 1 burn + 3 mean-teacher epochs (>= 2 post-burn-in)
    cfg.hyp.warmup_epochs = 0
    cfg.hyp.mosaic = 0.0
    cfg.noval = True
    cfg.nosave = True
    cfg.project = str(tmp_path / "runs")
    cfg.name = "lm_e2e"
    cfg.freeze()

    trainer = SSODTrainer(cfg, compute_dtype=jnp.float32)
    assert trainer.use_labelmatch
    thr_init_high = trainer.label_match.cls_thr_high.copy()
    thr_init_low = trainer.label_match.cls_thr_low.copy()
    thr_trace = []  # (epoch, thr_high, thr_low) AFTER each refresh

    def on_fit_epoch_end(metrics, epoch):
        thr_trace.append((
            epoch,
            trainer.label_match.cls_thr_high.copy(),
            trainer.label_match.cls_thr_low.copy(),
        ))

    trainer.callbacks.register_action("on_fit_epoch_end",
                                      callback=on_fit_epoch_end)
    trainer.train()

    # the harvest actually collected scores (the threshold-move assertions
    # below would be vacuous otherwise)
    assert trainer.label_match.cls_num_total.sum() > 0, (
        "no pseudo-label scores collected across the mean-teacher epochs")
    # thresholds moved off their ignore-default initialization after the
    # first post-burn-in refresh, and kept updating per epoch
    post = [t for t in thr_trace if t[0] >= cfg.hyp.burn_epochs]
    assert len(post) >= 2
    _, h1, l1 = post[0]
    assert not np.allclose(h1, thr_init_high), (
        f"thr_high never moved from ignore default: {h1}")
    assert not np.allclose(l1, thr_init_low), (
        f"thr_low never moved from ignore default: {l1}")
    assert np.isfinite(h1).all() and np.isfinite(l1).all()
    # the refreshed thresholds re-entered the jitted step as traced arrays
    # WITHOUT a recompile: one executable covers every mean-teacher epoch
    assert trainer.ssod_step._cache_size() == 1, (
        f"ssod step recompiled: cache size "
        f"{trainer.ssod_step._cache_size()} (thresholds must be traced "
        f"values, not baked constants)")
    # training stayed finite through the threshold updates
    assert int(trainer.state.step) > 0
    for k, meter in trainer.meter.meters.items():
        assert np.isfinite(meter.avg), (k, meter.avg)


def test_ssod_trainer_device_aug(ssod_data, tmp_path):
    """cfg.Dataset.device_aug: labeled aug AND the unlabeled weak/strong
    dual view + M_s record are produced on-device
    (ops/augment_device.device_ssod_views)."""
    import jax.numpy as jnp

    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Loss.type = "ComputeLoss"
    cfg.SSOD.train_domain = True
    cfg.SSOD.nms_conf_thres = 0.1
    cfg.SSOD.max_pseudo_labels = 16
    cfg.SSOD.fixed_accumulate = True
    cfg.SSOD.ssod_hyp.with_gt = True  # exercise the device GT passthrough
    cfg.hyp.burn_epochs = 1
    cfg.Dataset.train = str(ssod_data / "train.txt")
    cfg.Dataset.val = ""
    cfg.Dataset.target = str(ssod_data / "target.txt")
    cfg.Dataset.nc = 1
    cfg.Dataset.img_size = 128
    cfg.Dataset.batch_size = 4
    cfg.Dataset.max_targets = 16
    cfg.Dataset.device_aug = True
    cfg.epochs = 2
    cfg.hyp.warmup_epochs = 0
    cfg.noval = True
    cfg.nosave = True
    cfg.project = str(tmp_path / "runs")
    cfg.name = "ssod_devaug"
    cfg.freeze()

    trainer = SSODTrainer(cfg, compute_dtype=jnp.float32)
    assert trainer.device_aug
    trainer.train()
    assert int(trainer.state.step) >= 2
