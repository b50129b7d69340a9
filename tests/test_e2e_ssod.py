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
