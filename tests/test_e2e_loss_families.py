"""Trainer e2e smoke for the anchor-free loss families (ComputeXLoss,
ComputeTalLoss) and the anchor-OTA path — the configs the reference ships
but cannot train (SURVEY.md §2.11.1)."""

import numpy as np
import cv2
import pytest

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("lf")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        img = np.full((140, 140, 3), 70, np.uint8)
        cx, cy = rng.uniform(0.35, 0.65, 2)
        bw, bh = rng.uniform(0.25, 0.4, 2)
        cv2.rectangle(
            img,
            (int((cx - bw / 2) * 140), int((cy - bh / 2) * 140)),
            (int((cx + bw / 2) * 140), int((cy + bh / 2) * 140)),
            (0, 0, 255), -1,
        )
        p = root / "images" / f"i{i}.jpg"
        cv2.imwrite(str(p), img)
        (root / "labels" / f"i{i}.txt").write_text(
            f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n"
        )
        paths.append(str(p))
    (root / "train.txt").write_text("\n".join(paths))
    return root


def _base_cfg(data_root, tmp_path, name):
    cfg = get_cfg()
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Dataset.train = str(data_root / "train.txt")
    cfg.Dataset.val = ""
    cfg.Dataset.nc = 1
    cfg.Dataset.img_size = 128
    cfg.Dataset.batch_size = 8
    cfg.Dataset.max_targets = 16
    cfg.epochs = 1
    cfg.hyp.warmup_epochs = 0
    cfg.hyp.mosaic = 0.0
    cfg.noval = True
    cfg.nosave = True
    cfg.project = str(tmp_path / "runs")
    cfg.name = name
    return cfg


def test_trainer_yolox_loss(data_root, tmp_path):
    import jax.numpy as jnp

    cfg = _base_cfg(data_root, tmp_path, "yolox")
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloX"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.anchors = [1]
    cfg.Loss.type = "ComputeXLoss"
    cfg.freeze()
    t = Trainer(cfg, compute_dtype=jnp.float32)
    t.train()
    assert int(t.state.step) == 1


def test_trainer_tal_loss(data_root, tmp_path):
    import jax.numpy as jnp

    cfg = _base_cfg(data_root, tmp_path, "tal")
    cfg.Model.Backbone.name = "YoloV8"
    cfg.Model.Neck.name = "YoloV8"
    cfg.Model.Head.name = "YoloV8"
    cfg.Model.Neck.in_channels = [256, 512, 768]
    cfg.Model.Neck.out_channels = [256, 512, 768]
    cfg.Model.anchors = [1]
    cfg.Loss.type = "ComputeTalLoss"
    cfg.Loss.reg_max = 8
    cfg.freeze()
    t = Trainer(cfg, compute_dtype=jnp.float32)
    t.train()
    assert int(t.state.step) == 1


def test_trainer_ota_loss(data_root, tmp_path):
    import jax.numpy as jnp

    cfg = _base_cfg(data_root, tmp_path, "ota")
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Loss.type = "ComputeLoss"
    cfg.Loss.assigner_type = "SimOTA"
    cfg.freeze()
    t = Trainer(cfg, compute_dtype=jnp.float32)
    t.train()
    assert int(t.state.step) == 1
