"""End-to-end supervised training smoke on a synthetic disk dataset through
the full Trainer lifecycle (the COCO128-smoke analogue, BASELINE config 2)."""

import numpy as np
import cv2
import pytest

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(16):
        img = np.full((160, 160, 3), 70, np.uint8)
        cx, cy = rng.uniform(0.35, 0.65, 2)
        bw, bh = rng.uniform(0.25, 0.45, 2)
        x1, y1 = int((cx - bw / 2) * 160), int((cy - bh / 2) * 160)
        x2, y2 = int((cx + bw / 2) * 160), int((cy + bh / 2) * 160)
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), -1)
        p = root / "images" / f"i{i:02d}.jpg"
        cv2.imwrite(str(p), img)
        (root / "labels" / f"i{i:02d}.txt").write_text(
            f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n"
        )
        paths.append(str(p))
    (root / "train.txt").write_text("\n".join(paths))
    return root


def test_trainer_e2e(synth_root, tmp_path):
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
    cfg.Dataset.train = str(synth_root / "train.txt")
    cfg.Dataset.val = str(synth_root / "train.txt")
    cfg.Dataset.nc = 1
    cfg.Dataset.img_size = 128
    cfg.Dataset.batch_size = 8
    cfg.Dataset.max_targets = 16
    cfg.epochs = 2
    cfg.hyp.warmup_epochs = 0
    cfg.hyp.mosaic = 0.5
    cfg.project = str(tmp_path / "runs")
    cfg.name = "smoke"
    cfg.freeze()

    trainer = Trainer(cfg, compute_dtype=jnp.float32)
    trainer.train()

    # artifacts
    assert (trainer.save_dir / "weights" / "last.ckpt").exists()
    assert (trainer.save_dir / "weights" / "best.ckpt").exists()
    assert (trainer.save_dir / "results.csv").exists()
    assert (trainer.save_dir / "opt.yaml").exists()
    rows = (trainer.save_dir / "results.csv").read_text().strip().splitlines()
    assert len(rows) == 3  # header + 2 epochs

    # checkpoint round-trips into eval variables
    from efficientteacher_tpu.utils.checkpoint import load_eval_variables

    variables = load_eval_variables(trainer.save_dir / "weights" / "best.ckpt")
    assert "params" in variables and "batch_stats" in variables


def test_resume(synth_root, tmp_path):
    """Resume restores epoch, params, EMA, and optimizer momentum."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficientteacher_tpu.configs import get_cfg

    def make_cfg(epochs, weights="", resume=False):
        cfg = get_cfg()
        cfg.Model.Backbone.name = "YoloV5"
        cfg.Model.Neck.name = "YoloV5"
        cfg.Model.Head.name = "YoloV5"
        cfg.Model.Neck.in_channels = [256, 512, 1024]
        cfg.Model.Neck.out_channels = [256, 512, 1024]
        cfg.Model.width_multiple = 0.125
        cfg.Model.depth_multiple = 0.34
        cfg.Loss.type = "ComputeLoss"
        cfg.Dataset.train = str(synth_root / "train.txt")
        cfg.Dataset.val = ""
        cfg.Dataset.nc = 1
        cfg.Dataset.img_size = 128
        cfg.Dataset.batch_size = 16   # accumulate=4; 1 batch/epoch
        cfg.Dataset.max_targets = 16
        cfg.epochs = epochs
        cfg.hyp.warmup_epochs = 0
        cfg.noval = True
        cfg.weights = weights
        cfg.resume = resume
        cfg.project = str(tmp_path / "runs2")
        cfg.name = "resume"
        return cfg

    cfg = make_cfg(4)  # 4 micro-steps = exactly one optimizer step
    cfg.freeze()
    t1 = Trainer(cfg, compute_dtype=jnp.float32)
    t1.train()
    last = str(t1.save_dir / "weights" / "last.ckpt")

    cfg2 = make_cfg(6, weights=last, resume=True)
    cfg2.freeze()
    t2 = Trainer(cfg2, compute_dtype=jnp.float32)
    assert t2.start_epoch == 4
    # params match the saved state (fp16 ckpt quantization tolerance)
    p1 = np.asarray(jax.tree.leaves(t1.state.params)[0], np.float32)
    p2 = np.asarray(jax.tree.leaves(t2.state.params)[0], np.float32)
    np.testing.assert_allclose(p1, p2, atol=2e-3)
    # optimizer momentum restored (non-zero after training)
    m2 = np.concatenate([
        np.ravel(x) for x in jax.tree.leaves(t2.state.opt.momentum_buf)
    ])
    assert np.abs(m2).sum() > 0
    assert int(t2.state.ema.updates) > 0
    t2.train()  # continues cleanly


def test_trainer_device_aug_e2e(synth_root, tmp_path):
    """Device-side augmentation path: host only letterboxes; mosaic/
    perspective/HSV/flips run in the jitted aug program
    (cfg.Dataset.device_aug, ops/augment_device.py)."""
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
    cfg.Dataset.train = str(synth_root / "train.txt")
    cfg.Dataset.val = ""
    cfg.Dataset.nc = 1
    cfg.Dataset.img_size = 128
    cfg.Dataset.batch_size = 8
    cfg.Dataset.max_targets = 16
    cfg.Dataset.device_aug = True
    cfg.epochs = 2
    cfg.hyp.warmup_epochs = 0
    cfg.hyp.mosaic = 1.0
    cfg.hyp.no_aug_epochs = 1  # exercise the mosaic-close recompile
    cfg.noval = True
    cfg.nosave = True
    cfg.project = str(tmp_path / "runs")
    cfg.name = "devaug"
    cfg.freeze()

    trainer = Trainer(cfg, compute_dtype=jnp.float32)
    assert trainer.device_aug
    trainer.train()
    assert int(trainer.state.step) >= 2
    # the loss meter saw finite values
    assert all(np.isfinite(m.avg) for m in trainer.meter.meters.values())


def test_trainer_deterministic_rerun(synth_root, tmp_path):
    """End-to-end reproducibility (the determinism contract of the process
    loader + per-batch RNG seeding): two Trainer runs with identical seeds
    and the PROCESS loader produce identical results.csv — pins the whole
    pipeline (sampler order, mosaic/mixup draws, jitted step) since any
    scheduling leak into batch content would diverge the losses."""
    import jax.numpy as jnp

    def run(name):
        cfg = get_cfg()
        cfg.Model.Backbone.name = "YoloV5"
        cfg.Model.Neck.name = "YoloV5"
        cfg.Model.Head.name = "YoloV5"
        cfg.Model.Neck.in_channels = [256, 512, 1024]
        cfg.Model.Neck.out_channels = [256, 512, 1024]
        cfg.Model.width_multiple = 0.125
        cfg.Model.depth_multiple = 0.34
        cfg.Loss.type = "ComputeLoss"
        cfg.Dataset.train = str(synth_root / "train.txt")
        cfg.Dataset.val = str(synth_root / "train.txt")
        cfg.Dataset.nc = 1
        cfg.Dataset.img_size = 128
        cfg.Dataset.batch_size = 8
        cfg.Dataset.max_targets = 16
        cfg.Dataset.loader = "process"
        cfg.Dataset.workers = 2
        cfg.epochs = 2
        cfg.hyp.warmup_epochs = 0
        cfg.hyp.mosaic = 1.0
        cfg.hyp.mixup = 0.5
        cfg.project = str(tmp_path / "runs")
        cfg.name = name
        cfg.freeze()
        trainer = Trainer(cfg, compute_dtype=jnp.float32)
        trainer.train()
        return (trainer.save_dir / "results.csv").read_text()

    assert run("det_a") == run("det_b")
