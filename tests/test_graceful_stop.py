"""Preemption-graceful shutdown (utils/shutdown.py + trainer wiring).

SURVEY §5.3: the reference has no failure handling beyond resume-from-
last.pt; here SIGTERM/SIGINT finishes the in-flight step, saves
last.ckpt with epoch-1 (so resume re-runs the interrupted epoch), and
returns cleanly.
"""

import signal

import cv2
import numpy as np
import pytest

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.train.trainer import Trainer
from efficientteacher_tpu.utils.checkpoint import load_checkpoint
from efficientteacher_tpu.utils.shutdown import GracefulStop


def test_handler_sets_flag_and_uninstall_restores():
    stop = GracefulStop()
    prev = signal.getsignal(signal.SIGTERM)
    stop.install(signals=(signal.SIGTERM,))
    try:
        signal.raise_signal(signal.SIGTERM)
        assert stop.requested
    finally:
        stop.uninstall()
    assert signal.getsignal(signal.SIGTERM) is prev


@pytest.fixture
def synth_root(tmp_path):
    root = tmp_path / "data"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        img = np.full((140, 140, 3), 70, np.uint8)
        cx, cy = rng.uniform(0.35, 0.65, 2)
        bw, bh = rng.uniform(0.25, 0.45, 2)
        cv2.rectangle(
            img,
            (int((cx - bw / 2) * 140), int((cy - bh / 2) * 140)),
            (int((cx + bw / 2) * 140), int((cy + bh / 2) * 140)),
            (0, 0, 255), -1)
        p = root / "images" / f"i{i}.jpg"
        cv2.imwrite(str(p), img)
        (root / "labels" / f"i{i}.txt").write_text(
            f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n")
        paths.append(str(p))
    (root / "train.txt").write_text("\n".join(paths))
    return root


def test_trainer_stops_and_saves_resumable_ckpt(synth_root, tmp_path):
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
    cfg.Dataset.img_size = 64
    cfg.Dataset.batch_size = 8
    cfg.Dataset.max_targets = 16
    cfg.Dataset.workers = 1
    cfg.epochs = 50  # would be long; the stop must cut it short
    cfg.hyp.warmup_epochs = 0
    cfg.noval = True
    cfg.noautoanchor = True
    cfg.project = str(tmp_path / "runs")
    cfg.name = "stop"
    cfg.freeze()

    trainer = Trainer(cfg, compute_dtype=jnp.float32)
    # simulate SIGTERM arriving during the first batch of epoch 0 (the
    # handler itself is pinned by test_handler_sets_flag...; raising a
    # real signal mid-train would race the test harness)
    trainer.callbacks.register_action(
        "on_train_batch_end", "stop",
        lambda *a, **k: setattr(trainer.stop, "requested", True))
    trainer.train()

    assert int(trainer.state.step) >= 1  # at least one step ran
    ckpt_path = trainer.save_dir / "weights" / "last.ckpt"
    assert ckpt_path.exists()
    ckpt = load_checkpoint(ckpt_path)
    # interrupted epoch 0 -> saved as -1 -> resume starts at epoch 0
    assert ckpt["meta"]["epoch"] == -1
    assert "optimizer" in ckpt  # momentum rides along for the resume
    # no best.ckpt: val was skipped on the stop path
    assert not (trainer.save_dir / "weights" / "best.ckpt").exists()

    # resume picks the interrupted epoch back up
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.resume = True
    cfg2.weights = str(ckpt_path)
    cfg2.freeze()
    t2 = Trainer(cfg2, compute_dtype=jnp.float32)
    assert t2.start_epoch == 0
