"""Smoke tests for the round-2 config-zoo additions: each YAML must merge,
build its model, and run at least one real train step through the proper
trainer (reference configs: ssod/voc/yolov5l_voc_burn.yaml,
ssod/cityscapes/yolov5l_cityscapes.yaml, ssod/custom/yolov5l_transfer_ssod
.yaml, sup/public/yolov7s_coco_simota.yaml,
sup/public/yolov6s_coco_repopt_finetune.yaml)."""

from pathlib import Path

import cv2
import numpy as np
import pytest

from efficientteacher_tpu.configs import get_cfg

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("zoo2")
    for sub in ("images", "labels", "unlabeled"):
        (root / sub).mkdir()
    rng = np.random.default_rng(7)
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
    (root / "target.txt").write_text("\n".join(unlabeled * 3))
    return root


def _shrink(cfg, data_root, tmp_path, name, nc=1):
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.weights = ""
    cfg.Dataset.train = str(data_root / "train.txt")
    cfg.Dataset.val = ""
    cfg.Dataset.target = str(data_root / "target.txt")
    cfg.Dataset.nc = nc
    cfg.Dataset.names = ["obj"] * nc
    cfg.Dataset.img_size = 128
    cfg.Dataset.batch_size = 2  # SSOD: per-phase loaders handle small batch
    cfg.Dataset.max_targets = 16
    cfg.Dataset.workers = 1
    cfg.Dataset.sampler_type = "normal"
    cfg.hyp.warmup_epochs = 0
    cfg.hyp.no_aug_epochs = 0
    cfg.noval = True
    cfg.nosave = True
    cfg.noautoanchor = True
    cfg.project = str(tmp_path / "runs")
    cfg.name = name
    return cfg


def _load(rel):
    cfg = get_cfg()
    cfg.merge_from_file(str(REPO / "configs" / rel))
    return cfg


@pytest.mark.parametrize("rel,epochs,burn", [
    ("ssod/voc/yolov5l_voc_burn.yaml", 1, 1),            # burn-in phase
    ("ssod/cityscapes/yolov5l_cityscapes.yaml", 1, 0),   # DA loss, with_gt
    ("ssod/custom/yolov5l_transfer_ssod.yaml", 1, 0),    # epoch_adaptor
])
def test_ssod_zoo_config_trains(rel, epochs, burn, data_root, tmp_path):
    import jax.numpy as jnp

    from efficientteacher_tpu.train.ssod_trainer import SSODTrainer

    cfg = _shrink(_load(rel), data_root, tmp_path,
                  Path(rel).stem)
    cfg.epochs = epochs
    cfg.hyp.burn_epochs = burn
    cfg.SSOD.max_pseudo_labels = 16
    cfg.SSOD.fixed_accumulate = True
    cfg.freeze()
    t = SSODTrainer(cfg, compute_dtype=jnp.float32)
    t.train()
    assert int(t.state.step) >= 1


def test_yolov7s_simota_trains(data_root, tmp_path):
    import jax.numpy as jnp

    from efficientteacher_tpu.train.trainer import Trainer

    cfg = _shrink(_load("sup/public/yolov7s_coco_simota.yaml"),
                  data_root, tmp_path, "v7simota")
    cfg.epochs = 1
    # Trainer shards the batch over the 8-device virtual mesh
    cfg.Dataset.batch_size = 8
    cfg.freeze()
    assert cfg.Loss.type == "ComputeFastXLoss"
    t = Trainer(cfg, compute_dtype=jnp.float32)
    t.train()
    assert int(t.state.step) >= 1


def test_yolov6s_repopt_finetune_trains(data_root, tmp_path):
    """Stage 2 of RepOpt: RealVGG topology + gradient masks built from a
    stage-1 LinearAdd checkpoint (reference trainer/trainer.py:219-236)."""
    import jax
    import jax.numpy as jnp

    from efficientteacher_tpu.models import build_model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.train.trainer import Trainer
    from efficientteacher_tpu.utils.checkpoint import save_checkpoint

    # stage-1 LinearAdd model -> RepScale checkpoint
    cfg1 = _shrink(_load("sup/public/yolov6s_coco.yaml"),
                   data_root, tmp_path, "v6linearadd")
    cfg1.Model.LinearAddModel = True
    cfg1.freeze()
    m1 = build_model(spec_from_cfg(cfg1), ssod=False)
    v1 = m1.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                 train=False)
    scales_ckpt = tmp_path / "repscale.ckpt"
    save_checkpoint(scales_ckpt, params=v1["params"],
                    batch_stats=v1["batch_stats"])

    cfg = _shrink(_load("sup/public/yolov6s_coco_repopt_finetune.yaml"),
                  data_root, tmp_path, "v6repopt")
    cfg.epochs = 1
    cfg.Dataset.batch_size = 8
    cfg.Model.RepScale_weight = str(scales_ckpt)
    cfg.freeze()
    assert cfg.Model.RealVGGModel and cfg.Model.RepOpt
    t = Trainer(cfg, compute_dtype=jnp.float32)
    assert t.grad_masks is not None
    # at least one RealVGG conv kernel carries a non-trivial mask
    leaves = [m for m in jax.tree.leaves(t.grad_masks)
              if np.ndim(m) == 4]
    assert leaves and any(not np.allclose(m, 1.0) for m in leaves)
    t.train()
    assert int(t.state.step) >= 1


def test_all_zoo_yamls_merge_and_freeze():
    """Every YAML we ship merges into the default tree cleanly."""
    for p in sorted((REPO / "configs").rglob("*.yaml")):
        cfg = get_cfg()
        cfg.merge_from_file(str(p))
        cfg.freeze()
