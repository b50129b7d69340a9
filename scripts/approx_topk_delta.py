"""Measure the mAP cost of `approx_topk` candidate selection (VERDICT r3 #4).

The serving knob `batched_nms(..., selection="approx")` uses
`lax.approx_max_k` (recall 0.95) over the multi-label candidate lattice
instead of exact selection (reference semantics: max_nms top-k cap,
/root/reference/utils/general.py:994-1098). Only on TPU does approx_max_k
actually drop candidates (CPU falls back to exact), so this measurement runs
on the real chip: train the e2e val-parity harness's tiny model on a
synthetic set, then run eval/validator.run with selection = exact / pallas /
approx on (a) the harness's sparse set and (b) a crowded variant where every
image carries 30-60 objects (hundreds of above-floor candidates per image).

Prints one JSON line per dataset with mAP50/mAP for each engine and the
approx deltas; asserts pallas == exact bit-identically (the kernel's
exactness claim, ops/select_pallas.py) and that the approx delta stays small.

Usage (TPU default env):  python scripts/approx_topk_delta.py
"""

import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def write_dataset(root: Path, rng, n_images=32, crowded=False, nc=3,
                  mixed=False):
    """Rect-object synthetic set (mirrors tests/test_e2e_val_parity.py
    _write_dataset); crowded=True packs 30-60 small boxes per image;
    mixed=True alternates sparse/crowded images (training set — the
    crowded eval leg is vacuous unless the model has seen the crowded
    scale distribution; the r5 first run trained sparse-only and scored
    0.0 mAP on crowded, measuring generalization, not selection)."""
    import cv2

    img_dir, lab_dir = root / "images", root / "labels"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    sizes = [(480, 640), (640, 480), (400, 520), (320, 320),
             (360, 640), (640, 360), (500, 400), (448, 576)]
    colors = [(255, 80, 80), (80, 255, 80), (80, 80, 255)]
    files = []
    for i in range(n_images):
        h, w = sizes[i % len(sizes)]
        img = np.full((h, w, 3), 70, np.uint8)
        if mixed:
            crowd_this = i % 2 == 1
        else:
            crowd_this = crowded
        if crowd_this:
            n = int(rng.integers(30, 61))
            lo, hi = 0.04, 0.10
        else:
            n = int(rng.integers(2, 6))
            lo, hi = 0.2, 0.45
        rows = []
        for _ in range(n):
            bw = rng.uniform(lo, hi) * w
            bh = rng.uniform(lo, hi) * h
            cx = rng.uniform(bw / 2, w - bw / 2)
            cy = rng.uniform(bh / 2, h - bh / 2)
            c = int(rng.integers(0, nc))
            cv2.rectangle(img, (int(cx - bw / 2), int(cy - bh / 2)),
                          (int(cx + bw / 2), int(cy + bh / 2)),
                          colors[c % 3], -1)
            rows.append(f"{c} {cx / w:.6f} {cy / h:.6f} "
                        f"{bw / w:.6f} {bh / h:.6f}")
        p = img_dir / f"im{i:03d}.jpg"
        cv2.imwrite(str(p), img)
        (lab_dir / f"im{i:03d}.txt").write_text("\n".join(rows) + "\n")
        files.append(str(p))
    listfile = root / "val.txt"
    listfile.write_text("\n".join(files) + "\n")
    return listfile


def tiny_cfg(listfile, tmp, nc=3, imgsz=192, max_targets=64):
    from efficientteacher_tpu.configs import get_cfg

    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Dataset.nc = nc
    cfg.Dataset.img_size = imgsz
    cfg.Dataset.names = [str(i) for i in range(nc)]
    cfg.Loss.type = "ComputeLoss"
    cfg.Dataset.train = str(listfile)
    cfg.Dataset.val = str(listfile)
    cfg.Dataset.batch_size = 8
    cfg.Dataset.max_targets = max_targets
    cfg.epochs = int(os.environ.get("DELTA_EPOCHS", "150"))
    cfg.hyp.warmup_epochs = 0
    cfg.hyp.mosaic = 0.0
    cfg.noval = True  # skip per-epoch EMA validation; we eval explicitly
    cfg.project = str(tmp / "runs")
    return cfg


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from efficientteacher_tpu.data.datasets import (
        LoadImagesAndLabels, RectBatchLoader,
    )
    from efficientteacher_tpu.eval import validator
    from efficientteacher_tpu.models import build_model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.train.trainer import Trainer
    from efficientteacher_tpu.utils.checkpoint import load_eval_variables

    backend = jax.default_backend()
    print(f"backend: {backend}", file=sys.stderr)
    if backend != "tpu":
        print("WARNING: approx_max_k is exact on non-TPU backends; "
              "deltas will read 0", file=sys.stderr)

    rng = np.random.default_rng(7)
    tmp = Path(tempfile.mkdtemp(prefix="approx_delta_"))

    # Train ONCE on a MIXED sparse/crowded set so both eval legs are in
    # the model's scale distribution; the exact/approx delta is an
    # EVAL-time property of candidate selection, so the same weights
    # measure it on both densities.
    train_list = write_dataset(tmp / "trainset", rng, mixed=True)
    cfg = tiny_cfg(train_list, tmp / "trainset")
    cfg.name = "delta_train"
    cfg.freeze()
    trainer = Trainer(cfg, compute_dtype=jnp.float32)
    trainer.train()
    variables = load_eval_variables(
        trainer.save_dir / "weights" / "last.ckpt")
    model = build_model(spec_from_cfg(cfg), ssod=False)

    results = {}
    for name, crowded in (("sparse", False), ("crowded", True)):
        listfile = write_dataset(tmp / name, rng, crowded=crowded)
        per_engine = {}
        for engine in ("exact", "pallas", "approx"):
            ds = LoadImagesAndLabels(str(listfile), img_size=192, nc=3,
                                     max_targets=64)
            loader = RectBatchLoader(ds, batch_size=8, img_size=192)
            (mp, mr, map50, map_), maps, _ = validator.run(
                model, variables, loader, nc=3,
                compute_dtype=jnp.bfloat16, selection=engine,
            )
            per_engine[engine] = {
                "P": round(float(mp), 6), "R": round(float(mr), 6),
                "mAP50": round(float(map50), 6),
                "mAP": round(float(map_), 6),
            }
        ex, pl, ap = (per_engine[e] for e in ("exact", "pallas", "approx"))
        assert pl == ex, f"pallas != exact on {name}: {pl} vs {ex}"
        results[name] = {
            **{f"{e}_{k}": v for e in per_engine
               for k, v in per_engine[e].items()},
            "approx_delta_mAP50": round(ap["mAP50"] - ex["mAP50"], 6),
            "approx_delta_mAP": round(ap["mAP"] - ex["mAP"], 6),
        }
        print(json.dumps({"dataset": name, **results[name]}))

    for name, r in results.items():
        assert abs(r["approx_delta_mAP50"]) < 0.01, (name, r)
        assert abs(r["approx_delta_mAP"]) < 0.01, (name, r)
    print("OK: pallas bit-identical to exact; approx deltas within 0.01",
          file=sys.stderr)


if __name__ == "__main__":
    main()
