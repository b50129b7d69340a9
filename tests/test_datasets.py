"""Data pipeline tests on a synthetic YOLO-format dataset written to disk."""

import numpy as np
import cv2
import pytest

from efficientteacher_tpu.data import (
    LoadImagesAndFakeLabels,
    LoadImagesAndLabels,
    BatchLoader,
    SSODBatchLoader,
)
from efficientteacher_tpu.data.datasets import img2label_path, parse_data_path


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """12 images with one colored box each + YOLO labels."""
    root = tmp_path_factory.mktemp("synth")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        h, w = int(rng.integers(200, 400)), int(rng.integers(200, 400))
        img = np.full((h, w, 3), 60, np.uint8)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        bw, bh = rng.uniform(0.2, 0.4, 2)
        x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
        x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), -1)
        p = root / "images" / f"img{i:03d}.jpg"
        cv2.imwrite(str(p), img)
        cls = int(rng.integers(0, 3))
        (root / "labels" / f"img{i:03d}.txt").write_text(
            f"{cls} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n"
        )
        paths.append(str(p))
    listfile = root / "train.txt"
    listfile.write_text("\n".join(paths))
    return root, listfile


def test_path_parsing(synth_dataset):
    root, listfile = synth_dataset
    assert len(parse_data_path(str(root / "images"))) == 12
    assert len(parse_data_path(str(listfile))) == 12
    # concat + repeat syntax
    combo = f"{listfile}||{root/'images'}*2"
    assert len(parse_data_path(combo)) == 12 + 24
    assert img2label_path("/d/images/a.jpg") == "/d/labels/a.txt"


def test_dataset_loads_and_caches(synth_dataset):
    root, listfile = synth_dataset
    ds = LoadImagesAndLabels(str(listfile), img_size=128, nc=3,
                             max_targets=16)
    assert len(ds) == 12
    assert ds.cls_ratio_gt.shape == (3,)
    assert ds.label_num_per_image == pytest.approx(1.0)
    img, labels, mask, shapes = ds[0]
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    assert labels.shape == (16, 5) and mask.sum() == 1
    # normalized coords valid
    assert (labels[mask][:, 1:] >= 0).all() and (labels[mask][:, 1:] <= 1).all()
    # cache file exists and a second instantiation reuses it
    ds2 = LoadImagesAndLabels(str(listfile), img_size=128, nc=3,
                              max_targets=16)
    assert len(ds2) == 12


def test_augmented_batches(synth_dataset):
    root, listfile = synth_dataset
    hyp = dict(mosaic=1.0, mixup=0.2, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
               degrees=0.0, translate=0.1, scale=0.5, shear=0.0,
               perspective=0.0, flipud=0.0, fliplr=0.5)
    ds = LoadImagesAndLabels(str(listfile), img_size=128, hyp=hyp,
                             augment=True, nc=3, max_targets=32, seed=1)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape == (4, 128, 128, 3)
    assert b["labels"].shape == (4, 32, 5)
    assert b["mask"].shape == (4, 32)
    assert b["mask"].any()  # mosaic keeps some boxes
    # labels normalized
    lab = b["labels"][b["mask"]]
    assert (lab[:, 1:] >= 0).all() and (lab[:, 1:] <= 1.0001).all()


def test_ssod_weak_strong_geometry(synth_dataset):
    """The recorded M must map weak-view GT boxes onto the strong view:
    warp the (known) weak GT by M and check it overlaps the strong labels."""
    root, listfile = synth_dataset
    hyp = dict(mosaic=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, degrees=0.0,
               translate=0.1, scale=0.3, shear=0.0, perspective=0.0,
               flipud=0.0, fliplr=0.0, cutout=0.0, autoaugment=0.0)
    ds = LoadImagesAndFakeLabels(
        str(listfile), img_size=128, hyp=hyp, augment=True, nc=3,
        max_targets=16, seed=3, with_gt=True,
    )
    found = 0
    for idx in range(len(ds)):
        strong, labels, mask, weak, m_s = ds[idx]
        assert strong.shape == weak.shape == (128, 128, 3)
        assert m_s.shape == (13,)
        if not mask.any():
            continue
        M = m_s[1:10].reshape(3, 3)
        # red box on the weak view (BGR->RGB already applied; red = ch 0)
        red = (weak[:, :, 0] > 150) & (weak[:, :, 1] < 100)
        ys, xs = np.nonzero(red)
        if len(xs) < 10:
            continue
        box = np.array([[xs.min(), ys.min(), xs.max(), ys.max()]], np.float32)
        corners = np.array(
            [[box[0, 0], box[0, 1], 1], [box[0, 2], box[0, 3], 1]], np.float32
        )
        warped = corners @ M.T
        wx1, wy1 = warped[0, :2]
        wx2, wy2 = warped[1, :2]
        # strong-view label (normalized xywh) -> pixels
        lb = labels[mask][0]
        sx1 = (lb[1] - lb[3] / 2) * 128
        sx2 = (lb[1] + lb[3] / 2) * 128
        sy1 = (lb[2] - lb[4] / 2) * 128
        sy2 = (lb[2] + lb[4] / 2) * 128
        # warped weak box must align with strong label (clipping tolerance)
        ix1, iy1 = max(min(wx1, wx2), 0), max(min(wy1, wy2), 0)
        ix2, iy2 = min(max(wx1, wx2), 128), min(max(wy1, wy2), 128)
        inter = max(0, min(ix2, sx2) - max(ix1, sx1)) * max(
            0, min(iy2, sy2) - max(iy1, sy1))
        area_s = (sx2 - sx1) * (sy2 - sy1)
        assert inter / max(area_s, 1) > 0.7, (idx, inter, area_s)
        found += 1
    assert found >= 3


def test_ssod_batch_loader(synth_dataset):
    root, listfile = synth_dataset
    hyp = dict(mosaic=1.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, degrees=0.0,
               translate=0.1, scale=0.5, shear=0.0, perspective=0.0,
               flipud=0.0, fliplr=0.5, cutout=0.0, autoaugment=0.0)
    ds = LoadImagesAndFakeLabels(str(listfile), img_size=128, hyp=hyp,
                                 augment=True, nc=3, max_targets=16, seed=2)
    loader = SSODBatchLoader(ds, batch_size=4, seed=2)
    b = next(iter(loader))
    assert b["images"].shape == (4, 128, 128, 3)
    assert b["images_ori"].shape == (4, 128, 128, 3)
    assert b["M_s"].shape == (4, 13)
    np.testing.assert_array_equal(b["M_s"][:, 0], np.arange(4))
    # unlabeled: no GT labels
    assert not b["mask"].any()


def test_mosaic9(synth_dataset):
    import random

    from efficientteacher_tpu.data.augment import mosaic9

    root, listfile = synth_dataset
    ds = LoadImagesAndLabels(str(listfile), img_size=96, nc=3, max_targets=32)
    rng = random.Random(0)
    imgs, lbs = [], []
    for i in range(9):
        img, _, (h, w) = ds.load_image(i % len(ds))
        imgs.append(img)
        lbs.append(ds._labels_xyxy_pixels(i % len(ds), w, h, 0, 0))
    canvas, merged = mosaic9(imgs, lbs, 96, rng)
    assert canvas.shape == (192, 192, 3)
    if len(merged):
        assert (merged[:, 1:5] >= 0).all() and (merged[:, 1:5] <= 192).all()


def test_disk_image_cache(synth_dataset, tmp_path):
    root, listfile = synth_dataset
    ds = LoadImagesAndLabels(
        str(listfile), img_size=64, nc=3, max_targets=8,
        cache_dir_images=str(tmp_path / "imgc"),
    )
    img1, hw1, _ = ds.load_image(0)
    assert (tmp_path / "imgc" / "0.npy").exists()
    img2, hw2, _ = ds.load_image(0)  # served from disk
    np.testing.assert_array_equal(img1, img2)
    assert hw1 == tuple(hw2) or hw1 == hw2


def test_rect_batch_loader(synth_dataset):
    from efficientteacher_tpu.data.datasets import RectBatchLoader

    root, listfile = synth_dataset
    ds = LoadImagesAndLabels(str(listfile), img_size=128, nc=3, max_targets=8)
    loader = RectBatchLoader(ds, batch_size=4, img_size=128)
    seen = 0
    for b in loader:
        h, w = b["images"].shape[1:3]
        assert h % 32 == 0 and w % 32 == 0
        assert h <= 160 and w <= 160
        # labels normalized to the bucket frame
        lab = b["labels"][b["mask"]]
        if len(lab):
            assert (lab[:, 1:] >= 0).all() and (lab[:, 1:] <= 1.0001).all()
        seen += len(b["indices"])
    assert seen == len(ds)


def test_validator_with_rect_loader(synth_dataset):
    """Eval machinery over non-square rect batches (shape-bucketed)."""
    import jax
    import jax.numpy as jnp

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.data.datasets import RectBatchLoader
    from efficientteacher_tpu.eval import validator
    from efficientteacher_tpu.models import Model
    from efficientteacher_tpu.models.spec import spec_from_cfg

    root, listfile = synth_dataset
    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Dataset.nc = 3
    cfg.Dataset.img_size = 128
    spec = spec_from_cfg(cfg)
    model = Model(spec=spec, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                           train=False)
    ds = LoadImagesAndLabels(str(listfile), img_size=128, nc=3, max_targets=8)
    loader = RectBatchLoader(ds, batch_size=4, img_size=128)
    results, maps, thr = validator.run(
        model, variables, loader, nc=3, compute_dtype=jnp.float32,
        max_nms=512,
    )
    assert all(np.isfinite(v) for v in results)
    assert len(thr) == 3


def test_tracking_id_channel(synth_dataset):
    """pseudo_ids adds a trailing sequential id column to labels."""
    root, listfile = synth_dataset
    ds = LoadImagesAndLabels(str(listfile), img_size=64, nc=3, max_targets=8,
                             pseudo_ids=True)
    img, labels, mask, _ = ds[0]
    assert labels.shape == (8, 6)  # cls + xywh + id
    ids = labels[mask][:, 5]
    assert (ids == np.arange(len(ids))).all()


def test_quad_batch_loader(synth_dataset):
    from efficientteacher_tpu.data.datasets import QuadBatchLoader

    root, listfile = synth_dataset
    ds = LoadImagesAndLabels(str(listfile), img_size=64, nc=3, max_targets=4)
    loader = QuadBatchLoader(ds, batch_size=2, shuffle=True, seed=0)
    b = next(iter(loader))
    assert b["images"].shape == (2, 128, 128, 3)   # 2x img_size
    assert b["labels"].shape == (2, 16, 5)         # 4x max_targets
    lab = b["labels"][b["mask"]]
    if len(lab):
        assert (lab[:, 1:] >= 0).all() and (lab[:, 1:] <= 1.0001).all()


def test_reseed_streams_independent_across_epochs():
    """Regression: the per-batch RNG seed must not collide across epochs
    (an arithmetic mix epoch*K + seq replays epoch e's batch s+K as epoch
    e+1's batch s whenever batches-per-epoch > K)."""
    from efficientteacher_tpu.data.datasets import BatchLoader

    class _DS:
        img_files = []
        rng = None

    def draws(epoch, seq, n=8):
        bl = BatchLoader.__new__(BatchLoader)
        bl.ds = _DS()
        bl.seed = 0
        bl.epoch = epoch
        bl._reseed(seq)
        return tuple(bl.ds.rng.random() for _ in range(n))

    seen = {}
    for epoch in range(4):
        for seq in range(600):
            s = draws(epoch, seq)
            assert s not in seen, (
                f"stream collision: {(epoch, seq)} == {seen[s]}")
            seen[s] = (epoch, seq)
    # and reproducible for the same triple
    assert draws(2, 123) == draws(2, 123)
