"""AutoAugment ops and balanced samplers."""

import random

import numpy as np

from efficientteacher_tpu.data.autoaugment import (
    POLICIES,
    _BOX_OPS,
    _GEO_OPS,
    _IMG_OPS,
    distort_image_with_autoaugment,
    op_rotate_bbox,
    op_translate_x_bbox,
)
from efficientteacher_tpu.data.datasets import (
    class_balanced_indices,
    dir_balanced_indices,
)


def test_all_policy_ops_exist():
    """Every op named in any policy table v0-v5/vtest is implemented."""
    have = set(_IMG_OPS) | set(_GEO_OPS) | set(_BOX_OPS)
    for name, table in POLICIES.items():
        used = {op for sub in table for op, _, _ in sub}
        assert used <= have, f"{name}: missing {used - have}"


def test_autoaugment_v5_preserves_boxes():
    """The v5 policy uses no full-image geometric ops -> coords unchanged."""
    rng = random.Random(0)
    img = np.random.default_rng(0).integers(0, 255, (96, 96, 3), np.uint8)
    boxes = np.array([[0, 10, 10, 50, 50], [1, 40, 40, 90, 90]], np.float32)
    for _ in range(20):  # cover many sub-policies
        out, b = distort_image_with_autoaugment(img.copy(), boxes.copy(),
                                                "v5", rng)
        assert out.shape == img.shape and out.dtype == np.uint8
        np.testing.assert_array_equal(b, boxes)  # coords unchanged


def test_autoaugment_all_policies_run():
    img = np.random.default_rng(2).integers(0, 255, (96, 96, 3), np.uint8)
    boxes = np.array([[0, 10, 10, 50, 50], [1, 40, 40, 90, 90]], np.float32)
    for name in POLICIES:
        rng = random.Random(3)
        for _ in range(10):
            out, b = distort_image_with_autoaugment(img.copy(), boxes.copy(),
                                                    name, rng)
            assert out.shape == img.shape and out.dtype == np.uint8
            assert b.shape == boxes.shape
            # boxes stay inside the image after geometric ops
            assert (b[:, 1:] >= 0).all()
            assert (b[:, [1, 3]] <= img.shape[1]).all()
            assert (b[:, [2, 4]] <= img.shape[0]).all()


def test_each_op_runs():
    rng = random.Random(1)
    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3), np.uint8)
    boxes = np.array([[0, 5, 5, 40, 40]], np.float32)
    for name, fn in _IMG_OPS.items():
        out = fn(img.copy(), 8.0, boxes, rng)
        assert out.shape == img.shape, name
    for name, fn in _GEO_OPS.items():
        out, b = fn(img.copy(), 8.0, boxes.copy(), rng)
        assert out.shape == img.shape and b.shape == boxes.shape, name
    for name, fn in _BOX_OPS.items():
        out = fn(img.copy(), 8.0, boxes.copy(), rng, 3.0)  # prob/3 = 1
        assert out.shape == img.shape, name


def test_translate_x_bbox_moves_boxes():
    """TranslateX_BBox: content and coordinates shift together (reference
    translate_bbox, autoaugment_utils.py:948-1000)."""

    class FixedRng(random.Random):
        def random(self):
            return 0.9  # never negate -> positive pixels, content left

    rng = FixedRng()
    img = np.zeros((100, 100, 3), np.uint8)
    img[40:60, 40:60] = 255
    boxes = np.array([[0, 40, 40, 60, 60]], np.float32)
    out, b = op_translate_x_bbox(img, 2.0, boxes, rng)  # 2/10*250 = 50px
    # content moved left by 50
    assert out[50, 0, 0] == 255 and out[50, 55, 0] == 128
    np.testing.assert_allclose(b[0, 1:], [0, 40, 10, 60], atol=1.5)


def test_rotate_bbox_envelope():
    rng = random.Random(5)
    img = np.zeros((100, 100, 3), np.uint8)
    boxes = np.array([[0, 40, 40, 60, 60]], np.float32)
    out, b = op_rotate_bbox(img, 10.0, boxes.copy(), rng)  # +-30 degrees
    # centered box: envelope grows symmetrically around the center
    cx = (b[0, 1] + b[0, 3]) / 2
    cy = (b[0, 2] + b[0, 4]) / 2
    assert abs(cx - 50) < 1 and abs(cy - 50) < 1
    assert b[0, 3] - b[0, 1] > 20 - 1e-3  # envelope >= original width


def test_class_balanced_sampler_upweights_rare():
    rng = random.Random(0)
    # class 0 in 90 images, class 1 in 10
    labels = [np.array([[0, 0.5, 0.5, 0.1, 0.1]])] * 90 + \
             [np.array([[1, 0.5, 0.5, 0.1, 0.1]])] * 10
    idx = class_balanced_indices(labels, 2, rng)
    assert len(idx) == 100
    rare = sum(1 for i in idx if i >= 90)
    assert rare > 25  # rare class oversampled well above its 10% share


def test_dir_balanced_sampler_round_robin():
    rng = random.Random(0)
    files = [f"/a/{i}.jpg" for i in range(8)] + [f"/b/{i}.jpg" for i in range(2)]
    idx = dir_balanced_indices(files, rng)
    assert len(idx) == 10
    # directories alternate at the front
    dirs = ["a" if i < 8 else "b" for i in idx[:4]]
    assert "a" in dirs and "b" in dirs


def test_copy_paste():
    import numpy as np

    from efficientteacher_tpu.data.augment import copy_paste

    rng = random.Random(0)
    img = np.full((100, 100, 3), 50, np.uint8)
    img[20:40, 10:30] = 200  # object patch
    labels = np.array([[0, 10, 20, 30, 40]], np.float32)
    out_img, out_labels = copy_paste(img.copy(), labels.copy(), p=1.0,
                                     rng=rng)
    assert len(out_labels) >= len(labels)
    if len(out_labels) > 1:
        # pasted at the mirrored x location with same y band
        row = out_labels[-1]
        assert row[1] == 100 - labels[0][3]
        assert out_img[25, int(row[1]) + 5].max() >= 190


def test_solarize_threshold_mapping():
    """Reference level_to_arg: threshold = level/10*256; solarize inverts
    pixels >= threshold — HIGHER level is MILDER
    (autoaugment_utils.py:1448, :321)."""
    from efficientteacher_tpu.data.autoaugment import op_solarize

    img = np.arange(256, dtype=np.uint8).reshape(16, 16, 1).repeat(3, 2)
    out8 = op_solarize(img.copy(), 8.0)  # thr 204: only bright px invert
    changed = (out8 != img).any(-1)
    frac = changed.mean()
    assert 0.15 < frac < 0.25, frac  # ~52/256 pixels
    assert (out8[img[..., 0] < 204] == img[img[..., 0] < 204]).all()
    out10 = op_solarize(img.copy(), 10.0)  # thr 256: no-op
    np.testing.assert_array_equal(out10, img)
