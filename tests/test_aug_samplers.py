"""AutoAugment ops and balanced samplers."""

import random

import numpy as np

from efficientteacher_tpu.data.autoaugment import (
    POLICY_V5,
    _OPS,
    distort_image_with_autoaugment,
)
from efficientteacher_tpu.data.datasets import (
    class_balanced_indices,
    dir_balanced_indices,
)


def test_all_policy_ops_exist():
    used = {op for sub in POLICY_V5 for op, _, _ in sub}
    assert used <= set(_OPS)


def test_autoaugment_preserves_shape_and_boxes():
    rng = random.Random(0)
    img = np.random.default_rng(0).integers(0, 255, (96, 96, 3), np.uint8)
    boxes = np.array([[0, 10, 10, 50, 50], [1, 40, 40, 90, 90]], np.float32)
    for _ in range(20):  # cover many sub-policies
        out, b = distort_image_with_autoaugment(img.copy(), boxes.copy(),
                                                "v5", rng)
        assert out.shape == img.shape and out.dtype == np.uint8
        np.testing.assert_array_equal(b, boxes)  # coords unchanged


def test_each_op_runs():
    rng = random.Random(1)
    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3), np.uint8)
    boxes = np.array([[0, 5, 5, 40, 40]], np.float32)
    for name, fn in _OPS.items():
        out = fn(img.copy(), 8.0, boxes, rng)
        assert out.shape == img.shape, name


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
