"""AutoAugment detection policies (compact numpy/cv2 implementation).

Fills the role of the reference's utils/autoaugment_utils.py (1637-LoC TF
port) used on the SSOD strong view (utils/datasets_ssod.py:543). Implements
the operation set the shipped v5 policy actually uses — Color, Cutout,
Sharpness, Brightness, Contrast, AutoContrast, Equalize, Solarize,
SolarizeAdd, TranslateY_Only_BBoxes, ShearX_Only_BBoxes,
Cutout_Only_BBoxes — with the same (op, probability, magnitude 0..10)
sub-policy structure: one random sub-policy is applied per call.

Images are uint8 BGR HWC; boxes are (N, 5) [cls, x1, y1, x2, y2] pixels
(only the *_Only_BBoxes ops read them, and only pixel content inside the
boxes is modified — coordinates are never changed by this policy set).
"""

from __future__ import annotations

import random
from typing import List, Optional, Tuple

import cv2
import numpy as np

_MAX_LEVEL = 10.0


def _blend(a: np.ndarray, b: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(
        a.astype(np.float32)
        + factor * (b.astype(np.float32) - a.astype(np.float32)),
        0, 255,
    ).astype(np.uint8)


def _enhance_factor(level: float) -> float:
    return level / _MAX_LEVEL * 1.8 + 0.1


def op_color(img, level, *_):
    gray = cv2.cvtColor(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY),
                        cv2.COLOR_GRAY2BGR)
    return _blend(gray, img, _enhance_factor(level))


def op_brightness(img, level, *_):
    return _blend(np.zeros_like(img), img, _enhance_factor(level))


def op_contrast(img, level, *_):
    mean = int(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).mean() + 0.5)
    return _blend(np.full_like(img, mean), img, _enhance_factor(level))


def op_sharpness(img, level, *_):
    kernel = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0
    smooth = cv2.filter2D(img, -1, kernel)
    return _blend(smooth, img, _enhance_factor(level))


def op_autocontrast(img, *_):
    out = img.copy()
    for c in range(3):
        ch = out[:, :, c]
        lo, hi = int(ch.min()), int(ch.max())
        if hi > lo:
            lut = ((np.arange(256) - lo) * (255.0 / (hi - lo))).clip(0, 255)
            out[:, :, c] = cv2.LUT(ch, lut.astype(np.uint8))
    return out


def op_equalize(img, *_):
    out = img.copy()
    for c in range(3):
        out[:, :, c] = cv2.equalizeHist(out[:, :, c])
    return out


def op_solarize(img, level, *_):
    thr = int(256 - level / _MAX_LEVEL * 256)
    return np.where(img < thr, img, 255 - img).astype(np.uint8)


def op_solarize_add(img, level, *_):
    add = int(level / _MAX_LEVEL * 110)
    lifted = np.clip(img.astype(np.int32) + add, 0, 255).astype(np.uint8)
    return np.where(img < 128, lifted, img)


def op_cutout(img, level, boxes, rng):
    size = int(level / _MAX_LEVEL * 100)
    if size <= 0:
        return img
    h, w = img.shape[:2]
    cy, cx = rng.randrange(h), rng.randrange(w)
    y1, y2 = max(0, cy - size // 2), min(h, cy + size // 2)
    x1, x2 = max(0, cx - size // 2), min(w, cx + size // 2)
    img[y1:y2, x1:x2] = 128
    return img


def _for_each_box(img, boxes, fn, rng, prob=1.0):
    for b in boxes:
        if rng.random() > prob:
            continue
        x1, y1, x2, y2 = (int(v) for v in b[1:5])
        x1, y1 = max(0, x1), max(0, y1)
        x2, y2 = min(img.shape[1], x2), min(img.shape[0], y2)
        if x2 - x1 < 2 or y2 - y1 < 2:
            continue
        img[y1:y2, x1:x2] = fn(img[y1:y2, x1:x2])
    return img


def op_translate_y_only_bboxes(img, level, boxes, rng):
    pix = int(level / _MAX_LEVEL * 120)

    def shift(patch):
        d = rng.randint(-pix, pix) if pix else 0
        return np.roll(patch, d, axis=0)

    return _for_each_box(img, boxes, shift, rng, prob=0.3)


def op_shear_x_only_bboxes(img, level, boxes, rng):
    mag = level / _MAX_LEVEL * 0.3

    def shear(patch):
        h, w = patch.shape[:2]
        m = np.float32([[1, rng.uniform(-mag, mag), 0], [0, 1, 0]])
        return cv2.warpAffine(patch, m, (w, h), borderValue=(128, 128, 128))

    return _for_each_box(img, boxes, shear, rng, prob=0.3)


def op_cutout_only_bboxes(img, level, boxes, rng):
    size = int(level / _MAX_LEVEL * 50)

    def cut(patch):
        h, w = patch.shape[:2]
        if size and h > 2 and w > 2:
            cy, cx = rng.randrange(h), rng.randrange(w)
            y1, y2 = max(0, cy - size // 2), min(h, cy + size // 2)
            x1, x2 = max(0, cx - size // 2), min(w, cx + size // 2)
            patch[y1:y2, x1:x2] = 128
        return patch

    return _for_each_box(img, boxes, cut, rng, prob=0.3)


_OPS = {
    "Color": op_color,
    "Brightness": op_brightness,
    "Contrast": op_contrast,
    "Sharpness": op_sharpness,
    "AutoContrast": op_autocontrast,
    "Equalize": op_equalize,
    "Solarize": op_solarize,
    "SolarizeAdd": op_solarize_add,
    "Cutout": op_cutout,
    "TranslateY_Only_BBoxes": op_translate_y_only_bboxes,
    "ShearX_Only_BBoxes": op_shear_x_only_bboxes,
    "Cutout_Only_BBoxes": op_cutout_only_bboxes,
}

# the reference's policy_v5 (utils/autoaugment_utils.py:106-134)
POLICY_V5: List[List[Tuple[str, float, int]]] = [
    [("Color", 0.0, 6), ("Cutout", 0.6, 8), ("Sharpness", 0.4, 8)],
    [("TranslateY_Only_BBoxes", 1.0, 8), ("AutoContrast", 0.8, 2)],
    [("AutoContrast", 0.4, 6), ("ShearX_Only_BBoxes", 0.8, 8),
     ("Brightness", 0.0, 10)],
    [("SolarizeAdd", 0.2, 6), ("Contrast", 0.0, 10), ("AutoContrast", 0.6, 0)],
    [("Cutout", 0.2, 0), ("Solarize", 0.8, 8), ("Color", 1.0, 4)],
    [("Equalize", 0.6, 8), ("Solarize", 0.0, 10)],
    [("Cutout", 0.8, 8), ("Brightness", 0.8, 8), ("Cutout", 0.2, 2)],
    [("Color", 0.8, 4), ("TranslateY_Only_BBoxes", 1.0, 6)],
    [("Cutout_Only_BBoxes", 1.0, 1), ("Cutout", 0.2, 1)],
    [("Equalize", 0.6, 6)],
    [("Brightness", 0.8, 8), ("AutoContrast", 0.4, 2),
     ("Brightness", 0.2, 2)],
    [("TranslateY_Only_BBoxes", 0.4, 8), ("Solarize", 0.4, 6),
     ("SolarizeAdd", 0.2, 10)],
    [("Contrast", 1.0, 10), ("SolarizeAdd", 0.2, 8), ("Equalize", 0.2, 4)],
]


def distort_image_with_autoaugment(
    img: np.ndarray,
    boxes: np.ndarray,
    policy: str = "v5",
    rng: Optional[random.Random] = None,
):
    """Apply one random sub-policy in place. Returns (img, boxes)."""
    rng = rng or random
    assert policy == "v5", "only the v5 policy set is shipped"
    sub = rng.choice(POLICY_V5)
    for name, prob, level in sub:
        if rng.random() > prob:
            continue
        img = _OPS[name](img, float(level), boxes, rng)
    return img, boxes
