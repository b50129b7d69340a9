"""Device-side augmentation: geometry/property parity with the host cv2
pipeline semantics (data/augment.py, reference utils/augmentations.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.ops.augment_device import (
    box_candidates_device,
    build_affine_device,
    device_augment_batch,
    hsv_jitter_device,
    mosaic4_device,
    warp_boxes_device,
    warp_image_device,
)


def test_warp_identity():
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    M = jnp.eye(3)
    out = np.asarray(warp_image_device(jnp.asarray(img), M, 32, 32))
    np.testing.assert_allclose(out, img.astype(np.float32), atol=1e-3)


def test_warp_translation_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 48, 3), np.uint8)
    M = np.eye(3, dtype=np.float32)
    M[0, 2], M[1, 2] = 7.0, -3.0
    want = cv2.warpAffine(img, M[:2], dsize=(48, 48),
                          borderValue=(114, 114, 114)).astype(np.float32)
    got = np.asarray(warp_image_device(jnp.asarray(img), jnp.asarray(M),
                                       48, 48))
    # interior pixels identical; border interpolation may differ by 1px
    np.testing.assert_allclose(got[5:-5, 10:-2], want[5:-5, 10:-2], atol=1.0)


def test_warp_rotation_matches_cv2():
    import cv2

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    Mr = cv2.getRotationMatrix2D((32, 32), 17.0, 0.9)
    M = np.eye(3, dtype=np.float64)
    M[:2] = Mr
    want = cv2.warpAffine(img, M[:2], dsize=(64, 64),
                          borderValue=(114, 114, 114)).astype(np.float32)
    got = np.asarray(warp_image_device(jnp.asarray(img), jnp.asarray(M),
                                       64, 64))
    diff = np.abs(got - want)
    assert np.quantile(diff, 0.98) <= 2.0  # bilinear tie-breaks at edges


def test_warp_boxes_matches_host():
    from efficientteacher_tpu.data.augment import warp_boxes

    rng = np.random.default_rng(3)
    boxes = np.array([[5, 5, 20, 25], [10, 30, 40, 44]], np.float32)
    M = np.array([[0.9, 0.1, 3.0], [-0.05, 1.1, -2.0], [0.0, 0.0, 1.0]],
                 np.float32)
    want = warp_boxes(boxes.copy(), M, 48, 48, perspective=False)
    got = np.asarray(warp_boxes_device(jnp.asarray(boxes), jnp.asarray(M),
                                       48, 48))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_box_candidates_matches_host():
    from efficientteacher_tpu.data.augment import box_candidates

    rng = np.random.default_rng(4)
    before = rng.uniform(0, 40, (10, 4)).astype(np.float32)
    before[:, 2:] = before[:, :2] + rng.uniform(1, 20, (10, 2))
    after = before * rng.uniform(0.1, 1.2, (10, 1)).astype(np.float32)
    want = box_candidates(before.T, after.T, area_thr=0.1)
    got = np.asarray(box_candidates_device(jnp.asarray(before),
                                           jnp.asarray(after), 1.0))
    np.testing.assert_array_equal(got, want)


def test_mosaic4_device_geometry():
    """Each tile's content and boxes land in its quadrant around the
    center; box pixels match tile pixels."""
    s = 32
    imgs = np.stack([np.full((s, s, 3), 40 * (k + 1), np.uint8)
                     for k in range(4)])
    labels = np.zeros((4, 2, 5), np.float32)
    mask = np.zeros((4, 2), bool)
    for k in range(4):
        labels[k, 0] = [k, 0.5, 0.5, 0.25, 0.25]
        mask[k, 0] = True
    canvas, boxes, valid = mosaic4_device(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(labels),
        jnp.asarray(mask), s,
    )
    canvas = np.asarray(canvas)
    boxes = np.asarray(boxes)
    valid = np.asarray(valid)
    assert canvas.shape == (2 * s, 2 * s, 3)
    assert valid.sum() == 4
    for k in range(4):
        row = boxes[2 * k]
        assert row[0] == k
        cx = (row[1] + row[3]) / 2
        cy = (row[2] + row[4]) / 2
        if 0 <= cx < 2 * s and 0 <= cy < 2 * s:
            # pixel at box center belongs to tile k (value 40*(k+1)) when
            # inside the canvas
            v = canvas[int(cy), int(cx), 0]
            assert v == 40 * (k + 1), (k, v)


def test_hsv_zero_gains_identity():
    img = np.random.default_rng(5).uniform(0, 255, (16, 16, 3)).astype(
        np.float32
    )
    out = np.asarray(hsv_jitter_device(jax.random.PRNGKey(0),
                                       jnp.asarray(img), 0.0, 0.0, 0.0))
    np.testing.assert_allclose(out, img, atol=0.5)


def test_device_augment_batch_contract():
    """Jittable end-to-end: shapes, dtypes, boxes valid and normalized."""
    rng = np.random.default_rng(6)
    b, s, m = 4, 64, 6
    images = rng.integers(0, 255, (b, s, s, 3), np.uint8)
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    for bi in range(b):
        labels[bi, 0] = [bi % 3, 0.5, 0.5, 0.4, 0.4]
        labels[bi, 1] = [1, 0.3, 0.7, 0.2, 0.2]
        mask[bi, :2] = True
    hyp = {"mosaic": 1.0, "degrees": 5.0, "translate": 0.1, "scale": 0.3,
           "shear": 2.0, "perspective": 0.0, "hsv_h": 0.015, "hsv_s": 0.7,
           "hsv_v": 0.4, "fliplr": 0.5, "flipud": 0.0}
    fn = jax.jit(lambda k, i, l, ms: device_augment_batch(
        k, i, l, ms, hyp, max_out=16))
    out_img, out_lab, out_mask = fn(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(labels),
        jnp.asarray(mask),
    )
    assert out_img.shape == (b, s, s, 3) and out_img.dtype == jnp.uint8
    assert out_lab.shape == (b, 16, 5)
    assert out_mask.shape == (b, 16)
    ol = np.asarray(out_lab)
    om = np.asarray(out_mask)
    assert om.any()  # some boxes survive
    sel = ol[om]
    assert (sel[:, 1:] >= -1e-4).all() and (sel[:, 1:] <= 1 + 1e-4).all()
    assert (sel[:, 3] > 0).all() and (sel[:, 4] > 0).all()
    # different keys -> different outputs (randomness flows)
    out2 = fn(jax.random.PRNGKey(1), jnp.asarray(images),
              jnp.asarray(labels), jnp.asarray(mask))[0]
    assert not np.array_equal(np.asarray(out_img), np.asarray(out2))


def test_device_augment_no_mosaic_path():
    rng = np.random.default_rng(7)
    b, s, m = 2, 48, 4
    images = rng.integers(0, 255, (b, s, s, 3), np.uint8)
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    labels[:, 0] = [0, 0.5, 0.5, 0.5, 0.5]
    mask[:, 0] = True
    hyp = {"mosaic": 0.0, "degrees": 0.0, "translate": 0.0, "scale": 0.0,
           "shear": 0.0, "perspective": 0.0, "hsv_h": 0, "hsv_s": 0,
           "hsv_v": 0, "fliplr": 0.0, "flipud": 0.0}
    out_img, out_lab, out_mask = device_augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(labels),
        jnp.asarray(mask), hyp,
    )
    # all-identity hyp: the image and boxes pass through unchanged
    np.testing.assert_allclose(np.asarray(out_img[0]), images[0], atol=1.0)
    sel = np.asarray(out_lab[0])[np.asarray(out_mask[0])]
    np.testing.assert_allclose(sel[0], labels[0, 0], atol=1e-3)


def test_device_ssod_views_contract():
    """Weak/strong pair + M_s record: shapes, and the recorded transform
    actually maps weak-view content to strong-view content (the property
    the pseudo-label M-warp relies on)."""
    from efficientteacher_tpu.ops.augment_device import device_ssod_views

    rng = np.random.default_rng(8)
    b, s, m = 4, 64, 4
    images = rng.integers(0, 255, (b, s, s, 3), np.uint8)
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    labels[:, 0] = [0, 0.5, 0.5, 0.3, 0.3]
    mask[:, 0] = True
    hyp = {"mosaic": 1.0, "degrees": 3.0, "translate": 0.1, "scale": 0.3,
           "shear": 0.0, "perspective": 0.0, "hsv_h": 0.015, "hsv_s": 0.7,
           "hsv_v": 0.4, "fliplr": 0.5, "flipud": 0.0}
    fn = jax.jit(lambda k, i, l, ms: device_ssod_views(k, i, l, ms, hyp,
                                                       max_out=16))
    strong, out_lab, out_mask, weak, m_s = fn(
        jax.random.PRNGKey(3), jnp.asarray(images),
        jnp.asarray(labels), jnp.asarray(mask),
    )
    assert strong.shape == (b, s, s, 3) and strong.dtype == jnp.uint8
    assert weak.shape == (b, s, s, 3) and weak.dtype == jnp.uint8
    assert out_lab.shape == (b, 16, 5) and out_mask.shape == (b, 16)
    m_s = np.asarray(m_s)
    assert m_s.shape == (b, 13)
    np.testing.assert_array_equal(m_s[:, 0], np.arange(b))  # batch idx
    # M is a valid invertible 3x3; scale factor recorded in [0.7, 1.3]
    for bi in range(b):
        M = m_s[bi, 1:10].reshape(3, 3)
        assert abs(np.linalg.det(M)) > 1e-3
        assert 0.65 <= m_s[bi, 10] <= 1.35
        assert m_s[bi, 11] in (0.0, 1.0) and m_s[bi, 12] in (0.0, 1.0)


def test_device_ssod_views_identity_transform():
    """With identity hyp and no mosaic: strong == weak == input, labels
    pass through, M_s records the identity."""
    from efficientteacher_tpu.ops.augment_device import device_ssod_views

    rng = np.random.default_rng(9)
    b, s, m = 2, 48, 4
    images = rng.integers(0, 255, (b, s, s, 3), np.uint8)
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    labels[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    mask[:, 0] = True
    hyp = {"mosaic": 0.0, "degrees": 0.0, "translate": 0.0, "scale": 0.0,
           "shear": 0.0, "perspective": 0.0, "hsv_h": 0, "hsv_s": 0,
           "hsv_v": 0, "fliplr": 0.0, "flipud": 0.0}
    strong, out_lab, out_mask, weak, m_s = device_ssod_views(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(labels),
        jnp.asarray(mask), hyp,
    )
    np.testing.assert_allclose(np.asarray(weak[0]), images[0], atol=1.0)
    np.testing.assert_allclose(np.asarray(strong[0]), images[0], atol=1.0)
    M = np.asarray(m_s)[0, 1:10].reshape(3, 3)
    np.testing.assert_allclose(M, np.eye(3), atol=1e-5)
    sel = np.asarray(out_lab[0])[np.asarray(out_mask[0])]
    np.testing.assert_allclose(sel[0], labels[0, 0], atol=1e-3)


def test_scale_translate_warp_matches_gather_warp():
    """The MXU fast path reproduces the gather warp on axis-aligned
    affines (interior pixels; the two differ only in border handling)."""
    from efficientteacher_tpu.ops.augment_device import (
        warp_scale_translate_device,
    )

    rng = np.random.default_rng(10)
    img = rng.integers(0, 255, (96, 96, 3), np.uint8)
    for s_, tx, ty in [(1.0, 5.0, -3.0), (0.8, 10.0, 4.0),
                       (1.25, -7.0, 2.5)]:
        M = jnp.asarray(np.array(
            [[s_, 0, tx], [0, s_, ty], [0, 0, 1]], np.float32))
        want = np.asarray(warp_image_device(jnp.asarray(img), M, 48, 48))
        got = np.asarray(warp_scale_translate_device(jnp.asarray(img), M,
                                                     48, 48))
        # the two differ only where the bilinear footprint crosses the
        # source border (gather blends with fill, resample renormalizes
        # edge weights) — a band of ceil(s)+1 output pixels
        mg = int(np.ceil(s_)) + 8
        diff = np.abs(got[mg:-mg, mg:-mg] - want[mg:-mg, mg:-mg])
        assert diff.max() <= 1.5, (s_, tx, ty, diff.max())
        assert np.abs(got - want).mean() <= 1.0  # border band is small


def test_mosaic_warp_fused_matches_canvas_path():
    """The fused per-tile warp compositing equals mosaic4 canvas + st-warp
    (away from the 1px tile seams)."""
    from efficientteacher_tpu.ops.augment_device import (
        mosaic4_device,
        mosaic_warp_fused_device,
        warp_scale_translate_device,
    )

    rng = np.random.default_rng(11)
    s = 64
    imgs = jnp.asarray(rng.integers(0, 255, (4, s, s, 3), np.uint8))
    labels = jnp.zeros((4, 2, 5), jnp.float32)
    mask = jnp.zeros((4, 2), bool)
    km = jax.random.PRNGKey(4)
    canvas, _, _ = mosaic4_device(km, imgs, labels, mask, s)

    kx, ky = jax.random.split(km)
    xc = jax.random.uniform(kx, (), minval=0.5 * s, maxval=1.5 * s)
    yc = jax.random.uniform(ky, (), minval=0.5 * s, maxval=1.5 * s)
    # integer center: mosaic4_device places tiles at round(xc/yc) while the
    # fused path uses them exactly — use the rounded values for both
    xci = jnp.round(xc)
    yci = jnp.round(yc)
    corners = jnp.stack([
        jnp.stack([yci - s, xci - s]), jnp.stack([yci - s, xci]),
        jnp.stack([yci, xci - s]), jnp.stack([yci, xci]),
    ])
    tile_on = jnp.ones((4,), bool)

    for s_, tx, ty in [(1.0, -20.0, -28.0), (0.8, 5.0, -10.0)]:
        M = jnp.asarray(np.array(
            [[s_, 0, tx], [0, s_, ty], [0, 0, 1]], np.float32))
        want = np.asarray(warp_scale_translate_device(canvas, M, s, s))
        got = np.asarray(mosaic_warp_fused_device(imgs, corners, tile_on,
                                                  M, s))
        diff = np.abs(got - want).max(-1)
        # identical except a few-px band at tile seams / canvas border
        frac_bad = (diff > 2.0).mean()
        assert frac_bad < 0.08, (s_, tx, ty, frac_bad)
        assert np.median(np.abs(got - want)) <= 1.0


def test_cutout_device():
    """Occlusion patches: fill colors in [64, 191], coverage > 0, patch
    count/scales per the reference ladder (augmentations.py:382-407)."""
    from efficientteacher_tpu.ops.augment_device import cutout_device

    s = 96
    img = jnp.zeros((s, s, 3), jnp.float32)
    out = np.asarray(cutout_device(jax.random.PRNGKey(0), img, s))
    changed = (out != 0).any(-1)
    assert changed.any()
    assert changed.mean() < 0.9  # patches, not a full fill
    vals = out[changed]
    assert vals.min() >= 64 and vals.max() <= 191


def test_device_ssod_views_cutout_path():
    from efficientteacher_tpu.ops.augment_device import device_ssod_views

    rng = np.random.default_rng(12)
    b, s, m = 2, 64, 4
    images = rng.integers(0, 255, (b, s, s, 3), np.uint8)
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    hyp = {"mosaic": 1.0, "degrees": 0.0, "translate": 0.1, "scale": 0.3,
           "shear": 0.0, "perspective": 0.0, "hsv_h": 0.015, "hsv_s": 0.7,
           "hsv_v": 0.4, "fliplr": 0.5, "flipud": 0.0, "cutout": 1.0}
    strong, ol, om, weak, m_s = device_ssod_views(
        jax.random.PRNGKey(5), jnp.asarray(images), jnp.asarray(labels),
        jnp.asarray(mask), hyp,
    )
    assert strong.shape == (b, s, s, 3)
    # strong differs from a cutout-free run (the patches landed)
    strong2 = device_ssod_views(
        jax.random.PRNGKey(5), jnp.asarray(images), jnp.asarray(labels),
        jnp.asarray(mask), {**hyp, "cutout": 0.0},
    )[0]
    assert not np.array_equal(np.asarray(strong), np.asarray(strong2))


def test_device_augment_mixup():
    """hyp.mixup blends with the rolled partner and concatenates labels
    (host mixup: Beta(32,32) post-warp pre-HSV, data/augment.py:259)."""
    rng = np.random.default_rng(14)
    b, s, m = 4, 64, 6
    images = rng.integers(0, 255, (b, s, s, 3), np.uint8)
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    for bi in range(b):
        labels[bi, 0] = [bi % 3, 0.5, 0.5, 0.4, 0.4]
        mask[bi, 0] = True
    base = {"mosaic": 1.0, "degrees": 0.0, "translate": 0.05, "scale": 0.1,
            "shear": 0.0, "perspective": 0.0, "hsv_h": 0, "hsv_s": 0,
            "hsv_v": 0, "fliplr": 0.0, "flipud": 0.0}
    out0 = device_augment_batch(
        jax.random.PRNGKey(9), jnp.asarray(images), jnp.asarray(labels),
        jnp.asarray(mask), base, max_out=16,
    )
    out1 = device_augment_batch(
        jax.random.PRNGKey(9), jnp.asarray(images), jnp.asarray(labels),
        jnp.asarray(mask), {**base, "mixup": 1.0}, max_out=16,
    )
    # images change (blend) and label count grows
    assert not np.array_equal(np.asarray(out0[0]), np.asarray(out1[0]))
    assert np.asarray(out1[2]).sum() >= np.asarray(out0[2]).sum()
    # boxes remain valid normalized geometry
    sel = np.asarray(out1[1])[np.asarray(out1[2])]
    assert (sel[:, 1:] >= -1e-4).all() and (sel[:, 1:] <= 1 + 1e-4).all()
