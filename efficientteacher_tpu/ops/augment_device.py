"""Device-side train augmentation: mosaic-4 + random perspective + HSV +
flips as ONE jitted batched program.

Why: the reference runs its augmentation pipeline in Python/cv2 dataloader
workers (utils/datasets.py load_mosaic -> random_perspective ->
augment_hsv -> flips). On hosts with few cores that pipeline caps
end-to-end throughput far below the TPU's step rate (bench.py aux:
29 img/s e2e vs 251 img/s compute on a 1-core host). TPU-first fix: the
host only decodes + letterboxes once (RAM-cacheable); composition and
warping — the expensive parts — run on the TPU as MXU resample matmuls:
13.6 ms per b32@640 batch for the full supervised program and 26 ms for
the SSOD dual view on v5e (~2350 / ~1220 img/s), small next to the
128 ms train step.

Semantics per sample (mirrors the host pipeline in data/augment.py, which
itself mirrors reference utils/augmentations.py):
  1. mosaic-4: 3 partner images drawn from WITHIN the batch (the host
     pipeline draws from the whole dataset; in-batch drawing is the
     sampling approximation that makes the op batchable — every image
     still appears once as a primary tile per step)
  2. random_perspective with border = -s/2 (mosaic crop), the same
     T@S@R@P@C matrix composition (augmentations.py:278-303) and
     box_candidates filter (:417)
  3. HSV jitter (float-space equivalent of the reference's uint8 LUT
     trick, augmentations.py:48-60)
  4. horizontal/vertical flips

All shapes static; randomness via jax.random (fold_in per sample); output
uint8 so the existing train-step signature (u8 -> /255 on device) is
unchanged.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

FILL = 114.0


# -- geometry -----------------------------------------------------------------

def build_affine_device(key, width, height, degrees, translate, scale,
                        shear, perspective, border: Tuple[int, int]):
    """Random M (3,3) and scale s; composition T@S@R@P@C mirrors
    data/augment.py build_affine (reference augmentations.py:278-303)."""
    k = jax.random.split(key, 8)
    u = lambda kk, lo, hi: jax.random.uniform(kk, (), minval=lo, maxval=hi)

    C = jnp.array([[1.0, 0.0, -width / 2],
                   [0.0, 1.0, -height / 2],
                   [0.0, 0.0, 1.0]])
    P = jnp.eye(3)
    P = P.at[2, 0].set(u(k[0], -perspective, perspective))
    P = P.at[2, 1].set(u(k[1], -perspective, perspective))

    a = u(k[2], -degrees, degrees) * math.pi / 180.0
    s = u(k[3], 1.0 - scale, 1.0 + scale)
    # cv2.getRotationMatrix2D(center=(0,0), angle, scale): y-down CCW
    alpha, beta = s * jnp.cos(a), s * jnp.sin(a)
    R = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    R = R.at[0, 0].set(alpha).at[0, 1].set(beta)
    R = R.at[1, 0].set(-beta).at[1, 1].set(alpha)

    S = jnp.eye(3)
    sh = lambda kk: jnp.tan(u(kk, -shear, shear) * math.pi / 180.0)
    S = S.at[0, 1].set(sh(k[4])).at[1, 0].set(sh(k[5]))

    out_w = width + border[1] * 2
    out_h = height + border[0] * 2
    T = jnp.eye(3)
    T = T.at[0, 2].set(u(k[6], 0.5 - translate, 0.5 + translate) * out_w)
    T = T.at[1, 2].set(u(k[7], 0.5 - translate, 0.5 + translate) * out_h)
    M = T @ S @ R @ P @ C
    return M, s


def warp_image_device(img, M, out_h: int, out_w: int, fill: float = FILL):
    """Inverse-map bilinear warp: out(x, y) = img(M^-1 @ (x, y, 1)).
    img: (H, W, 3) uint8/float. Matches cv2.warpPerspective(borderValue=114)
    up to bilinear edge handling."""
    h, w = img.shape[0], img.shape[1]
    Minv = jnp.linalg.inv(M)
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    src = jnp.einsum("ij,jhw->ihw", Minv, jnp.stack([xs, ys, ones]))
    sx = src[0] / src[2]
    sy = src[1] / src[2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)].astype(
            jnp.float32
        )
        return jnp.where(inside[..., None], v, fill)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return out


def _st_weight(in_size: int, out_size: int, scale, translation):
    """(in, out) bilinear resample matrix for out(X) = in((X - t)/scale),
    integer-pixel convention. Out-of-range columns are all-zero, which
    (with the fill shift in _st_warp) reproduces the gather warp's
    blend-with-fill border semantics exactly."""
    x = (jnp.arange(out_size, dtype=jnp.float32) - translation) / scale
    src = jnp.arange(in_size, dtype=jnp.float32)
    return jnp.clip(1.0 - jnp.abs(x[None, :] - src[:, None]), 0.0, 1.0)


def _st_warp(img, sy, sx, ty, tx, out_h: int, out_w: int,
             fill: float = FILL):
    """Separable scale+translate warp as two einsums (MXU work at default
    precision — jax.image.scale_and_translate pins Precision.HIGHEST,
    ~6x slower f32 on TPU). out(Y, X) = img((Y - ty)/sy, (X - tx)/sx).
    Negative scales flip — folding flips into the matrix avoids the
    reversed-operand `where` that defeats XLA fusion."""
    h, w = img.shape[0], img.shape[1]
    wy = _st_weight(h, out_h, sy, ty)
    wx = _st_weight(w, out_w, sx, tx)
    x = img.astype(jnp.float32) - fill
    x = jnp.einsum("hwc,hH->Hwc", x, wy)
    x = jnp.einsum("Hwc,wW->HWc", x, wx)
    return x + fill


def warp_scale_translate_device(img, M, out_h: int, out_w: int,
                                fill: float = FILL):
    """Fast separable warp for AXIS-ALIGNED affines
    (M = [[s, 0, tx], [0, s, ty]], i.e. degrees = shear = perspective = 0 —
    the shipped hyp defaults): jax.image.scale_and_translate lowers to two
    MXU matmuls instead of per-pixel gathers, 42x faster than
    warp_image_device on TPU v5e (24 ms vs 1013 ms, b32 1280->640).

    Mapping identical to warp_image_device: src = (X - t)/s with
    integer-pixel coordinates. Out-of-range fills `fill` via the
    (img - fill) shift trick (the resample zero-pads)."""
    return _st_warp(img, M[1, 1], M[0, 0], M[1, 2], M[0, 2], out_h, out_w,
                    fill)


def mosaic_warp_fused_device(imgs4, corners_yx, tile_on, M, s: int,
                             fill: float = FILL):
    """Mosaic composition FUSED with an axis-aligned warp: instead of
    materializing the 2s x 2s canvas and warping it, each s-tile is warped
    straight into output space (out = s_M * (tile coord + corner) + t) and
    composited with its coverage rectangle. 4 MXU s->s resamples replace
    one 2s->s resample + a 2s canvas round-trip through HBM.

    imgs4 (4, s, s, 3) u8; corners_yx (4, 2) tile top-left in mosaic
    coords; tile_on (4,) bool; M the axis-aligned affine. Seam note: at
    tile boundaries each tile blends its last pixel with fill instead of
    its neighbor — a <=1px difference from the canvas path."""
    sx = M[0, 0]
    sy = M[1, 1]
    tx = M[0, 2]
    ty = M[1, 2]
    ys = jnp.arange(s, dtype=jnp.float32)[:, None]
    xs = jnp.arange(s, dtype=jnp.float32)[None, :]
    out = jnp.full((s, s, 3), fill, jnp.float32)

    def span(lo, hi):  # unordered endpoints (negative scale = flip)
        return jnp.minimum(lo, hi), jnp.maximum(lo, hi)

    # the virtual canvas is 2s x 2s: tiles crop at its boundary (mosaic
    # coords outside [0, 2s) are fill, exactly like the canvas path)
    wy1, wy2 = span(ty, ty + sy * 2 * s)
    wx1, wx2 = span(tx, tx + sx * 2 * s)
    win = (ys >= wy1) & (ys < wy2) & (xs >= wx1) & (xs < wx2)
    for k in range(4):
        cy, cx = corners_yx[k, 0], corners_yx[k, 1]
        warped = _st_warp(imgs4[k], sy, sx, ty + sy * cy, tx + sx * cx,
                          s, s, fill)
        y1, y2 = span(sy * cy + ty, sy * (cy + s) + ty)
        x1, x2 = span(sx * cx + tx, sx * (cx + s) + tx)
        cover = ((ys >= y1) & (ys < y2)
                 & (xs >= x1) & (xs < x2) & win & tile_on[k])
        out = jnp.where(cover[..., None], warped, out)
    return out


def _fold_flips(M, do_lr, do_ud, s: int, pixel: bool):
    """F @ M: compose horizontal/vertical flips into the affine. Pixel
    convention flips around s-1 (img[::-1] samples in(s-1-x)); box corner
    coordinates flip around s (x' = s - x), matching the host pipeline."""
    off = (s - 1.0) if pixel else float(s)
    fx = jnp.where(do_lr, -1.0, 1.0)
    fy = jnp.where(do_ud, -1.0, 1.0)
    ox = jnp.where(do_lr, off, 0.0)
    oy = jnp.where(do_ud, off, 0.0)
    F = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    F = F.at[0, 0].set(fx).at[0, 2].set(ox)
    F = F.at[1, 1].set(fy).at[1, 2].set(oy)
    return F @ M


def _axis_aligned(hyp: Dict) -> bool:
    """True when the random affine never rotates/shears (fast-warp path)."""
    return (float(hyp.get("degrees", 0.0)) == 0.0
            and float(hyp.get("shear", 0.0)) == 0.0
            and float(hyp.get("perspective", 0.0)) == 0.0)


def warp_boxes_device(boxes, M, out_w: int, out_h: int):
    """(N, 4) xyxy -> enclosing boxes of the warped corners, clipped
    (reference augmentations.py:318-337)."""
    n = boxes.shape[0]
    corners = jnp.stack([
        boxes[:, 0], boxes[:, 1],
        boxes[:, 2], boxes[:, 1],
        boxes[:, 0], boxes[:, 3],
        boxes[:, 2], boxes[:, 3],
    ], axis=-1).reshape(n * 4, 2)
    pts = jnp.concatenate([corners, jnp.ones((n * 4, 1))], axis=-1)
    warped = pts @ M.T
    warped = warped[:, :2] / warped[:, 2:3]
    warped = warped.reshape(n, 4, 2)
    x = warped[..., 0]
    y = warped[..., 1]
    out = jnp.stack([
        x.min(-1).clip(0, out_w), y.min(-1).clip(0, out_h),
        x.max(-1).clip(0, out_w), y.max(-1).clip(0, out_h),
    ], axis=-1)
    return out


def box_candidates_device(before, after, s, wh_thr=2.0, ar_thr=20.0,
                          area_thr=0.1, eps=1e-16):
    """Survival mask after a warp (reference augmentations.py:417)."""
    w1 = (before[:, 2] - before[:, 0]) * s
    h1 = (before[:, 3] - before[:, 1]) * s
    w2 = after[:, 2] - after[:, 0]
    h2 = after[:, 3] - after[:, 1]
    ar = jnp.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return ((w2 > wh_thr) & (h2 > wh_thr)
            & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr))


# -- mosaic -------------------------------------------------------------------

def mosaic4_device(key, imgs4, labels4, mask4, s: int):
    """4 s-square tiles -> (2s, 2s) mosaic around a random center
    (reference utils/datasets.py load_mosaic; tiles are pre-letterboxed to
    s x s so the per-tile crop degenerates to corner placement).

    imgs4 (4, s, s, 3) u8; labels4 (4, M, 5) [cls, xywhn]; mask4 (4, M).
    Returns canvas (2s, 2s, 3) f32, boxes (4M, 5) [cls, xyxy px], (4M,)."""
    kx, ky = jax.random.split(key)
    xc = jax.random.uniform(kx, (), minval=0.5 * s, maxval=1.5 * s)
    yc = jax.random.uniform(ky, (), minval=0.5 * s, maxval=1.5 * s)
    xci = jnp.round(xc).astype(jnp.int32)
    yci = jnp.round(yc).astype(jnp.int32)

    pad = s // 2  # canvas coords = mosaic coords + pad
    # uint8 canvas: the 3s x 3s f32 intermediate would cost 4x the HBM
    # traffic (177 MB/sample at 640) for no precision gain
    canvas = jnp.full((3 * s, 3 * s, 3), int(FILL), jnp.uint8)
    # tile corner offsets relative to the shared center (y, x)
    offs = [(-s, -s), (-s, 0), (0, -s), (0, 0)]
    for k in range(4):
        oy, ox = offs[k]
        canvas = jax.lax.dynamic_update_slice(
            canvas, imgs4[k],
            (yci + pad + oy, xci + pad + ox, 0),
        )
    canvas = jax.lax.dynamic_slice(canvas, (pad, pad, 0),
                                   (2 * s, 2 * s, 3)).astype(jnp.float32)

    m = labels4.shape[1]
    boxes = []
    valid = []
    for k in range(4):
        oy, ox = offs[k]
        cls = labels4[k, :, 0:1]
        cx = labels4[k, :, 1] * s + (xc + ox)
        cy = labels4[k, :, 2] * s + (yc + oy)
        bw = labels4[k, :, 3] * s
        bh = labels4[k, :, 4] * s
        xyxy = jnp.stack([cx - bw / 2, cy - bh / 2,
                          cx + bw / 2, cy + bh / 2], axis=-1)
        boxes.append(jnp.concatenate([cls, xyxy], axis=-1))
        valid.append(mask4[k])
    out = jnp.concatenate(boxes, axis=0)          # (4M, 5)
    out = out.at[:, 1:].set(out[:, 1:].clip(0, 2 * s))
    return canvas, out, jnp.concatenate(valid, axis=0)


# -- color / flips ------------------------------------------------------------

def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn + 1e-12
    h = jnp.where(
        mx == r, (g - b) / d % 6.0,
        jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0),
    ) / 6.0
    sat = d / (mx + 1e-12)
    return h % 1.0, sat, mx


def _hsv_to_rgb(h, s, v):
    h6 = h * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def hsv_jitter_device(key, img, hgain, sgain, vgain):
    """Random HSV gains (float-space port of the reference's uint8 LUT,
    augmentations.py:48-60). img float RGB 0..255."""
    r = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0)
    r = r * jnp.array([hgain, sgain, vgain]) + 1.0
    h, s, v = _rgb_to_hsv(img / 255.0)
    h = (h * r[0]) % 1.0
    s = jnp.clip(s * r[1], 0.0, 1.0)
    v = jnp.clip(v * r[2], 0.0, 1.0)
    return _hsv_to_rgb(h, s, v) * 255.0


# -- the batched entry point --------------------------------------------------

def device_augment_batch(key, images, labels, mask, hyp: Dict,
                         max_out: int = 0):
    """Batched train augmentation on device.

    images (B, s, s, 3) uint8 letterboxed; labels (B, M, 5) [cls, xywhn];
    mask (B, M). Returns (images u8 (B, s, s, 3), labels (B, Mo, 5)
    normalized, mask (B, Mo)) with Mo = max_out or 4M. hyp keys: mosaic,
    degrees, translate, scale, shear, perspective, hsv_h/s/v, fliplr,
    flipud (the reference hyp namespace).
    """
    b, s = images.shape[0], images.shape[1]
    m = labels.shape[1]
    mo = max_out or 4 * m
    use_mosaic = float(hyp.get("mosaic", 1.0)) > 0

    kperm, kbatch, khsv_base = jax.random.split(key, 3)
    # 3 partner tiles per sample, drawn in-batch by shifted permutation
    # (never self at shift 0)
    shifts = 1 + jax.random.randint(kperm, (3,), 0, b - 1) if b > 1 else (
        jnp.zeros((3,), jnp.int32))
    idx = jnp.stack(
        [jnp.arange(b)] + [(jnp.arange(b) + shifts[j]) % b for j in range(3)],
        axis=1,
    )  # (B, 4)

    fast = _axis_aligned(hyp)

    def one(key_i, quad_imgs, quad_labels, quad_mask, p_mosaic):
        km, kw, kh, kfl, kfu, kg = jax.random.split(key_i, 6)
        if use_mosaic:
            # mosaic geometry (same draws as mosaic4_device: km -> kx, ky)
            kx, ky = jax.random.split(km)
            xc = jax.random.uniform(kx, (), minval=0.5 * s, maxval=1.5 * s)
            yc = jax.random.uniform(ky, (), minval=0.5 * s, maxval=1.5 * s)
            do_mos = jax.random.uniform(kg, ()) < p_mosaic
            offs = [(-s, -s), (-s, 0), (0, -s), (0, 0)]
            half = jnp.float32(s // 2)
            corners = []   # tile top-left (y, x) in mosaic coords
            tile_on = []
            box_rows = []
            valid_rows = []
            for k in range(4):
                cy_k = yc + offs[k][0]
                cx_k = xc + offs[k][1]
                if k == 0:  # solo fallback: primary tile centered on 2s
                    cy_k = jnp.where(do_mos, cy_k, half)
                    cx_k = jnp.where(do_mos, cx_k, half)
                    on_k = jnp.bool_(True)
                else:
                    on_k = do_mos
                corners.append(jnp.stack([cy_k, cx_k]))
                tile_on.append(on_k)
                cls_k = quad_labels[k, :, 0:1]
                bcx = quad_labels[k, :, 1] * s + cx_k
                bcy = quad_labels[k, :, 2] * s + cy_k
                bw = quad_labels[k, :, 3] * s
                bh = quad_labels[k, :, 4] * s
                box_rows.append(jnp.concatenate(
                    [cls_k, jnp.stack([bcx - bw / 2, bcy - bh / 2,
                                       bcx + bw / 2, bcy + bh / 2], -1)],
                    axis=-1))
                valid_rows.append(quad_mask[k] & on_k)
            corners = jnp.stack(corners)          # (4, 2)
            tile_on = jnp.stack(tile_on)          # (4,)
            boxes = jnp.concatenate(box_rows, axis=0)
            boxes = boxes.at[:, 1:].set(boxes[:, 1:].clip(0, 2 * s))
            valid = jnp.concatenate(valid_rows, axis=0)
            border = (-s // 2, -s // 2)
            src_w = src_h = 2 * s
        else:
            cls0 = quad_labels[0, :, 0:1]
            cx = quad_labels[0, :, 1] * s
            cy = quad_labels[0, :, 2] * s
            bw = quad_labels[0, :, 3] * s
            bh = quad_labels[0, :, 4] * s
            boxes = jnp.concatenate(
                [cls0, jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                                  cy + bh / 2], -1)], axis=-1)
            valid = quad_mask[0]
            border = (0, 0)
            src_w = src_h = s

        M, sc = build_affine_device(
            kw, src_w, src_h,
            float(hyp.get("degrees", 0.0)), float(hyp.get("translate", 0.1)),
            float(hyp.get("scale", 0.5)), float(hyp.get("shear", 0.0)),
            float(hyp.get("perspective", 0.0)), border,
        )
        # flips FOLDED INTO the matrix: a post-warp `where(flip, img[::-1],
        # img)` forces XLA to materialize both orientations and recompute
        # the upstream pipeline per branch (196 ms vs 16 ms at b32@640)
        do_lr = jax.random.uniform(kfl, ()) < float(hyp.get("fliplr", 0.0))
        do_ud = jax.random.uniform(kfu, ()) < float(hyp.get("flipud", 0.0))
        M_img = _fold_flips(M, do_lr, do_ud, s, pixel=True)
        M_box = _fold_flips(M, do_lr, do_ud, s, pixel=False)
        if use_mosaic and fast:
            # fused: 4 per-tile MXU warps straight into output space —
            # no 2s canvas through HBM
            img = mosaic_warp_fused_device(quad_imgs, corners, tile_on,
                                           M_img, s)
        elif use_mosaic:
            # general (rotating/shearing) path: materialize the 2s canvas
            # (mosaic4_device re-draws the same xc/yc from km)
            canvas, _, _ = mosaic4_device(
                km, quad_imgs, quad_labels, quad_mask, s
            )
            solo = jnp.full((2 * s, 2 * s, 3), FILL, jnp.float32)
            solo = jax.lax.dynamic_update_slice(
                solo, quad_imgs[0].astype(jnp.float32), (s // 2, s // 2, 0)
            )
            canvas = jnp.where(do_mos, canvas, solo)
            img = warp_image_device(canvas, M_img, s, s)
        elif fast:
            img = warp_scale_translate_device(quad_imgs[0], M_img, s, s)
        else:
            img = warp_image_device(quad_imgs[0], M_img, s, s)
        new = warp_boxes_device(boxes[:, 1:], M_box, s, s)
        keep = valid & box_candidates_device(boxes[:, 1:], new, sc)

        x1, y1, x2, y2 = new[:, 0], new[:, 1], new[:, 2], new[:, 3]

        # back to [cls, xywhn], compacted valid-first into mo slots
        cxn = (x1 + x2) / 2 / s
        cyn = (y1 + y2) / 2 / s
        bwn = (x2 - x1) / s
        bhn = (y2 - y1) / s
        out = jnp.stack([boxes[:, 0], cxn, cyn, bwn, bhn], axis=-1)
        order = jnp.argsort(~keep)  # valid rows first, stable
        out = out[order][:mo]
        keep = keep[order][:mo]
        return img, jnp.where(keep[:, None], out, 0.0), keep

    keys = jax.vmap(lambda i: jax.random.fold_in(kbatch, i))(jnp.arange(b))
    quad_imgs = images[idx]        # (B, 4, s, s, 3)
    quad_labels = labels[idx]
    quad_mask = mask[idx]
    p_mos = jnp.full((b,), float(hyp.get("mosaic", 1.0)))
    imgs, out, keep = jax.vmap(one)(keys, quad_imgs, quad_labels,
                                    quad_mask, p_mos)

    # mixup (host order: post-warp, pre-HSV — datasets.py __getitem__):
    # Beta(32, 32) blend with the batch-rolled partner, labels concatenated
    p_mix = float(hyp.get("mixup", 0.0))
    if p_mix > 0 and use_mosaic and b > 1:
        kmr, kmp = jax.random.split(jax.random.fold_in(kbatch, b))
        r = jax.random.beta(kmr, 32.0, 32.0, (b, 1, 1, 1))
        do_mix = jax.random.uniform(kmp, (b,)) < p_mix
        partner = jnp.roll(imgs, 1, axis=0)
        imgs = jnp.where(do_mix[:, None, None, None],
                         imgs * r + partner * (1.0 - r), imgs)
        p_out = jnp.roll(out, 1, axis=0)
        p_keep = jnp.roll(keep, 1, axis=0) & do_mix[:, None]
        out = jnp.concatenate([out, p_out], axis=1)
        keep = jnp.concatenate([keep, p_keep], axis=1)
        order = jnp.argsort(~keep, axis=1)
        out = jnp.take_along_axis(out, order[..., None], axis=1)[:, :mo]
        keep = jnp.take_along_axis(keep, order, axis=1)[:, :mo]
        out = jnp.where(keep[..., None], out, 0.0)

    khsv = jax.vmap(lambda i: jax.random.fold_in(khsv_base, i))(jnp.arange(b))
    imgs = jax.vmap(
        lambda k, im: hsv_jitter_device(
            k, im, float(hyp.get("hsv_h", 0.0)),
            float(hyp.get("hsv_s", 0.0)), float(hyp.get("hsv_v", 0.0)),
        )
    )(khsv, imgs)
    return jnp.clip(imgs, 0, 255).astype(jnp.uint8), out, keep


# -- SSOD dual view -------------------------------------------------------------

def device_ssod_views(key, images, labels, mask, hyp: Dict,
                      max_out: int = 0):
    """Device-side SSOD weak/strong pair (data/datasets_ssod.py
    LoadImagesAndFakeLabels.__getitem__, reference utils/datasets_ssod.py):

      weak   = in-batch mosaic-4 of letterboxed tiles, 2s canvas resized
               to s (reference :768 half-scale)
      strong = recorded affine warp of the weak view + HSV + flips
      M_s    = the 13-vector transform record [batch_idx, M (9), s,
               flipud, fliplr] the pseudo-label path consumes

    images (B, s, s, 3) uint8; labels (B, M, 5) [cls, xywhn] (zeros when
    the pool is unlabeled); mask (B, M).
    Returns (strong u8, labels (B, Mo, 5) xywhn on the STRONG view, mask,
    weak u8, m_s (B, 13)).

    Deviation: the host strong view can additionally apply AutoAugment
    (ssod_hyp.autoaugment); the device path covers mosaic/affine/HSV/
    cutout/flips — use the host loader when AutoAugment matters.
    """
    b, s = images.shape[0], images.shape[1]
    m = labels.shape[1]
    mo = max_out or 4 * m
    use_mosaic = float(hyp.get("mosaic", 1.0)) > 0

    kperm, kbatch = jax.random.split(key)
    shifts = 1 + jax.random.randint(kperm, (3,), 0, b - 1) if b > 1 else (
        jnp.zeros((3,), jnp.int32))
    idx = jnp.stack(
        [jnp.arange(b)] + [(jnp.arange(b) + shifts[j]) % b for j in range(3)],
        axis=1,
    )

    def one(key_i, quad_imgs, quad_labels, quad_mask, bi):
        km, kg, kw, kh, kfl, kfu, kc = jax.random.split(key_i, 7)
        if use_mosaic:
            canvas, boxes2s, valid = mosaic4_device(
                km, quad_imgs, quad_labels, quad_mask, s
            )
            do_mos = jax.random.uniform(kg, ()) < float(hyp["mosaic"])
            solo = quad_imgs[0].astype(jnp.float32)
            weak = jnp.where(
                do_mos,
                jax.image.resize(canvas, (s, s, 3), method="bilinear"),
                solo,
            )
            # boxes on the weak view: mosaic coords / 2 vs the solo tile
            cls0 = quad_labels[0, :, 0:1]
            cx = quad_labels[0, :, 1] * s
            cy = quad_labels[0, :, 2] * s
            bw = quad_labels[0, :, 3] * s
            bh = quad_labels[0, :, 4] * s
            solo_boxes = jnp.concatenate(
                [cls0, jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                                  cy + bh / 2], -1)], axis=-1)
            solo_boxes = jnp.concatenate(
                [solo_boxes, jnp.zeros((3 * m, 5), jnp.float32)], axis=0)
            solo_valid = jnp.concatenate(
                [quad_mask[0], jnp.zeros((3 * m,), bool)], axis=0)
            boxes = jnp.where(
                do_mos,
                boxes2s.at[:, 1:].set(boxes2s[:, 1:] * 0.5),
                solo_boxes,
            )
            valid = jnp.where(do_mos, valid, solo_valid)
        else:
            weak = quad_imgs[0].astype(jnp.float32)
            cls0 = quad_labels[0, :, 0:1]
            cx = quad_labels[0, :, 1] * s
            cy = quad_labels[0, :, 2] * s
            bw = quad_labels[0, :, 3] * s
            bh = quad_labels[0, :, 4] * s
            boxes = jnp.concatenate(
                [cls0, jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                                  cy + bh / 2], -1)], axis=-1)
            valid = quad_mask[0]

        M, sc = build_affine_device(
            kw, s, s,
            float(hyp.get("degrees", 0.0)), float(hyp.get("translate", 0.1)),
            float(hyp.get("scale", 0.5)), float(hyp.get("shear", 0.0)),
            float(hyp.get("perspective", 0.0)), (0, 0),
        )
        # flips folded into the matrix (see device_augment_batch); M_s
        # still records the RAW M + flip flags — the pseudo-label consumer
        # applies them separately
        do_lr = jax.random.uniform(kfl, ()) < float(hyp.get("fliplr", 0.0))
        do_ud = jax.random.uniform(kfu, ()) < float(hyp.get("flipud", 0.0))
        M_img = _fold_flips(M, do_lr, do_ud, s, pixel=True)
        M_box = _fold_flips(M, do_lr, do_ud, s, pixel=False)
        if _axis_aligned(hyp):
            strong = warp_scale_translate_device(weak, M_img, s, s)
        else:
            strong = warp_image_device(weak, M_img, s, s)
        new = warp_boxes_device(boxes[:, 1:], M_box, s, s)
        keep = valid & box_candidates_device(boxes[:, 1:], new, sc)

        strong = hsv_jitter_device(kh, strong, float(hyp.get("hsv_h", 0.0)),
                                   float(hyp.get("hsv_s", 0.0)),
                                   float(hyp.get("hsv_v", 0.0)))
        if float(hyp.get("cutout", 0.0)) > 0:
            kc1, kc2 = jax.random.split(kc)
            do_cut = (jax.random.uniform(kc1, ())
                      < float(hyp.get("cutout", 0.0)))
            strong = jnp.where(do_cut, cutout_device(kc2, strong, s),
                               strong)
        x1, y1, x2, y2 = new[:, 0], new[:, 1], new[:, 2], new[:, 3]

        m_s = jnp.concatenate([
            jnp.array([bi], jnp.float32),
            M.reshape(-1).astype(jnp.float32),
            jnp.array([sc], jnp.float32),
            do_ud.astype(jnp.float32)[None],
            do_lr.astype(jnp.float32)[None],
        ])

        out = jnp.stack([
            boxes[:, 0],
            (x1 + x2) / 2 / s, (y1 + y2) / 2 / s,
            (x2 - x1) / s, (y2 - y1) / s,
        ], axis=-1)
        order = jnp.argsort(~keep)
        out = out[order][:mo]
        keep = keep[order][:mo]
        return (jnp.clip(strong, 0, 255).astype(jnp.uint8),
                jnp.where(keep[:, None], out, 0.0), keep,
                jnp.clip(weak, 0, 255).astype(jnp.uint8), m_s)

    keys = jax.vmap(lambda i: jax.random.fold_in(kbatch, i))(jnp.arange(b))
    return jax.vmap(one)(keys, images[idx], labels[idx], mask[idx],
                         jnp.arange(b, dtype=jnp.int32))


def cutout_device(key, img, s: int):
    """Random occlusion rectangles (reference augmentations.py:382-407 /
    data/augment.py cutout): the fixed scale ladder 1x0.5 + 2x0.25 +
    4x0.125 + 8x0.0625 + 16x0.03125, each a random-size random-position
    patch filled with a random gray-ish color. Labels are untouched (the
    host impl keeps them too). One fused pass: all 31 rectangle masks are
    combined into a single per-pixel patch-index select."""
    scales = [0.5] * 1 + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 \
        + [0.03125] * 16
    n = len(scales)
    ks = jax.random.split(key, 5)
    sc = jnp.asarray(scales, jnp.float32)
    mh = (jax.random.uniform(ks[0], (n,)) * (sc * s - 1) + 1).astype(
        jnp.int32)
    mw = (jax.random.uniform(ks[1], (n,)) * (sc * s - 1) + 1).astype(
        jnp.int32)
    cx = jax.random.randint(ks[2], (n,), 0, s + 1)
    cy = jax.random.randint(ks[3], (n,), 0, s + 1)
    x1 = jnp.maximum(0, cx - mw // 2)
    y1 = jnp.maximum(0, cy - mh // 2)
    x2 = jnp.minimum(s, x1 + mw)
    y2 = jnp.minimum(s, y1 + mh)
    colors = jax.random.randint(ks[4], (n, 3), 64, 192).astype(jnp.float32)

    ys = jnp.arange(s)[:, None, None]
    xs = jnp.arange(s)[None, :, None]
    inside = ((ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2))  # (s, s, n)
    # later patches overwrite earlier ones (host loop order): take the
    # LAST covering patch per pixel
    rev = inside[..., ::-1]
    last = n - 1 - jnp.argmax(rev, axis=-1)          # (s, s)
    any_hit = inside.any(-1)
    fill = colors[last]                               # (s, s, 3)
    return jnp.where(any_hit[..., None], fill, img)
