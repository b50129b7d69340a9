"""Unlabeled (SSOD target) dataset: weak/strong view pairs with the affine
transform record M_s.

Parity with reference utils/datasets_ssod.py:
  - LoadImagesAndFakeLabels: images without labels unless with_gt/debug
    (datasets_ssod.py:246-393); aug hyp comes from cfg.SSOD.ssod_hyp
  - mosaic path (load_mosaic_with_M :732-792): 4-mosaic composed on a 2s
    canvas, labels at half scale, canvas resized to s; the WEAK view is a
    deep copy of the resized canvas BEFORE random_perspective
  - strong view = random_perspective(+HSV+cutout[+autoaugment]) + flips
  - M_s 13-vector [batch_idx, M(3x3 row-major), scale s, flipud, fliplr]
    recording weak->strong geometry (:490-591; flips at :563-576); batch idx
    stamped at collate (:593-602)
  - non-mosaic path: weak = letterboxed image before perspective

The teacher runs on the weak view; FairPseudoLabel warps its detections by
M_s onto the strong view (reference utils/self_supervised_utils.py:194-245).
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, Optional

import cv2
import numpy as np

from .augment import (
    augment_hsv,
    build_affine,
    box_candidates,
    cutout,
    letterbox,
    random_perspective,
    warp_boxes,
)
from .datasets import BatchLoader, LoadImagesAndLabels


class LoadImagesAndFakeLabels(LoadImagesAndLabels):
    """Unlabeled dataset emitting (strong, labels, mask, weak, M_s)."""

    def __init__(self, *args, with_gt: bool = False, **kw):
        super().__init__(*args, **kw)
        self.with_gt = with_gt
        if not with_gt:
            # fake_image_label path (datasets_ssod.py:382-393): drop labels
            self.labels = [np.zeros((0, 5), np.float32) for _ in self.labels]

    def _mosaic_pair(self, index: int):
        s = self.img_size
        idxs = [index] + [self.rng.randrange(len(self)) for _ in range(3)]
        self.rng.shuffle(idxs)
        canvas = np.full((s * 2, s * 2, 3), 114, np.uint8)
        merged = []
        yc = int(self.rng.uniform(s // 2, 2 * s - s // 2))
        xc = int(self.rng.uniform(s // 2, 2 * s - s // 2))
        for i, di in enumerate(idxs):
            img, _, (h, w) = self.load_image(di)
            if i == 0:
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            lb = self.labels[di]
            if len(lb):
                # labels in HALF-scale pixel space: the 2s canvas is resized
                # to s below (reference datasets_ssod.py:768 uses w/2, h/2)
                out = np.zeros((len(lb), 5), np.float32)
                out[:, 0] = lb[:, 0]
                cx = lb[:, 1] * w / 2 + padw / 2
                cy = lb[:, 2] * h / 2 + padh / 2
                bw = lb[:, 3] * w / 2
                bh = lb[:, 4] * h / 2
                out[:, 1], out[:, 2] = cx - bw / 2, cy - bh / 2
                out[:, 3], out[:, 4] = cx + bw / 2, cy + bh / 2
                merged.append(out)
        labels = (
            np.concatenate(merged, 0) if merged else np.zeros((0, 5), np.float32)
        )
        np.clip(labels[:, 1:5], 0, s * 2, out=labels[:, 1:5])
        weak = cv2.resize(canvas, (s, s))
        return weak, labels

    def __getitem__(self, index: int):
        hyp = self.hyp
        s = self.img_size
        use_mosaic = self.augment and self.rng.random() < hyp.get("mosaic", 0)
        if use_mosaic:
            weak, targets = self._mosaic_pair(index)
        else:
            img, _, (h, w) = self.load_image(index)
            img, ratio, pad = letterbox(img, s, auto=False, scaleup=self.augment)
            targets = self._labels_xyxy_pixels(
                index, ratio[0] * w, ratio[1] * h, pad[0], pad[1]
            )
            weak = img

        # strong view: recorded affine warp of the weak view
        m_s = np.zeros(13, np.float32)
        if self.augment:
            M, sc = build_affine(
                weak.shape[1], weak.shape[0],
                degrees=hyp.get("degrees", 0.0),
                translate=hyp.get("translate", 0.1),
                scale=hyp.get("scale", 0.5),
                shear=hyp.get("shear", 0.0),
                perspective=hyp.get("perspective", 0.0),
                rng=self.rng,
            )
            persp = hyp.get("perspective", 0.0) > 0
            if persp:
                strong = cv2.warpPerspective(
                    weak, M, dsize=(s, s), borderValue=(114, 114, 114)
                )
            else:
                strong = cv2.warpAffine(
                    weak, M[:2], dsize=(s, s), borderValue=(114, 114, 114)
                )
            if len(targets):
                old = targets[:, 1:5].copy()
                new = warp_boxes(old, M, s, s, persp)
                keep = box_candidates(old.T * sc, new.T, area_thr=0.1)
                targets = targets[keep]
                targets[:, 1:5] = new[keep]
            m_s[1:10] = M.reshape(-1)
            m_s[10] = sc
            augment_hsv(
                strong, hyp.get("hsv_h", 0), hyp.get("hsv_s", 0),
                hyp.get("hsv_v", 0), self.rng,
            )
            if self.rng.random() < hyp.get("cutout", 0) and len(targets):
                cutout(strong, targets, self.rng)
            if self.rng.random() < hyp.get("autoaugment", 0) and len(targets):
                from .autoaugment import distort_image_with_autoaugment

                strong = np.ascontiguousarray(strong)
                strong, targets = distort_image_with_autoaugment(
                    strong, targets,
                    hyp.get("autoaugment_policy", "v5"), self.rng,
                )
        else:
            strong = weak.copy()
            m_s[1:10] = np.eye(3, dtype=np.float32).reshape(-1)
            m_s[10] = 1.0

        labels, mask = self.pack_labels(targets, s, s)

        # flips on the strong view only, recorded as flags
        # (reference datasets_ssod.py:563-576)
        if self.augment:
            if self.rng.random() < hyp.get("flipud", 0):
                strong = np.flipud(strong).copy()
                labels[mask, 2] = 1.0 - labels[mask, 2]
                m_s[11] = 1.0
            if self.rng.random() < hyp.get("fliplr", 0):
                strong = np.fliplr(strong).copy()
                labels[mask, 1] = 1.0 - labels[mask, 1]
                m_s[12] = 1.0

        strong = np.ascontiguousarray(strong[:, :, ::-1])  # BGR -> RGB
        weak = np.ascontiguousarray(weak[:, :, ::-1])
        return strong, labels, mask, weak, m_s


class SSODBatchLoader(BatchLoader):
    """Batches of (strong, labels, mask, weak, M_s); M_s[0] stamped with the
    in-batch index (reference collate_fn, datasets_ssod.py:593-602).
    Prefetch/worker engine inherited from BatchLoader — the dual-view
    pipeline is 2x the host work of the labeled one, so it benefits most."""

    def _build_batch(self, bidx) -> Dict[str, np.ndarray]:
        items = [self.ds[i] for i in bidx]
        m_s = np.stack([it[4] for it in items])
        m_s[:, 0] = np.arange(len(items))
        return {
            "images": np.stack([it[0] for it in items]),
            "labels": np.stack([it[1] for it in items]),
            "mask": np.stack([it[2] for it in items]),
            "images_ori": np.stack([it[3] for it in items]),
            "M_s": m_s,
            "indices": bidx,
        }


def create_target_dataloader(cfg, batch_size: Optional[int] = None,
                             seed: int = 0, augment: bool = True):
    """Factory mirroring reference create_target_dataloader
    (utils/datasets_ssod.py:67). augment=False serves raw letterboxed
    weak views for the device-side dual-view path
    (ops/augment_device.device_ssod_views)."""
    hyp = {k: cfg.SSOD.ssod_hyp[k] for k in cfg.SSOD.ssod_hyp}
    with_gt = bool(cfg.SSOD.ssod_hyp.with_gt or cfg.SSOD.debug)
    ds = LoadImagesAndFakeLabels(
        cfg.Dataset.target,
        img_size=cfg.Dataset.img_size,
        hyp=hyp,
        augment=augment,
        nc=cfg.Dataset.nc,
        max_targets=cfg.Dataset.max_targets,
        single_cls=cfg.single_cls,
        seed=seed,
        with_gt=with_gt,
    )
    from ..parallel.distributed import per_process_batch

    return SSODBatchLoader(
        ds, per_process_batch(batch_size or cfg.Dataset.batch_size),
        shuffle=True, seed=seed,
        drop_last=True, workers=int(cfg.Dataset.workers),
        mode=str(cfg.Dataset.loader),
    )
