"""LabelMatch: dynamic per-class pseudo-label thresholds.

Parity with reference utils/labelmatch.py:56-354:
  - per-epoch collection of all pseudo-label scores per class
    (score_list_epoch, :283-299) — here the jitted SSOD step already returns
    compact (scores, cls) arrays per batch, so collection is a cheap host
    append (the reference's all_gather across ranks, :41-54, is unnecessary:
    under GSPMD the step output is already global)
  - thr_high per class via the 2-component GaussianMixture 'high' policy
    (gmm_policy :138-189): fit scores, take the min score of the positive
    cluster at/above its highest-likelihood member
  - thr_low per class = max(ignore_thres_low, score at a resample-percentile
    position capped by the running per-epoch class budget
    cls_num_total/(epoch+1)) (:191-240)
  - thresholds pushed into the SSOD loss each epoch (ssod_trainer.py:320-323)
"""

from __future__ import annotations

from typing import List

import numpy as np


def gmm_policy(scores: np.ndarray, given_gt_thr: float = 0.0,
               policy: str = "high") -> float:
    """Two-component GMM threshold selection."""
    if len(scores) < 4:
        return given_gt_thr
    from sklearn.mixture import GaussianMixture

    s = np.asarray(scores, np.float64).reshape(-1, 1)
    gmm = GaussianMixture(
        2,
        weights_init=[0.5, 0.5],
        means_init=[[s.min()], [s.max()]],
        precisions_init=[[[1.0]], [[1.0]]],
    )
    gmm.fit(s)
    assign = gmm.predict(s)
    loglik = gmm.score_samples(s)
    if policy == "high":
        if (assign == 1).any():
            loglik = loglik.copy()
            loglik[assign == 0] = -np.inf
            anchor = np.argmax(loglik)
            pos = (assign == 1) & (s[:, 0] >= s[anchor, 0])
            return max(given_gt_thr, float(s[pos, 0].min()))
        return given_gt_thr
    if (assign == 1).any():
        return max(given_gt_thr, float(s[assign == 1, 0].min()))
    return given_gt_thr


class LabelMatch:
    def __init__(self, cfg, target_data_len: int, label_num_per_img: float,
                 cls_ratio_gt: np.ndarray):
        self.nc = len(cls_ratio_gt)
        self.cls_ratio_gt = np.asarray(cls_ratio_gt)
        self.ignore_thres_high = float(cfg.SSOD.ignore_thres_high)
        self.ignore_thres_low = float(cfg.SSOD.ignore_thres_low)
        self.resample_high_percent = float(cfg.SSOD.resample_high_percent)
        self.resample_low_percent = float(cfg.SSOD.resample_low_percent)
        self.target_data_len = target_data_len
        self.anno_num_per_img = label_num_per_img * 3
        self.cls_thr_high = np.full(self.nc, self.ignore_thres_high,
                                    np.float32)
        self.cls_thr_low = np.full(self.nc, self.ignore_thres_low, np.float32)
        self.cls_num_total = np.zeros(self.nc)
        self.score_list_epoch: List[List[float]] = [
            [] for _ in range(self.nc)
        ]

    def collect(self, scores: np.ndarray, cls: np.ndarray):
        """Accumulate one batch of pseudo-label (conf, class) pairs.
        Zero-score entries are padding."""
        scores = np.asarray(scores).reshape(-1)
        cls = np.asarray(cls).reshape(-1)
        keep = scores > 0
        for c, s in zip(cls[keep], scores[keep]):
            self.score_list_epoch[int(c)].append(float(s))

    def update_epoch_cls_thr(self, epoch: int):
        for c in range(self.nc):
            scores = sorted(self.score_list_epoch[c], reverse=True)
            self.cls_num_total[c] += len(scores)
            max_num = int(self.cls_num_total[c] / (epoch + 1))
            if not scores:
                self.cls_thr_high[c] = self.ignore_thres_high
                self.cls_thr_low[c] = self.ignore_thres_low
                continue
            self.cls_thr_high[c] = gmm_policy(
                np.array(scores), given_gt_thr=0.0, policy="high"
            )
            pos_low = min(max_num, int(len(scores) * self.resample_low_percent))
            pos_low = min(pos_low, len(scores) - 1)
            self.cls_thr_low[c] = max(self.ignore_thres_low, scores[pos_low])
        self.score_list_epoch = [[] for _ in range(self.nc)]
