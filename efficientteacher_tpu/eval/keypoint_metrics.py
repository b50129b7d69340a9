"""Keypoint evaluation: OKS (object keypoint similarity) AP.

Fills the reference's val_kp branch (val.py:80-96 keypoint OKS evaluation):
per-detection OKS against GT keypoint sets, then the same 101-point AP
machinery as boxes over OKS thresholds [.5:.95].

OKS = sum_i exp(-d_i^2 / (2 s^2 k_i^2)) * v_i / sum_i v_i, with s^2 the GT
box area and k_i per-keypoint constants (uniform fallback when the dataset
defines none).
"""

from __future__ import annotations

import numpy as np

from .metrics import ap_per_class


def oks(
    pred_kps: np.ndarray,   # (P, np, 2) pixels
    gt_kps: np.ndarray,     # (G, np, 2) pixels, <0 marks invisible
    gt_areas: np.ndarray,   # (G,) box areas
    kappas: np.ndarray | None = None,
) -> np.ndarray:
    """Pairwise OKS matrix (G, P)."""
    g, npk = gt_kps.shape[0], gt_kps.shape[1]
    p = pred_kps.shape[0]
    if kappas is None:
        kappas = np.full(npk, 0.05)
    vis = (gt_kps >= 0).all(-1)                         # (G, np)
    d2 = ((gt_kps[:, None] - pred_kps[None]) ** 2).sum(-1)  # (G, P, np)
    s2 = np.maximum(gt_areas, 1.0)[:, None, None]
    e = d2 / (2.0 * s2 * (kappas[None, None, :] ** 2) + 1e-9)
    sim = np.exp(-e) * vis[:, None, :]
    denom = np.maximum(vis.sum(-1), 1)[:, None]
    return sim.sum(-1) / denom


def process_batch_kp(
    pred_kps: np.ndarray, pred_conf: np.ndarray, pred_cls: np.ndarray,
    gt_kps: np.ndarray, gt_cls: np.ndarray, gt_areas: np.ndarray,
    thresholds: np.ndarray,
) -> np.ndarray:
    """TP matrix (P, T) by greedy OKS matching (mirror of box
    process_batch)."""
    correct = np.zeros((len(pred_kps), len(thresholds)), bool)
    if len(gt_kps) == 0 or len(pred_kps) == 0:
        return correct
    sim = oks(pred_kps, gt_kps, gt_areas)               # (G, P)
    cls_ok = gt_cls[:, None] == pred_cls[None, :]
    for t in range(len(thresholds)):
        gi, pi = np.where((sim >= thresholds[t]) & cls_ok)
        if len(gi):
            matches = np.stack([gi, pi, sim[gi, pi]], 1)
            matches = matches[matches[:, 2].argsort()[::-1]]
            matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
            matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
            correct[matches[:, 1].astype(int), t] = True
    return correct


def kp_ap(stats) -> float:
    """mAP over OKS thresholds from accumulated (correct, conf, cls,
    target_cls) tuples."""
    stats = [np.concatenate(x, 0) for x in zip(*stats)]
    if not len(stats) or not stats[0].any():
        return 0.0
    _, _, ap, _, _, _ = ap_per_class(*stats)
    return float(ap.mean())
