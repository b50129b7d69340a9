"""Loss primitives shared across the loss zoo.

Stable BCE-with-logits (optionally pos_weight / focal-modulated) matching
torch.nn.BCEWithLogitsLoss + the reference's FocalLoss wrapper
(reference: models/loss/loss.py:24-60 FocalLoss, smooth_BCE at loss.py:16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_bce(eps: float = 0.0):
    """Positive/negative BCE targets for label smoothing
    (reference loss.py:16-19)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: float = 1.0,
) -> jnp.ndarray:
    """Elementwise stable BCE-with-logits, torch pos_weight semantics:
    loss = -[pw * t * log(sigmoid(x)) + (1 - t) * log(1 - sigmoid(x))].
    """
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def focal_bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float,
    alpha: float = 0.25,
    pos_weight: float = 1.0,
) -> jnp.ndarray:
    """Reference FocalLoss wrapper around BCE (loss.py:24-46)."""
    loss = bce_with_logits(logits, targets, pos_weight)
    pred_prob = jax.nn.sigmoid(logits)
    p_t = targets * pred_prob + (1.0 - targets) * (1.0 - pred_prob)
    alpha_factor = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    modulating = (1.0 - p_t) ** gamma
    return loss * alpha_factor * modulating


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-9):
    """Mean of `x` over elements where `mask` (broadcastable) is true.
    Matches torch `.mean()` over a filtered ragged tensor."""
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), eps)


def wing_loss(pred: jnp.ndarray, target: jnp.ndarray, w: float = 10.0,
              e: float = 2.0) -> jnp.ndarray:
    """Elementwise Wing loss for landmark regression
    (reference models/loss/loss.py:573-595, arXiv:1711.06753)."""
    c = w - w * jnp.log(1.0 + w / e)
    d = jnp.abs(pred - target)
    return jnp.where(d < w, w * jnp.log(1.0 + d / e), d - c)


def landmarks_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    """Masked-mean wing loss over visible keypoint coordinates
    (reference LandmarksLossYolov5, loss.py:436-445)."""
    m = mask.astype(pred.dtype)
    losses = wing_loss(pred * m, target * m)
    return jnp.sum(losses) / (jnp.sum(m) + 1e-13)
