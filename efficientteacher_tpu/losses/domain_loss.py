"""Domain-adaptation losses over GRL'd discriminator maps.

Parity with reference models/loss/loss.py:312-421:
  - DomainFocalLoss: softmax focal loss (gamma 2, alpha 1) over 2-class
    domain logits
  - DomainLoss: source images labeled 0, loss * 0.5
  - TargetLoss: target images labeled 1, loss * 0.5
Feature maps are the three per-scale (B, H, W, 2) discriminator outputs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def domain_focal_loss(logits: jnp.ndarray, target_cls: int,
                      gamma: float = 2.0) -> jnp.ndarray:
    """Softmax focal loss, scalar mean. logits (N, 2)."""
    logp = jax.nn.log_softmax(logits, axis=-1)[:, target_cls]
    p = jnp.exp(logp)
    return jnp.mean(-((1.0 - p) ** gamma) * logp)


def _flatten(features: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.concatenate([f.reshape(-1, 2) for f in features], axis=0)


def domain_loss(features: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Source-domain alignment loss (label 0)."""
    return 0.5 * domain_focal_loss(_flatten(features), 0)


def target_loss(features: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Target-domain alignment loss (label 1)."""
    return 0.5 * domain_focal_loss(_flatten(features), 1)
