"""Supervised train step: one jitted function = forward + loss + backward +
(accumulated) optimizer + EMA.

Replaces the reference hot loop (trainer/trainer.py:413-440: H2D copy, AMP
forward, ComputeLoss, DDP-scaled backward, GradScaler step, EMA update) with
a single XLA program. bf16 compute needs no GradScaler; schedules arrive as
traced scalars so warmup/one-cycle never recompile.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.yolov5_loss import YoloV5LossConfig, compute_loss
from .optim import OptimizerConfig
from .train_state import TrainState, apply_gradients_accumulating


class Schedule(NamedTuple):
    """Per-iteration traced scalars (host computes them, device consumes)."""

    lr_bias: jnp.ndarray
    lr_rest: jnp.ndarray
    momentum: jnp.ndarray
    accumulate: jnp.ndarray  # int32
    ema_decay: jnp.ndarray

    @classmethod
    def make(cls, lr_bias, lr_rest, momentum, accumulate, ema_decay=0.9999):
        return cls(
            jnp.float32(lr_bias), jnp.float32(lr_rest), jnp.float32(momentum),
            jnp.int32(accumulate), jnp.float32(ema_decay),
        )


def make_supervised_train_step(
    model,
    loss_cfg: YoloV5LossConfig = None,
    anchors_grid: np.ndarray = None,
    opt_cfg: OptimizerConfig = None,
    norm_scale: float = 255.0,
    compute_dtype=jnp.bfloat16,
    detection_loss=None,
    grad_masks=None,
):
    """Build the jitted supervised train step.

    The returned fn: (state, images_u8, labels, label_mask, sched) -> (state,
    metrics). Images arrive uint8 NHWC; normalization happens on-device
    (replacing the reference's host-side img/255, trainer.py:417).

    `detection_loss(raw, labels, mask) -> (loss, parts)` selects the loss
    family (the reference's Loss.type dispatch, trainer.py:320-327); when
    omitted, the classic YOLOv5 ComputeLoss is used with (loss_cfg,
    anchors_grid).
    """
    if detection_loss is None:
        anchors_np = np.asarray(anchors_grid, np.float32)

        def detection_loss(raw, labels, label_mask):
            return compute_loss(raw, labels, label_mask, anchors_np, loss_cfg)

    def train_step(state: TrainState, images, labels, label_mask,
                   sched: Schedule):
        x = images.astype(compute_dtype) / norm_scale

        def loss_fn(params):
            raw, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, decode=False, mutable=["batch_stats"],
            )
            if isinstance(raw, tuple) and len(raw) == 2 and raw[1] is None:
                raw = raw[0]  # SSODModel with with_domain=False
            loss, parts = detection_loss(raw, labels, label_mask)
            return loss, (parts, mutated["batch_stats"])

        (loss, (parts, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if grad_masks is not None:
            # RepOptimizer: per-kernel gradient reparameterization
            # (reference models/optimizers/RepOptimizer.py:163-178)
            from .repopt import apply_grad_masks

            grads = apply_grad_masks(grads, grad_masks)
        state = apply_gradients_accumulating(
            state, grads, opt_cfg,
            lr_bias=sched.lr_bias, lr_rest=sched.lr_rest,
            momentum=sched.momentum, accumulate=sched.accumulate,
            ema_decay=sched.ema_decay, new_batch_stats=new_bs,
        )
        return state, parts

    return jax.jit(train_step, donate_argnums=(0,))
