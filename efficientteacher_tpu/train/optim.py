"""Optimizer: torch-parity SGD(nesterov)/AdamW with the reference's three
parameter groups and warmup/one-cycle schedules.

Parity with reference trainer/trainer.py:193-251:
  - groups: bias (conv+BN biases), weight (conv/linear kernels, gets weight
    decay), bn (BN scales, no decay) — trainer.py:200-214
  - weight decay scaled by batch_size * accumulate / 64 (trainer.py:196-197)
  - SGD nesterov (or AdamW with betas (momentum, 0.999)) — trainer.py:211-216
  - one_cycle cosine epoch schedule lr0 -> lr0*lrf (utils/general.py:480-482)
  - per-iteration warmup: bias lr falls from warmup_bias_lr, others rise from
    0; momentum ramps warmup_momentum -> momentum (trainer.py:388-397)

Implemented as a hand-rolled pytree transform (not optax.chain) so lr and
momentum can be traced per-step scalars — schedules never trigger recompiles.
torch-SGD semantics: buf = mu*buf + (g + wd*p); nesterov d = g+wd*p + mu*buf;
p -= lr*d.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def one_cycle(y1: float = 0.0, y2: float = 1.0, steps: int = 100):
    """Sinusoidal ramp y1 -> y2 (reference utils/general.py:480)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def linear_lf(lrf: float, epochs: int):
    """Linear schedule (reference trainer.py:242)."""
    return lambda x: (1 - x / max(epochs - 1, 1)) * (1.0 - lrf) + lrf


def param_group_label(path: Tuple[Any, ...], leaf) -> str:
    """Map a flax param path to {bias, weight, bn} (reference trainer.py:200-207).

    flax naming: Conv kernels -> 'kernel' (decayed weight group); BatchNorm
    scale -> 'scale' (bn group, no decay); any 'bias' -> bias group; other
    1-D params (implicit tokens etc.) -> bn group (no decay).
    """
    name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
    if name == "bias":
        return "bias"
    if name == "kernel":
        return "weight"
    return "bn"


@struct.dataclass
class SGDState:
    momentum_buf: Any  # pytree like params
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 0.0005  # already nominal-batch scaled by caller
    adam: bool = False
    warmup_epochs: float = 0.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    epochs: int = 300
    linear_lr: bool = False
    # SSOD multi-step schedule (reference cfg.SSOD.multi_step_lr +
    # milestones: LR x0.1 at each milestone epoch)
    multi_step: bool = False
    milestones: Tuple[int, ...] = ()

    @classmethod
    def from_cfg(cls, cfg, scaled_weight_decay: float):
        return cls(
            lr0=float(cfg.hyp.lr0),
            lrf=float(cfg.hyp.lrf),
            momentum=float(cfg.hyp.momentum),
            weight_decay=scaled_weight_decay,
            adam=bool(cfg.adam),
            warmup_epochs=float(cfg.hyp.warmup_epochs),
            warmup_momentum=float(cfg.hyp.warmup_momentum),
            warmup_bias_lr=float(cfg.hyp.warmup_bias_lr),
            epochs=int(cfg.epochs),
            linear_lr=bool(cfg.linear_lr),
            multi_step=bool(cfg.SSOD.multi_step_lr),
            milestones=tuple(int(m) for m in cfg.SSOD.milestones),
        )

    def lf(self, epoch: float) -> float:
        if self.multi_step:
            return 0.1 ** sum(epoch >= m for m in self.milestones)
        f = (
            linear_lf(self.lrf, self.epochs)
            if self.linear_lr
            else one_cycle(1.0, self.lrf, self.epochs)
        )
        return f(epoch)

    def schedule(self, ni: int, epoch: float, nw: int) -> Dict[str, float]:
        """Host-side scalar schedule for iteration `ni` (global it counter)
        and fractional epoch. nw = number of warmup iterations.
        Returns traced-scalar-ready {lr_bias, lr_rest, momentum}."""
        base = self.lr0 * self.lf(epoch)
        if nw > 0 and ni <= nw:
            x = [0, nw]
            lr_bias = float(np.interp(ni, x, [self.warmup_bias_lr, base]))
            lr_rest = float(np.interp(ni, x, [0.0, base]))
            mom = float(np.interp(ni, x, [self.warmup_momentum, self.momentum]))
        else:
            lr_bias = lr_rest = base
            mom = self.momentum
        return {"lr_bias": lr_bias, "lr_rest": lr_rest, "momentum": mom}


def sgd_update(
    params,
    grads,
    state: SGDState,
    oc: OptimizerConfig,
    lr_bias,
    lr_rest,
    momentum,
):
    """One torch-SGD(nesterov)/AdamW step with per-group lr/decay.

    lr_bias/lr_rest/momentum are traced scalars (see OptimizerConfig.schedule).
    """
    labels = jax.tree_util.tree_map_with_path(param_group_label, params)

    def decayed_grad(label, p, g):
        wd = oc.weight_decay if label == "weight" else 0.0
        return g.astype(jnp.float32) + wd * p.astype(jnp.float32)

    def group_lr(label):
        return lr_bias if label == "bias" else lr_rest

    if not oc.adam:
        new_buf = jax.tree.map(
            lambda label, p, g, buf: momentum * buf + decayed_grad(label, p, g),
            labels, params, grads, state.momentum_buf,
        )
        new_params = jax.tree.map(
            lambda label, p, g, buf: (
                p.astype(jnp.float32)
                - group_lr(label) * (decayed_grad(label, p, g) + momentum * buf)
            ).astype(p.dtype),
            labels, params, grads, new_buf,
        )
        return new_params, SGDState(momentum_buf=new_buf, step=state.step + 1)

    # AdamW: betas (momentum_cfg, 0.999) (reference trainer.py:213)
    b1, b2, eps = oc.momentum, 0.999, 1e-8
    t = (state.step + 1).astype(jnp.float32)
    m_buf, v_buf = state.momentum_buf["m"], state.momentum_buf["v"]
    new_m = jax.tree.map(
        lambda g, m: b1 * m + (1 - b1) * g.astype(jnp.float32), grads, m_buf
    )
    new_v = jax.tree.map(
        lambda g, v: b2 * v + (1 - b2) * jnp.square(g.astype(jnp.float32)),
        grads, v_buf,
    )

    def upd_adam(label, p, m, v):
        lr = group_lr(label)
        wd = oc.weight_decay if label == "weight" else 0.0
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        p32 = p.astype(jnp.float32)
        p32 = p32 * (1 - lr * wd) - lr * mh / (jnp.sqrt(vh) + eps)
        return p32.astype(p.dtype)

    new_params = jax.tree.map(upd_adam, labels, params, new_m, new_v)
    return new_params, SGDState(
        momentum_buf={"m": new_m, "v": new_v}, step=state.step + 1
    )


def init_opt_state(params, oc: OptimizerConfig) -> SGDState:
    zeros = lambda: jax.tree.map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params
    )
    if oc.adam:
        return SGDState(
            momentum_buf={"m": zeros(), "v": zeros()},
            step=jnp.zeros((), jnp.int32),
        )
    return SGDState(momentum_buf=zeros(), step=jnp.zeros((), jnp.int32))
