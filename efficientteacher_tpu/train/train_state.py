"""Training state: params + BN stats + optimizer buffers + EMA pytrees.

The reference maintains EMA as deep-copied nn.Modules
(ModelEMA utils/torch_utils.py:308-342, SemiSupModelEMA :344-379,
CosineEMA :381-424); here EMA is just another pytree in the TrainState —
no model copy, the teacher is the same apply_fn over the EMA pytree
(SURVEY.md §7.1).

EMA semantics parity:
  - ModelEMA decay: d = decay * (1 - exp(-updates / 2000)) ramp
    (torch_utils.py:322-324), updates counted per optimizer step
  - EMA covers params AND BN statistics (the reference EMAs the full
    state_dict, torch_utils.py:334-338)
  - SemiSupModelEMA: constant decay (torch_utils.py:366-372)
  - CosineEMA: per-epoch cosine-annealed decay decay_start -> decay_end
    (torch_utils.py:404-414), updated by the SSOD trainer at epoch end
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .optim import OptimizerConfig, SGDState, init_opt_state, sgd_update


@struct.dataclass
class EMAState:
    params: Any
    batch_stats: Any
    updates: jnp.ndarray  # int32 counter


def init_ema(params, batch_stats) -> EMAState:
    # jnp.array(copy=True): astype would alias f32 leaves with the live
    # params, and aliased buffers break donation in the jitted train step
    copy32 = lambda p: jnp.array(p, jnp.float32)
    return EMAState(
        params=jax.tree.map(copy32, params),
        batch_stats=jax.tree.map(copy32, batch_stats),
        updates=jnp.zeros((), jnp.int32),
    )


def ema_update(
    ema: EMAState, params, batch_stats, decay: float, ramp: bool = True
) -> EMAState:
    """One EMA step. With ramp=True uses the ModelEMA warmup
    d = decay * (1 - exp(-updates / 2000)); otherwise constant decay
    (SemiSupModelEMA / CosineEMA semantics)."""
    updates = ema.updates + 1
    if ramp:
        d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))
    else:
        d = jnp.asarray(decay, jnp.float32)
    blend = lambda e, p: e * d + (1.0 - d) * p.astype(jnp.float32)
    return EMAState(
        params=jax.tree.map(blend, ema.params, params),
        batch_stats=jax.tree.map(blend, ema.batch_stats, batch_stats),
        updates=updates,
    )


def cosine_ema_decay(epoch: int, epochs: int, decay_start: float,
                     decay_end: float = 0.9999) -> float:
    """CosineEMA per-epoch decay (reference torch_utils.py:404-414)."""
    return (
        decay_end
        + (decay_start - decay_end) * (1 + math.cos(math.pi * epoch / epochs)) / 2
    )


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt: SGDState
    ema: Optional[EMAState]
    # gradient accumulation (reference accumulate-to-nominal-64,
    # trainer.py:385-390): grads are summed until acc_count reaches the
    # dynamic `accumulate`, then one optimizer step fires
    acc_grads: Any
    acc_count: jnp.ndarray  # int32
    step: jnp.ndarray       # global iteration counter (ni)


def create_train_state(params, batch_stats, oc: OptimizerConfig,
                       with_ema: bool = True) -> TrainState:
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt=init_opt_state(params, oc),
        ema=init_ema(params, batch_stats) if with_ema else None,
        acc_grads=jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        ),
        acc_count=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )


def apply_gradients_accumulating_tree(
    state: TrainState,
    grads,
    oc: OptimizerConfig,
    *,
    lr_bias,
    lr_rest,
    momentum,
    accumulate,
    ema_decay,
    new_batch_stats,
):
    """Pytree-map formulation (one kernel per leaf per op). Kept as the
    AdamW path and as the reference implementation the flat fast path is
    tested against; SGD callers use `apply_gradients_accumulating`.
    Mirrors reference update_optimizer (trainer.py:381-404)."""
    acc_grads = jax.tree.map(
        lambda a, g: a + g.astype(jnp.float32), state.acc_grads, grads
    )
    acc_count = state.acc_count + 1
    do_step = acc_count >= accumulate

    def take_step(_):
        # reference sums losses over accumulate micro-batches (no mean), so
        # apply the summed gradient as-is
        new_params, new_opt = sgd_update(
            state.params, acc_grads, state.opt, oc, lr_bias, lr_rest, momentum
        )
        if state.ema is not None:
            new_ema = ema_update(
                state.ema, new_params, new_batch_stats, ema_decay, ramp=True
            )
        else:
            new_ema = None
        zeros = jax.tree.map(jnp.zeros_like, acc_grads)
        return new_params, new_opt, new_ema, zeros, jnp.zeros((), jnp.int32)

    def keep_accumulating(_):
        return (state.params, state.opt, state.ema, acc_grads, acc_count)

    new_params, new_opt, new_ema, new_acc, new_count = jax.lax.cond(
        do_step, take_step, keep_accumulating, operand=None
    )
    return state.replace(
        params=new_params,
        batch_stats=new_batch_stats,
        opt=new_opt,
        ema=new_ema,
        acc_grads=new_acc,
        acc_count=new_count,
        step=state.step + 1,
    )


def apply_gradients_accumulating(
    state: TrainState,
    grads,
    oc: OptimizerConfig,
    *,
    lr_bias,
    lr_rest,
    momentum,
    accumulate,
    ema_decay,
    new_batch_stats,
    semi_decay=None,
):
    """Accumulate grads; fire an optimizer + EMA(-chain) step every
    `accumulate` micro-steps. All schedule inputs are traced scalars.

    Fused fast path: the full accumulate/SGD/EMA(/semi-EMA) chain runs as
    ONE fused element-wise pass per leaf (`where(flag)` selects instead of
    lax.cond, so hold steps cost the same single bandwidth pass and no
    branch copies) — element-wise identical math to the tree formulation
    (tests/test_flat_optim.py proves equality). With `semi_decay` set and
    an SSOD state, also advances the semi_ema teacher chain (reference
    ssod_trainer.py:458-488: ema.update(student); semi_ema.update(ema))."""
    if oc.adam:
        new_state = apply_gradients_accumulating_tree(
            state, grads, oc, lr_bias=lr_bias, lr_rest=lr_rest,
            momentum=momentum, accumulate=accumulate, ema_decay=ema_decay,
            new_batch_stats=new_batch_stats,
        )
        semi = getattr(state, "semi_ema", None)
        if semi_decay is not None and semi is not None:
            # advance the teacher chain semi_ema.update(ema) on fired steps
            # only (reference ssod_trainer.py:458-488), mirroring the fused
            # SGD path below
            do_step = (state.acc_count + 1) >= accumulate
            stepped = ema_update(
                semi, new_state.ema.params, new_state.ema.batch_stats,
                semi_decay, ramp=False,
            )
            new_semi = jax.tree.map(
                lambda a, b: jnp.where(do_step, a, b), stepped, semi)
            new_state = new_state.replace(semi_ema=new_semi)
        return new_state

    from .optim import param_group_label

    has_ema = state.ema is not None
    semi = getattr(state, "semi_ema", None)
    has_semi = semi_decay is not None and semi is not None

    acc_count = state.acc_count + 1
    do_step = acc_count >= accumulate
    flag = do_step.astype(jnp.float32) if hasattr(do_step, "astype") \
        else jnp.float32(do_step)

    # scalar chain (updates counters advance only when the step fires)
    e_updates = (state.ema.updates + do_step.astype(jnp.int32)) \
        if has_ema else None
    if has_ema:
        d_ema = ema_decay * (
            1.0 - jnp.exp(-e_updates.astype(jnp.float32) / 2000.0))
    s_updates = (semi.updates + do_step.astype(jnp.int32)) \
        if has_semi else None

    labels = jax.tree_util.tree_map_with_path(param_group_label, state.params)

    def leaf_update(label, p, g, buf, acc, ep, sep):
        """Whole per-leaf chain in one fused pass; `where(flag)` replaces
        lax.cond so hold steps cost the same single bandwidth pass and no
        branch copies."""
        acc_new = acc + g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        wd = oc.weight_decay if label == "weight" else 0.0
        lr = lr_bias if label == "bias" else lr_rest
        dg = acc_new + wd * p32
        buf_step = momentum * buf + dg
        p_step = p32 - lr * (dg + momentum * buf_step)
        new_p = jnp.where(flag > 0, p_step, p32)
        new_buf = jnp.where(flag > 0, buf_step, buf)
        new_acc = acc_new * (1.0 - flag)
        outs = [new_p.astype(p.dtype), new_buf, new_acc]
        if has_ema:
            ep_step = ep * d_ema + (1.0 - d_ema) * new_p
            new_ep = jnp.where(flag > 0, ep_step, ep)
            outs.append(new_ep)
            if has_semi:
                sep_step = sep * semi_decay + (1.0 - semi_decay) * new_ep
                outs.append(jnp.where(flag > 0, sep_step, sep))
        return tuple(outs)

    zeros = jax.tree.map(lambda p: 0.0, state.params)  # placeholder leaves
    ep_tree = state.ema.params if has_ema else zeros
    sep_tree = semi.params if has_semi else zeros
    fused = jax.tree.map(
        leaf_update, labels, state.params, grads, state.opt.momentum_buf,
        state.acc_grads, ep_tree, sep_tree,
    )
    pick = lambda i: jax.tree.map(
        lambda t: t[i], fused, is_leaf=lambda t: isinstance(t, tuple))
    new_params, new_buf, new_acc = pick(0), pick(1), pick(2)

    new_ema = None
    kwargs = {}
    if has_ema:
        new_ep = pick(3)

        def stat_update(e, s):
            blended = e * d_ema + (1.0 - d_ema) * s.astype(jnp.float32)
            return jnp.where(flag > 0, blended, e)

        new_ebs = jax.tree.map(stat_update, state.ema.batch_stats,
                               new_batch_stats)
        new_ema = EMAState(params=new_ep, batch_stats=new_ebs,
                           updates=e_updates)
        if has_semi:
            new_sep = pick(4)

            def semi_stat(se, e):
                blended = se * semi_decay + (1.0 - semi_decay) * e
                return jnp.where(flag > 0, blended, se)

            new_sebs = jax.tree.map(semi_stat, semi.batch_stats, new_ebs)
            kwargs["semi_ema"] = EMAState(
                params=new_sep, batch_stats=new_sebs, updates=s_updates)

    return state.replace(
        params=new_params,
        batch_stats=new_batch_stats,
        opt=SGDState(momentum_buf=new_buf,
                     step=state.opt.step + do_step.astype(jnp.int32)),
        ema=new_ema,
        acc_grads=new_acc,
        acc_count=jnp.where(do_step, 0, acc_count).astype(jnp.int32),
        step=state.step + 1,
        **kwargs,
    )
