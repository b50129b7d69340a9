"""SSOD train step: teacher -> pseudo labels -> student, one XLA program.

Fuses the reference's train_instance (trainer/ssod_trainer.py:587-680):
  1. EMA-teacher no-grad forward on the weak view (:595-606)
  2. FairPseudoLabel NMS + M-warp (:618) — on-device here, no host loop
  3. student forward on concat([labeled, strong_unlabeled]) (:623-626)
  4. split sup/unsup heads + domain maps (:568-585)
  5. sup loss + DA losses * da_weight + unsup loss * teacher_loss_weight
     (:628-649); unsup zeroed when no pseudo label survived
  6. optimizer step; ema.update(student); semi_ema.update(ema) (:458-488)

The per-class thresholds (LabelMatch) and EMA decays arrive as traced
arrays/scalars so epoch-boundary updates never recompile.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..losses.domain_loss import domain_loss, target_loss
from ..losses.ssod_loss import SSODLossConfig, compute_ssod_loss
from ..losses.yolov5_loss import YoloV5LossConfig, compute_loss
from ..ssod.pseudo_label import create_pseudo_labels, create_pseudo_labels_multi
from .optim import OptimizerConfig
from .supervised import Schedule
from .train_state import (
    EMAState, TrainState, apply_gradients_accumulating, init_ema,
)


@struct.dataclass
class SSODTrainState(TrainState):
    """TrainState + the teacher EMA chain: student -> ema -> semi_ema
    (reference ssod_trainer.py:485-487)."""

    semi_ema: Optional[EMAState] = None


def create_ssod_train_state(params, batch_stats, oc: OptimizerConfig):
    from .train_state import create_train_state

    base = create_train_state(params, batch_stats, oc, with_ema=True)
    return SSODTrainState(
        params=base.params,
        batch_stats=base.batch_stats,
        opt=base.opt,
        ema=base.ema,
        acc_grads=base.acc_grads,
        acc_count=base.acc_count,
        step=base.step,
        semi_ema=init_ema(params, batch_stats),
    )


class SSODBatchOut(NamedTuple):
    metrics: dict
    pseudo_labels: jnp.ndarray  # (B, max_pl, 8) [cls, xywhn, conf, obj, clsc]
    pseudo_mask: jnp.ndarray    # (B, max_pl) bool
    pseudo_count: jnp.ndarray   # () int32
    # pre-warp NMS (conf, cls, valid) for LabelMatch score collection
    # (reference accumulates every NMS detection, utils/labelmatch.py:283-299)
    nms_conf: jnp.ndarray       # (B, max_pl)
    nms_cls: jnp.ndarray        # (B, max_pl)
    nms_valid: jnp.ndarray      # (B, max_pl) bool


def make_ssod_train_step(
    model,
    sup_cfg: YoloV5LossConfig,
    ssod_cfg: SSODLossConfig,
    anchors_grid: np.ndarray,
    opt_cfg: OptimizerConfig,
    spec,
    *,
    nms_conf_thres: float,
    nms_iou_thres: float,
    max_pl: int,
    multi_label: bool,
    teacher_loss_weight: float,
    da_loss_weight: float,
    with_da_loss: bool,
    norm_scale: float = 255.0,
    compute_dtype=jnp.bfloat16,
    extra_teachers=None,
    use_ota: bool = False,
    ota_top_k: int = 10,
):
    """extra_teachers: optional list of (variables, class_map | None)
    frozen teachers merged into pseudo-label creation (reference
    ssod_trainer.py:96-203 extra_teachers with class-name remap)."""
    anchors_grid = np.asarray(anchors_grid, np.float32)
    img_size = spec.img_size
    nc = spec.nc
    extra_teachers = extra_teachers or []

    def train_step(
        state: SSODTrainState,
        sup_images, sup_labels, sup_mask,
        un_strong, un_weak, m_s,
        thr_high, thr_low,
        sched: Schedule,
        semi_decay,
    ):
        bs_sup = sup_images.shape[0]

        # 1-2. teacher pseudo labels on the weak view (no grad).
        # Pseudo labels come from the PRIMARY EMA (reference
        # ssod_trainer.py:595-606 uses self.ema.ema); semi_ema is only for
        # validation/checkpointing (ssod_trainer.py:339-419).
        teacher_vars = {
            "params": state.ema.params,
            "batch_stats": state.ema.batch_stats,
        }
        tx = un_weak.astype(compute_dtype) / norm_scale
        (decoded, _), _ = model.apply(
            teacher_vars, tx, train=False, with_domain=False
        )
        if extra_teachers:
            decoded_list = [jax.lax.stop_gradient(decoded)]
            class_maps = [None]
            for tv, cmap in extra_teachers:
                (dec_t, _), _ = model.apply(
                    tv, tx, train=False, with_domain=False
                )
                decoded_list.append(jax.lax.stop_gradient(dec_t))
                class_maps.append(cmap)
            pl = create_pseudo_labels_multi(
                decoded_list, class_maps, m_s,
                img_size=img_size, nc=nc,
                conf_thres=nms_conf_thres, iou_thres=nms_iou_thres,
                max_pl=max_pl, multi_label=multi_label,
            )
        else:
            pl = create_pseudo_labels(
                jax.lax.stop_gradient(decoded), m_s,
                img_size=img_size, nc=nc,
                conf_thres=nms_conf_thres, iou_thres=nms_iou_thres,
                max_pl=max_pl, multi_label=multi_label,
            )

        # 3-5. student forward + losses
        def loss_fn(params):
            x = jnp.concatenate([sup_images, un_strong], axis=0)
            x = x.astype(compute_dtype) / norm_scale
            (raw, domain), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, decode=False, with_domain=with_da_loss,
                mutable=["batch_stats"],
            )
            sup_raw = [r[:bs_sup] for r in raw]
            un_raw = [r[bs_sup:] for r in raw]
            sup_loss, sup_parts = compute_loss(
                sup_raw, sup_labels, sup_mask, anchors_grid, sup_cfg
            )
            if use_ota:
                # SSOD.use_ota: SimOTA assignment of reliable/uncertain
                # pseudo labels (reference ssod_loss.py:296-345)
                from ..losses.ssod_loss import compute_ssod_ota_loss

                un_loss, un_parts = compute_ssod_ota_loss(
                    un_raw, pl.labels, pl.mask, thr_high, thr_low,
                    anchors_grid, spec.strides, img_size, ssod_cfg,
                    top_k=ota_top_k,
                )
            else:
                un_loss, un_parts = compute_ssod_loss(
                    un_raw, pl.labels, pl.mask, thr_high, thr_low,
                    anchors_grid, ssod_cfg,
                )
            un_loss = jnp.where(pl.invalid, 0.0, un_loss)
            total = sup_loss + un_loss * teacher_loss_weight
            if with_da_loss:
                d_feats = [f[:bs_sup] for f in domain]
                t_feats = [f[bs_sup:] for f in domain]
                d_l = domain_loss(d_feats)
                t_l = target_loss(t_feats)
                total = total + (d_l + t_l) * da_loss_weight
                sup_parts = {**sup_parts, "d_loss": d_l, "t_loss": t_l}
            parts = {**sup_parts, **un_parts, "total": total}
            return total, (parts, mutated["batch_stats"])

        (_, (parts, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # 6. accumulate/step + EMA chain (ema ramped from the new student,
        # semi_ema constant-decay from the new ema — reference
        # ssod_trainer.py:458-488), as ONE fused flat update
        new_state = apply_gradients_accumulating(
            state, grads, opt_cfg,
            lr_bias=sched.lr_bias, lr_rest=sched.lr_rest,
            momentum=sched.momentum, accumulate=sched.accumulate,
            ema_decay=sched.ema_decay, new_batch_stats=new_bs,
            semi_decay=semi_decay,
        )
        out = SSODBatchOut(
            metrics=parts,
            pseudo_labels=pl.labels,
            pseudo_mask=pl.mask,
            pseudo_count=pl.mask.sum(),
            nms_conf=pl.nms_conf,
            nms_cls=pl.nms_cls,
            nms_valid=pl.nms_valid,
        )
        return new_state, out

    return jax.jit(train_step, donate_argnums=(0,))


def make_burn_in_train_step(
    model,
    sup_cfg: YoloV5LossConfig,
    anchors_grid: np.ndarray,
    opt_cfg: OptimizerConfig,
    *,
    with_da_loss: bool = False,
    da_loss_weight: float = 0.0,
    norm_scale: float = 255.0,
    compute_dtype=jnp.bfloat16,
):
    """Burn-in phase: supervised-only on the SSOD model (optionally with the
    GRL domain losses against weak target images — train_without_unlabeled_da,
    reference ssod_trainer.py:490-533). Maintains both EMA chains so the
    teacher can be seeded at burn-in end."""
    anchors_grid = np.asarray(anchors_grid, np.float32)

    def train_step(state: SSODTrainState, images, labels, mask,
                   target_images, sched: Schedule, semi_decay):
        bs_sup = images.shape[0]

        def loss_fn(params):
            if with_da_loss:
                x = jnp.concatenate([images, target_images], axis=0)
            else:
                x = images
            x = x.astype(compute_dtype) / norm_scale
            (raw, domain), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, decode=False, with_domain=with_da_loss,
                mutable=["batch_stats"],
            )
            sup_raw = [r[:bs_sup] for r in raw]
            loss, parts = compute_loss(
                sup_raw, labels, mask, anchors_grid, sup_cfg
            )
            if with_da_loss:
                d_l = domain_loss([f[:bs_sup] for f in domain])
                t_l = target_loss([f[bs_sup:] for f in domain])
                loss = loss + (d_l + t_l) * da_loss_weight
                parts = {**parts, "d_loss": d_l, "t_loss": t_l}
            return loss, (parts, mutated["batch_stats"])

        (_, (parts, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # fused flat accumulate/SGD/EMA (semi_ema untouched during burn-in;
        # it is seeded from the EMA at burn-in end, ssod_trainer.py:305-316)
        new_state = apply_gradients_accumulating(
            state, grads, opt_cfg,
            lr_bias=sched.lr_bias, lr_rest=sched.lr_rest,
            momentum=sched.momentum, accumulate=sched.accumulate,
            ema_decay=sched.ema_decay, new_batch_stats=new_bs,
        )
        return new_state, parts

    return jax.jit(train_step, donate_argnums=(0,))


def seed_teacher_from_ema(state: SSODTrainState) -> SSODTrainState:
    """Burn-in end: copy EMA weights into the student and seed the teacher
    from the EMA (reference ssod_trainer.py:305-316)."""
    # jnp.array (copy) — asarray would alias the EMA buffers with the live
    # params and break donation in the jitted step
    copy_cast = lambda src, like: jax.tree.map(
        lambda s, p: jnp.array(s, p.dtype), src, like
    )
    new_params = copy_cast(state.ema.params, state.params)
    new_bs = copy_cast(state.ema.batch_stats, state.batch_stats)
    return state.replace(
        params=new_params,
        batch_stats=new_bs,
        semi_ema=EMAState(
            params=jax.tree.map(jnp.array, state.ema.params),
            batch_stats=jax.tree.map(jnp.array, state.ema.batch_stats),
            updates=jnp.zeros((), jnp.int32),
        ),
    )
