"""SSOD Trainer: mean-teacher lifecycle around the jitted SSOD step.

Parity with reference trainer/ssod_trainer.py:53-714:
  - env: burn_epochs, epoch_adaptor, cosine_ema, teacher_loss_weight
    (:76-84)
  - model: SSOD detector + semi_ema teacher chain (:96-203)
  - dataloaders: labeled + create_target_dataloader (:205-255)
  - epoch dispatch (:295-317): epoch < burn_epochs -> supervised burn-in
    (optionally with DA losses); at burn_epochs the EMA is copied into the
    student and the teacher is seeded (:305-316); afterwards mean-teacher
  - epoch_adaptor (:685-697): the UNLABELED loader drives the epoch; labeled
    batches come from an infinite iterator
  - after_epoch (:319-419): LabelMatch threshold refresh, cosine EMA decay,
    validation of the (semi-)EMA teacher, teacher saved as the ckpt `ema`
  - pseudo-label quality meters (:655-680)
"""

from __future__ import annotations

import itertools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets_ssod import create_target_dataloader
from ..parallel.distributed import to_host
from ..eval import validator
from ..eval.metrics import fitness
from ..losses.ssod_loss import SSODLossConfig
from ..models import build_model
from ..ssod.labelmatch import LabelMatch
from ..ssod.quality import check_pseudo_label, check_pseudo_label_with_gt
from .ssod_step import (
    create_ssod_train_state,
    make_burn_in_train_step,
    make_ssod_train_step,
    seed_teacher_from_ema,
)
from .train_state import cosine_ema_decay
from .trainer import Trainer

LOGGER = logging.getLogger(__name__)


class SSODTrainer(Trainer):
    def set_env(self, cfg):
        super().set_env(cfg)
        self.burn_epochs = int(cfg.hyp.burn_epochs)
        self.epoch_adaptor = bool(cfg.SSOD.epoch_adaptor)
        self.cosine_ema = bool(cfg.SSOD.cosine_ema)
        self.ema_rate = float(cfg.SSOD.ema_rate)
        self.teacher_loss_weight = float(cfg.SSOD.teacher_loss_weight)
        self.with_da_loss = bool(cfg.SSOD.with_da_loss)
        self.da_loss_weights = float(cfg.SSOD.da_loss_weights)
        self.dynamic_thres_epoch = int(cfg.SSOD.dynamic_thres_epoch)
        # dynamic per-class thresholds only under the LabelMatch creator;
        # FairPseudoLabel keeps the fixed ignore_thres_high/low
        # (reference ssod_trainer.py:320-323 gated on pseudo_label_type)
        self.use_labelmatch = (
            str(cfg.SSOD.pseudo_label_type) == "LabelMatch"
        )
        self.teacher_seeded = False
        # monotonic batch counter shared by the burn-in and mean-teacher
        # phases so the warmup/accumulate interpolation never jumps when the
        # target-loader length differs from self.nb (reference counts ni
        # over a single nb-based axis)
        self.global_step = None

    def _next_ni(self) -> int:
        if self.global_step is None:
            self.global_step = self.nb * self.start_epoch
        else:
            self.global_step += 1
        return self.global_step

    def build_model(self, cfg):
        super().build_model(cfg)
        # rebuild as the SSOD detector (with domain discriminators)
        self.model = build_model(self.spec, ssod=True,
                                 dtype=self.compute_dtype)
        x0 = jnp.zeros((1, self.img_size, self.img_size, self.spec.ch),
                       self.compute_dtype)
        variables = self.model.init(jax.random.PRNGKey(0), x0, train=False)
        params, batch_stats = variables["params"], variables["batch_stats"]
        if cfg.weights:
            params, batch_stats = self._warm_start(cfg.weights, params,
                                                   batch_stats)
        self._init_params, self._init_bs = params, batch_stats

    def build_optimizer(self, cfg):
        nbs = 64
        self.accumulate = max(round(nbs / self.batch_size), 1)
        if cfg.SSOD.fixed_accumulate:
            self.accumulate = 1
        scaled_wd = (
            cfg.hyp.weight_decay * self.batch_size * self.accumulate / nbs
        )
        from .optim import OptimizerConfig

        self.opt_cfg = OptimizerConfig.from_cfg(cfg, scaled_wd)
        self.state = create_ssod_train_state(
            self._init_params, self._init_bs, self.opt_cfg
        )
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            self.state = replicate(self.mesh, self.state)
        del self._init_params, self._init_bs

    def _rebuild_model(self):
        self.model = build_model(self.spec, ssod=True,
                                 dtype=self.compute_dtype)

    def build_dataloader(self, cfg):
        super().build_dataloader(cfg)
        # device_aug: the target loader serves raw letterboxed weak views;
        # mosaic/affine/HSV/flips + the M_s record are produced on-TPU
        # (ops/augment_device.device_ssod_views)
        self.target_loader = create_target_dataloader(
            cfg, batch_size=self.batch_size, augment=not self.device_aug
        )
        if self.device_aug:
            import functools

            from ..ops.augment_device import device_ssod_views

            hyp = {k: cfg.SSOD.ssod_hyp[k] for k in cfg.SSOD.ssod_hyp}
            self._ssod_aug_fn = jax.jit(functools.partial(
                device_ssod_views, hyp=hyp,
                max_out=int(cfg.Dataset.max_targets),
            ))
        self.target_with_gt = bool(cfg.SSOD.ssod_hyp.with_gt or cfg.SSOD.debug)
        self.label_match = LabelMatch(
            cfg,
            target_data_len=len(self.target_loader.ds),
            label_num_per_img=self.dataset.label_num_per_image,
            cls_ratio_gt=self.dataset.cls_ratio_gt,
        )

    def build_loss(self, cfg):
        super().build_loss(cfg)
        self.ssod_loss_cfg = SSODLossConfig.from_cfg(cfg, nl=self.spec.nl)

    def _load_extra_teachers(self, cfg):
        """Load frozen extra-teacher checkpoints with class-name remap
        (reference ssod_trainer.py:96-203)."""
        import numpy as _np

        from ..utils.checkpoint import load_eval_variables

        out = []
        names = [str(n) for n in cfg.Dataset.names]
        extra_names_lists = list(cfg.SSOD.extra_teachers_class_names)
        for i, path in enumerate(cfg.SSOD.extra_teachers):
            variables = load_eval_variables(path)
            cmap = None
            if i < len(extra_names_lists) and extra_names_lists[i]:
                t_names = [str(n) for n in extra_names_lists[i]]
                cmap = _np.array(
                    [names.index(n) if n in names else -1 for n in t_names],
                    _np.int32,
                )
            out.append((variables, cmap))
            LOGGER.info("loaded extra teacher %s", path)
        return out

    def build_step(self):
        cfg = self.cfg
        self.burn_step = make_burn_in_train_step(
            self.model, self.loss_cfg, self.anchors_grid, self.opt_cfg,
            with_da_loss=self.with_da_loss,
            da_loss_weight=self.da_loss_weights,
            norm_scale=float(cfg.Dataset.norm_scale),
            compute_dtype=self.compute_dtype,
        )
        extra = (
            self._load_extra_teachers(cfg) if cfg.SSOD.extra_teachers else None
        )
        self.ssod_step = make_ssod_train_step(
            self.model, self.loss_cfg, self.ssod_loss_cfg, self.anchors_grid,
            self.opt_cfg, self.spec,
            nms_conf_thres=float(cfg.SSOD.nms_conf_thres),
            nms_iou_thres=float(cfg.SSOD.nms_iou_thres),
            max_pl=int(cfg.SSOD.max_pseudo_labels),
            multi_label=bool(cfg.SSOD.multi_label),
            teacher_loss_weight=self.teacher_loss_weight,
            da_loss_weight=self.da_loss_weights,
            with_da_loss=self.with_da_loss,
            norm_scale=float(cfg.Dataset.norm_scale),
            compute_dtype=self.compute_dtype,
            extra_teachers=extra,
            use_ota=bool(cfg.SSOD.use_ota),
            # the reference's SSOD assigner is built WITHOUT top_k, i.e. the
            # YOLOAnchorAssigner ctor default 1 (ssod_loss.py:71-72)
            ota_top_k=1,
        )

    # -- epoch logic --------------------------------------------------------
    def _semi_decay(self) -> float:
        if self.cosine_ema:
            return cosine_ema_decay(
                max(self.epoch - self.burn_epochs, 0),
                max(self.epochs - self.burn_epochs, 1),
                decay_start=self.ema_rate,
            )
        return self.ema_rate

    def train_in_epoch(self):
        if self.epoch == self.burn_epochs and not self.teacher_seeded:
            LOGGER.info("burn-in complete: seeding teacher from EMA")
            self.state = seed_teacher_from_ema(self.state)
            if self.mesh is not None:
                # the seeding copies land on the default device; restore
                # uniform mesh replication or the first post-seed step
                # compiles once for the mixed sharding and AGAIN for its
                # own output sharding (caught by the LabelMatch e2e test's
                # compile counter)
                from ..parallel.mesh import replicate

                self.state = replicate(self.mesh, self.state)
            self.teacher_seeded = True
        if self.epoch < self.burn_epochs:
            self._train_burn_in()
        else:
            self._train_with_unlabeled()

    def _shard(self, *arrays):
        """Batch-dim dp sharding (single- or multi-host); falls back to
        replication when the per-step batch doesn't divide the mesh (tiny
        smoke-test batches)."""
        n = jax.local_device_count() if self.mesh is not None else 1
        if self.mesh is None or any(a.shape[0] % n for a in arrays):
            out = tuple(jnp.asarray(a) for a in arrays)
        else:
            from jax.sharding import PartitionSpec as P

            from ..parallel.distributed import make_global_batch
            from ..parallel.mesh import image_sharding

            # NHWC leaves additionally shard H over sp when cfg.sp > 1
            img_spec = image_sharding(self.mesh).spec
            specs = [img_spec if a.ndim == 4 else P("dp") for a in arrays]
            out = make_global_batch(self.mesh, tuple(arrays), specs=specs)
        return out if len(out) > 1 else out[0]

    def _train_burn_in(self):
        target_iter = iter(itertools.cycle(self.target_loader)) \
            if self.with_da_loss else None
        for i, batch in enumerate(self.train_loader):
            ni = self._next_ni()
            sched = self._schedule(ni)
            if target_iter:
                t_imgs = self._shard(next(target_iter)["images_ori"])
            else:
                t_imgs = jnp.zeros((0,) + batch["images"].shape[1:],
                                   jnp.uint8)
            images, labels, mask = self._shard(
                batch["images"], batch["labels"], batch["mask"]
            )
            if self.device_aug:
                key = jax.random.fold_in(jax.random.PRNGKey(1), ni)
                images, labels, mask = self._device_aug_fn(
                    key, images, labels.astype(jnp.float32), mask
                )
            self.state, parts = self.burn_step(
                self.state, images, labels, mask,
                t_imgs, sched, jnp.float32(self._semi_decay()),
            )
            if i % 50 == 0:
                self.meter.update({k: float(v) for k, v in parts.items()
                                   if k != "loss"})
                LOGGER.info("burn epoch %d it %d/%d %s", self.epoch, i,
                            self.nb, self.meter)
            if self.stop.requested:
                break

    def _train_with_unlabeled(self):
        thr_high = jnp.asarray(self.label_match.cls_thr_high)
        thr_low = jnp.asarray(self.label_match.cls_thr_low)
        semi_decay = jnp.float32(self._semi_decay())
        if self.epoch_adaptor:
            # unlabeled loader drives; labeled pulled from an infinite iter
            driver = self.target_loader
            labeled_iter = iter(itertools.cycle(self.train_loader))
            n_iter = len(driver)
        else:
            driver = self.target_loader
            labeled_iter = iter(itertools.cycle(self.train_loader))
            n_iter = min(len(driver), self.nb)
        for i, tbatch in enumerate(driver):
            if i >= n_iter:
                break
            sbatch = next(labeled_iter)
            ni = self._next_ni()
            sched = self._schedule(ni)
            s_imgs, s_labels, s_mask = self._shard(
                sbatch["images"], sbatch["labels"], sbatch["mask"]
            )
            if self.device_aug:
                # only the raw weak view crosses host->device; the strong
                # view + M_s are generated on-chip (the host copies of
                # tbatch['images']/['M_s'] are identity duplicates here)
                t_weak, t_labels, t_mask = self._shard(
                    tbatch["images_ori"], tbatch["labels"], tbatch["mask"]
                )
                key = jax.random.fold_in(jax.random.PRNGKey(2), ni)
                k1, k2 = jax.random.split(key)
                s_imgs, s_labels, s_mask = self._device_aug_fn(
                    k1, s_imgs, s_labels.astype(jnp.float32), s_mask
                )
                (t_strong, t_labels, t_mask, t_weak,
                 t_ms) = self._ssod_aug_fn(
                    k2, t_weak, t_labels.astype(jnp.float32), t_mask
                )
                if self.target_with_gt:
                    # strong-view GT for the quality meters now comes from
                    # the device pipeline; the debug mosaics must draw on
                    # the device-generated strong view too
                    tbatch = {**tbatch, "labels": to_host(t_labels),
                              "mask": to_host(t_mask),
                              "images": to_host(t_strong)}
            else:
                t_strong, t_weak, t_ms = self._shard(
                    tbatch["images"], tbatch["images_ori"], tbatch["M_s"]
                )
            self.state, out = self.ssod_step(
                self.state, s_imgs, s_labels, s_mask,
                t_strong, t_weak, t_ms,
                thr_high, thr_low, sched, semi_decay,
            )
            pl_np = to_host(out.pseudo_labels)
            mask_np = to_host(out.pseudo_mask)
            if (self.cfg.SSOD.debug and i < 2 and self.is_main
                    and self.target_with_gt):
                # pseudo-vs-GT debug mosaics on the strong view (reference
                # utils/self_supervised_utils.py:239-243)
                try:
                    from ..utils.plots import plot_pseudo_vs_gt

                    plot_pseudo_vs_gt(
                        np.asarray(tbatch["images"]), pl_np, mask_np,
                        np.asarray(tbatch["labels"]),
                        np.asarray(tbatch["mask"]),
                        self.save_dir
                        / f"pseudo_gt_e{self.epoch}_b{i}.png",
                    )
                except Exception as e:
                    LOGGER.debug("pseudo debug plot skipped: %s", e)
            # LabelMatch sees every pre-warp NMS detection's (conf, cls) —
            # not just M-warp survivors — matching the reference's
            # score_list_epoch harvest (utils/labelmatch.py:283-299)
            nms_valid = to_host(out.nms_valid)
            self.label_match.collect(
                np.where(nms_valid, to_host(out.nms_conf), 0.0),
                to_host(out.nms_cls),
            )
            if i % 50 == 0:
                metrics = {k: float(v) for k, v in out.metrics.items()
                           if k not in ("loss", "total")}
                if self.target_with_gt:
                    metrics.update(check_pseudo_label_with_gt(
                        pl_np, mask_np, tbatch["labels"], tbatch["mask"],
                    ))
                else:
                    metrics.update(check_pseudo_label(pl_np, mask_np))
                self.meter.update(metrics)
                LOGGER.info("ssod epoch %d it %d/%d %s", self.epoch, i,
                            n_iter, self.meter)
            if self.stop.requested:
                break

    def after_epoch(self):
        if self.use_labelmatch and self.epoch >= self.burn_epochs \
                and self.epoch >= self.dynamic_thres_epoch:
            self.label_match.update_epoch_cls_thr(
                max(self.epoch - self.burn_epochs, 0)
            )
            LOGGER.info(
                "labelmatch thr_high[:5]=%s thr_low[:5]=%s",
                np.round(self.label_match.cls_thr_high[:5], 3),
                np.round(self.label_match.cls_thr_low[:5], 3),
            )
        # validate the teacher (semi_ema after burn-in, else EMA)
        results = (0.0, 0.0, 0.0, 0.0)
        if self.val_loader is not None and not self.noval:
            ema_src = (
                self.state.semi_ema
                if self.teacher_seeded else self.state.ema
            )
            variables = {
                "params": ema_src.params,
                "batch_stats": ema_src.batch_stats,
            }
            results, maps, cls_thr = validator.run(
                self.model, variables, self.val_loader, nc=self.spec.nc,
                conf_thres=float(self.cfg.val_conf_thres),
                compute_dtype=self.compute_dtype,
                mesh=self.mesh,  # sharded teacher val (see trainer.py)
            )
            LOGGER.info("epoch %d teacher val P=%.4f R=%.4f mAP50=%.4f "
                        "mAP=%.4f", self.epoch, *results)
        fi = float(fitness(np.array([list(results)]))[0])
        if fi > self.best_fitness:
            self.best_fitness = fi
        if self.is_main:
            self._write_results_row(results, fi)
        metrics = {
            "metrics/precision": results[0],
            "metrics/recall": results[1],
            "metrics/mAP_0.5": results[2],
            "metrics/mAP_0.5:0.95": results[3],
        }
        for k, meter in self.meter.meters.items():
            metrics[f"train/{k}"] = meter.avg
        self.callbacks.run("on_fit_epoch_end", metrics, self.epoch)
        if not self.nosave and self.is_main:
            self._save_ckpt("last.ckpt", fi)
            if fi == self.best_fitness:
                self._save_ckpt("best.ckpt", fi)

    def _save_ckpt(self, name: str, fi: float, epoch=None):
        """Saves the teacher (semi_ema) as the ckpt `ema` entry after burn-in
        (reference ssod_trainer.py:393-409)."""
        st = self.state
        ema_src = st.semi_ema if self.teacher_seeded else st.ema
        # async snapshot+write (utils/checkpoint.py AsyncCheckpointer)
        self.checkpointer.save(
            self.save_dir / "weights" / name,
            params=st.params,
            batch_stats=st.batch_stats,
            ema_params=ema_src.params,
            ema_batch_stats=ema_src.batch_stats,
            ema_updates=int(ema_src.updates),
            epoch=self.epoch if epoch is None else epoch,
            best_fitness=self.best_fitness,
            cfg_yaml=self.cfg.dump(),
        )
