"""Supervised Trainer: lifecycle orchestration around the jitted train step.

Parity with reference trainer/trainer.py:43-542:
  - set_env: run dir via increment_path, config dump, loggers (trainer.py:253)
  - build_model: spec from cfg, warm-start via shape-matched partial load
    (intersect, trainer.py:132-144), EMA in TrainState
  - build_optimizer: accumulate = 64/batch, scaled weight decay
    (trainer.py:195-197), SGD nesterov / AdamW, one_cycle or linear LR
  - warmup iterations nw = clamp(round(warmup_epochs*nb), 1000, half-run)
    (trainer.py:372-376)
  - before_epoch: close mosaic for the last no_aug_epochs (trainer.py:363-365)
  - after_epoch: validate EMA, fitness = 0.1*mAP50+0.9*mAP, save last/best
    (trainer.py:445-491)

TPU deltas: the whole hot loop is the jitted train step (no AMP scaler, no
DDP); data parallelism via mesh sharding when >1 device is visible.
"""

from __future__ import annotations

import csv
import logging
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..configs import CfgNode
from ..data.datasets import create_dataloader
from ..eval import validator
from ..eval.metrics import MetricMeter, fitness
from ..losses.yolov5_loss import YoloV5LossConfig
from ..models import build_model
from ..models.spec import spec_from_cfg
from ..parallel.distributed import is_main_process, make_global_batch
from ..parallel.mesh import image_sharding, make_mesh, make_mesh_2d, replicate
from ..utils.callbacks import Callbacks
from ..utils.shutdown import GracefulStop
from ..utils.checkpoint import (
    AsyncCheckpointer,
    intersect_trees,
    load_checkpoint,
)
from ..utils.general import check_img_size, increment_path
from .optim import OptimizerConfig
from .supervised import Schedule, make_supervised_train_step
from .train_state import create_train_state

LOGGER = logging.getLogger(__name__)

RESULTS_KEYS = [
    "epoch", "train/box_loss", "train/obj_loss", "train/cls_loss",
    "metrics/precision", "metrics/recall", "metrics/mAP_0.5",
    "metrics/mAP_0.5:0.95", "val/fitness", "lr",
]


class Trainer:
    def __init__(self, cfg: CfgNode, callbacks: Optional[Callbacks] = None,
                 compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.callbacks = callbacks or Callbacks()
        self.compute_dtype = compute_dtype
        self.epoch = 0
        self.start_epoch = 0
        self.best_fitness = 0.0
        self.set_env(cfg)
        self.build_model(cfg)
        self.build_optimizer(cfg)
        self.build_dataloader(cfg)
        self.build_loss(cfg)
        self.build_step()

    # -- lifecycle ----------------------------------------------------------
    def set_env(self, cfg):
        self.epochs = cfg.epochs
        self.batch_size = cfg.Dataset.batch_size
        self.save_dir = increment_path(
            Path(cfg.project or "runs/train") / (cfg.name or "exp"),
            exist_ok=cfg.exist_ok, mkdir=True,
        )
        (self.save_dir / "weights").mkdir(parents=True, exist_ok=True)
        # host-0-only side effects on multi-host slices (the reference's
        # RANK in (-1, 0) guards)
        self.is_main = is_main_process()
        if self.is_main:
            (self.save_dir / "opt.yaml").write_text(cfg.dump())
        self.img_size = check_img_size(cfg.Dataset.img_size, 32)
        self.noval = cfg.noval
        self.nosave = cfg.nosave
        self.save_period = cfg.save_period
        self.results_csv = self.save_dir / "results.csv"
        self.n_devices = len(jax.devices())
        self.checkpointer = AsyncCheckpointer()
        self.stop = GracefulStop()
        # cfg.sp > 1: dp x sp mesh, image H sharded over sp (GSPMD spatial
        # partitioning, parallel/mesh.py) — otherwise plain dp
        self.sp = max(int(getattr(cfg, "sp", 1) or 1), 1)
        if self.sp > 1 and self.n_devices % self.sp:
            raise ValueError(
                f"cfg.sp={self.sp} must divide device count "
                f"{self.n_devices}")
        if self.n_devices > 1:
            self.mesh = (make_mesh_2d(self.n_devices // self.sp, self.sp)
                         if self.sp > 1 else make_mesh(self.n_devices))
        else:
            self.mesh = None
        # loggers registered on the callbacks bus (reference trainer.py:281)
        self.loggers = None
        if self.is_main:
            try:
                from ..utils.loggers import Loggers

                self.loggers = Loggers(self.save_dir, cfg, include=("tb",))
                self.loggers.register(self.callbacks)
            except Exception as e:
                LOGGER.debug("loggers disabled: %s", e)

    def build_model(self, cfg):
        self.spec = spec_from_cfg(cfg)
        self.model = build_model(self.spec, ssod=False, dtype=self.compute_dtype)
        x0 = jnp.zeros((1, self.img_size, self.img_size, self.spec.ch),
                       self.compute_dtype)
        variables = self.model.init(jax.random.PRNGKey(0), x0, train=False)
        params, batch_stats = variables["params"], variables["batch_stats"]
        try:  # reference model_info line (utils/torch_utils.py:222-244)
            from ..utils.profile import count_params

            LOGGER.info("Model summary: %s/%s/%s head, %.2fM parameters",
                        self.spec.backbone, self.spec.neck, self.spec.head,
                        count_params(params) / 1e6)
        except Exception:
            pass
        if cfg.weights:
            params, batch_stats = self._warm_start(
                cfg.weights, params, batch_stats
            )
        # RepOptimizer (reference trainer/trainer.py:219-236): scales from
        # the LinearAdd hyper-search ckpt drive per-kernel gradient masks;
        # from-scratch runs also reinit the 3x3 kernels to the fused CSLA
        # equivalent (RepVGGOptimizer reinit=True when cfg.weights=='').
        self.grad_masks = None
        if cfg.Model.RepOpt:
            from .repopt import (build_grad_masks, load_repscale_scales,
                                 reinitialize_from_scales)

            scales = load_repscale_scales(cfg.Model.RepScale_weight)
            if not cfg.weights:
                params = jax.tree.map(
                    jnp.asarray,
                    reinitialize_from_scales(
                        jax.tree.map(np.asarray, params), scales
                    ),
                )
            self.grad_masks = build_grad_masks(
                jax.tree.map(np.asarray, params), scales
            )
        self._init_params = params
        self._init_bs = batch_stats
        s = np.asarray(self.spec.strides, np.float32)[:, None, None]
        self.anchors_grid = (
            np.asarray(self.spec.anchors, np.float32)
            .reshape(self.spec.nl, -1, 2) / s
        )

    def _warm_start(self, weights: str, params, batch_stats):
        """Shape-matched partial load from our ckpt or a torch .pt."""
        if weights.endswith(".pt"):
            from ..utils.torch_import import load_torch_weights

            src = load_torch_weights(weights, self.spec)
            src_params, src_bs = src["params"], src["batch_stats"]
        else:
            ckpt = load_checkpoint(weights)
            ent = ckpt.get("ema") or ckpt["model"]
            src_params, src_bs = ent["params"], ent["batch_stats"]
        params, c1, t1 = intersect_trees(src_params, params)
        batch_stats, c2, t2 = intersect_trees(src_bs, batch_stats)
        LOGGER.info(
            "warm start: %d/%d params, %d/%d stats from %s",
            c1, t1, c2, t2, weights,
        )
        return params, batch_stats

    def build_optimizer(self, cfg):
        nbs = 64
        self.accumulate = max(round(nbs / self.batch_size), 1)
        scaled_wd = (
            cfg.hyp.weight_decay * self.batch_size * self.accumulate / nbs
        )
        self.opt_cfg = OptimizerConfig.from_cfg(cfg, scaled_wd)
        self.state = create_train_state(
            self._init_params, self._init_bs, self.opt_cfg, with_ema=True
        )
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
        del self._init_params, self._init_bs
        if cfg.resume and cfg.weights and not cfg.weights.endswith(".pt"):
            self._resume(cfg.weights)

    def _resume(self, weights):
        """Full resume: params + BN stats + EMA + optimizer momentum + epoch
        (reference trainer.py:159-186)."""
        ckpt = load_checkpoint(weights)
        meta = ckpt.get("meta", {})
        self.start_epoch = self.epoch = meta.get("epoch", -1) + 1
        self.best_fitness = meta.get("best_fitness", 0.0)
        cast = lambda t, like: jax.tree.map(
            lambda s, p: jnp.asarray(np.asarray(s), p.dtype), t, like
        )
        st = self.state
        new = {
            "params": cast(ckpt["model"]["params"], st.params),
            "batch_stats": cast(ckpt["model"]["batch_stats"], st.batch_stats),
        }
        updates = {}
        if st.ema is not None and "ema" in ckpt:
            updates["ema"] = st.ema.replace(
                params=cast(ckpt["ema"]["params"], st.ema.params),
                batch_stats=cast(ckpt["ema"]["batch_stats"],
                                 st.ema.batch_stats),
                updates=jnp.int32(meta.get("ema_updates", 0)),
            )
        if "optimizer" in ckpt and ckpt["optimizer"] is not None:
            try:
                from flax import serialization

                updates["opt"] = serialization.from_state_dict(
                    st.opt, jax.tree.map(jnp.asarray, ckpt["optimizer"])
                )
            except Exception as e:
                LOGGER.warning("optimizer state not restored: %s", e)
        self.state = st.replace(params=new["params"],
                                batch_stats=new["batch_stats"], **updates)
        LOGGER.info("resumed at epoch %d (best_fitness %.4f)",
                    self.start_epoch, self.best_fitness)

    def build_dataloader(self, cfg):
        self.device_aug = bool(cfg.Dataset.device_aug)
        if self.device_aug:
            # host only decodes + letterboxes (cacheable); mosaic-4 /
            # perspective / HSV / flips run on-TPU (ops/augment_device.py)
            from ..data.datasets import BatchLoader, LoadImagesAndLabels

            ds = LoadImagesAndLabels(
                cfg.Dataset.train,
                img_size=cfg.Dataset.img_size,
                hyp={k: cfg.hyp[k] for k in cfg.hyp},
                augment=False,
                nc=cfg.Dataset.nc,
                max_targets=cfg.Dataset.max_targets,
                single_cls=cfg.single_cls,
                cache_images=cfg.cache is True or cfg.cache == "ram",
                num_keypoints=int(cfg.Dataset.np),
            )
            from ..parallel.distributed import per_process_batch

            self.train_loader = BatchLoader(
                ds, per_process_batch(self.batch_size), shuffle=True,
                drop_last=True,
                sampler_type=cfg.Dataset.sampler_type,
                workers=int(cfg.Dataset.workers),
                mode=str(cfg.Dataset.loader),
            )
            self._aug_hyp = {k: cfg.hyp[k] for k in cfg.hyp}
            self._build_device_aug()
        else:
            self.train_loader = create_dataloader(cfg, "train",
                                                  batch_size=self.batch_size)
        self.dataset = self.train_loader.ds
        self.nb = len(self.train_loader)
        try:  # label statistics plot (reference plot_labels at train start)
            from ..utils.plots import plot_labels

            plot_labels(self.dataset.labels, self.spec.nc, self.save_dir)
        except Exception as e:  # plotting is never fatal
            LOGGER.debug("plot_labels skipped: %s", e)
        self.val_loader = (
            create_dataloader(cfg, "val", augment=False,
                              batch_size=self.batch_size)
            if cfg.Dataset.val else None
        )
        self._maybe_autoanchor(cfg)

    def _rebuild_model(self):
        self.model = build_model(self.spec, ssod=False,
                                 dtype=self.compute_dtype)

    def _maybe_autoanchor(self, cfg):
        """Train-start anchor BPR check / k-means+GA evolution behind
        cfg.noautoanchor, skipped on resume like upstream (reference
        trainer.py:104-120, ssod_trainer.py:250, utils/autoanchor.py:26-49).
        Runs AFTER the dataset exists and BEFORE the loss/step are built:
        evolved anchors re-enter the STATIC model spec (so the head's eval
        decode sees them) and the dense loss lattice `anchors_grid` before
        anything is jitted."""
        from ..models.heads import head_model_type

        if cfg.noautoanchor or cfg.resume:
            return
        if head_model_type(self.spec.head) != "yolov5":
            return  # anchor-free heads have no anchors to evolve
        from dataclasses import replace

        from ..data.autoanchor import check_anchors

        anchors_px = np.asarray(self.spec.anchors, np.float32).reshape(
            self.spec.nl, -1, 2)
        new_px, bpr = check_anchors(
            self.dataset, anchors_px, self.spec.strides, self.img_size,
            anchor_t=float(cfg.Loss.anchor_t),  # reference hyp.anchor_t
        )
        if np.allclose(new_px, anchors_px):
            return
        LOGGER.info("autoanchor: adopting evolved anchors (BPR %.4f)", bpr)
        self.spec = replace(
            self.spec,
            anchors=tuple(tuple(float(v) for v in sc.reshape(-1))
                          for sc in new_px),
        )
        self._rebuild_model()  # anchors are static decode constants, not
        # params — the initialized params/batch_stats remain valid
        s = np.asarray(self.spec.strides, np.float32)[:, None, None]
        self.anchors_grid = new_px.astype(np.float32) / s

    def build_loss(self, cfg):
        """Loss.type dispatch. Unlike the reference (which raises
        NotImplementedError for ComputeXLoss/ComputeTalLoss at
        trainer.py:320-327 despite shipping configs that use them —
        SURVEY.md §2.11), all three loss families are wired here."""
        loss_type = cfg.Loss.type
        # fail early on a head/loss family mismatch — the default
        # Loss.type is ComputeXLoss (reference defaults.py:135) which only
        # fits anchor-free heads; pairing it with an anchor head otherwise
        # surfaces as an opaque shape error deep inside the loss
        from ..models.heads import head_model_type

        mt = head_model_type(self.spec.head)
        if loss_type in ("ComputeXLoss", "ComputeFastXLoss",
                         "ComputeTalLoss") and mt == "yolov5":
            raise ValueError(
                f"Loss.type {loss_type!r} is anchor-free but head "
                f"{self.spec.head!r} is anchor-based — set Loss.type: "
                "'ComputeLoss' (every shipped anchor-head YAML does)"
            )
        self.loss_cfg = YoloV5LossConfig.from_cfg(cfg, nl=self.spec.nl)
        if loss_type == "ComputeLoss":
            anchors = self.anchors_grid
            lc = self.loss_cfg
            if cfg.Loss.assigner_type == "SimOTA":
                # anchor-based OTA branch (reference ComputeLoss.ota_loss,
                # loss.py:215-303; the yolov7s-simota config)
                from ..losses.yolov5_ota_loss import compute_ota_loss

                strides = self.spec.strides
                img = self.img_size
                top_k = int(cfg.Loss.top_k)  # reference loss.py:131-137

                def det_loss(raw, labels, mask):
                    return compute_ota_loss(raw, labels, mask, anchors,
                                            strides, img, lc, top_k=top_k)
            else:
                def det_loss(raw, labels, mask):
                    from ..losses.yolov5_loss import compute_loss

                    return compute_loss(raw, labels, mask, anchors, lc)

        elif loss_type in ("ComputeXLoss", "ComputeFastXLoss"):
            from ..losses.yolox_loss import YoloXLossConfig, compute_yolox_loss

            self.yolox_cfg = YoloXLossConfig.from_cfg(cfg)
            img = self.img_size
            xc = self.yolox_cfg

            def det_loss(raw, labels, mask):
                return compute_yolox_loss(raw, labels, mask, img, xc)

        elif loss_type == "ComputeTalLoss":
            from ..losses.tal_loss import TALLossConfig, compute_tal_loss

            self.tal_cfg = TALLossConfig.from_cfg(cfg)
            img = self.img_size
            tc = self.tal_cfg

            def det_loss(raw, labels, mask):
                return compute_tal_loss(raw, labels, mask, img, tc)

        else:
            raise NotImplementedError(f"Loss.type {loss_type!r}")
        self.detection_loss = det_loss

    def build_step(self):
        self.train_step = make_supervised_train_step(
            self.model, self.loss_cfg, self.anchors_grid, self.opt_cfg,
            norm_scale=float(self.cfg.Dataset.norm_scale),
            compute_dtype=self.compute_dtype,
            detection_loss=self.detection_loss,
            grad_masks=self.grad_masks,
        )

    # -- schedule -----------------------------------------------------------
    def _warmup_iters(self) -> int:
        if self.cfg.hyp.warmup_epochs > 0:
            nw = max(round(self.cfg.hyp.warmup_epochs * self.nb), 1000)
            return int(min(nw, (self.epochs - self.start_epoch) / 2 * self.nb))
        return -1

    def _schedule(self, ni: int) -> Schedule:
        s = self.opt_cfg.schedule(ni, self.epoch, self._warmup_iters())
        if self._warmup_iters() > 0 and ni <= self._warmup_iters():
            accumulate = max(
                1, round(np.interp(ni, [0, self._warmup_iters()],
                                   [1, 64 / self.batch_size]))
            )
        else:
            accumulate = self.accumulate
        return Schedule.make(
            s["lr_bias"], s["lr_rest"], s["momentum"], accumulate,
            ema_decay=0.9999,
        )

    # -- loop ---------------------------------------------------------------
    def before_epoch(self):
        if self.epoch == self.epochs - self.cfg.hyp.no_aug_epochs:
            LOGGER.info("closing mosaic augmentation")
            self.dataset.mosaic = False
            if getattr(self, "device_aug", False):
                self._aug_hyp["mosaic"] = 0.0
                self._build_device_aug()  # recompiles once
            if self.cfg.Loss.type in ("ComputeXLoss", "ComputeFastXLoss"):
                # yolox: enable the extra L1 term for the no-aug tail
                # (reference trainer.py:366-368)
                from ..losses.yolox_loss import (
                    YoloXLossConfig, compute_yolox_loss,
                )

                self.yolox_cfg = YoloXLossConfig.from_cfg(self.cfg, use_l1=True)
                img, xc = self.img_size, self.yolox_cfg
                self.detection_loss = (
                    lambda raw, labels, mask: compute_yolox_loss(
                        raw, labels, mask, img, xc
                    )
                )
                self.build_step()  # recompiles once
        self.meter = MetricMeter()

    def _build_device_aug(self):
        import functools

        from ..ops.augment_device import device_augment_batch

        self._device_aug_fn = jax.jit(functools.partial(
            device_augment_batch, hyp=dict(self._aug_hyp),
            max_out=int(self.cfg.Dataset.max_targets),
        ))

    def train_in_epoch(self):
        for i, batch in enumerate(self.train_loader):
            ni = i + self.nb * self.epoch
            if self.epoch == self.start_epoch and i < 3 and self.is_main:
                # first-batches mosaic plots (reference loggers plot_images
                # on the first 3 train batches, utils/loggers/__init__.py:88)
                try:
                    from ..utils.plots import plot_images

                    plot_images(
                        batch["images"], batch["labels"], batch["mask"],
                        self.save_dir / f"train_batch{i}.png",
                    )
                except Exception as e:
                    LOGGER.debug("train batch plot skipped: %s", e)
            sched = self._schedule(ni)
            if self.mesh is not None:
                # single host: device_put sharded over dp; multi host: each
                # process contributes its local shard of the global batch
                images, labels, mask = make_global_batch(
                    self.mesh,
                    (batch["images"], batch["labels"], batch["mask"]),
                    specs=[image_sharding(self.mesh).spec,
                           P("dp"), P("dp")],
                )
            else:
                images = jnp.asarray(batch["images"])
                labels = jnp.asarray(batch["labels"])
                mask = jnp.asarray(batch["mask"])
            if self.device_aug:
                key = jax.random.fold_in(jax.random.PRNGKey(0), ni)
                images, labels, mask = self._device_aug_fn(
                    key, images, labels.astype(jnp.float32), mask
                )
            self.state, parts = self.train_step(
                self.state, images, labels, mask, sched
            )
            if i % 50 == 0:
                self.meter.update(
                    {k: float(v) for k, v in parts.items() if k != "loss"}
                )
                LOGGER.info("epoch %d it %d/%d %s", self.epoch, i, self.nb,
                            self.meter)
            self.callbacks.run("on_train_batch_end")
            if self.stop.requested:
                break

    def after_epoch(self):
        results = (0.0, 0.0, 0.0, 0.0)
        if self.val_loader is not None and not self.noval:
            variables = {
                "params": self.state.ema.params,
                "batch_stats": self.state.ema.batch_stats,
            }
            results, maps, cls_thr = validator.run(
                self.model, variables, self.val_loader,
                nc=self.spec.nc,
                conf_thres=float(self.cfg.val_conf_thres),
                compute_dtype=self.compute_dtype,
                mesh=self.mesh,  # epoch-end val uses every chip (vs the
                # reference's rank-0-only val, trainer.py:445-457)
            )
            LOGGER.info(
                "epoch %d val P=%.4f R=%.4f mAP50=%.4f mAP=%.4f",
                self.epoch, *results,
            )
        fi = float(fitness(np.array([list(results)]))[0])
        if fi > self.best_fitness:
            self.best_fitness = fi
        if self.is_main:
            self._write_results_row(results, fi)
        if not self.nosave and self.is_main:
            self._save_ckpt("last.ckpt", fi)
            if fi == self.best_fitness:
                self._save_ckpt("best.ckpt", fi)
            if self.save_period > 0 and self.epoch % self.save_period == 0:
                self._save_ckpt(f"epoch{self.epoch}.ckpt", fi)
        metrics = {
            "metrics/precision": results[0],
            "metrics/recall": results[1],
            "metrics/mAP_0.5": results[2],
            "metrics/mAP_0.5:0.95": results[3],
            "x/lr0": self.opt_cfg.lr0 * self.opt_cfg.lf(self.epoch),
        }
        for k, meter in self.meter.meters.items():
            metrics[f"train/{k}_loss"] = meter.avg
        self.callbacks.run("on_fit_epoch_end", metrics, self.epoch)

    def _write_results_row(self, results, fi):
        new = not self.results_csv.exists()
        with open(self.results_csv, "a", newline="") as f:
            w = csv.writer(f)
            if new:
                w.writerow(RESULTS_KEYS)
            m = self.meter.meters
            w.writerow([
                self.epoch,
                m.get("box", None) and m["box"].avg or 0.0,
                m.get("obj", None) and m["obj"].avg or 0.0,
                m.get("cls", None) and m["cls"].avg or 0.0,
                *results, fi,
                self.opt_cfg.lr0 * self.opt_cfg.lf(self.epoch),
            ])

    def _save_ckpt(self, name: str, fi: float, epoch: Optional[int] = None):
        # async: on-device snapshot now, serialize+write on the ckpt-writer
        # thread (utils/checkpoint.py AsyncCheckpointer); the step loop
        # never blocks on the device->host pull or msgpack
        st = self.state
        self.checkpointer.save(
            self.save_dir / "weights" / name,
            params=st.params,
            batch_stats=st.batch_stats,
            ema_params=st.ema.params if st.ema else None,
            ema_batch_stats=st.ema.batch_stats if st.ema else None,
            ema_updates=int(st.ema.updates) if st.ema else 0,
            # optimizer momentum only rides in last.ckpt (resume source;
            # reference keeps it in last.pt and strips it from best)
            opt_state=st.opt if name == "last.ckpt" else None,
            epoch=self.epoch if epoch is None else epoch,
            best_fitness=self.best_fitness,
            cfg_yaml=self.cfg.dump(),
        )
        self.callbacks.run("on_model_save",
                           self.save_dir / "weights" / name,
                           self.epoch if epoch is None else epoch, fi, name)

    def profile_steps(self, n: int = 5, logdir: str | None = None):
        """Capture a jax.profiler trace of `n` train steps (the TPU-native
        replacement for the reference's hook-based profiler/timeline gap,
        SURVEY.md §5.1). View with xprof/tensorboard."""
        logdir = logdir or str(self.save_dir / "trace")
        batch = next(iter(self.train_loader))
        images = jnp.asarray(batch["images"])
        labels = jnp.asarray(batch["labels"])
        mask = jnp.asarray(batch["mask"])
        sched = self._schedule(0)
        self.state, parts = self.train_step(self.state, images, labels,
                                            mask, sched)  # compile first
        float(parts["loss"])
        jax.profiler.start_trace(logdir)
        for _ in range(n):
            self.state, parts = self.train_step(self.state, images, labels,
                                                mask, sched)
        float(parts["loss"])
        jax.profiler.stop_trace()
        LOGGER.info("profiler trace (%d steps) -> %s", n, logdir)
        return logdir

    def train(self):
        self.callbacks.run("on_train_start")
        # preemption (SIGTERM) / Ctrl-C: finish step, save, exit cleanly
        self.stop.install()
        t0 = time.time()
        try:
            for self.epoch in range(self.start_epoch, self.epochs):
                self.callbacks.run("on_train_epoch_start")
                self.before_epoch()
                self.train_in_epoch()
                if self.stop.requested:
                    LOGGER.warning(
                        "graceful stop at epoch %d: saving last.ckpt "
                        "(resume restarts this epoch), skipping val",
                        self.epoch)
                    if not self.nosave and self.is_main:
                        # epoch-1: the interrupted epoch is incomplete;
                        # resume (meta.epoch + 1, :210) must re-run it
                        self._save_ckpt("last.ckpt", self.best_fitness,
                                        epoch=self.epoch - 1)
                    break
                self.after_epoch()
        finally:
            # even on an epoch-loop exception: restore default signal
            # handlers (a leaked GracefulStop handler would swallow the
            # next Ctrl-C into a dangling flag) and join the async
            # checkpoint writer so a mid-write daemon isn't killed at
            # interpreter exit and a failed save's exception surfaces
            self.stop.uninstall()
            self.checkpointer.wait()  # last/best.ckpt durable before return
        LOGGER.info(
            "%d epochs in %.1f h, best fitness %.4f",
            self.epochs - self.start_epoch, (time.time() - t0) / 3600,
            self.best_fitness,
        )
        try:  # training curves (reference plot_results at train end)
            from ..utils.plots import plot_results

            if self.results_csv.exists():
                plot_results(self.results_csv)
        except Exception as e:
            LOGGER.debug("plot_results skipped: %s", e)
        self.callbacks.run("on_train_end")
        return self.best_fitness
