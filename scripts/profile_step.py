"""Profile a train step on the current backend and print an XLA-level
attribution report (utils/xprof.py): category buckets (conv fwd/bwd,
copies, fusions) + top device events joined to HLO op_name metadata.

TPU-native replacement for the reference's layer profiler
(utils/profile.py:1-103, utils/torch_utils.py profile).

Usage (TPU):
    python scripts/profile_step.py [--model yolov5l] [--batch 32]
        [--img 640] [--steps 3] [--ssod]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov5l",
                    choices=["yolov5s", "yolov5m", "yolov5l"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--logdir", default=None,
                    help="keep the raw trace here (default: temp dir)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.losses.yolov5_loss import YoloV5LossConfig
    from efficientteacher_tpu.models import Model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.train import (
        OptimizerConfig, Schedule, create_train_state,
        make_supervised_train_step,
    )
    from efficientteacher_tpu.utils import xprof

    wd = {"yolov5s": (0.5, 0.33), "yolov5m": (0.75, 0.67),
          "yolov5l": (1.0, 1.0)}[args.model]
    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple, cfg.Model.depth_multiple = wd
    cfg.Dataset.nc = 80
    cfg.Dataset.img_size = args.img

    spec = spec_from_cfg(cfg)
    model = Model(spec=spec, dtype=jnp.bfloat16)
    b, img, m = args.batch, args.img, 60
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, img, img, 3), jnp.bfloat16),
                           train=False)
    oc = OptimizerConfig(epochs=300)
    state = create_train_state(variables["params"], variables["batch_stats"],
                               oc)
    lc = YoloV5LossConfig.from_cfg(cfg)
    anchors = (np.asarray(spec.anchors, np.float32).reshape(3, 3, 2)
               / np.array([8.0, 16.0, 32.0]).reshape(3, 1, 1))
    step = make_supervised_train_step(model, lc, anchors, oc)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (b, img, img, 3), np.uint8))
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    for bi in range(b):
        n = int(rng.integers(1, 20))
        labels[bi, :n, 0] = rng.integers(0, 80, n)
        labels[bi, :n, 1:3] = rng.uniform(0.2, 0.8, (n, 2))
        labels[bi, :n, 3:5] = rng.uniform(0.05, 0.4, (n, 2))
        mask[bi, :n] = True
    labels, mask = jnp.asarray(labels), jnp.asarray(mask)
    sched = Schedule.make(0.01, 0.01, 0.937, 2)

    st = state
    for _ in range(8):  # compile + tunnel warm (CLAUDE.md first-loop bias)
        st, parts = step(st, images, labels, mask, sched)
        float(parts["loss"])

    def run():
        nonlocal st
        st, parts = step(st, images, labels, mask, sched)
        float(parts["loss"])

    plane = "TPU" if jax.default_backend() != "cpu" else "/host:CPU"
    events = xprof.capture(run, steps=args.steps, logdir=args.logdir,
                           plane_filter=plane)
    hlo = step.lower(st, images, labels, mask, sched).compile().as_text()
    print(xprof.format_report(events, hlo, steps=args.steps, n=args.top))


if __name__ == "__main__":
    main()
