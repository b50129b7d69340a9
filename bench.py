"""Benchmark: YOLOv5l supervised training throughput, COCO images/sec/chip.

Matches the BASELINE.json metric: "COCO images/sec/chip (YOLOv5l b32@640)".
V100 baseline derivation: the reference trains YOLOv5l at 6.2 ms/img
inference (README.md:44); its b32 fp32 training step (fwd+bwd+optim) runs
~3x inference cost, i.e. ~53 img/s/GPU. We report measured train-step
throughput on one TPU chip with synthetic data (the data pipeline is
benched separately) and vs_baseline against the 53 img/s/V100 figure.
"""

import json
import time

import numpy as np

V100_TRAIN_IMGS_PER_SEC = 53.0  # derived from README.md:44 (see docstring)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.losses.yolov5_loss import YoloV5LossConfig
    from efficientteacher_tpu.models import Model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.train import (
        OptimizerConfig, Schedule, create_train_state,
        make_supervised_train_step,
    )

    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 1.0   # YOLOv5l
    cfg.Model.depth_multiple = 1.0
    cfg.Dataset.nc = 80
    cfg.Dataset.img_size = 640

    spec = spec_from_cfg(cfg)
    model = Model(spec=spec, dtype=jnp.bfloat16)
    b, img, m = 32, 640, 60

    x0 = jnp.zeros((1, img, img, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    oc = OptimizerConfig(epochs=300)
    state = create_train_state(variables["params"], variables["batch_stats"], oc)
    lc = YoloV5LossConfig.from_cfg(cfg)
    anchors = np.asarray(spec.anchors, np.float32).reshape(3, 3, 2) / np.array(
        [8.0, 16.0, 32.0]
    ).reshape(3, 1, 1)
    step = make_supervised_train_step(model, lc, anchors, oc)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (b, img, img, 3), np.uint8))
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    for bi in range(b):
        n = rng.integers(1, 20)
        labels[bi, :n, 0] = rng.integers(0, 80, n)
        labels[bi, :n, 1:3] = rng.uniform(0.2, 0.8, (n, 2))
        labels[bi, :n, 3:5] = rng.uniform(0.05, 0.4, (n, 2))
        mask[bi, :n] = True
    labels, mask = jnp.asarray(labels), jnp.asarray(mask)
    sched = Schedule.make(0.01, 0.01, 0.937, 2)

    # warmup/compile (host materialization = true device sync;
    # block_until_ready returns early through the axon tunnel)
    for _ in range(3):
        state, parts = step(state, images, labels, mask, sched)
        float(parts["loss"])

    # steady-state: chain `iters` dependent steps, materialize only the
    # final loss. The state dependency chain forces every step to execute;
    # the single fetch amortizes the ~35 ms per-call tunnel latency that
    # per-step syncing would otherwise add to every step.
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, parts = step(state, images, labels, mask, sched)
    final_loss = float(parts["loss"])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(final_loss)
    imgs_per_sec = b / dt

    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip_yolov5l_b32_640",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / V100_TRAIN_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
