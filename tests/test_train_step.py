"""Supervised train step: loss decreases, EMA tracks, DP sharding works on
the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.losses.yolov5_loss import YoloV5LossConfig
from efficientteacher_tpu.models import Model
from efficientteacher_tpu.models.spec import spec_from_cfg
from efficientteacher_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from efficientteacher_tpu.train import (
    OptimizerConfig,
    Schedule,
    create_train_state,
    make_supervised_train_step,
)


def tiny_cfg():
    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Dataset.nc = 4
    cfg.Dataset.img_size = 64
    return cfg


def make_batch(rng, b=8, m=8, nc=4):
    images = rng.integers(0, 255, (b, 64, 64, 3), np.uint8)
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    for bi in range(b):
        for k in range(3):
            labels[bi, k] = [
                rng.integers(0, nc),
                *rng.uniform(0.3, 0.7, 2),
                *rng.uniform(0.2, 0.5, 2),
            ]
            mask[bi, k] = True
    return images, labels, mask


def _setup(cfg, dtype=jnp.float32):
    spec = spec_from_cfg(cfg)
    model = Model(spec=spec, dtype=dtype)
    x0 = jnp.zeros((1, 64, 64, 3), dtype)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    oc = OptimizerConfig(lr0=0.01, epochs=10)
    state = create_train_state(variables["params"], variables["batch_stats"], oc)
    lc = YoloV5LossConfig.from_cfg(cfg)
    anchors = np.asarray(spec.anchors, np.float32).reshape(3, 3, 2) / np.array(
        [8.0, 16.0, 32.0]
    ).reshape(3, 1, 1)
    step = make_supervised_train_step(model, lc, anchors, oc,
                                      compute_dtype=dtype)
    return model, state, step


def test_loss_decreases_single_device():
    cfg = tiny_cfg()
    model, state, step = _setup(cfg)
    rng = np.random.default_rng(0)
    images, labels, mask = make_batch(rng)
    sched = Schedule.make(0.01, 0.01, 0.937, 1)
    losses = []
    for i in range(12):
        state, parts = step(state, jnp.asarray(images), jnp.asarray(labels),
                            jnp.asarray(mask), sched)
        losses.append(float(parts["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
    # EMA counters advanced (accumulate=1 -> every step)
    assert int(state.ema.updates) == 12
    assert int(state.opt.step) == 12


def test_gradient_accumulation():
    cfg = tiny_cfg()
    model, state, step = _setup(cfg)
    rng = np.random.default_rng(1)
    images, labels, mask = make_batch(rng)
    sched = Schedule.make(0.01, 0.01, 0.937, 4)  # accumulate 4
    for i in range(8):
        state, _ = step(state, jnp.asarray(images), jnp.asarray(labels),
                        jnp.asarray(mask), sched)
    assert int(state.opt.step) == 2        # 8 micro / 4 = 2 optimizer steps
    assert int(state.ema.updates) == 2
    assert int(state.acc_count) == 0


def test_dp_sharded_train_step():
    """Train step over the 8-device virtual mesh; params replicated, batch
    sharded on dp. Also checks the result matches single-device numerics."""
    assert jax.device_count() >= 8
    cfg = tiny_cfg()
    model, state, step = _setup(cfg)
    rng = np.random.default_rng(2)
    images, labels, mask = make_batch(rng)
    sched = Schedule.make(0.01, 0.01, 0.937, 1)

    # single-device result
    s1, parts1 = step(state, jnp.asarray(images), jnp.asarray(labels),
                      jnp.asarray(mask), sched)
    loss1 = float(parts1["loss"])

    # sharded result
    _, state2, step2 = _setup(cfg)
    mesh = make_mesh(8)
    state2 = replicate(mesh, state2)
    sb = shard_batch(mesh, (jnp.asarray(images), jnp.asarray(labels),
                            jnp.asarray(mask)))
    s2, parts2 = step2(state2, *sb, sched)
    loss2 = float(parts2["loss"])
    assert np.isfinite(loss2)
    np.testing.assert_allclose(loss1, loss2, rtol=1e-3)
    # updated params agree modulo cross-device reduction-order float noise
    p1 = jax.tree.leaves(s1.params)[0]
    p2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
