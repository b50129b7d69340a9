"""GSPMD spatial partitioning (dp x sp mesh, parallel/mesh.py).

Shards the image HEIGHT axis over an `sp` mesh axis in addition to dp;
XLA inserts the conv halo exchanges. No reference analogue (its DDP
replicates whole batches, train.py:52-59) — this is the TPU-native way
to scale past data parallelism when the per-chip batch is small.

Numerics background (measured on the 8-device virtual mesh):
- max-pool's XLA gradient (select-and-scatter) is WRONG under spatial
  sharding even at healthy shard sizes — fixed by the custom-VJP pools
  in ops/pool.py; the op-level test below pins that exactly.
- any sharded deep net (dp OR sp) drifts from the single-device run by
  chaotically-amplified reduction-reorder noise through train-mode BN
  chains (dp8 and dp4xsp2 measure the SAME drift, ~0.2 on surrogate
  grads at 128px) — so composed-model checks compare sp against the
  dp-noise envelope, not to machine epsilon.
- below 2 rows per sp shard at the deepest stride, halo exchange
  degrades (shard < halo): shard_images warns, tests stay at 128px+.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import flax.linen as nn

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.losses.yolov5_loss import YoloV5LossConfig
from efficientteacher_tpu.models import Model
from efficientteacher_tpu.models.spec import spec_from_cfg
from efficientteacher_tpu.ops.pool import (
    max_pool_2x2, max_pool_same, max_pool_strided,
)
from efficientteacher_tpu.parallel.mesh import (
    image_sharding, make_mesh, make_mesh_2d, replicate, shard_batch,
    shard_images,
)
from efficientteacher_tpu.train import (
    OptimizerConfig, Schedule, create_train_state,
    make_supervised_train_step,
)

from test_train_step import make_batch, tiny_cfg

SIZE = 128  # >=2 rows/shard at stride 32 under sp=2 (see module docstring)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh_2d(dp=4, sp=2)


def _setup128(cfg):
    spec = spec_from_cfg(cfg)
    model = Model(spec=spec, dtype=jnp.float32)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    oc = OptimizerConfig(lr0=0.01, epochs=10)
    state = create_train_state(variables["params"],
                               variables["batch_stats"], oc)
    lc = YoloV5LossConfig.from_cfg(cfg)
    anchors = np.asarray(spec.anchors, np.float32).reshape(3, 3, 2) / \
        np.array([8.0, 16.0, 32.0]).reshape(3, 1, 1)
    step = make_supervised_train_step(model, lc, anchors, oc)
    return model, state, step


def _cfg128():
    cfg = tiny_cfg()
    cfg.Dataset.img_size = SIZE
    return cfg


def _batch128(rng, b=8, m=8, nc=4):
    images, labels, mask = make_batch(rng, b=b, m=m, nc=nc)
    images = np.repeat(np.repeat(images, 2, axis=1), 2, axis=2)
    return images, labels, mask


def test_mesh_shape(mesh):
    assert dict(mesh.shape) == {"dp": 4, "sp": 2}
    # 1-D fallback: image_sharding degrades to dp-only
    assert image_sharding(make_mesh(8)).spec == jax.sharding.PartitionSpec(
        "dp")


def test_maxpool_grad_sharded(mesh):
    """Op-level pin of the GSPMD select-and-scatter gradient bug: the
    custom-VJP pools must be exact under sp sharding (XLA's builtin
    nn.max_pool gradient is not), and match the builtin on one device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 64, 64, 8)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", "sp")))

    for fn, builtin in (
        (lambda x: max_pool_same(x, 5),
         lambda x: nn.max_pool(x, (5, 5), strides=(1, 1),
                               padding=[(2, 2), (2, 2)])),
        (max_pool_2x2,
         lambda x: nn.max_pool(x, (2, 2), strides=(2, 2))),
        (lambda x: max_pool_strided(x, 3, 2),
         lambda x: nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])),
    ):
        g = jax.jit(jax.grad(lambda x, fn=fn: (fn(x) ** 2).mean()))
        ref = np.asarray(g(x))
        # exact under sharding (continuous inputs: no ties)
        np.testing.assert_allclose(np.asarray(g(xs)), ref, atol=1e-6)
        # and identical to XLA's own gradient on one device
        gb = jax.jit(jax.grad(
            lambda x, b=builtin: (b(x) ** 2).mean()))
        np.testing.assert_allclose(ref, np.asarray(gb(x)), atol=1e-6)
        # forward parity with the builtin
        np.testing.assert_array_equal(np.asarray(jax.jit(fn)(x)),
                                      np.asarray(jax.jit(builtin)(x)))


def test_spatial_forward_parity(mesh):
    """Eval-mode forward under sp sharding matches replicated forward
    tightly (no BN-chaos in eval: running stats are fixed)."""
    cfg = _cfg128()
    model, state, _ = _setup128(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (8, SIZE, SIZE, 3)),
        jnp.float32)

    @jax.jit
    def fwd(params, bs, x):
        return model.apply({"params": params, "batch_stats": bs}, x,
                           train=False, decode=False)

    ref = fwd(state.params, state.batch_stats, x)
    st = replicate(mesh, (state.params, state.batch_stats))
    out = fwd(*st, shard_images(mesh, x))
    for r, o in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o), atol=2e-5)


def test_images_stay_sharded(mesh):
    """The input sharding must survive into device placement (N/4 batch,
    H/2 rows per shard) so the conv halo-exchange path is actually
    exercised."""
    imgs = jnp.zeros((8, SIZE, SIZE, 3), jnp.uint8)
    img_s = shard_images(mesh, imgs)
    shard_shapes = {s.data.shape for s in img_s.addressable_shards}
    assert shard_shapes == {(2, SIZE // 2, SIZE, 3)}


def test_small_shard_warns():
    mesh = make_mesh_2d(dp=4, sp=2)
    with pytest.warns(UserWarning, match="spatial sharding"):
        shard_images(mesh, jnp.zeros((8, 64, 64, 3), jnp.uint8))


def test_spatial_step_within_dp_noise(mesh):
    """Full supervised train step under dp x sp: loss matches the
    single-device step tightly, and the updated params deviate no more
    than the dp-only sharded step's own deviation (both drifts are
    reduction-reorder noise through train-BN; a real partitioning bug —
    e.g. the pre-fix maxpool — exceeds the dp envelope by >100x)."""
    cfg = _cfg128()
    rng = np.random.default_rng(3)
    images, labels, mask = _batch128(rng)
    sched = Schedule.make(0.01, 0.01, 0.937, 1)

    def run(kind):
        _, state, step = _setup128(cfg)
        if kind == "single":
            s, parts = step(state, jnp.asarray(images), jnp.asarray(labels),
                            jnp.asarray(mask), sched)
        elif kind == "dp":
            m = make_mesh(8)
            state = replicate(m, state)
            sb = shard_batch(m, (jnp.asarray(images), jnp.asarray(labels),
                                 jnp.asarray(mask)))
            s, parts = step(state, *sb, sched)
        else:
            state = replicate(mesh, state)
            img = shard_images(mesh, jnp.asarray(images))
            lab, msk = shard_batch(mesh, (jnp.asarray(labels),
                                          jnp.asarray(mask)))
            s, parts = step(state, img, lab, msk, sched)
        return s, float(parts["loss"])

    s1, l1 = run("single")
    s2, l2 = run("dp")
    s3, l3 = run("sp")
    np.testing.assert_allclose(l1, l3, rtol=1e-3)

    def maxdiff(a, b):
        return max(
            float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    dp_noise = maxdiff(s1.params, s2.params)
    sp_noise = maxdiff(s1.params, s3.params)
    assert sp_noise <= 20 * dp_noise + 1e-3, (
        f"sp step drift {sp_noise:.3e} far exceeds dp noise envelope "
        f"{dp_noise:.3e}: spatial partitioning is numerically broken")
    # BN running stats reduce over the H-sharded activations — still the
    # global reduction, tight
    assert maxdiff(s1.batch_stats, s3.batch_stats) < 1e-4


def test_ssod_step_spatial(mesh):
    """The full SSOD train step (teacher forward + on-device pseudo
    labels + student losses + optimizer + EMA chain) under dp x sp:
    loss matches the single-device step and the pseudo-label count is
    identical (NMS operates on decoded boxes, which GSPMD gathers off
    the H-sharded maps)."""
    from efficientteacher_tpu.losses.ssod_loss import SSODLossConfig
    from efficientteacher_tpu.models import build_model
    from efficientteacher_tpu.train.ssod_step import (
        create_ssod_train_state, make_ssod_train_step,
        seed_teacher_from_ema,
    )
    from efficientteacher_tpu.train import OptimizerConfig, Schedule

    cfg = _cfg128()
    cfg.SSOD.train_domain = True
    cfg.SSOD.with_da_loss = True
    spec = spec_from_cfg(cfg)
    model = build_model(spec, ssod=True, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    oc = OptimizerConfig(lr0=0.01, epochs=10)
    anchors = np.asarray(spec.anchors, np.float32).reshape(3, 3, 2) / \
        np.array([8.0, 16.0, 32.0]).reshape(3, 1, 1)
    step = make_ssod_train_step(
        model, YoloV5LossConfig.from_cfg(cfg), SSODLossConfig.from_cfg(cfg),
        anchors, oc, spec, nms_conf_thres=0.001, nms_iou_thres=0.6,
        max_pl=16, multi_label=False, teacher_loss_weight=0.5,
        da_loss_weight=0.1, with_da_loss=True, compute_dtype=jnp.float32,
    )

    rng = np.random.default_rng(5)
    b = 8
    images = jnp.asarray(rng.integers(0, 255, (b, SIZE, SIZE, 3), np.uint8))
    labels = np.zeros((b, 8, 5), np.float32)
    mask = np.zeros((b, 8), bool)
    labels[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    mask[:, 0] = True
    labels, mask = jnp.asarray(labels), jnp.asarray(mask)
    m_s = np.zeros((b, 13), np.float32)
    m_s[:, 1:10] = np.eye(3).reshape(-1)
    m_s[:, 10] = 1.0
    m_s = jnp.asarray(m_s)
    thr = (jnp.full((4,), 0.001), jnp.full((4,), 0.0005))
    sched = Schedule.make(0.01, 0.01, 0.937, 1)

    def run(spatial):
        state = create_ssod_train_state(
            jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables["batch_stats"]), oc)
        state = seed_teacher_from_ema(state)
        if spatial:
            state = replicate(mesh, state)
            img = shard_images(mesh, images)
            lab, msk, ms = shard_batch(mesh, (labels, mask, m_s))
            th = replicate(mesh, thr)
            st, out = step(state, img, lab, msk, img, img, ms,
                           *th, sched, jnp.float32(0.999))
        else:
            st, out = step(state, images, labels, mask, images, images,
                           m_s, *thr, sched, jnp.float32(0.999))
        return float(out.metrics["total"]), int(out.pseudo_count)

    loss1, pl1 = run(False)
    loss2, pl2 = run(True)
    assert pl1 == pl2 and pl1 > 0
    np.testing.assert_allclose(loss1, loss2, rtol=2e-3)


def test_trainer_sp_smoke(tmp_path):
    """End-to-end: Trainer with cfg.sp=2 builds a dp4 x sp2 mesh, places
    images P('dp','sp'), and runs a real epoch."""
    import cv2

    root = tmp_path / "data"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rng = np.random.default_rng(7)
    paths = []
    for i in range(8):
        img = np.full((140, 140, 3), 70, np.uint8)
        cx, cy = rng.uniform(0.35, 0.65, 2)
        bw, bh = rng.uniform(0.25, 0.4, 2)
        cv2.rectangle(
            img,
            (int((cx - bw / 2) * 140), int((cy - bh / 2) * 140)),
            (int((cx + bw / 2) * 140), int((cy + bh / 2) * 140)),
            (0, 0, 255), -1)
        p = root / "images" / f"l{i}.jpg"
        cv2.imwrite(str(p), img)
        (root / "labels" / f"l{i}.txt").write_text(
            f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n")
        paths.append(str(p))
    (root / "train.txt").write_text("\n".join(paths))

    from efficientteacher_tpu.train.trainer import Trainer

    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Dataset.train = str(root / "train.txt")
    cfg.Dataset.val = ""
    cfg.Loss.type = "ComputeLoss"
    cfg.Dataset.nc = 1
    cfg.Dataset.names = ["obj"]
    cfg.Dataset.img_size = SIZE
    cfg.Dataset.batch_size = 4
    cfg.Dataset.max_targets = 16
    cfg.Dataset.workers = 1
    cfg.hyp.warmup_epochs = 0
    cfg.epochs = 1
    cfg.noval = True
    cfg.nosave = True
    cfg.noautoanchor = True
    cfg.project = str(tmp_path / "runs")
    cfg.name = "sp_smoke"
    cfg.sp = 2
    cfg.freeze()
    t = Trainer(cfg, compute_dtype=jnp.float32)
    assert dict(t.mesh.shape) == {"dp": 4, "sp": 2}
    t.train()
    assert int(t.state.step) >= 1
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(t.state.params)[0])))
