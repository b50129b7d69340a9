"""RepVGG deploy fusion: fused single-conv model must reproduce the trained
multi-branch model's outputs."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.models import Model
from efficientteacher_tpu.models.common import RepVGGBlock
from efficientteacher_tpu.models.spec import spec_from_cfg
from efficientteacher_tpu.utils.reparam import (
    fuse_conv_bn,
    fuse_repvgg_block,
    fuse_repvgg_tree,
)


def test_fuse_conv_bn_math():
    rng = np.random.default_rng(0)
    k = rng.normal(0, 0.1, (3, 3, 4, 8)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    bias = rng.normal(0, 0.1, 8).astype(np.float32)
    mean = rng.normal(0, 0.5, 8).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    x = rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)

    y_ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y_ref = (y_ref - mean) / np.sqrt(var + 1e-3) * scale + bias

    kf, bf = fuse_conv_bn(k, scale, bias, mean, var, 1e-3)
    y_fused = jax.lax.conv_general_dilated(
        x, kf, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bf
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=1e-4)


def test_repvgg_block_fusion():
    """Trained 3-branch block == fused single-conv block, elementwise."""
    block = RepVGGBlock(8, s=1, act="relu")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    variables = block.init(jax.random.PRNGKey(1), x, train=False)
    # randomize BN stats so the fusion is non-trivial
    rng = np.random.default_rng(2)
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape), a.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    want = block.apply(variables, x, train=False)

    k, b = fuse_repvgg_block(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]),
    )
    deploy = RepVGGBlock(8, s=1, act="relu", deploy=True)
    got = deploy.apply(
        {"params": {"rbr_reparam": {"kernel": jnp.asarray(k),
                                    "bias": jnp.asarray(b)}}},
        x, train=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_full_v6_model_fusion():
    """Whole YOLOv6 model: deploy tree reproduces trained outputs."""
    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV6"
    cfg.Model.Neck.name = "YoloV6"
    cfg.Model.Head.name = "YoloV6"
    cfg.Model.Backbone.out_channels = [64, 128, 256, 512, 1024]
    cfg.Model.Backbone.num_repeats = [1, 6, 12, 18, 6]
    cfg.Model.Neck.num_repeats = [12, 12, 12, 12]
    cfg.Model.Neck.out_channels = [256, 128, 128, 256, 256, 512]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.2
    cfg.Model.anchors = [1]
    cfg.Loss.reg_max = 8
    cfg.Dataset.nc = 4
    cfg.Dataset.img_size = 64
    spec = spec_from_cfg(cfg)

    model = Model(spec=spec)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    rng = np.random.default_rng(3)
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.8, 1.2, a.shape), a.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    want, _ = model.apply(variables, x, train=False)

    fused_p, fused_bs = fuse_repvgg_tree(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]),
    )
    deploy_model = Model(spec=dataclasses.replace(spec, deploy=True))
    got, _ = deploy_model.apply(
        {"params": jax.tree.map(jnp.asarray, fused_p),
         "batch_stats": jax.tree.map(jnp.asarray, fused_bs)},
        x, train=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-3, rtol=1e-3)
