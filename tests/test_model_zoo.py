"""Every reference config in the supervised zoo must build a model and run a
jitted forward with correct output shapes (the 'YAML swap' capability,
BASELINE config 5)."""

import glob

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.models import build_model
from efficientteacher_tpu.models.spec import spec_from_cfg

REF_CONFIGS = sorted(glob.glob("/root/reference/configs/sup/public/*.yaml"))


def _shrunk_spec(path):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    # shrink for CPU test speed
    cfg.Model.width_multiple = max(0.125, cfg.Model.width_multiple * 0.25)
    cfg.Model.depth_multiple = min(cfg.Model.depth_multiple, 0.34)
    cfg.Dataset.nc = 4
    cfg.Dataset.img_size = 64
    return spec_from_cfg(cfg)


@pytest.mark.parametrize(
    "path", REF_CONFIGS, ids=[p.split("/")[-1] for p in REF_CONFIGS]
)
def test_zoo_config_builds_and_runs(path):
    spec = _shrunk_spec(path)
    model = build_model(spec, ssod=False)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    decoded, raw = model.apply(variables, x, train=False)
    assert len(raw) == 3
    # anchor heads: na from anchors; anchor-free: na=1
    n_total = sum(r.shape[1] * r.shape[2] * r.shape[3] for r in raw)
    assert decoded.shape[1] == n_total
    assert np.isfinite(np.asarray(decoded)).all()


def test_resnet_backbone_builds():
    cfg = get_cfg()
    cfg.Model.Backbone.name = "ResNet50"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [512, 1024, 2048]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 1.0
    cfg.Model.depth_multiple = 0.34
    cfg.Dataset.nc = 4
    cfg.Dataset.img_size = 64
    model = build_model(spec_from_cfg(cfg), ssod=False)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    decoded, raw = model.apply(variables, x, train=False)
    assert len(raw) == 3
