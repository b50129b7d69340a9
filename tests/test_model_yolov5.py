import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.models import Model, SSODModel, build_model, grad_reverse
from efficientteacher_tpu.models.spec import spec_from_cfg


def yolov5_cfg(width=0.25, depth=0.34, nc=8, img=64):
    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = width
    cfg.Model.depth_multiple = depth
    cfg.Dataset.nc = nc
    cfg.Dataset.img_size = img
    return cfg


def test_forward_shapes_train_and_eval():
    cfg = yolov5_cfg()
    model = Model(spec=spec_from_cfg(cfg))
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # eval: (decoded, raw)
    decoded, raw = model.apply(variables, x, train=False)
    na, no = 3, 5 + 8
    assert len(raw) == 3
    assert raw[0].shape == (2, 8, 8, na, no)    # stride 8 on 64px
    assert raw[1].shape == (2, 4, 4, na, no)
    assert raw[2].shape == (2, 2, 2, na, no)
    n_total = na * (8 * 8 + 4 * 4 + 2 * 2)
    assert decoded.shape == (2, n_total, no)

    # train: raw maps only
    out = model.apply(
        variables, x, train=True, decode=False,
        mutable=["batch_stats"], rngs={},
    )
    raw_t, _ = out
    assert len(raw_t) == 3


def test_decode_geometry():
    """Decoded xy must land inside the image; wh positive and bounded."""
    cfg = yolov5_cfg()
    model = Model(spec=spec_from_cfg(cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    decoded, _ = model.apply(variables, x, train=False)
    d = np.asarray(decoded)[0]
    xy, wh = d[:, :2], d[:, 2:4]
    assert (xy > -16).all() and (xy < 64 + 16).all()
    assert (wh >= 0).all()
    obj = d[:, 4]
    assert (obj >= 0).all() and (obj <= 1).all()
    # bias prior: freshly-initialized obj should be low (log(8/(640/s)^2))
    assert obj.mean() < 0.2


def _param_count(cfg):
    """Count params via eval_shape (no compile — fast on 1-core CPU)."""
    x = jnp.zeros((1, 64, 64, 3))
    model = Model(spec=spec_from_cfg(cfg))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False)
    )
    return sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"])
    )


def test_width_depth_scaling():
    n_s = _param_count(yolov5_cfg(width=0.5, depth=0.33))
    n_l = _param_count(yolov5_cfg(width=1.0, depth=1.0))
    assert n_l > 3 * n_s


def test_yolov5l_param_count():
    """YOLOv5l reference: 46.56M params (BASELINE.md). Ours counts params
    only (BN stats excluded); expect within 2%."""
    n = _param_count(yolov5_cfg(width=1.0, depth=1.0, nc=80))
    assert abs(n - 46.56e6) / 46.56e6 < 0.02, f"got {n/1e6:.2f}M params"


def test_ssod_model_domain_outputs():
    cfg = yolov5_cfg()
    cfg.SSOD.train_domain = True
    model = build_model(cfg)
    assert isinstance(model, SSODModel)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (decoded, raw), domain = model.apply(variables, x, train=False)
    assert len(domain) == 3
    assert domain[0].shape == (2, 8, 8, 2)
    assert domain[2].shape == (2, 2, 2, 2)


def test_grad_reverse():
    f = lambda x: jnp.sum(grad_reverse(x) * 3.0)
    g = jax.grad(f)(jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(g), -3.0)
