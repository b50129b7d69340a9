"""DetectBackend facade (ckpt + deploy + saved_model) and LoadImages."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.data.loaders import LoadImages
from efficientteacher_tpu.eval.multi_backend import DetectBackend
from efficientteacher_tpu.models import Model
from efficientteacher_tpu.models.spec import spec_from_cfg
from efficientteacher_tpu.utils.checkpoint import save_checkpoint


def tiny_cfg():
    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Dataset.nc = 3
    cfg.Dataset.img_size = 64
    return cfg


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    cfg = tiny_cfg()
    spec = spec_from_cfg(cfg)
    model = Model(spec=spec, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
                           train=False)
    path = tmp_path_factory.mktemp("w") / "m.ckpt"
    save_checkpoint(path, params=variables["params"],
                    batch_stats=variables["batch_stats"], half=False)
    return str(path)


def test_backend_ckpt(ckpt_path):
    be = DetectBackend(ckpt_path, tiny_cfg())
    assert be.kind == "ckpt"
    out = be(np.zeros((2, 64, 64, 3), np.uint8))
    assert out.shape == (2, 3 * (8 * 8 + 4 * 4 + 2 * 2), 5 + 3)
    assert np.isfinite(out).all()
    be.warmup((1, 64, 64, 3))


def test_load_images(tmp_path):
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"i{i}.jpg"),
                    np.full((100, 80, 3), 100, np.uint8))
    li = LoadImages(str(tmp_path), img_size=64)
    items = list(li)
    assert len(items) == 3
    path, rgb, img0, rp = items[0]
    assert rgb.shape == (64, 64, 3)
    assert img0.shape == (100, 80, 3)


def test_autoshape(ckpt_path, tmp_path):
    """AutoShape end-user wrapper: paths and arrays in, Detections out."""
    from efficientteacher_tpu.models.autoshape import AutoShape
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.models import build_model
    from efficientteacher_tpu.utils.checkpoint import load_eval_variables

    cfg = tiny_cfg()
    spec = spec_from_cfg(cfg)
    model = build_model(spec, ssod=False, dtype=jnp.bfloat16)
    variables = load_eval_variables(ckpt_path)
    sh = AutoShape(model, variables, spec, names=["a", "b", "c"], img_size=64)

    img_file = tmp_path / "x.jpg"
    cv2.imwrite(str(img_file), np.full((90, 70, 3), 120, np.uint8))
    dets = sh([str(img_file), np.full((50, 80, 3), 90, np.uint8)])
    assert len(dets) == 2
    assert isinstance(dets.xyxy, list) and isinstance(dets.xywh, list)
    rendered = dets.render()
    assert rendered[0].shape == (90, 70, 3)
    dets.save(tmp_path / "out")
    assert (tmp_path / "out" / "image0.jpg").exists()
    dets.print()


def test_backend_torchscript(tmp_path):
    """.torchscript files (reference export_torchscript output) run through
    torch CPU with the NCHW contract."""
    torch = pytest.importorskip("torch")

    class Tiny(torch.nn.Module):
        def forward(self, x):
            b = x.shape[0]
            flat = x.mean(dim=(1, 2, 3)).reshape(b, 1, 1)
            return (flat * torch.ones(b, 84, 9)), None

    m = torch.jit.script(Tiny())
    p = tmp_path / "tiny.torchscript"
    m.save(str(p))

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.eval.multi_backend import DetectBackend

    cfg = get_cfg()
    cfg.Dataset.nc = 4
    be = DetectBackend(str(p), cfg)
    assert be.kind == "torchscript"
    out = be(np.full((2, 8, 8, 3), 255, np.uint8))
    assert out.shape == (2, 84, 9)
    np.testing.assert_allclose(out, 1.0, atol=1e-5)  # mean(255/255) == 1


def test_rescale_tf_guard_pixel_scale_passthrough():
    """TF-family outputs are normalized xywh and get re-scaled to pixels
    (reference utils/detect_multi_backend.py:312); a pre-contract artifact
    that already emits pixel coords must pass through UNCHANGED (not be
    silently double-scaled)."""
    from efficientteacher_tpu.eval.multi_backend import DetectBackend

    images = np.zeros((1, 64, 64, 3), np.uint8)
    norm = np.zeros((1, 5, 9), np.float32)
    norm[..., :4] = 0.5
    out = DetectBackend._rescale_tf(norm.copy(), images)
    np.testing.assert_allclose(out[..., :4], 32.0)  # 0.5 * 64

    pixel = np.zeros((1, 5, 9), np.float32)
    pixel[..., :4] = 48.0  # pixel-scale: > half the 64px input size
    out = DetectBackend._rescale_tf(pixel.copy(), images)
    np.testing.assert_allclose(out, pixel)
