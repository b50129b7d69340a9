"""Direct ONNX export (efficientteacher_tpu/export/onnx_jaxpr.py) verified
end-to-end: the emitted file is parsed and EXECUTED by cv2.dnn
(an independent ONNX implementation) and compared against the jax forward.

Covers what the reference's torch.onnx.export path covers
(deploy/model_convert.py:75-130): full decoded detector graphs, NCHW
float input -> (B, N, 5+nc) output.
"""

import dataclasses

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from efficientteacher_tpu.configs import get_cfg  # noqa: E402
from efficientteacher_tpu.export import export_onnx  # noqa: E402
from efficientteacher_tpu.models import build_model  # noqa: E402
from efficientteacher_tpu.models.spec import spec_from_cfg  # noqa: E402


def _tiny_cfg(backbone, neck, head, img=96, nc=7):
    cfg = get_cfg()
    cfg.Model.Backbone.name = backbone
    cfg.Model.Neck.name = neck
    cfg.Model.Head.name = head
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Dataset.nc = nc
    cfg.Dataset.img_size = img
    return cfg


def _roundtrip(cfg, tmp_path, deploy=False, atol=2e-4):
    spec = spec_from_cfg(cfg)
    if deploy:
        spec = dataclasses.replace(spec, deploy=True)
    model = build_model(spec, ssod=False, dtype=jnp.float32)
    img = int(cfg.Dataset.img_size)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, img, img, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def fwd(x_nchw):
        xh = jnp.transpose(x_nchw, (0, 2, 3, 1))
        decoded, _ = model.apply(variables, xh, train=False)
        return decoded

    xn = np.asarray(jnp.transpose(x, (0, 3, 1, 2)))
    ref = np.asarray(fwd(jnp.asarray(xn)))
    path = str(tmp_path / "m.onnx")
    export_onnx(fwd, (jnp.asarray(xn),), path,
                input_names=["images"], output_names=["output"])
    net = cv2.dnn.readNetFromONNX(path)
    net.setInput(xn)
    out = net.forward()
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=atol)
    return path


def test_yolov5_decoded_cv2_parity(tmp_path):
    _roundtrip(_tiny_cfg("YoloV5", "YoloV5", "YoloV5"), tmp_path)


@pytest.mark.slow
def test_yolox_decoded_cv2_parity(tmp_path):
    _roundtrip(_tiny_cfg("YoloV5", "YoloV5", "YoloX"), tmp_path)


@pytest.mark.slow
def test_yolov6_deploy_cv2_parity(tmp_path):
    # RepVGG-fused graph + ConvTranspose upsample
    _roundtrip(_tiny_cfg("YoloV6", "YoloV6", "YoloV6"), tmp_path,
               deploy=True)


@pytest.mark.slow
def test_yolov7_decoded_cv2_parity(tmp_path):
    _roundtrip(_tiny_cfg("YoloV7", "YoloV7", "YoloV7"), tmp_path,
               atol=5e-4)


@pytest.mark.slow
def test_yolov8_decoded_cv2_parity(tmp_path):
    _roundtrip(_tiny_cfg("YoloV8", "YoloV8", "YoloV8"), tmp_path)


def test_multi_backend_roundtrip(tmp_path):
    """Our exported .onnx loads through our own DetectMultiBackend and
    matches the native ckpt backend on uint8 input."""
    from efficientteacher_tpu.eval.multi_backend import DetectBackend

    cfg = _tiny_cfg("YoloV5", "YoloV5", "YoloV5")
    spec = spec_from_cfg(cfg)
    model = build_model(spec, ssod=False, dtype=jnp.float32)
    img = int(cfg.Dataset.img_size)
    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (1, img, img, 3), np.uint8)
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def fwd(x_nchw):
        xh = jnp.transpose(x_nchw, (0, 2, 3, 1))
        decoded, _ = model.apply(variables, xh, train=False)
        return decoded

    ref = np.asarray(fwd(jnp.asarray(
        images.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)))
    path = str(tmp_path / "m.onnx")
    export_onnx(fwd, (jnp.zeros((1, 3, img, img), jnp.float32),), path)
    backend = DetectBackend(path, cfg)
    out = backend(images)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_bn_folding_produces_flat_conv_graph(tmp_path):
    """The affine-fold pass must leave no standalone BN arithmetic around
    convs: count ops in the emitted yolov5 graph."""
    cfg = _tiny_cfg("YoloV5", "YoloV5", "YoloV5")
    path = _roundtrip(cfg, tmp_path)
    data = open(path, "rb").read()
    # cheap op census without an onnx parser: op_type strings are
    # length-delimited in NodeProto field 4
    n_conv = data.count(b"\x22\x04Conv")
    n_sub = data.count(b"\x22\x03Sub")
    assert n_conv >= 30
    # the only Subs left are decode's per-scale `2*sigma - 0.5`; each BN
    # would have contributed one more
    assert n_sub <= 3, f"BN Sub chains survived folding ({n_sub})"
