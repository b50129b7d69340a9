"""TF-family export legs (saved_model / pb / tflite / tflite-int8) and
their DetectBackend inference paths.

Drives the REAL export CLI (export.py main) end-to-end on a tiny model,
then loads every emitted artifact through eval/multi_backend.DetectBackend
and checks the outputs against the fp32 fused JAX forward. Reference
surface being matched: deploy/model_convert.py:274-316 (export_pb /
export_tflite incl. --int8) + utils/detect_multi_backend.py:100-107
(wrap_frozen_graph), :296-312 (tflite u8 de/re-scale, normalized-xywh
re-scale to pixels).
"""

import argparse
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.eval.multi_backend import DetectBackend
from efficientteacher_tpu.models import Model, build_model
from efficientteacher_tpu.models.spec import spec_from_cfg
from efficientteacher_tpu.utils.checkpoint import save_checkpoint

pytest.importorskip("tensorflow")

IMG = 64


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
    cfg.Dataset.img_size = IMG
    return cfg


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """Run export.py main() once: saved_model + pb + tflite, then a second
    pass for the int8 tflite blob."""
    root = tmp_path_factory.mktemp("tfexp")
    cfg = tiny_cfg()
    yaml_path = root / "tiny.yaml"
    yaml_path.write_text(cfg.dump())

    spec = spec_from_cfg(cfg)
    model = Model(spec=spec, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, IMG, IMG, 3)), train=False)
    ckpt = root / "m.ckpt"
    save_checkpoint(ckpt, params=variables["params"],
                    batch_stats=variables["batch_stats"], half=False)

    # load OUR export.py by path: the ref_compat parity harness puts
    # /root/reference on sys.path[0], whose own export.py would win a
    # bare `import export` when those tests ran earlier in the session
    import importlib.util

    _spec = importlib.util.spec_from_file_location(
        "et_export_cli", Path(__file__).resolve().parents[1] / "export.py")
    export_cli = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(export_cli)

    base = dict(cfg=str(yaml_path), weights=str(ckpt), opset=13,
                img_size=IMG, batch=1, out=None, opts=[],
                data_dir=None)
    export_cli.main(argparse.Namespace(
        include=["saved_model", "pb", "tflite"], int8=False, **base))
    export_cli.main(argparse.Namespace(
        include=["tflite"], int8=True, **base))

    stem = ckpt.with_suffix("")
    out = {
        "cfg": cfg,
        "saved_model": str(stem) + "_saved_model",
        "pb": str(stem.with_suffix(".pb")),
        "tflite": str(stem.with_suffix(".tflite")),
        "tflite_int8": str(stem) + "-int8.tflite",
    }
    for k in ("saved_model", "pb", "tflite", "tflite_int8"):
        assert Path(out[k]).exists(), f"export leg {k} missing"

    # fp32 fused-JAX oracle on the same (deploy) graph the exports carry
    from efficientteacher_tpu.utils.reparam import fuse_repvgg_tree
    import dataclasses

    fp, fbs = fuse_repvgg_tree(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]))
    fused = {"params": fp, "batch_stats": fbs}
    dmodel = build_model(dataclasses.replace(spec, deploy=True),
                         ssod=False, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    img_u8 = rng.integers(0, 256, (1, IMG, IMG, 3), dtype=np.uint8)
    decoded, _ = dmodel.apply(fused, jnp.asarray(img_u8, jnp.float32) / 255.0,
                              train=False)
    out["img"] = img_u8
    out["oracle"] = np.asarray(decoded)
    return out


def test_saved_model_backend(exported):
    be = DetectBackend(exported["saved_model"], exported["cfg"])
    assert be.kind == "saved_model"
    y = be(exported["img"])
    assert y.shape == exported["oracle"].shape
    np.testing.assert_allclose(y, exported["oracle"], atol=2e-4, rtol=1e-3)


def test_pb_backend(exported):
    """Frozen GraphDef leg: import_graph_def + prune, bit-equal to the
    SavedModel path (same frozen graph)."""
    be = DetectBackend(exported["pb"], exported["cfg"])
    assert be.kind == "pb"
    y = be(exported["img"])
    np.testing.assert_allclose(y, exported["oracle"], atol=2e-4, rtol=1e-3)


def test_tflite_backend(exported):
    be = DetectBackend(exported["tflite"], exported["cfg"])
    assert be.kind == "tflite"
    y = be(exported["img"])
    # TFLite builtins (XNNPACK) reassociate; fp32 stays within ~1e-3
    np.testing.assert_allclose(y, exported["oracle"], atol=5e-3, rtol=1e-2)


def test_tflite_int8_backend(exported):
    """Full-integer u8 model: the export is GENUINELY quantized (every
    tensor integer-typed — the exporter requests TFLITE_BUILTINS_INT8
    only, so float islands fail conversion) and the backend de-scales
    input / re-scales output (reference utils/detect_multi_backend.py:
    296-310). Accuracy bounds are deliberately loose: a random-init net
    has pathological per-tensor dynamic ranges (wh spans ~6x the image
    because the 640-scale anchor priors meet a 64px input), so this
    checks plumbing + signal, not production int8 SNR."""
    import tensorflow as tf

    it = tf.lite.Interpreter(model_path=exported["tflite_int8"])
    it.allocate_tensors()
    inp = it.get_input_details()[0]
    out = it.get_output_details()[0]
    assert inp["dtype"] == np.uint8, "int8 export did not quantize input"
    assert out["dtype"] == np.uint8, "int8 export did not quantize output"
    dtypes = {np.dtype(d["dtype"]).kind for d in it.get_tensor_details()}
    assert dtypes <= {"i", "u"}, f"float tensors survived int8 export: {dtypes}"

    be = DetectBackend(exported["tflite_int8"], exported["cfg"])
    y = be(exported["img"])
    ref = exported["oracle"]
    assert y.shape == ref.shape
    assert np.isfinite(y).all()
    # xy rides the grid structure and must survive quantization: strong
    # correlation with the fp32 oracle + mean error well under a cell
    xy_corr = np.corrcoef(y[..., :2].ravel(), ref[..., :2].ravel())[0, 1]
    assert xy_corr > 0.9, f"int8 xy decorrelated from fp32: {xy_corr}"
    assert np.abs(y[..., :2] - ref[..., :2]).mean() < 8.0  # px @64
    # scores live in [0,1]; the output tensor's u8 scale is dominated by
    # the anchor-prior wh range (~6), so one step is ~0.023 — bound the
    # mean by a handful of steps of accumulated conv quantization noise
    assert np.abs(y[..., 4:] - ref[..., 4:]).mean() < 0.3
