"""Export CLI (parity: reference export.py:78-94 + deploy/model_convert.py).

Formats:
  params       stripped inference checkpoint (EMA preferred, fp16)
  deploy       RepVGG-fused deploy checkpoint (single-conv blocks) — the
               TPU-relevant part of the reference's fuse()/switch_to_deploy
  torch        reference-style flat state_dict .npz (the mula-convertor
               efficient->yolov5 direction; loadable from torch without jax)
  saved_model  TF SavedModel via jax2tf (CPU/TPU serving)
  pb           frozen TF GraphDef (reference deploy/model_convert.py:274-291)
  tflite       TFLite flatbuffer via the TF converter; --int8 adds
               full-integer quantization with a representative dataset
               (reference deploy/model_convert.py:294-316)
  onnx         direct ONNX emission from the traced jaxpr (reference
               export.py:78-94 export_onnx, deploy/model_convert.py:75-130)
               — no onnx/tf2onnx dependency; RepVGG-fused, decode baked in,
               verified against cv2.dnn in tests/test_onnx_export.py

TensorRT/CoreML exporters from the reference matrix depend on GPU/macOS
toolchains with no TPU analogue; TensorRT consumes the onnx output.
edgetpu would be the int8 tflite blob through Google's edgetpu_compiler
(not installable here); tfjs needs the tensorflowjs package (absent).

Usage:
    python export.py --cfg <yaml> --weights best.ckpt --include params deploy
"""

import argparse
import logging
from pathlib import Path

LOGGER = logging.getLogger(__name__)


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--include", nargs="+", default=["params"],
                   choices=["params", "deploy", "torch", "saved_model",
                            "pb", "tflite", "onnx"])
    p.add_argument("--opset", type=int, default=13,
                   help="ONNX opset (reference export.py default 13)")
    p.add_argument("--int8", action="store_true",
                   help="full-integer TFLite quantization with a "
                        "representative dataset (reference export.py "
                        "--int8, deploy/model_convert.py:307-316)")
    p.add_argument("--data-dir", default=None,
                   help="directory of images for the int8 representative "
                        "dataset (synthetic frames when omitted)")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--out", default=None, help="output stem")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def main(opt):
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.models import build_model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.utils.checkpoint import (
        load_eval_variables, save_checkpoint,
    )
    from efficientteacher_tpu.utils.reparam import fuse_repvgg_tree

    cfg = get_cfg()
    cfg.merge_from_file(opt.cfg)
    if opt.opts:
        cfg.merge_from_list(opt.opts)
    cfg.freeze()
    spec = spec_from_cfg(cfg)
    variables = load_eval_variables(opt.weights)
    stem = Path(opt.out or opt.weights).with_suffix("")

    if "params" in opt.include:
        out = stem.with_suffix(".params.ckpt")
        save_checkpoint(out, params=variables["params"],
                        batch_stats=variables["batch_stats"],
                        cfg_yaml=cfg.dump())
        LOGGER.info("params -> %s", out)

    fused_vars, fused_spec = None, None
    if "deploy" in opt.include or "saved_model" in opt.include \
            or "tflite" in opt.include or "onnx" in opt.include:
        fp, fbs = fuse_repvgg_tree(
            jax.tree.map(np.asarray, variables["params"]),
            jax.tree.map(np.asarray, variables["batch_stats"]),
        )
        fused_vars = {"params": jax.tree.map(jnp.asarray, fp),
                      "batch_stats": jax.tree.map(jnp.asarray, fbs)}
        fused_spec = dataclasses.replace(spec, deploy=True)

    if "deploy" in opt.include:
        out = stem.with_suffix(".deploy.ckpt")
        save_checkpoint(out, params=fused_vars["params"],
                        batch_stats=fused_vars["batch_stats"],
                        cfg_yaml=cfg.dump())
        LOGGER.info("deploy (RepVGG-fused) -> %s", out)

    if "torch" in opt.include:
        from efficientteacher_tpu.utils.torch_import import (
            export_to_torch_state_dict,
        )

        sd = export_to_torch_state_dict(
            jax.tree.map(np.asarray, variables["params"]),
            jax.tree.map(np.asarray, variables["batch_stats"]),
        )
        out = stem.with_suffix(".state_dict.npz")
        np.savez(out, **sd)
        LOGGER.info("torch state_dict (%d tensors) -> %s", len(sd), out)

    if "onnx" in opt.include:
        # Direct ONNX emission (reference deploy/model_convert.py:75-130
        # export_onnx at opset 13) — the jaxpr translator needs no
        # onnx/tf2onnx/torch packages. Input: NCHW float (pre-normalized),
        # output: decoded (B, N, 5+nc), matching reference-exported graphs
        # so eval/multi_backend.py's cv2.dnn branch loads either.
        from efficientteacher_tpu.export import export_onnx

        onnx_model = build_model(fused_spec, ssod=False, dtype=jnp.float32)

        def onnx_fwd(x_nchw):
            x = jnp.transpose(x_nchw, (0, 2, 3, 1))
            decoded, _ = onnx_model.apply(fused_vars, x, train=False)
            return decoded

        x0 = jnp.zeros((opt.batch, 3, opt.img_size, opt.img_size),
                       jnp.float32)
        out = stem.with_suffix(".onnx")
        export_onnx(onnx_fwd, (x0,), str(out), input_names=["images"],
                    output_names=["output"], opset=opt.opset)
        LOGGER.info("onnx (opset %d, direct jaxpr emission) -> %s",
                    opt.opset, out)

    if ("saved_model" in opt.include or "pb" in opt.include
            or "tflite" in opt.include):
        import tensorflow as tf
        from jax.experimental import jax2tf

        model = build_model(fused_spec, ssod=False, dtype=jnp.float32)

        def fwd(x):
            decoded, _ = model.apply(fused_vars, x, train=False)
            # TF-family exports carry NORMALIZED xywh (the reference's TF
            # models do the same; utils/detect_multi_backend.py:312
            # re-scales to pixels in the backend) so u8 full-integer
            # quantization shares one sane scale across the output tensor
            # instead of mixing 0-640 coords with 0-1 probabilities.
            inv = jnp.ones((decoded.shape[-1],), decoded.dtype)
            inv = inv.at[:4].set(1.0 / opt.img_size)
            return decoded * inv

        shape = (opt.batch, opt.img_size, opt.img_size, 3)
        if "saved_model" in opt.include or "pb" in opt.include:
            # jax2tf native serialization (single XlaCallModule op): exact
            # and ideal for TF-runtime serving; JAX >= 0.9 removed the
            # graph-mode lowering entirely, so the TFLite leg below goes
            # through the converter's own HLO importer instead.
            tf_fn = tf.function(
                jax2tf.convert(fwd, with_gradient=False),
                input_signature=[tf.TensorSpec(shape, tf.float32)],
                autograph=False,
            )
            module = tf.Module()
            module.f = tf_fn
        if "saved_model" in opt.include:
            sm_dir = str(stem) + "_saved_model"
            tf.saved_model.save(module, sm_dir)
            LOGGER.info("saved_model -> %s", sm_dir)
        if "pb" in opt.include:
            # Frozen GraphDef (reference deploy/model_convert.py:274-291
            # export_pb): constants folded in, loadable with nothing but
            # a TF runtime via import_graph_def.
            from tensorflow.python.framework.convert_to_constants import (
                convert_variables_to_constants_v2,
            )

            frozen = convert_variables_to_constants_v2(
                tf_fn.get_concrete_function())
            out = stem.with_suffix(".pb")
            tf.io.write_graph(frozen.graph.as_graph_def(),
                              str(out.parent), out.name, as_text=False)
            LOGGER.info("pb (frozen GraphDef) -> %s", out)
        if "tflite" in opt.include:
            # experimental_from_jax lowers the jaxpr's HLO to REAL TFLite
            # builtins (CONV_2D/MUL/...), not a flex-wrapped XlaCallModule
            # — required for genuine int8 quantization and for tflite
            # runtimes without the flex delegate. fp32 exactness + int8
            # full-integer-ness asserted by tests/test_tf_export_backends.py.
            example = np.zeros(shape, np.float32)
            conv = tf.lite.TFLiteConverter.experimental_from_jax(
                [fwd], [[("images", example)]])
            if opt.int8:
                # Full-integer quantization (reference
                # deploy/model_convert.py:307-316): representative frames
                # calibrate activation ranges; u8 I/O so DetectBackend's
                # de-scale/re-scale branch (reference
                # utils/detect_multi_backend.py:296-310) applies.
                def rep_data():
                    rng = np.random.default_rng(0)
                    files = []
                    if opt.data_dir:
                        import cv2

                        exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
                        # decode-filter up front: directories, label .txt
                        # and cache files in a dataset dir must not abort
                        # the conversion mid-stream
                        for p in sorted(Path(opt.data_dir).iterdir()):
                            if p.suffix.lower() not in exts:
                                continue
                            if cv2.imread(str(p)) is not None:
                                files.append(str(p))
                            if len(files) >= 100:
                                break
                        if not files:
                            LOGGER.warning(
                                "--data-dir %s has no decodable images; "
                                "falling back to synthetic calibration "
                                "frames", opt.data_dir)
                    for i in range(max(len(files), 32)):
                        if files:
                            import cv2

                            im = cv2.imread(files[i % len(files)])[..., ::-1]
                            im = cv2.resize(
                                im, (opt.img_size, opt.img_size))
                            x = im[None].astype(np.float32) / 255.0
                            x = np.repeat(x, opt.batch, axis=0)
                        else:
                            x = rng.random(shape, dtype=np.float32)
                        yield [x]

                conv.optimizations = [tf.lite.Optimize.DEFAULT]
                conv.representative_dataset = rep_data
                # BUILTINS_INT8 only: the converter then FAILS rather than
                # silently leaving float islands, so a successful export
                # is proof of full integer quantization.
                conv.target_spec.supported_ops = [
                    tf.lite.OpsSet.TFLITE_BUILTINS_INT8,
                ]
                conv.inference_input_type = tf.uint8
                conv.inference_output_type = tf.uint8
            blob = conv.convert()
            out = (Path(str(stem) + "-int8.tflite") if opt.int8
                   else stem.with_suffix(".tflite"))
            out.write_bytes(blob)
            LOGGER.info("tflite%s -> %s",
                        " (int8)" if opt.int8 else "", out)


if __name__ == "__main__":
    main(parse_opt())
