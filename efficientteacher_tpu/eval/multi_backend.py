"""DetectBackend: one inference facade over every format this framework
emits.

Parity with reference utils/detect_multi_backend.py:27-355 (a 14-format
torch facade): format is detected by suffix, a uniform
`__call__(images_u8_rgb) -> (B, N, 5+nc) decoded predictions` is exposed,
and `warmup()` pre-compiles. Formats:

  .ckpt         native checkpoint (EMA-preferred), jitted flax forward
  .deploy.ckpt  RepVGG-fused deploy checkpoint
  .pt           reference torch checkpoint, imported on the fly
  saved_model/  TF SavedModel (from export.py)
  .pb           frozen TF GraphDef (reference wrap_frozen_graph path,
                utils/detect_multi_backend.py:100-107)
  .tflite       TFLite flatbuffer (TF interpreter); u8-quantized int8
                models de-scale input / re-scale output exactly as the
                reference (utils/detect_multi_backend.py:296-310)
  .torchscript  reference-exported TorchScript module (torch CPU)
  .onnx         reference-exported ONNX graph via cv2.dnn (no onnx pkg
                needed); TensorRT/CoreML/OpenVINO engines need their own
                runtimes and stay out of scope on TPU hosts
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np


class DetectBackend:
    def __init__(self, weights: str, cfg, norm_scale: float = 255.0):
        import jax
        import jax.numpy as jnp

        from ..models import build_model
        from ..models.spec import spec_from_cfg

        self.weights = str(weights)
        self.norm_scale = norm_scale
        self.spec = spec_from_cfg(cfg)
        self.kind = self._detect_kind(self.weights)
        self._tf_fn = None
        self._tflite = None
        self._jit = None
        self._ts = None
        self._dnn = None

        if self.kind in ("ckpt", "deploy", "pt"):
            spec = self.spec
            if self.kind == "deploy":
                spec = dataclasses.replace(spec, deploy=True)
            model = build_model(spec, ssod=False, dtype=jnp.bfloat16)
            if self.kind == "pt":
                from ..utils.torch_import import load_torch_weights

                tree = load_torch_weights(self.weights, spec)
                variables = {
                    k: jax.tree.map(jnp.asarray, v) for k, v in tree.items()
                }
            else:
                from ..utils.checkpoint import load_eval_variables

                variables = load_eval_variables(self.weights)
            self._variables = variables

            @jax.jit
            def fwd(v, x):
                decoded, _ = model.apply(
                    v, x.astype(jnp.bfloat16) / norm_scale, train=False
                )
                return decoded

            self._jit = fwd
        elif self.kind == "saved_model":
            import tensorflow as tf

            self._tf_mod = tf.saved_model.load(self.weights)
            self._tf_fn = self._tf_mod.f
        elif self.kind == "pb":
            import tensorflow as tf

            gd = tf.compat.v1.GraphDef()
            gd.ParseFromString(Path(self.weights).read_bytes())
            wrapped = tf.compat.v1.wrap_function(
                lambda: tf.compat.v1.import_graph_def(gd, name=""), [])
            # input = the graph's placeholder; output = its last tensor
            # (the frozen concrete function's single Identity result).
            ops = wrapped.graph.get_operations()
            inp = next(o for o in ops if o.type == "Placeholder")
            idents = [o for o in ops if o.type == "Identity"]
            out_op = idents[-1] if idents else ops[-1]
            pruned = wrapped.prune(inp.outputs[0], out_op.outputs[0])
            # pruned concrete functions bind TF tensors, not ndarrays
            self._tf_fn = lambda x: pruned(tf.constant(x))
        elif self.kind == "tflite":
            import tensorflow as tf

            self._tflite = tf.lite.Interpreter(model_path=self.weights)
            self._tflite.allocate_tensors()
        elif self.kind == "torchscript":
            import torch

            self._ts = torch.jit.load(self.weights, map_location="cpu")
            self._ts.eval()
        elif self.kind == "onnx":
            import cv2

            self._dnn = cv2.dnn.readNetFromONNX(self.weights)
        else:
            raise NotImplementedError(f"format {self.kind!r}")

    @staticmethod
    def _detect_kind(path: str) -> str:
        p = Path(path)
        if p.is_dir():
            return "saved_model"
        name = p.name
        if name.endswith(".deploy.ckpt"):
            return "deploy"
        if name.endswith(".ckpt"):
            return "ckpt"
        if name.endswith(".pt"):
            return "pt"
        if name.endswith(".pb"):
            return "pb"
        if name.endswith(".tflite"):
            return "tflite"
        if name.endswith(".torchscript"):
            return "torchscript"
        if name.endswith(".onnx"):
            return "onnx"
        return "unknown"

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: (B, H, W, 3) uint8 RGB -> decoded (B, N, 5+nc) f32."""
        if self._jit is not None:
            import jax.numpy as jnp

            return np.asarray(self._jit(self._variables, jnp.asarray(images)))
        if self._tf_fn is not None:
            x = images.astype(np.float32) / self.norm_scale
            y = np.asarray(self._tf_fn(x))
            return self._rescale_tf(y, images)
        if self._tflite is not None:
            inp = self._tflite.get_input_details()[0]
            out = self._tflite.get_output_details()[0]
            x = images.astype(np.float32) / self.norm_scale
            if inp["dtype"] == np.uint8:  # full-integer-quantized model
                scale, zero_point = inp["quantization"]
                x = (x / scale + zero_point).astype(np.uint8)
            self._tflite.set_tensor(inp["index"], x)
            self._tflite.invoke()
            y = self._tflite.get_tensor(out["index"])
            if out["dtype"] == np.uint8:
                scale, zero_point = out["quantization"]
                y = (y.astype(np.float32) - zero_point) * scale
            return self._rescale_tf(y, images)
        if getattr(self, "_ts", None) is not None:
            import torch

            x = torch.from_numpy(
                images.transpose(0, 3, 1, 2).astype(np.float32)
                / self.norm_scale
            )
            with torch.no_grad():
                y = self._ts(x)
            if isinstance(y, (list, tuple)):
                y = y[0]
            return y.numpy()
        if getattr(self, "_dnn", None) is not None:
            x = (images.transpose(0, 3, 1, 2).astype(np.float32)
                 / self.norm_scale)
            self._dnn.setInput(x)
            return np.asarray(self._dnn.forward())
        raise RuntimeError("no backend initialized")

    @staticmethod
    def _rescale_tf(y: np.ndarray, images: np.ndarray) -> np.ndarray:
        """TF-family exports (saved_model/pb/tflite) carry normalized
        xywh; re-scale to input pixels exactly as the reference
        (utils/detect_multi_backend.py:312).

        Guard: artifacts exported before the normalized-output contract
        (export.py pre-r5) already emit pixel coords — re-scaling those
        would silently double-scale. Normalized xywh stays ~O(1) for a
        trained model (worst random-init case: wh <= 4*max_anchor/img,
        ~20 at a 64px test input) while pixel coords reach the image
        size, so a max box coord above half the input size means the
        blob is already pixel-scale; pass it through with a warning."""
        h, w = images.shape[1:3]
        y = np.array(y)
        if np.abs(y[..., :4]).max() > 0.5 * max(h, w):
            import logging

            logging.getLogger(__name__).warning(
                "TF-family model output looks pixel-scaled already "
                "(max box coord %.1f); skipping the normalized-xywh "
                "re-scale — re-export with the current export.py",
                float(np.abs(y[..., :4]).max()))
            return y
        y[..., :4] *= [w, h, w, h]
        return y

    def warmup(self, shape=(1, 640, 640, 3)):
        self(np.zeros(shape, np.uint8))
