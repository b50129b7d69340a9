"""Deploy-format exporters (reference deploy/model_convert.py).

`export_onnx` translates a traced jaxpr directly to an ONNX file with no
onnx/tf2onnx dependency (see onnx_jaxpr.py). TF-family formats
(SavedModel/TFLite) live in the root-level export.py CLI via jax2tf.
"""

from .onnx_jaxpr import export_onnx

__all__ = ["export_onnx"]
