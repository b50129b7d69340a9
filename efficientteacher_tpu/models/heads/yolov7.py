"""YOLOv7 IDetect head in Flax.

Parity with reference models/head/yolov7_head.py:9-72: the anchor-based
Detect head with learned implicit tokens — ImplicitA added to the head
input, ImplicitM multiplying the conv output (reference common.py:1482-1506).
Decode semantics identical to the v5 head.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common import ImplicitA, ImplicitM
from ..spec import ModelSpec
from .yolov5 import YoloV5Detect, _detect_bias_init, decode_yolov5_scale


class YoloV7Detect(nn.Module):
    """Anchor-based IDetect head ('YoloV7' in the head factory)."""

    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @property
    def strides(self):
        return self.spec.strides

    @property
    def anchors_px(self) -> np.ndarray:
        a = np.asarray(self.spec.anchors, np.float32)
        return a.reshape(len(self.spec.anchors), -1, 2)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False,
                 decode: bool | None = None):
        spec = self.spec
        nc = spec.nc
        # the reference declares no = nc + np + 5 (yolov5_head.py:22)
        # but its own loss reads 2 coords per keypoint
        # (loss.py:175-179); we emit the coherent channel count
        no = nc + 2 * spec.num_keypoints + 5
        anchors = self.anchors_px
        na = anchors.shape[1]

        raw = []
        for i, f in enumerate(feats):
            b, ny, nx, c = f.shape
            f = ImplicitA(c, dtype=self.dtype, name=f"ia_{i}")(f)
            x = nn.Conv(
                na * no, (1, 1), use_bias=True, dtype=self.dtype,
                bias_init=_detect_bias_init(na, no, nc, self.strides[i]),
                name=f"m_{i}",
            )(f)
            x = ImplicitM(na * no, dtype=self.dtype, name=f"im_{i}")(x)
            raw.append(x.reshape(b, ny, nx, na, no))

        if decode is None:
            decode = not train
        if not decode:
            return raw
        z = [
            decode_yolov5_scale(r.astype(jnp.float32), self.strides[i],
                                jnp.asarray(anchors[i]), nc)
            for i, r in enumerate(raw)
        ]
        return jnp.concatenate(z, axis=1), raw
