"""YOLOv8 decoupled head in Flax.

Parity with reference models/head/yolov8_head.py:10-95:
  - per-scale branches: cv2 (reg: two 3x3 Convs at c2 = max(16, ch0/4,
    4*(reg_max+1)) + 1x1 -> 4*(reg_max+1)) and cv3 (cls: two 3x3 Convs at
    c3 = max(ch0, nc) + 1x1 -> nc) (yolov8_head.py:76-83)
  - bias init: reg bias 1.0, cls bias log(5/nc/(640/s)^2) (:89-95)
  - same train/eval output contract as the v6 head (TAL family)
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import Conv
from ..spec import ModelSpec
from .yolov6 import decode_tal_scale


class YoloV8Detect(nn.Module):
    """TAL anchor-free head ('YoloV8' in the head factory)."""

    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @property
    def strides(self):
        return self.spec.strides

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False,
                 decode: bool | None = None):
        spec = self.spec
        nc = spec.nc
        reg_max = spec.reg_max
        nbins = 4 * (reg_max + 1)
        act = {"SiLU": "silu", "ReLU": "relu"}.get(spec.head_act, "silu")
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        ch0 = feats[0].shape[-1]
        c2 = max(16, ch0 // 4, nbins)
        c3 = max(ch0, nc)

        raw = []
        for i, f in enumerate(feats):
            b, ny, nx, _ = f.shape
            reg_x = Conv(c2, 3, 1, act=act, name=f"cv2_{i}_0", **kw)(f, train)
            reg_x = Conv(c2, 3, 1, act=act, name=f"cv2_{i}_1", **kw)(
                reg_x, train
            )
            reg_out = nn.Conv(
                nbins, (1, 1), use_bias=True, dtype=self.dtype,
                bias_init=lambda k, s, d=jnp.float32: jnp.ones(s, d),
                name=f"cv2_{i}_2",
            )(reg_x)
            cls_x = Conv(c3, 3, 1, act=act, name=f"cv3_{i}_0", **kw)(f, train)
            cls_x = Conv(c3, 3, 1, act=act, name=f"cv3_{i}_1", **kw)(
                cls_x, train
            )
            s = self.strides[i]
            cls_bias = math.log(5.0 / nc / (640.0 / s) ** 2)
            cls_out = nn.Conv(
                nc, (1, 1), use_bias=True, dtype=self.dtype,
                bias_init=lambda k, sh, d=jnp.float32, v=cls_bias: jnp.full(
                    sh, v, d
                ),
                name=f"cv3_{i}_2",
            )(cls_x)
            out = jnp.concatenate([reg_out, cls_out], axis=-1)
            raw.append(out.reshape(b, ny, nx, 1, nbins + nc))

        if decode is None:
            decode = not train
        if not decode:
            return raw
        z = [
            decode_tal_scale(r.astype(jnp.float32), self.strides[i], reg_max,
                             spec.use_dfl, nc)
            for i, r in enumerate(raw)
        ]
        return jnp.concatenate(z, axis=1), raw
