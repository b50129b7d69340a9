"""YOLOv8 C2f PAN neck in Flax.

Parity with reference models/neck/yolov8_neck.py:20-109: like the v5 PAN but
without the 1x1 reduce convs (direct upsample + concat) and C2f stages.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import C2f, Conv, make_divisible, upsample2x
from ..spec import ModelSpec


def _acts(name: str):
    if name == "SiLU":
        return "silu", "silu"
    if name == "ReLU":
        return "relu", "relu"
    return "hard_swish", "hard_swish"


class YoloV8Neck(nn.Module):
    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        spec = self.spec
        w = lambda n: make_divisible(n * spec.width_multiple, 8)
        d = lambda n: max(round(n * spec.depth_multiple), 1) if n > 1 else n
        in_p3, in_p4, in_p5 = (w(c) for c in spec.neck_in_channels)
        out_p3, out_p4, out_p5 = (w(c) for c in spec.neck_out_channels)
        conv_act, c_act = _acts(spec.neck_act)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)

        p3, p4, p5 = inputs
        x1 = C2f(in_p4, d(3), False, act=c_act, name="C1", **kw)(
            jnp.concatenate([upsample2x(p5), p4], -1), train
        )
        x2 = C2f(out_p3, d(3), False, act=c_act, name="C2", **kw)(
            jnp.concatenate([upsample2x(x1), p3], -1), train
        )
        x3 = C2f(out_p4, d(3), False, act=c_act, name="C3", **kw)(
            jnp.concatenate(
                [Conv(out_p3, 3, 2, act=conv_act, name="conv3", **kw)(
                    x2, train), x1], -1,
            ), train,
        )
        x4 = C2f(out_p5, d(3), False, act=c_act, name="C4", **kw)(
            jnp.concatenate(
                [Conv(out_p4, 3, 2, act=conv_act, name="conv4", **kw)(
                    x3, train), p5], -1,
            ), train,
        )
        return x2, x3, x4
