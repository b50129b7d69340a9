"""YOLOv5 PAN neck in Flax.

Parity with reference models/neck/yolov5_neck.py:6-109: top-down FPN
(1x1 conv + nearest 2x upsample + concat + C3) followed by bottom-up PAN
(3x3/2 conv + concat + C3). Channel scaling via width_multiple
(reference yolov5_neck.py:78-86).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import C3, Conv, make_divisible, upsample2x
from ..spec import ModelSpec


def _act_names(activation: str):
    if activation == "SiLU":
        return "silu", "silu"
    if activation == "ReLU":
        return "relu", "relu"
    return "hard_swish", "relu_hswish"


class YoloV5Neck(nn.Module):
    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    def setup(self):
        gd = self.spec.depth_multiple
        gw = self.spec.width_multiple
        w = lambda n: make_divisible(n * gw, 8)
        d = lambda n: max(round(n * gd), 1) if n > 1 else n
        in_p3, in_p4, in_p5 = (w(c) for c in self.spec.neck_in_channels)
        out_p3, out_p4, out_p5 = (w(c) for c in self.spec.neck_out_channels)
        conv_act, c_act = _act_names(self.spec.neck_act)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)

        self.conv1 = Conv(in_p5 // 2, 1, 1, act=conv_act, **kw)
        self.C1 = C3(in_p4, d(3), False, act=c_act, **kw)
        self.conv2 = Conv(in_p3, 1, 1, act=conv_act, **kw)
        self.C2 = C3(out_p3, d(3), False, act=c_act, **kw)
        self.conv3 = Conv(out_p3, 3, 2, act=conv_act, **kw)
        self.C3 = C3(out_p4, d(3), False, act=c_act, **kw)
        self.conv4 = Conv(out_p4, 3, 2, act=conv_act, **kw)
        self.C4 = C3(out_p5, d(3), False, act=c_act, **kw)
        self.out_channels = (out_p3, out_p4, out_p5)

    def __call__(self, inputs, train: bool = False):
        p3, p4, p5 = inputs
        xp1 = self.conv1(p5, train)
        x = jnp.concatenate([upsample2x(xp1), p4], axis=-1)
        x1 = self.C1(x, train)

        xp2 = self.conv2(x1, train)
        x = jnp.concatenate([upsample2x(xp2), p3], axis=-1)
        x2 = self.C2(x, train)

        x = jnp.concatenate([self.conv3(x2, train), xp2], axis=-1)
        x3 = self.C3(x, train)

        x = jnp.concatenate([self.conv4(x3, train), xp1], axis=-1)
        x4 = self.C4(x, train)
        return x2, x3, x4
