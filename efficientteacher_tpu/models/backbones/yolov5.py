"""YOLOv5 CSPDarknet backbone in Flax.

Architecture parity with reference models/backbone/yolov5_backbone.py:26-98:
6x6/2 stem -> 4 stages of (3x3/2 Conv + C3) -> SPPF, returning (C3, C4, C5)
at strides 8/16/32. Channel/depth scaling via width_multiple/depth_multiple
with make_divisible(...,8) (reference yolov5_backbone.py:90-98).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import C3, Conv, SPPF, make_divisible
from ..spec import ModelSpec


def _act_names(activation: str):
    if activation == "SiLU":
        return "silu", "silu"
    if activation == "ReLU":
        return "relu", "relu"
    return "hard_swish", "relu_hswish"


class YoloV5BackBone(nn.Module):
    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    def setup(self):
        gd = self.spec.depth_multiple
        gw = self.spec.width_multiple
        w = lambda n: make_divisible(n * gw, 8)
        d = lambda n: max(round(n * gd), 1) if n > 1 else n
        conv_act, c_act = _act_names(self.spec.backbone_act)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)

        self.stage1 = Conv(w(64), 6, 2, 2, act=conv_act, **kw)
        self.stage2_1 = Conv(w(128), 3, 2, act=conv_act, **kw)
        self.stage2_2 = C3(w(128), d(3), True, act=c_act, **kw)
        self.stage3_1 = Conv(w(256), 3, 2, act=conv_act, **kw)
        self.stage3_2 = C3(w(256), d(6), True, act=c_act, **kw)
        self.stage4_1 = Conv(w(512), 3, 2, act=conv_act, **kw)
        self.stage4_2 = C3(w(512), d(9), True, act=c_act, **kw)
        self.stage5_1 = Conv(w(1024), 3, 2, act=conv_act, **kw)
        self.stage5_2 = C3(w(1024), d(3), True, act=c_act, **kw)
        self.sppf = SPPF(w(1024), 5, act=conv_act, **kw)
        self.out_channels = (w(256), w(512), w(1024))

    def __call__(self, x, train: bool = False):
        x = self.stage1(x, train)
        x = self.stage2_1(x, train)
        x = self.stage2_2(x, train)
        x = self.stage3_1(x, train)
        c3 = self.stage3_2(x, train)
        x = self.stage4_1(c3, train)
        c4 = self.stage4_2(x, train)
        x = self.stage5_1(c4, train)
        x = self.stage5_2(x, train)
        c5 = self.sppf(x, train)
        return c3, c4, c5
