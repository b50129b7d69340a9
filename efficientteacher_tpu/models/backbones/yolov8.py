"""YOLOv8 C2f backbone in Flax.

Parity with reference models/backbone/yolov8_backbone.py:25-100: identical
topology to the v5 backbone but with C2f blocks (shortcut=True) and a
768-channel top stage.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import C2f, Conv, SPPF, make_divisible
from ..spec import ModelSpec


def _acts(name: str):
    if name == "SiLU":
        return "silu", "silu"
    if name == "ReLU":
        return "relu", "relu"
    return "hard_swish", "hard_swish"


class YoloV8BackBone(nn.Module):
    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = self.spec
        w = lambda n: make_divisible(n * spec.width_multiple, 8)
        d = lambda n: max(round(n * spec.depth_multiple), 1) if n > 1 else n
        conv_act, c_act = _acts(spec.backbone_act)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)

        x = Conv(w(64), 6, 2, 2, act=conv_act, name="stage1", **kw)(x, train)
        x = Conv(w(128), 3, 2, act=conv_act, name="stage2_1", **kw)(x, train)
        x = C2f(w(128), d(3), True, act=c_act, name="stage2_2", **kw)(x, train)
        x = Conv(w(256), 3, 2, act=conv_act, name="stage3_1", **kw)(x, train)
        c3 = C2f(w(256), d(6), True, act=c_act, name="stage3_2", **kw)(x, train)
        x = Conv(w(512), 3, 2, act=conv_act, name="stage4_1", **kw)(c3, train)
        c4 = C2f(w(512), d(6), True, act=c_act, name="stage4_2", **kw)(x, train)
        x = Conv(w(768), 3, 2, act=conv_act, name="stage5_1", **kw)(c4, train)
        x = C2f(w(768), d(3), True, act=c_act, name="stage5_2", **kw)(x, train)
        c5 = SPPF(w(768), 5, act=conv_act, name="sppf", **kw)(x, train)
        return c3, c4, c5
