"""YOLOv7 ELAN backbone in Flax.

Parity with reference models/backbone/yolov7_backbone.py:31-87:
two PreConv stem stages, then four ELAN stages (first without MP/AUG
downsample, the rest with), returning the last three stages at strides
8/16/32.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import ELAN, PreConv, make_divisible
from ..spec import ModelSpec


def _act(name: str) -> str:
    return {"SiLU": "silu", "ReLU": "relu", "LeakyReLU": "lrelu"}.get(
        name, "hard_swish"
    )


class YoloV7BackBone(nn.Module):
    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = self.spec
        w = lambda n: make_divisible(n * spec.width_multiple, 8)
        d = lambda n: max(round(n * spec.depth_multiple), 1) if n > 1 else n
        act = _act(spec.backbone_act)
        kw = dict(act=act, dtype=self.dtype, axis_name=self.axis_name)

        x = PreConv(w(64), 0.5, True, name="stage0", **kw)(x, train)
        x = PreConv(w(128), 0.5, True, name="stage1", **kw)(x, train)
        x = ELAN(w(256), d(2), 0.5, with_mp=False, with_aug=False,
                 name="elan_0", **kw)(x, train)
        c3 = ELAN(w(512), d(2), 0.5, with_mp=True, with_aug=True,
                  name="elan_1", **kw)(x, train)
        c4 = ELAN(w(1024), d(2), 0.5, with_mp=True, with_aug=True,
                  name="elan_2", **kw)(c3, train)
        c5 = ELAN(w(1024), d(2), 0.25, with_mp=True, with_aug=True,
                  name="elan_3", **kw)(c4, train)
        return c3, c4, c5
