"""YOLOv7 neck (SPPCSPC + ELAN_NECK PAN + RepConv outputs) in Flax.

Parity with reference models/neck/yolov7_neck.py:6-142: SPPCSPC on P5,
top-down with 1x1 reduce + nearest upsample + ELAN_NECK, bottom-up with
maxpool/conv-pair downsample concat (three-way, including the skip), and
RepConv 3x3 on each output.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import (
    Conv,
    ELANNeck,
    RepConv,
    SPPCSPC,
    make_divisible,
    max_pool_2x,
    upsample2x,
)
from ..spec import ModelSpec


def _act(name: str) -> str:
    return {"SiLU": "silu", "ReLU": "relu", "LeakyReLU": "lrelu"}.get(
        name, "hard_swish"
    )


class YoloV7Neck(nn.Module):
    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        spec = self.spec
        w = lambda n: make_divisible(n * spec.width_multiple, 8)
        in_p3, in_p4, in_p5 = (w(c) for c in spec.neck_in_channels)
        out_p3, out_p4, out_p5 = (w(c) for c in spec.neck_out_channels)
        act = _act(spec.neck_act)
        kw = dict(act=act, dtype=self.dtype, axis_name=self.axis_name)
        c0, c1, c2 = in_p5 // 2, in_p5 // 4, in_p5 // 8

        p3, p4, p5 = inputs
        x0 = SPPCSPC(c0, act=act, dtype=self.dtype,
                     axis_name=self.axis_name, name="sppcspc")(p5, train)
        x1 = Conv(c1, 1, 1, name="conv1", **kw)(x0, train)
        x3 = Conv(c1, 1, 1, name="conv2", **kw)(p4, train)
        x4 = jnp.concatenate([x3, upsample2x(x1)], -1)
        x12 = ELANNeck(c1, 3, 0.5, 0.5, act=act, dtype=self.dtype,
                       axis_name=self.axis_name, name="elan_0")(x4, train)

        x13 = Conv(c2, 1, 1, name="conv10", **kw)(x12, train)
        x15 = Conv(c2, 1, 1, name="conv11", **kw)(p3, train)
        x16 = jnp.concatenate([x15, upsample2x(x13)], -1)
        x24 = ELANNeck(c2, 3, 0.5, 0.5, act=act, dtype=self.dtype,
                       axis_name=self.axis_name, name="elan_1")(x16, train)

        x26 = Conv(c2, 1, 1, name="conv19", **kw)(max_pool_2x(x24), train)
        x27 = Conv(c2, 1, 1, name="conv20", **kw)(x24, train)
        x28 = Conv(c2, 3, 2, name="conv21", **kw)(x27, train)
        x29 = jnp.concatenate([x28, x26, x12], -1)
        x37 = ELANNeck(c1, 3, 0.5, 0.5, act=act, dtype=self.dtype,
                       axis_name=self.axis_name, name="elan_2")(x29, train)

        x39 = Conv(c1, 1, 1, name="conv29", **kw)(max_pool_2x(x37), train)
        x40 = Conv(c1, 1, 1, name="conv30", **kw)(x37, train)
        x41 = Conv(c1, 3, 2, name="conv31", **kw)(x40, train)
        x42 = jnp.concatenate([x41, x39, x0], -1)
        x50 = ELANNeck(c0, 3, 0.5, 0.5, act=act, dtype=self.dtype,
                       axis_name=self.axis_name, name="elan_3")(x42, train)

        o3 = RepConv(out_p3, act=act, deploy=spec.deploy, dtype=self.dtype,
                     axis_name=self.axis_name, name="repconv0")(x24, train)
        o4 = RepConv(out_p4, act=act, deploy=spec.deploy, dtype=self.dtype,
                     axis_name=self.axis_name, name="repconv1")(x37, train)
        o5 = RepConv(out_p5, act=act, deploy=spec.deploy, dtype=self.dtype,
                     axis_name=self.axis_name, name="repconv2")(x50, train)
        return o3, o4, o5
