"""YOLOv6 RepPAN neck in Flax.

Parity with reference models/neck/yolov6_neck.py:8-142: SimConv reduce +
ConvTranspose upsample top-down, SimConv stride-2 bottom-up, RepBlock
stages. Channel indexing follows the reference's concatenated
channels_list = Backbone.out_channels + Neck.out_channels (:26-27).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import RepBlock, SimConv, Transpose, make_divisible
from ..spec import ModelSpec


class YoloV6Neck(nn.Module):
    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        spec = self.spec
        w = lambda n: make_divisible(n * spec.width_multiple, 8)
        d = lambda n: max(round(n * spec.depth_multiple), 1) if n > 1 else n
        cl = [w(c) for c in spec.backbone_out_channels] + [
            w(c) for c in spec.neck_out_channels
        ]
        reps = [d(n) for n in spec.depth_num_repeats] + [
            d(n) for n in spec.neck_num_repeats
        ]
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        rep = dict(deploy=spec.deploy, block_type=spec.vgg_block_type,
                   dtype=self.dtype, axis_name=self.axis_name)

        x2, x1, x0 = inputs
        fpn_out0 = SimConv(cl[6], 1, 1, name="reduce_layer0", **kw)(x0, train)
        up0 = Transpose(cl[6], dtype=self.dtype, name="upsample0")(fpn_out0)
        f_out0 = RepBlock(cl[6], reps[5], name="Rep_p4", **rep)(
            jnp.concatenate([up0, x1], -1), train
        )
        fpn_out1 = SimConv(cl[5], 1, 1, name="reduce_layer1", **kw)(
            f_out0, train
        )
        up1 = Transpose(cl[5], dtype=self.dtype, name="upsample1")(fpn_out1)
        pan_out2 = RepBlock(cl[5], reps[6], name="Rep_p3", **rep)(
            jnp.concatenate([up1, x2], -1), train
        )
        down1 = SimConv(cl[5], 3, 2, name="downsample2", **kw)(pan_out2, train)
        pan_out1 = RepBlock(cl[6], reps[7], name="Rep_n3", **rep)(
            jnp.concatenate([down1, fpn_out1], -1), train
        )
        down0 = SimConv(cl[6], 3, 2, name="downsample1", **kw)(pan_out1, train)
        pan_out0 = RepBlock(cl[7], reps[8], name="Rep_n4", **rep)(
            jnp.concatenate([down0, fpn_out0], -1), train
        )
        return pan_out2, pan_out1, pan_out0
