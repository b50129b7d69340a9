"""YOLOv6 EfficientRep backbone in Flax.

Parity with reference models/backbone/yolov6_backbone.py:6-124:
RepVGG stem + 4 stages of (RepVGG s2 + RepBlock) + SimSPPF, returning the
last three stages. Channel/depth scaling via width/depth multiples with
make_divisible (:22-24). The RealVGG/QARep/LinearAdd block variants are
train-time RepVGG reparameterizations; all share the RepVGGBlock topology
here (deploy fusion handled at export time).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import RepBlock, SimSPPF, VGG_BLOCKS, make_divisible
from ..spec import ModelSpec


class YoloV6BackBone(nn.Module):
    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = self.spec
        w = lambda n: make_divisible(n * spec.width_multiple, 8)
        d = lambda n: max(round(n * spec.depth_multiple), 1) if n > 1 else n
        ch = [w(c) for c in spec.backbone_out_channels]
        reps = [d(n) for n in spec.depth_num_repeats]
        block = VGG_BLOCKS[spec.vgg_block_type]
        kw = dict(deploy=spec.deploy, dtype=self.dtype,
                  axis_name=self.axis_name)

        x = block(ch[0], s=2, name="stem", **kw)(x, train)
        outs = []
        for i in range(1, 5):
            x = block(ch[i], s=2, name=f"ERBlock_{i + 1}_0", **kw)(
                x, train
            )
            x = RepBlock(ch[i], reps[i], block_type=spec.vgg_block_type,
                         name=f"ERBlock_{i + 1}_1", **kw)(
                x, train
            )
            if i == 4:
                x = SimSPPF(ch[i], 5, name="ERBlock_5_2",
                            dtype=self.dtype, axis_name=self.axis_name)(
                    x, train
                )
            if i >= 2:
                outs.append(x)
        return tuple(outs)
