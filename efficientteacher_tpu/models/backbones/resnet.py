"""ResNet-50 backbone in Flax.

Parity with reference models/backbone/resnet.py:230 (torchvision-style
bottleneck ResNet returning C3/C4/C5 at strides 8/16/32)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...ops.pool import max_pool_strided
from ..spec import ModelSpec


class _BNConv(nn.Module):
    c2: int
    k: int = 1
    s: int = 1
    act: bool = True
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.k // 2
        x = nn.Conv(self.c2, (self.k, self.k), (self.s, self.s),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.axis_name if train else None,
                         name="bn")(x)
        return nn.relu(x) if self.act else x


class BottleneckRes(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        ident = x
        y = _BNConv(self.planes, 1, 1, name="conv1", **kw)(x, train)
        y = _BNConv(self.planes, 3, self.stride, name="conv2", **kw)(y, train)
        y = _BNConv(self.planes * 4, 1, 1, act=False, name="conv3", **kw)(
            y, train
        )
        if self.downsample:
            ident = _BNConv(self.planes * 4, 1, self.stride, act=False,
                            name="downsample", **kw)(x, train)
        return nn.relu(y + ident)


class ResNet50BackBone(nn.Module):
    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        x = _BNConv(64, 7, 2, name="stem", **kw)(x, train)
        x = max_pool_strided(x, 3, 2)
        outs = []
        for li, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        ):
            for bi in range(blocks):
                x = BottleneckRes(
                    planes,
                    stride=stride if bi == 0 else 1,
                    downsample=bi == 0,
                    name=f"layer{li + 1}_{bi}",
                    **kw,
                )(x, train)
            if li >= 1:
                outs.append(x)
        return tuple(outs)  # C3 (512ch), C4 (1024ch), C5 (2048ch)
