"""Detector composition: backbone -> neck -> head (+ SSOD discriminators).

Parity targets:
  - supervised Model: reference models/detector/yolo.py:45-128
  - SSOD Model (per-scale domain discriminators behind gradient reversal):
    reference models/detector/yolo_ssod.py:44-258
  - model_type dispatch {yolov5 (anchor), yolox (anchor-free), tal}:
    reference yolo.py:66-82, yolo_ssod.py:72-92

TPU-first deltas: strides/anchors are static config properties (no dummy
forward probe); GradReverse is a `jax.custom_vjp` negating the cotangent
(reference autograd Function at yolo_ssod.py:158-172).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbones import build_backbone_cls
from .heads import build_head_cls, head_model_type
from .necks import build_neck_cls
from .spec import ModelSpec, spec_from_cfg


@jax.custom_vjp
def grad_reverse(x):
    """Identity forward, negated gradient (GRL, yolo_ssod.py:158-172)."""
    return x


def _grad_reverse_fwd(x):
    return x, None


def _grad_reverse_bwd(_, g):
    return (-g,)


grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)


class NetD(nn.Module):
    """Per-scale domain discriminator: 1x1 conv -> ReLU -> 1x1 conv -> 2ch
    (reference yolo_ssod.py:224-238)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        return x


class Model(nn.Module):
    """Supervised detector (reference yolo.py:45)."""

    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @property
    def model_type(self) -> str:
        return head_model_type(self.spec.head)

    def setup(self):
        kw = dict(spec=self.spec, dtype=self.dtype, axis_name=self.axis_name)
        self.backbone = build_backbone_cls(self.spec.backbone)(**kw)
        self.neck = build_neck_cls(self.spec.neck)(**kw)
        self.head = build_head_cls(self.spec.head)(**kw)

    def __call__(self, x, train: bool = False, decode: bool | None = None):
        feats = self.backbone(x, train)
        feats = self.neck(feats, train)
        return self.head(feats, train, decode=decode)


class SSODModel(nn.Module):
    """SSOD detector: head outputs plus per-scale GRL'd domain logits
    (reference yolo_ssod.py:105-118)."""

    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @property
    def model_type(self) -> str:
        return head_model_type(self.spec.head)

    def setup(self):
        kw = dict(spec=self.spec, dtype=self.dtype, axis_name=self.axis_name)
        self.backbone = build_backbone_cls(self.spec.backbone)(**kw)
        self.neck = build_neck_cls(self.spec.neck)(**kw)
        self.head = build_head_cls(self.spec.head)(**kw)
        gw = self.spec.width_multiple
        p3, p4, p5 = (int(c * gw) for c in self.spec.neck_out_channels)
        self.det_8 = NetD(p3, dtype=self.dtype)
        self.det_16 = NetD(p4, dtype=self.dtype)
        self.det_32 = NetD(p5, dtype=self.dtype)

    def __call__(self, x, train: bool = False, decode: bool | None = None,
                 with_domain: bool = True):
        feats = self.backbone(x, train)
        f8, f16, f32 = self.neck(feats, train)
        out = self.head((f8, f16, f32), train, decode=decode)
        if not with_domain:
            return out, None
        domain = (
            self.det_8(grad_reverse(f8)),
            self.det_16(grad_reverse(f16)),
            self.det_32(grad_reverse(f32)),
        )
        return out, domain


def build_model(cfg, ssod: bool | None = None, dtype=jnp.float32,
                axis_name: str | None = None):
    """Factory mirroring the trainer's Model-vs-SSOD selection
    (reference train.py:71-76 via cfg.SSOD.train_domain). Accepts either a
    CfgNode or a prebuilt ModelSpec."""
    spec = cfg if isinstance(cfg, ModelSpec) else spec_from_cfg(cfg)
    if ssod is None:
        ssod = spec.train_domain
    cls = SSODModel if ssod else Model
    return cls(spec=spec, dtype=dtype, axis_name=axis_name)
