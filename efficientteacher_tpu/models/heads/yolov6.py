"""YOLOv6 efficient decoupled head (effidehead) in Flax.

Parity with reference models/head/yolov6_head.py:53-381:
  - per scale: 1x1 stem + 3x3 cls conv + 3x3 reg conv (tal_build_effidehead_
    layer :280-381, channels = the scale's neck channels)
  - 1x1 preds: cls (nc), reg (4*(reg_max+1) DFL bins)
  - train output: raw maps (B, ny, nx, 1, 4*(reg_max+1)+nc) [bins, cls]
  - eval decode: DFL projection -> dist2bbox around (grid+0.5) anchor points,
    scaled by stride; output [xywh, obj=1, sigmoid cls] (:173-215)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..common import Conv
from ..spec import ModelSpec


def decode_tal_scale(raw: jnp.ndarray, stride: float, reg_max: int,
                     use_dfl: bool, nc: int) -> jnp.ndarray:
    """(B, ny, nx, 1, bins+nc) -> (B, ny*nx, 5+nc) [xywh abs, 1, cls]."""
    from ...losses.tal_loss import dfl_project

    b, ny, nx, na, _ = raw.shape
    nbins = 4 * (reg_max + 1)
    reg = raw[..., :nbins]
    cls = jax.nn.sigmoid(raw[..., nbins:])
    ltrb = dfl_project(reg, reg_max) if use_dfl else reg[..., :4]
    gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
    anc = jnp.stack([gx + 0.5, gy + 0.5], -1)[:, :, None, :]
    x1y1 = anc - ltrb[..., 0:2]
    x2y2 = anc + ltrb[..., 2:4]
    cxy = (x1y1 + x2y2) / 2 * stride
    wh = (x2y2 - x1y1) * stride
    obj = jnp.ones_like(cxy[..., :1])
    out = jnp.concatenate([cxy, wh, obj, cls], axis=-1)
    return out.reshape(b, na * ny * nx, 5 + nc)


class YoloV6Detect(nn.Module):
    """TAL anchor-free head ('YoloV6' in the head factory)."""

    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @property
    def strides(self):
        return self.spec.strides

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False,
                 decode: bool | None = None):
        spec = self.spec
        nc = spec.nc
        reg_max = spec.reg_max
        nbins = 4 * (reg_max + 1)
        act = {"SiLU": "silu", "ReLU": "relu"}.get(spec.head_act, "relu")
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)

        raw = []
        for i, f in enumerate(feats):
            b, ny, nx, c = f.shape
            x = Conv(c, 1, 1, act=act, name=f"stems_{i}", **kw)(f, train)
            cls_feat = Conv(c, 3, 1, act=act, name=f"cls_convs_{i}", **kw)(
                x, train
            )
            reg_feat = Conv(c, 3, 1, act=act, name=f"reg_convs_{i}", **kw)(
                x, train
            )
            cls_out = nn.Conv(nc, (1, 1), use_bias=True, dtype=self.dtype,
                              name=f"cls_preds_{i}")(cls_feat)
            reg_out = nn.Conv(nbins, (1, 1), use_bias=True, dtype=self.dtype,
                              name=f"reg_preds_{i}")(reg_feat)
            out = jnp.concatenate([reg_out, cls_out], axis=-1)
            raw.append(out.reshape(b, ny, nx, 1, nbins + nc))

        if decode is None:
            decode = not train
        if not decode:
            return raw
        z = [
            decode_tal_scale(r.astype(jnp.float32), self.strides[i], reg_max,
                             spec.use_dfl, nc)
            for i, r in enumerate(raw)
        ]
        return jnp.concatenate(z, axis=1), raw
