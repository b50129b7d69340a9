"""YOLOX decoupled anchor-free head in Flax.

Parity with reference models/head/yolox_head.py:40-365:
  - per-scale 1x1 projection to feat_channels (width-scaled), then
    depth-scaled stacks of 3x3 convs for separate cls/reg towers
    (yolox_head.py:103-118, num_decouple = get_depth(Head.num_decouple))
  - per-scale 1x1 cls (nc) / reg (4) / obj (1) preds with prior-prob bias
    init -log((1-p)/p) on cls and obj (yolox_head.py:169-180)
  - train output: raw maps (B, ny, nx, na=1, 5+nc) laid out [xywh, obj, cls]
  - eval decode: xy = (reg + grid) * stride, wh = exp(reg) * stride, obj/cls
    sigmoid (yolox_head.py:341-362); returns (concat, raw) like the v5 head
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common import Conv, make_divisible
from ..spec import ModelSpec


def _prior_bias(prior_prob: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, -math.log((1 - prior_prob) / prior_prob), dtype)

    return init


def decode_yolox_scale(raw: jnp.ndarray, stride: float) -> jnp.ndarray:
    """(B, ny, nx, 1, no) raw -> (B, ny*nx, no) absolute decode."""
    b, ny, nx, na, no = raw.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
    grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]
    xy = (raw[..., 0:2] + grid) * stride
    wh = jnp.exp(raw[..., 2:4]) * stride
    rest = jax.nn.sigmoid(raw[..., 4:])
    out = jnp.concatenate([xy, wh, rest], axis=-1)
    return out.reshape(b, na * ny * nx, no)


class YoloXDetect(nn.Module):
    """Anchor-free decoupled head ('YoloX' in the head factory)."""

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
        no = 5 + nc
        gw, gd = spec.width_multiple, spec.depth_multiple
        dec_c = make_divisible(256 * gw, 8)  # Head.feat_channels scaled
        num_dec = max(round(spec.num_decouple * gd), 1) \
            if spec.num_decouple > 0 else 0
        act = {"SiLU": "silu", "ReLU": "relu"}.get(spec.head_act, "hard_swish")
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)

        raw = []
        for i, f in enumerate(feats):
            b, ny, nx, _ = f.shape
            if num_dec > 0:
                f = Conv(dec_c, 1, 1, act=act, name=f"conv{i + 1}", **kw)(
                    f, train
                )
                cls_x, reg_x = f, f
                for j in range(num_dec):
                    cls_x = Conv(dec_c, 3, 1, act=act, name=f"cls{i}_{j}",
                                 **kw)(cls_x, train)
                    reg_x = Conv(dec_c, 3, 1, act=act, name=f"reg{i}_{j}",
                                 **kw)(reg_x, train)
            else:
                cls_x = reg_x = f
            cls_out = nn.Conv(nc, (1, 1), use_bias=True, dtype=self.dtype,
                              bias_init=_prior_bias(spec.prior_prob),
                              name=f"cls_preds_{i}")(cls_x)
            reg_out = nn.Conv(4, (1, 1), use_bias=True, dtype=self.dtype,
                              name=f"reg_preds_{i}")(reg_x)
            obj_out = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                              bias_init=_prior_bias(spec.prior_prob),
                              name=f"obj_preds_{i}")(reg_x)
            out = jnp.concatenate([reg_out, obj_out, cls_out], axis=-1)
            raw.append(out.reshape(b, ny, nx, 1, no))

        if decode is None:
            decode = not train
        if not decode:
            return raw
        z = [
            decode_yolox_scale(r.astype(jnp.float32), self.strides[i])
            for i, r in enumerate(raw)
        ]
        return jnp.concatenate(z, axis=1), raw
