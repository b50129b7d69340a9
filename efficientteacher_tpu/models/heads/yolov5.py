"""YOLOv5 anchor-based Detect head in Flax.

Parity with reference models/head/yolov5_head.py:7-159:
  - per-scale 1x1 conv to na*(5+nc+np) channels (bias on)
  - focal-prior bias init (obj: log(8/(640/s)^2), cls: log(0.6/(nc-0.99)))
    (reference yolov5_head.py:36-45)
  - train output: raw maps, here laid out (B, ny, nx, na, no) NHWC-style
  - eval decode: xy=(2*sig-0.5+grid)*stride, wh=(2*sig)^2*anchor_px
    (reference yolov5_head.py:70-79), flattened in the reference's
    (anchor, y, x) order for bit-comparable outputs

TPU-first deltas: strides are static from config (no dummy-forward probe,
reference yolo.py:68-76 replaced by SURVEY.md §7.1 static mapping); grids are
built with broadcasted_iota at trace time and folded by XLA.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..spec import ModelSpec


def _detect_bias_init(na: int, no: int, nc: int, stride: float):
    """Per-scale focal-prior bias (reference yolov5_head.py:41-44)."""

    def init(key, shape, dtype=jnp.float32):
        b = np.zeros((na, no), np.float32)
        b[:, 4] += math.log(8.0 / (640.0 / stride) ** 2)
        b[:, 5 : 5 + nc] += math.log(0.6 / (nc - 0.99))
        return jnp.asarray(b.reshape(-1), dtype)

    return init


def decode_yolov5_scale(
    raw: jnp.ndarray, stride: float, anchors_px: jnp.ndarray, nc: int
) -> jnp.ndarray:
    """Decode one scale's raw map (B, ny, nx, na, no) to absolute xywh+scores.

    Returns (B, na*ny*nx, no) flattened in (anchor, y, x) order to match the
    reference's cat ordering (yolov5_head.py:68-81).
    """
    b, ny, nx, na, no = raw.shape
    y = jax.nn.sigmoid(raw[..., : 5 + nc])
    gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
    grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]  # (ny, nx, 1, 2)
    xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * stride
    wh = (y[..., 2:4] * 2.0) ** 2 * anchors_px[None, None, None, :, :]
    out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
    if no > 5 + nc:
        # keypoint channels -> absolute pixels. The loss trains raw*anchor
        # as the cell-relative offset (losses/yolov5_loss.py keypoint
        # branch, mirroring reference loss.py:175-179), so the inverse is
        # kp_px = (raw * anchor_grid_units + cell) * stride
        #       = raw * anchors_px + cell_px.
        # Deliberate fix over the reference, whose eval decode ZEROES the
        # keypoint channels (yolov5_head.py:72 `y = torch.full_like(x,0)`
        # assigns only class_range) — keypoint inference is dead upstream.
        npk2 = no - 5 - nc
        kp = raw[..., 5 + nc :].reshape(raw.shape[:-1] + (npk2 // 2, 2))
        kp = kp * anchors_px[None, None, None, :, None, :] \
            + grid[..., None, :] * stride
        out = jnp.concatenate(
            [out, kp.reshape(raw.shape[:-1] + (npk2,))], axis=-1)
    # (B, ny, nx, na, no) -> (B, na, ny, nx, no) -> flatten, reference order
    out = jnp.transpose(out, (0, 3, 1, 2, 4))
    return out.reshape(b, na * ny * nx, no)


class YoloV5Detect(nn.Module):
    """Anchor-based detection head ('YoloV5' in the head factory)."""

    spec: ModelSpec
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @property
    def nc(self) -> int:
        return self.spec.nc

    @property
    def strides(self) -> Tuple[float, ...]:
        return self.spec.strides

    @property
    def anchors_px(self) -> np.ndarray:
        """(nl, na, 2) anchors in input pixels (config units)."""
        a = np.asarray(self.spec.anchors, np.float32)
        return a.reshape(len(self.spec.anchors), -1, 2)

    @property
    def anchors_grid(self) -> np.ndarray:
        """(nl, na, 2) anchors in grid units (anchors_px / stride) — the units
        the assigner/loss work in (reference yolo.py:73 `m.anchors /= stride`)."""
        s = np.asarray(self.strides, np.float32)[:, None, None]
        return self.anchors_px / s

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False,
                 decode: bool | None = None):
        """feats: (P3, P4, P5) NHWC features from the neck.

        Returns raw per-scale maps [(B, ny, nx, na, no), ...]; when
        `decode` (default: not train), also returns the concatenated decoded
        predictions (B, N, no) as `(decoded, raw_maps)` mirroring the
        reference eval contract (yolov5_head.py:87).
        """
        nc = self.nc
        npk = self.spec.num_keypoints
        # coherent channel count: 2 coords per keypoint (see yolov7 note)
        no = nc + 2 * npk + 5
        anchors = self.anchors_px
        nl, na = anchors.shape[0], anchors.shape[1]
        assert len(feats) == nl

        raw = []
        for i, f in enumerate(feats):
            b, ny, nx, _ = f.shape
            x = nn.Conv(
                na * no, (1, 1), use_bias=True, dtype=self.dtype,
                bias_init=_detect_bias_init(na, no, nc, self.strides[i]),
                name=f"m_{i}",
            )(f)
            # (B, ny, nx, na*no) -> (B, ny, nx, na, no)
            raw.append(x.reshape(b, ny, nx, na, no))

        if decode is None:
            decode = not train
        if not decode:
            return raw
        z = [
            decode_yolov5_scale(r.astype(jnp.float32), self.strides[i],
                                jnp.asarray(anchors[i]), nc)
            for i, r in enumerate(raw)
        ]
        return jnp.concatenate(z, axis=1), raw
