"""End-user inference wrappers: AutoShape + Detections.

Parity with reference models/backbone/common.py:800-960 (AutoShape handles
arbitrary input images end to end; Detections holds results with xyxy/xywh
views, render/save/crop helpers).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Union

import cv2
import numpy as np

from ..data.augment import letterbox
from ..eval.validator import _scale_to_native
from ..ops.nms import batched_nms


class Detections:
    """Per-image detection results (reference common.py:884-960)."""

    def __init__(self, imgs, preds, names):
        self.imgs = imgs                      # original BGR images
        self.preds = preds                    # list of (n, 6) xyxy conf cls
        self.names = names
        self.n = len(imgs)

    @property
    def xyxy(self) -> List[np.ndarray]:
        return self.preds

    @property
    def xywh(self) -> List[np.ndarray]:
        out = []
        for p in self.preds:
            q = p.copy()
            q[:, 0] = (p[:, 0] + p[:, 2]) / 2
            q[:, 1] = (p[:, 1] + p[:, 3]) / 2
            q[:, 2] = p[:, 2] - p[:, 0]
            q[:, 3] = p[:, 3] - p[:, 1]
            out.append(q)
        return out

    def render(self) -> List[np.ndarray]:
        rendered = []
        for img, det in zip(self.imgs, self.preds):
            img = img.copy()
            for *xyxy, conf, cls in det:
                c = int(cls)
                color = (37 * c % 255, 17 * c % 255, 29 * c % 255)
                cv2.rectangle(img, (int(xyxy[0]), int(xyxy[1])),
                              (int(xyxy[2]), int(xyxy[3])), color, 2)
                name = self.names[c] if c < len(self.names) else str(c)
                cv2.putText(img, f"{name} {conf:.2f}",
                            (int(xyxy[0]), int(xyxy[1]) - 4),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
            rendered.append(img)
        return rendered

    def save(self, save_dir: Union[str, Path] = "runs/detect"):
        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        for i, img in enumerate(self.render()):
            cv2.imwrite(str(save_dir / f"image{i}.jpg"), img)

    def crop(self) -> List[List[np.ndarray]]:
        out = []
        for img, det in zip(self.imgs, self.preds):
            crops = []
            for *xyxy, conf, cls in det:
                x1, y1, x2, y2 = (max(0, int(v)) for v in xyxy)
                crops.append(img[y1:y2, x1:x2].copy())
            out.append(crops)
        return out

    def print(self):
        for i, det in enumerate(self.preds):
            counts = {}
            for c in det[:, 5].astype(int):
                counts[c] = counts.get(c, 0) + 1
            desc = ", ".join(
                f"{v} {self.names[k] if k < len(self.names) else k}"
                for k, v in counts.items()
            )
            print(f"image {i}: {desc or 'no detections'}")

    def __len__(self):
        return self.n


class AutoShape:
    """Arbitrary-input inference wrapper (reference common.py:800-880):
    accepts file paths / BGR arrays / lists thereof, letterboxes, runs the
    jitted forward + NMS, and rescales back to native space."""

    conf = 0.25
    iou = 0.45
    max_det = 300

    def __init__(self, model, variables, spec, names: Optional[Sequence[str]] = None,
                 img_size: int = 640, norm_scale: float = 255.0):
        import jax
        import jax.numpy as jnp

        self.spec = spec
        self.names = list(names or [str(i) for i in range(spec.nc)])
        self.img_size = img_size

        @jax.jit
        def fwd(v, x):
            decoded, _ = model.apply(
                v, x.astype(jnp.bfloat16) / norm_scale, train=False
            )
            return decoded

        self._fwd = fwd
        self._variables = variables
        self._jnp = jnp

    def __call__(self, inputs, size: Optional[int] = None) -> Detections:
        size = size or self.img_size
        if not isinstance(inputs, (list, tuple)):
            inputs = [inputs]
        imgs0 = []
        for item in inputs:
            if isinstance(item, (str, Path)):
                imgs0.append(cv2.imread(str(item)))
            else:
                imgs0.append(np.asarray(item))
        batch = np.stack([
            np.ascontiguousarray(
                letterbox(im, size, auto=False)[0][:, :, ::-1]
            )
            for im in imgs0
        ])
        decoded = self._fwd(self._variables, self._jnp.asarray(batch))
        out = batched_nms(
            decoded, nc=self.spec.nc, conf_thres=self.conf,
            iou_thres=self.iou, max_det=self.max_det, max_nms=2048,
        )
        dets = np.asarray(out.detections)
        valid = np.asarray(out.valid)
        preds = []
        for i, im0 in enumerate(imgs0):
            det = dets[i][valid[i]].copy()
            if len(det):
                det[:, :4] = _scale_to_native(
                    det[:, :4], (size, size), im0.shape[:2]
                )
            preds.append(det)
        return Detections(imgs0, preds, self.names)


class Ensemble:
    """Multi-checkpoint ensemble (reference models/backbone/experimental.py
    Ensemble:110-128): averages the decoded prediction tensors of several
    same-architecture models before NMS."""

    def __init__(self, model, variables_list):
        import jax
        import jax.numpy as jnp

        self._vars = list(variables_list)

        @jax.jit
        def fwd(vs, x):
            outs = []
            for v in vs:
                decoded, _ = model.apply(v, x, train=False)
                outs.append(decoded)
            return jnp.mean(jnp.stack(outs), axis=0)

        self._fwd = fwd

    def __call__(self, x):
        return self._fwd(self._vars, x)


def attempt_load(weights, cfg, dtype=None):
    """Load one or many checkpoints for inference, EMA-preferred; several
    weights build an Ensemble (reference experimental.py:73-128)."""
    import jax.numpy as jnp

    from ..utils.checkpoint import load_eval_variables
    from .detector import build_model
    from .spec import spec_from_cfg

    spec = spec_from_cfg(cfg) if not hasattr(cfg, "nc") else cfg
    model = build_model(spec, ssod=False, dtype=dtype or jnp.bfloat16)
    paths = [weights] if isinstance(weights, (str, Path)) else list(weights)
    variables = [load_eval_variables(p) for p in paths]
    if len(variables) == 1:
        return model, variables[0]
    return model, Ensemble(model, variables)
