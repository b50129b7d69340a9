"""Import harness for the ACTUAL reference torch package at /root/reference.

The reference imports a few packages absent from this environment
(pkg_resources, torchvision) and downloads a font at import time
(reference utils/plots.py:51-61). This module shims those so the real
reference `Model`, `ComputeLoss` and `non_max_suppression` can be
instantiated on CPU torch and used as external parity oracles.

Only stdlib/torch shims are installed — the reference's own numerics are
untouched.
"""

from __future__ import annotations

import os
import shutil
import sys
import types
from pathlib import Path

REF_ROOT = "/root/reference"


def _shim_pkg_resources():
    if "pkg_resources" in sys.modules:
        return
    pkg = types.ModuleType("pkg_resources")

    def parse_version(s):
        parts = []
        for p in str(s).replace("+", ".").split("."):
            num = "".join(c for c in p if c.isdigit())
            parts.append(int(num) if num else 0)
        return tuple(parts)

    pkg.parse_version = parse_version
    pkg.get_distribution = lambda name: types.SimpleNamespace(version="0.0.0")
    sys.modules["pkg_resources"] = pkg


def _shim_torchvision():
    """torchvision.ops.nms as a pure-torch exact greedy loop."""
    if "torchvision" in sys.modules:
        return
    import torch

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")

    def _nms(boxes, scores, iou_thres):
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0].item()
            keep.append(i)
            if order.numel() == 1:
                break
            rest = order[1:]
            b1, b2 = boxes[i], boxes[rest]
            x1 = torch.maximum(b1[0], b2[:, 0])
            y1 = torch.maximum(b1[1], b2[:, 1])
            x2 = torch.minimum(b1[2], b2[:, 2])
            y2 = torch.minimum(b1[3], b2[:, 3])
            inter = (x2 - x1).clamp(0) * (y2 - y1).clamp(0)
            a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
            a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
            iou = inter / (a1 + a2 - inter)
            order = rest[iou <= iou_thres]
        return torch.tensor(keep, dtype=torch.long)

    tv_ops.nms = _nms
    tv.ops = tv_ops
    tv.__version__ = "0.0.0"
    tv_t = types.ModuleType("torchvision.transforms")

    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    tv_t.Compose = _Compose
    tv.transforms = tv_t
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv_ops
    sys.modules["torchvision.transforms"] = tv_t


def _ensure_font():
    """reference utils/plots.py downloads Arial.ttf at import; pre-seed it."""
    dst = Path(os.path.expanduser("~/.config/Ultralytics/Arial.ttf"))
    if dst.exists():
        return
    try:
        import matplotlib

        src = (Path(matplotlib.__file__).parent / "mpl-data/fonts/ttf/"
               "DejaVuSans.ttf")
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(src, dst)
    except Exception:
        pass  # Annotator() still imports if PIL finds any default font


def _shim_numpy_aliases():
    """The reference uses np.int (utils/general.py:516), removed in
    numpy>=1.24; restore the deprecated builtin alias."""
    import numpy as np

    if not hasattr(np, "int"):
        np.int = int
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "bool"):
        np.bool = bool


def _shim_cuda_noop():
    """Several reference paths hardcode .cuda() (e.g. DomainLoss,
    models/loss/loss.py:332). On this CPU-only torch, make it a no-op so
    those numerics stay testable."""
    import torch

    if getattr(torch.Tensor.cuda, "_ref_compat", False):
        return

    def cuda(self, *a, **k):
        return self

    cuda._ref_compat = True
    torch.Tensor.cuda = cuda


def _shim_torch_clamp():
    """The reference was written against an older torch where
    `long_tensor.clamp_(0, float_tensor)` silently cast the bound
    (models/assigner/yolo_anchor_assigner.py:367); torch 2.x raises.
    Restore the old behavior: cast tensor bounds to python numbers when
    clamping an integer tensor. Values are exact integers stored as float,
    so numerics are unchanged."""
    import torch

    if getattr(torch.Tensor.clamp_, "_ref_compat", False):
        return
    orig = torch.Tensor.clamp_

    def clamp_(self, min=None, max=None):
        if not torch.is_floating_point(self):
            if isinstance(min, torch.Tensor):
                min = min.item()
            if isinstance(max, torch.Tensor):
                max = max.item()
            if isinstance(min, float):
                min = int(min)
            if isinstance(max, float):
                max = int(max)
        return orig(self, min=min, max=max)

    clamp_._ref_compat = True
    torch.Tensor.clamp_ = clamp_


_ns = None


def load_reference():
    """Import the reference package once; returns a namespace with the
    pieces the parity tests need."""
    global _ns
    if _ns is not None:
        return _ns
    if not os.path.isdir(REF_ROOT):
        return None
    _shim_pkg_resources()
    _shim_torchvision()
    _shim_torch_clamp()
    _shim_cuda_noop()
    _shim_numpy_aliases()
    _ensure_font()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    from configs.defaults import get_cfg as ref_get_cfg  # noqa: E402
    from models.detector.yolo import Model as RefModel  # noqa: E402
    from models.loss.loss import ComputeLoss as RefComputeLoss  # noqa: E402
    from utils import general as ref_general  # noqa: E402

    _ns = types.SimpleNamespace(
        get_cfg=ref_get_cfg,
        Model=RefModel,
        ComputeLoss=RefComputeLoss,
        general=ref_general,
        root=REF_ROOT,
    )
    return _ns


def build_ref_model(yaml_rel: str, seed: int = 0):
    """Build the reference torch model from one of its own config YAMLs."""
    import torch

    ns = load_reference()
    cfg = ns.get_cfg()
    cfg.merge_from_file(os.path.join(REF_ROOT, "configs", yaml_rel))
    torch.manual_seed(seed)
    model = ns.Model(cfg)
    model.eval().float()
    return model, cfg
