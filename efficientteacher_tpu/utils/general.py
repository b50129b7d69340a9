"""Small host-side utilities (parity: reference utils/general.py misc)."""

from __future__ import annotations

import math
import os
import re
from pathlib import Path


def increment_path(path, exist_ok: bool = False, sep: str = "",
                   mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, exp3... (reference general.py:1230-1246)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        suffix = path.suffix
        path = path.with_suffix("")
        dirs = [str(p) for p in path.parent.glob(f"{path.name}{sep}*")]
        matches = [re.search(rf"%s{sep}(\d+)" % re.escape(path.name), d)
                   for d in dirs]
        nums = [int(m.groups()[0]) for m in matches if m]
        n = max(nums) + 1 if nums else 2
        path = Path(f"{path}{sep}{n}{suffix}")
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def check_img_size(imgsz: int, s: int = 32, floor: int = 0) -> int:
    """Round image size to a stride multiple (reference general.py:313-322)."""
    new_size = max(math.ceil(imgsz / s) * s, floor)
    return int(new_size)


def colorstr(*input):
    """ANSI color helper (reference general.py colorstr)."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m", "bold": "\033[1m",
        "end": "\033[0m",
    }
    return "".join(colors.get(x, "") for x in args) + str(string) + colors["end"]


def one_flat_cycle(y1: float, y2: float, steps: int):
    """Alias used by some configs; see train.optim.one_cycle."""
    from ..train.optim import one_cycle

    return one_cycle(y1, y2, steps)


def labels_to_class_weights(labels, nc: int = 80):
    """Inverse-frequency class weights from dataset labels
    (reference utils/general.py labels_to_class_weights; attached to the
    model as class_weights, trainer.py:317)."""
    import numpy as np

    counts = np.zeros(nc, np.float64)
    for lb in labels:
        if len(lb):
            counts += np.bincount(lb[:, 0].astype(int), minlength=nc)
    counts[counts == 0] = 1
    w = 1.0 / counts
    return (w / w.sum()).astype(np.float32)


def init_seeds(seed: int = 0):
    """Seed python/numpy RNGs and return a jax PRNGKey
    (reference utils/general.py init_seeds + torch_utils.init_torch_seeds)."""
    import random as _random

    import numpy as np

    _random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
