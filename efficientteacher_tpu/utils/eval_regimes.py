"""Serving-bench weight regimes + candidate-density instrumentation.

Single source of truth for the two weight regimes the serving benchmarks
time (bench.py, scripts/ab_selection.py, scripts/profile_eval.py) so the
regime definition can never drift between the tools that record it:

  representative: a FRESH smart-bias init — heads put objectness at the
    focal prior log(8/grid^2) (reference initialize_biases,
    models/head/yolov5_head.py:36-45), the sparse candidate field a
    converged detector shows at the 0.001 eval gate.
  pathological:   `saturate_obj` pushes every head objectness bias up by
    +10, lighting ~every (anchor, class) lattice pair — the dense tail
    that forces the selection engine's worst case. Deterministic, unlike
    "whatever the noise-trained bench state happens to produce" (r5
    lesson: the r4 trained state saturated obj, the r5 one did not, and
    the bench's "pathological" number silently measured a sparse field).

`candidate_density` reuses ops/nms._pair_scores — the exact gate the NMS
path applies — so the recorded density stats describe precisely what the
selection kernel sees (reference gate semantics: utils/general.py:1005,
multi-label expansion :1058).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def yolov5l_eval_cfg():
    """The YOLOv5l @640 config every serving measurement runs on."""
    from ..configs import get_cfg

    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 1.0
    cfg.Model.depth_multiple = 1.0
    cfg.Dataset.nc = 80
    cfg.Dataset.img_size = 640
    return cfg


def saturate_obj(variables, no: int = 85, delta: float = 10.0):
    """Return a copy of `variables` with every head objectness bias
    raised by `delta` — the deterministic pathological serving regime.

    Head output biases are identified as 1-D 'bias' leaves under a
    module path containing 'head' whose size is a multiple of
    `no` = 5 + nc (the per-anchor prediction width).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"])
    out = {}
    for kk, v in flat.items():
        if kk[-1] == "bias" and "head" in "/".join(kk).lower() and \
                v.ndim == 1 and v.size % no == 0:
            vv = np.asarray(v).reshape(-1, no).copy()
            vv[:, 4] += delta
            v = jnp.asarray(vv.reshape(-1))
        out[kk] = v
    return {"params": flax.traverse_util.unflatten_dict(out),
            "batch_stats": variables["batch_stats"]}


def make_density_fn(model, nc: int, conf_thres: float = 0.001):
    """Jitted (variables, images_u8) -> (mean candidates/img, max live
    128-lane rows of the flat (anchor, class) lattice).

    Gating is ops/nms._pair_scores itself (candidates are scores > 0),
    row granularity mirrors ops/select_pallas's 128-lane tiles.
    """
    from ..ops.nms import _pair_scores

    @jax.jit
    def density(variables, images_u8):
        x = images_u8.astype(jnp.bfloat16) / 255.0
        decoded = model.apply(variables, x, train=False)[0]
        decoded = decoded.astype(jnp.float32)
        score, _, _ = jax.vmap(
            lambda p: _pair_scores(p, nc, conf_thres, False, 0, False,
                                   None))(decoded)
        keep = score > 0  # (B, anchors*nc) candidate lattice
        bsz, n = keep.shape
        pad = (-n) % 128
        flat = jnp.pad(keep, ((0, 0), (0, pad)))
        rows = jnp.any(flat.reshape(bsz, -1, 128), -1)
        return (jnp.sum(keep) / bsz, jnp.max(jnp.sum(rows, -1)))

    return density
