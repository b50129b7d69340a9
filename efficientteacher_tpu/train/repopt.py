"""RepOptimizer: gradient-reparameterized training for RealVGG models.

Parity with reference models/optimizers/RepOptimizer.py:18-180 (RepOpt-VGG):
a plain conv3x3 network (RealVGGModel) trains with per-kernel gradient
masks derived from the per-channel scales of a pretrained CSLA/LinearAdd
"RepScale" checkpoint (cfg.Model.RepScale_weight), making plain-topology SGD
equivalent to training the multi-branch CSLA net:

  mask = s_conv^2 (everywhere)
       + s_1x1^2 (center tap)
       + 1 at the center diagonal (identity branch, square blocks only)
  grad(conv3x3) *= mask                    (:163-178)

Optional re-initialization of the 3x3 kernels from the scales (:142-160).

Delta vs reference: scales are matched to blocks BY TREE PATH (both the
RealVGG student and the LinearAdd RepScale ckpt share block paths), not by
module traversal order — more robust to partial models.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np


def _is_linear_add(node) -> bool:
    return isinstance(node, dict) and "scale_conv" in node and "conv" in node


def _is_real_vgg(node) -> bool:
    return (
        isinstance(node, dict) and set(node) >= {"conv", "bn"}
        and "rbr_dense_conv" not in node
        and isinstance(node.get("conv"), dict)
        and "kernel" in node["conv"]
        and np.ndim(node["conv"]["kernel"]) == 4
        and np.shape(node["conv"]["kernel"])[0] == 3
    )


def extract_scales(repscale_params: Dict) -> Dict[str, Tuple]:
    """Walk a LinearAdd checkpoint's params; returns path -> (s_identity?,
    s_1x1, s_conv) numpy tuples (reference extract_scales, :18-29)."""
    out: Dict[str, Tuple] = {}

    def walk(node, path):
        if _is_linear_add(node):
            key = "/".join(path)
            s_conv = np.asarray(node["scale_conv"])
            s_1x1 = np.asarray(node["scale_1x1"])
            if "scale_identity" in node:
                out[key] = (np.asarray(node["scale_identity"]), s_1x1, s_conv)
            else:
                out[key] = (s_1x1, s_conv)
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])

    walk(repscale_params, [])
    return out


def build_grad_masks(params: Dict, scales: Dict[str, Tuple]):
    """Mask pytree shaped like `params`: conv kernels of RealVGG blocks get
    the RepOpt mask, everything else gets 1.0 (scalar). Kernels are HWIO."""

    def walk(node, path):
        if _is_real_vgg(node) and "/".join(path) in scales:
            sc = scales["/".join(path)]
            k = np.asarray(node["conv"]["kernel"])
            h, w, ci, co = k.shape
            if len(sc) == 2:
                s_1x1, s_conv = sc
                mask = np.ones((h, w, ci, co), np.float32) * (s_conv**2)
                mask[1, 1] += s_1x1**2
            else:
                s_id, s_1x1, s_conv = sc
                mask = np.ones((h, w, ci, co), np.float32) * (s_conv**2)
                mask[1, 1] += s_1x1**2
                ids = np.arange(min(ci, co))
                mask[1, 1, ids, ids] += 1.0
            return {
                "conv": {"kernel": mask},
                "bn": jax.tree.map(lambda _: 1.0, node["bn"]),
            }
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        return 1.0

    return walk(params, [])


def apply_grad_masks(grads, masks):
    """grads * masks, elementwise over matching leaves."""
    return jax.tree.map(
        lambda g, m: g * m if not np.isscalar(m) or m != 1.0 else g,
        grads, masks,
    )


def load_repscale_scales(path: str) -> Dict[str, Tuple]:
    """cfg.Model.RepScale_weight -> path->scales map (reference
    trainer/trainer.py:219-236: torch.load of the LinearAdd hyper-search
    checkpoint feeding RepVGGOptimizer). Accepts our .ckpt (LinearAdd model
    params, EMA preferred) or a reference torch .pt."""
    if str(path).endswith(".pt"):
        from ..utils.torch_import import load_torch_weights

        tree = load_torch_weights(path)
        src = tree["params"]
    else:
        from ..utils.checkpoint import load_checkpoint

        ckpt = load_checkpoint(path)
        src = ckpt.get("ema") or ckpt["model"]
        if isinstance(src, dict) and "params" in src:
            src = src["params"]
    scales = extract_scales(src)
    if not scales:
        raise ValueError(
            f"no LinearAdd/CSLA scale branches found in {path!r} — "
            "RepScale_weight must point at a model trained with "
            "Model.LinearAddModel: True"
        )
    return scales


def reinitialize_from_scales(params: Dict, scales: Dict[str, Tuple],
                             rng: Optional[np.random.Generator] = None):
    """Re-init RealVGG 3x3 kernels to the fused CSLA equivalent
    (reference reinitialize, :142-160)."""
    rng = rng or np.random.default_rng(0)

    def walk(node, path):
        if _is_real_vgg(node) and "/".join(path) in scales:
            sc = scales["/".join(path)]
            k = np.asarray(node["conv"]["kernel"]).copy()
            h, w, ci, co = k.shape
            k1 = rng.normal(0, np.sqrt(2.0 / ci), (1, 1, ci, co)).astype(
                np.float32
            )
            if len(sc) == 2:
                s_1x1, s_conv = sc
                k = k * s_conv[None, None, None, :]
                k[1:2, 1:2] += k1 * s_1x1[None, None, None, :]
            else:
                s_id, s_1x1, s_conv = sc
                k = k * s_conv[None, None, None, :]
                k[1:2, 1:2] += k1 * s_1x1[None, None, None, :]
                ids = np.arange(min(ci, co))
                k[1, 1, ids, ids] += s_id[: len(ids)]
            node = dict(node)
            node["conv"] = {"kernel": k}
            return node
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        return node

    return walk(params, [])
