"""Deploy-time reparameterization: conv+BN fusion and RepVGG branch fusion.

Replaces the reference's fuse path (Model.fuse at models/detector/yolo.py:
95-128 via fuse_conv_and_bn, and RepVGGBlock.switch_to_deploy at
models/backbone/common.py:1002-1120).

TPU note: plain conv+BN folding is a no-op for XLA (inference BN is an
affine transform the compiler already fuses into the conv); what matters on
TPU is collapsing the RepVGG 3-branch topology into ONE 3x3 conv — that
removes two real convolutions per block at serving time. `fuse_repvgg_tree`
rewrites a trained params/batch_stats tree into the deploy tree consumed by
`RepVGGBlock(deploy=True)` models.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def fuse_conv_bn(
    kernel: np.ndarray,  # HWIO
    bn_scale: np.ndarray,
    bn_bias: np.ndarray,
    bn_mean: np.ndarray,
    bn_var: np.ndarray,
    eps: float = 1e-3,
    conv_bias: np.ndarray | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold BN into conv: returns (kernel', bias')."""
    std = np.sqrt(bn_var + eps)
    t = bn_scale / std  # per output channel
    k = kernel * t[None, None, None, :]
    b = bn_bias - bn_mean * t
    if conv_bias is not None:
        b = b + conv_bias * t
    return k.astype(kernel.dtype), b.astype(kernel.dtype)


def _pad_1x1_to_3x3(k: np.ndarray) -> np.ndarray:
    out = np.zeros((3, 3) + k.shape[2:], k.dtype)
    out[1, 1] = k[0, 0]
    return out


def _identity_kernel_3x3(channels: int, groups: int = 1) -> np.ndarray:
    cin = channels // groups
    k = np.zeros((3, 3, cin, channels), np.float32)
    for o in range(channels):
        k[1, 1, o % cin, o] = 1.0
    return k


def fuse_repvgg_block(p: Dict, bs: Dict, eps: float = 1e-3):
    """One RepVGG block's trained params/stats -> (kernel3x3, bias)."""
    k3, b3 = fuse_conv_bn(
        np.asarray(p["rbr_dense_conv"]["kernel"]),
        np.asarray(p["rbr_dense_bn"]["scale"]),
        np.asarray(p["rbr_dense_bn"]["bias"]),
        np.asarray(bs["rbr_dense_bn"]["mean"]),
        np.asarray(bs["rbr_dense_bn"]["var"]),
        eps,
    )
    k1, b1 = fuse_conv_bn(
        np.asarray(p["rbr_1x1_conv"]["kernel"]),
        np.asarray(p["rbr_1x1_bn"]["scale"]),
        np.asarray(p["rbr_1x1_bn"]["bias"]),
        np.asarray(bs["rbr_1x1_bn"]["mean"]),
        np.asarray(bs["rbr_1x1_bn"]["var"]),
        eps,
    )
    k = k3 + _pad_1x1_to_3x3(k1)
    b = b3 + b1
    if "rbr_identity" in p:  # identity BN branch
        cout = k3.shape[-1]
        kid, bid = fuse_conv_bn(
            _identity_kernel_3x3(cout),
            np.asarray(p["rbr_identity"]["scale"]),
            np.asarray(p["rbr_identity"]["bias"]),
            np.asarray(bs["rbr_identity"]["mean"]),
            np.asarray(bs["rbr_identity"]["var"]),
            eps,
        )
        k = k + kid
        b = b + bid
    return k, b


def _is_repvgg_node(p) -> bool:
    return isinstance(p, dict) and "rbr_dense_conv" in p


def fuse_repvgg_tree(params: Dict, batch_stats: Dict, eps: float = 1e-3):
    """Rewrite every RepVGG block in the tree into its deploy form
    ({'rbr_reparam': {'kernel', 'bias'}}). Returns (params', batch_stats')
    where fused blocks' BN stats are removed."""

    def walk(p, bs):
        if _is_repvgg_node(p):
            k, b = fuse_repvgg_block(p, bs or {}, eps)
            return {"rbr_reparam": {"kernel": k, "bias": b}}, None
        if isinstance(p, dict):
            new_p, new_bs = {}, {}
            for key, val in p.items():
                sp, sbs = walk(val, (bs or {}).get(key))
                new_p[key] = sp
                if sbs is not None:
                    new_bs[key] = sbs
            # keep stats that had no param counterpart (shouldn't happen)
            if bs:
                for key, val in bs.items():
                    if key not in p:
                        new_bs[key] = val
            return new_p, (new_bs if new_bs else None)
        return p, bs

    new_params, new_stats = walk(params, batch_stats)
    return new_params, (new_stats or {})
