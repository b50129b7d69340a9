"""Shared building blocks for the model zoo, as Flax modules.

TPU-native counterparts of the reference's block library
(reference: models/backbone/common.py — Conv:471, Bottleneck:534, C3:566,
C2f:594, SPP:655, SPPF:682, Focus:711, RepVGGBlock:1002, ELAN:1523,
ImplicitA/M:1482/1495). Differences from the reference are deliberate:

  - NHWC layout and HWIO kernels (XLA/TPU native, feeds the MXU directly)
  - bf16 compute / f32 params via the `dtype` attribute
  - BatchNorm carries `axis_name` for cross-replica stats (the reference's
    SyncBN option) and momentum/eps match the reference's overrides
    (utils/torch_utils.py:167-169: eps 1e-3, momentum 0.03)
  - submodule field names mirror the reference state_dict keys
    (`cv1`, `m_0`, `stage2_1`, ...) so torch checkpoint import is a
    mechanical name map
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round channel count up to a multiple (reference utils/general.py:470)."""
    return int(math.ceil(x / divisor) * divisor)


def autopad(k: int, p: int | None = None) -> int:
    return k // 2 if p is None else p


def get_activation(name) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry (reference common.py get_activation)."""
    if name in (True, "silu", "swish"):
        return nn.silu
    table = {
        "relu": nn.relu,
        "lrelu": lambda x: nn.leaky_relu(x, 0.1),
        "relu6": nn.relu6,
        "hard_swish": nn.hard_swish,
        "hard_sigmoid": nn.hard_sigmoid,
        "sigmoid": nn.sigmoid,
        "identity": lambda x: x,
        False: lambda x: x,
        None: lambda x: x,
    }
    if name not in table:
        raise KeyError(f"unsupported activation: {name!r}")
    return table[name]


def split_c3_act(act):
    """C3-style paired activations, e.g. 'relu_hswish' = inner relu, final
    hard_swish (reference common.py:573-584)."""
    pairs = {
        "relu_silu": ("relu", "silu"),
        "relu_lrelu": ("relu", "lrelu"),
        "relu_hswish": ("relu", "hard_swish"),
    }
    return pairs.get(act, (act, act))


class ConvBase(nn.Module):
    """Conv2D + BatchNorm + activation (reference Conv, common.py:471).

    NHWC in/out. `fuse` folds BN into the conv at inference-export time via
    the checkpoint utilities (not a module concern here).
    """

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    bn_momentum: float = 0.97  # reference BN momentum 0.03 => flax 1-0.03
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, self.p)
        x = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.g,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            name="bn",
        )(x)
        return get_activation(self.act)(x)


# The reference names this block `Conv`; keep an alias for readability at
# call sites that mirror reference code paths.
Conv = ConvBase


class DWConv(nn.Module):
    """Depthwise-separable grouping convenience (reference common.py:492)."""

    c2: int
    k: int = 1
    s: int = 1
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(x.shape[-1], self.c2)
        return ConvBase(
            self.c2, self.k, self.s, None, g, self.act,
            dtype=self.dtype, axis_name=self.axis_name, name="conv",
        )(x, train)


class Bottleneck(nn.Module):
    """Standard residual bottleneck (reference common.py:534)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (1, 3)
    e: float = 0.5
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBase(c_, self.k[0], 1, act=self.act, dtype=self.dtype,
                     axis_name=self.axis_name, name="cv1")(x, train)
        y = ConvBase(self.c2, self.k[1], 1, g=self.g, act=self.act,
                     dtype=self.dtype, axis_name=self.axis_name, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            y = x + y
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference common.py:566)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner_act, last_act = split_c3_act(self.act)
        c_ = int(self.c2 * self.e)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        y1 = ConvBase(c_, 1, 1, act=inner_act, name="cv1", **kw)(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, act=inner_act,
                            name=f"m_{i}", **kw)(y1, train)
        y2 = ConvBase(c_, 1, 1, act=inner_act, name="cv2", **kw)(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBase(self.c2, 1, 1, act=last_act, name="cv3", **kw)(y, train)


class C2f(nn.Module):
    """CSP bottleneck with 2 convs, v8-style (reference common.py:594)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        y = ConvBase(2 * c, 1, 1, act=self.act, name="cv1", **kw)(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0,
                           act=self.act, name=f"m_{i}", **kw)(ys[-1], train)
            )
        y = jnp.concatenate(ys, axis=-1)
        return ConvBase(self.c2, 1, 1, act=self.act, name="cv2", **kw)(y, train)


class BottleneckCSP(nn.Module):
    """Original CSP block (reference common.py:547)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        y1 = ConvBase(c_, 1, 1, act=self.act, name="cv1", **kw)(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, act=True,
                            name=f"m_{i}", **kw)(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            axis_name=self.axis_name if train else None, dtype=self.dtype,
            name="bn",
        )(y)
        y = nn.leaky_relu(y, 0.1)
        return ConvBase(self.c2, 1, 1, act=self.act, name="cv4", **kw)(y, train)


def _max_pool_same(x, k: int):
    # custom-VJP pool: select-and-scatter (XLA's maxpool grad) is both
    # slow on TPU and wrong under GSPMD spatial sharding (ops/pool.py)
    from ..ops.pool import max_pool_same

    return max_pool_same(x, k)


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (reference common.py:682)."""

    c2: int
    k: int = 5
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner_act, last_act = split_c3_act(self.act)
        c_ = x.shape[-1] // 2
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        x = ConvBase(c_, 1, 1, act=inner_act, name="cv1", **kw)(x, train)
        y1 = _max_pool_same(x, self.k)
        y2 = _max_pool_same(y1, self.k)
        y3 = _max_pool_same(y2, self.k)
        y = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBase(self.c2, 1, 1, act=last_act, name="cv2", **kw)(y, train)


class SPP(nn.Module):
    """Spatial pyramid pooling (reference common.py:655)."""

    c2: int
    k: Sequence[int] = (5, 9, 13)
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner_act, last_act = split_c3_act(self.act)
        c_ = x.shape[-1] // 2
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        x = ConvBase(c_, 1, 1, act=inner_act, name="cv1", **kw)(x, train)
        ys = [x] + [_max_pool_same(x, k) for k in self.k]
        y = jnp.concatenate(ys, axis=-1)
        return ConvBase(self.c2, 1, 1, act=last_act, name="cv2", **kw)(y, train)


class Focus(nn.Module):
    """Space-to-depth stem (reference common.py:711)."""

    c2: int
    k: int = 1
    s: int = 1
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        return ConvBase(self.c2, self.k, self.s, act=self.act, dtype=self.dtype,
                        axis_name=self.axis_name, name="conv")(y, train)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample, NHWC. Implemented with reshape-broadcast (cheap
    on TPU; avoids gather-based jax.image.resize)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class RepVGGBlock(nn.Module):
    """RepVGG training-time block: 3x3 + 1x1 + (identity BN) branches
    (reference common.py:1002-1120). Deploy-time fusion into one 3x3 conv is
    done by `efficientteacher_tpu.utils.reparam.fuse_repvgg`.
    """

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = "relu"
    use_se: bool = False
    deploy: bool = False
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.k == 3
        if self.deploy:
            # single fused 3x3 conv (weights produced by
            # utils.reparam.fuse_repvgg_tree)
            y = nn.Conv(self.c2, (3, 3), (self.s, self.s),
                        padding=[(1, 1), (1, 1)], feature_group_count=self.g,
                        use_bias=True, dtype=self.dtype,
                        name="rbr_reparam")(x)
            return get_activation(self.act)(y)
        c1 = x.shape[-1]
        bn_kw = dict(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            axis_name=self.axis_name if train else None, dtype=self.dtype,
        )
        dense = nn.Conv(self.c2, (3, 3), (self.s, self.s),
                        padding=[(1, 1), (1, 1)], feature_group_count=self.g,
                        use_bias=False, dtype=self.dtype, name="rbr_dense_conv")(x)
        dense = nn.BatchNorm(name="rbr_dense_bn", **bn_kw)(dense)
        one = nn.Conv(self.c2, (1, 1), (self.s, self.s), padding="VALID",
                      feature_group_count=self.g, use_bias=False,
                      dtype=self.dtype, name="rbr_1x1_conv")(x)
        one = nn.BatchNorm(name="rbr_1x1_bn", **bn_kw)(one)
        y = dense + one
        if c1 == self.c2 and self.s == 1:
            ident = nn.BatchNorm(name="rbr_identity", **bn_kw)(x)
            y = y + ident
        return get_activation(self.act)(y)


class RepBlock(nn.Module):
    """Sequence of rep-style blocks (YOLOv6 EfficientRep stage). The block
    class is selected by `block_type` (reference yolov6_backbone.py:29-36
    Model.{RealVGGModel,QARepVGGModel,LinearAddModel} switch)."""

    c2: int
    n: int = 1
    act: Any = "relu"
    deploy: bool = False
    block_type: str = "repvgg"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = VGG_BLOCKS[self.block_type]
        kw = dict(act=self.act, deploy=self.deploy, dtype=self.dtype,
                  axis_name=self.axis_name)
        x = block(self.c2, name="conv1", **kw)(x, train)
        for i in range(self.n - 1):
            x = block(self.c2, name=f"block_{i}", **kw)(x, train)
        return x


def max_pool_2x(x):
    """2x2/2 max pool (reference MP, common.py:1191)."""
    from ..ops.pool import max_pool_2x2

    return max_pool_2x2(x)


class AUG(nn.Module):
    """YOLOv7 downsample-merge helper (reference common.py:1507-1520):
    concat(conv3x3/2(conv1x1(x)), conv1x1(maxpool(x)))."""

    c2: int
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, mp_x, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        x0 = ConvBase(self.c2, 1, 1, act=self.act, name="cv0", **kw)(mp_x, train)
        x1 = ConvBase(self.c2, 1, 1, act=self.act, name="cv1", **kw)(x, train)
        x2 = ConvBase(self.c2, 3, 2, act=self.act, name="cv2", **kw)(x1, train)
        return jnp.concatenate([x2, x0], axis=-1)


class PreConv(nn.Module):
    """YOLOv7 stem stage (reference common.py:1557-1574)."""

    c2: int
    e: float = 0.5
    with_aug: bool = True
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        if self.with_aug:
            c_ = int(self.c2 * self.e)
            x = ConvBase(c_, 3, 1, act=self.act, name="cv0", **kw)(x, train)
        return ConvBase(self.c2, 3, 2, act=self.act, name="cv1", **kw)(x, train)


class ELAN(nn.Module):
    """YOLOv7 backbone ELAN stage (reference common.py:1523-1555):
    optional MP(+AUG) downsample, then two 1x1 branches, two n-deep 3x3
    chains, 4-way concat, 1x1 merge."""

    c2: int
    n: int = 1
    e: float = 0.5
    with_mp: bool = True
    with_aug: bool = True
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        c1 = x.shape[-1]
        c_ = int(c1 * self.e)
        if self.with_mp and self.with_aug:
            x = AUG(int(c1 * 0.5), act=self.act, name="aug", **kw)(
                max_pool_2x(x), x, train
            )
        elif self.with_mp:
            x = max_pool_2x(x)
        x0 = ConvBase(c_, 1, 1, act=self.act, name="cv0", **kw)(x, train)
        x1 = ConvBase(c_, 1, 1, act=self.act, name="cv1", **kw)(x, train)
        x2 = x1
        for i in range(self.n):
            x2 = ConvBase(c_, 3, 1, act=self.act, name=f"m0_{i}", **kw)(x2, train)
        x3 = x2
        for i in range(self.n):
            x3 = ConvBase(c_, 3, 1, act=self.act, name=f"m1_{i}", **kw)(x3, train)
        y = jnp.concatenate([x3, x2, x1, x0], axis=-1)
        return ConvBase(self.c2, 1, 1, act=self.act, name="cv2", **kw)(y, train)


class ELANNeck(nn.Module):
    """YOLOv7 neck ELAN block (reference ELAN_NECK, common.py:1576-1609)."""

    c2: int
    n: int = 3
    e: float = 0.5
    e_m: float = 0.5
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        c1 = x.shape[-1]
        c_ = int(c1 * self.e)
        c_m = int(c_ * self.e_m)
        outs = []
        x0 = ConvBase(c_, 1, 1, act=self.act, name="cv0", **kw)(x, train)
        outs.append(x0)
        x1 = ConvBase(c_, 1, 1, act=self.act, name="cv1", **kw)(x, train)
        outs.append(x1)
        x2 = ConvBase(c_m, 3, 1, act=self.act, name="cv2", **kw)(x1, train)
        outs.append(x2)
        for i in range(self.n):
            x2 = ConvBase(c_m, 3, 1, act=self.act, name=f"m{i}", **kw)(x2, train)
            outs.append(x2)
        y = jnp.concatenate(outs[::-1], axis=-1)
        return ConvBase(self.c2, 1, 1, act=self.act, name="cv3", **kw)(y, train)


class SPPCSPC(nn.Module):
    """YOLOv7 CSP-SPP block (reference common.py:1199-1217)."""

    c2: int
    k: Sequence[int] = (5, 9, 13)
    e: float = 0.5
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        c_ = int(2 * self.c2 * self.e)
        x1 = ConvBase(c_, 1, 1, act=self.act, name="cv1", **kw)(x, train)
        x1 = ConvBase(c_, 3, 1, act=self.act, name="cv3", **kw)(x1, train)
        x1 = ConvBase(c_, 1, 1, act=self.act, name="cv4", **kw)(x1, train)
        ys = [x1] + [_max_pool_same(x1, k) for k in self.k]
        y1 = ConvBase(c_, 1, 1, act=self.act, name="cv5", **kw)(
            jnp.concatenate(ys, -1), train
        )
        y1 = ConvBase(c_, 3, 1, act=self.act, name="cv6", **kw)(y1, train)
        y2 = ConvBase(c_, 1, 1, act=self.act, name="cv2", **kw)(x, train)
        return ConvBase(self.c2, 1, 1, act=self.act, name="cv7", **kw)(
            jnp.concatenate([y1, y2], -1), train
        )


class SimConv(ConvBase):
    """Conv+BN+ReLU (reference common.py:1136-1154). Subclasses ConvBase so
    its conv/bn params sit at the module's own scope, mirroring the
    reference state_dict keys (<name>.conv.weight / <name>.bn.*)."""

    act: Any = "relu"


class Transpose(nn.Module):
    """ConvTranspose 2x upsample (reference common.py:1159-1172)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.c2, (2, 2), strides=(2, 2), use_bias=True,
            dtype=self.dtype, name="upsample_transpose",
        )(x)


class ImplicitA(nn.Module):
    """Learned additive token (YOLOv7 IDetect, reference common.py:1482)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ia = self.param(
            "implicit",
            lambda key, shape: 0.02 * jax.random.normal(key, shape, jnp.float32),
            (1, 1, 1, self.channels),
        )
        return x + ia.astype(x.dtype)


class ImplicitM(nn.Module):
    """Learned multiplicative token (YOLOv7 IDetect, reference common.py:1495)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        im = self.param(
            "implicit",
            lambda key, shape: 1.0 + 0.02 * jax.random.normal(key, shape, jnp.float32),
            (1, 1, 1, self.channels),
        )
        return x * im.astype(x.dtype)


class SimSPPF(SPPF):
    """SPPF with ReLU (YOLOv6, reference common.py:1174-1190). Subclasses
    SPPF so cv1/cv2 sit at the module's own scope (the reference names the
    SimSPPF instance ERBlock_5_2 with cv1/cv2 children)."""

    act: Any = "relu"


# YOLOv7's RepConv (reference common.py:1219-1400) is structurally the
# RepVGG train-time block with a configurable activation.
RepConv = RepVGGBlock


class SE(nn.Module):
    """Squeeze-excitation channel attention (reference common.py SE block)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = x.mean(axis=(1, 2))
        s = nn.Dense(max(c // self.reduction, 1), dtype=self.dtype,
                     name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)[:, None, None, :]


class CBAM(nn.Module):
    """Convolutional block attention: channel then spatial gate
    (reference common.py CBAM)."""

    reduction: int = 16
    k: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = max(c // self.reduction, 1)
        mlp = nn.Sequential([
            nn.Dense(hidden, dtype=self.dtype),
            nn.relu,
            nn.Dense(c, dtype=self.dtype),
        ])
        ca = jax.nn.sigmoid(mlp(x.mean((1, 2))) + mlp(x.max((1, 2))))
        x = x * ca[:, None, None, :]
        sp = jnp.concatenate(
            [x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], -1
        )
        sa = nn.Conv(1, (self.k, self.k),
                     padding=[(self.k // 2,) * 2] * 2,
                     dtype=self.dtype, name="spatial")(sp)
        return x * jax.nn.sigmoid(sa)


class GhostConv(nn.Module):
    """Ghost convolution: half dense, half depthwise-cheap
    (reference common.py GhostConv)."""

    c2: int
    k: int = 1
    s: int = 1
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        y = ConvBase(c_, self.k, self.s, act=self.act, name="cv1", **kw)(x, train)
        y2 = ConvBase(c_, 5, 1, g=c_, act=self.act, name="cv2", **kw)(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """(reference common.py GhostBottleneck)."""

    c2: int
    k: int = 3
    s: int = 1
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        y = GhostConv(c_, 1, 1, act=self.act, name="conv1", **kw)(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, name="dw", **kw)(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, name="conv2", **kw)(y, train)
        if self.s == 1 and x.shape[-1] == self.c2:
            return x + y
        sc = DWConv(self.c2, self.k, self.s, act=False, name="short_dw",
                    **kw)(x, train)
        sc = ConvBase(self.c2, 1, 1, act=False, name="short_pw", **kw)(sc, train)
        return y + sc


class TransformerBlock(nn.Module):
    """Lightweight vision transformer over a conv feature map
    (reference common.py TransformerBlock/TransformerLayer:498-533)."""

    c2: int
    num_heads: int = 4
    num_layers: int = 1
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        if c != self.c2:
            x = ConvBase(self.c2, 1, 1, dtype=self.dtype,
                         axis_name=self.axis_name, name="conv")(x, train)
        seq = x.reshape(b, h * w, self.c2)
        pos = nn.Dense(self.c2, dtype=self.dtype, name="linear")(seq)
        seq = seq + pos
        for i in range(self.num_layers):
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                name=f"tr_{i}_attn",
            )(seq, seq)
            seq = seq + attn
            y = nn.Dense(self.c2, dtype=self.dtype, name=f"tr_{i}_fc1")(seq)
            y = nn.Dense(self.c2, dtype=self.dtype, name=f"tr_{i}_fc2")(y)
            seq = seq + y
        return seq.reshape(b, h, w, self.c2)


class C3TR(nn.Module):
    """C3 with a transformer inner stage (reference common.py:636-641)."""

    c2: int
    n: int = 1
    e: float = 0.5
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        y1 = ConvBase(c_, 1, 1, act=self.act, name="cv1", **kw)(x, train)
        y1 = TransformerBlock(c_, 4, self.n, dtype=self.dtype,
                              axis_name=self.axis_name, name="m")(y1, train)
        y2 = ConvBase(c_, 1, 1, act=self.act, name="cv2", **kw)(x, train)
        return ConvBase(self.c2, 1, 1, act=self.act, name="cv3", **kw)(
            jnp.concatenate([y1, y2], -1), train
        )


class C3Ghost(nn.Module):
    """C3 with GhostBottleneck inner stages (reference common.py:647-652)."""

    c2: int
    n: int = 1
    e: float = 0.5
    act: Any = "silu"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        y1 = ConvBase(c_, 1, 1, act=self.act, name="cv1", **kw)(x, train)
        for i in range(self.n):
            y1 = GhostBottleneck(c_, act=self.act, name=f"m_{i}", **kw)(
                y1, train
            )
        y2 = ConvBase(c_, 1, 1, act=self.act, name="cv2", **kw)(x, train)
        return ConvBase(self.c2, 1, 1, act=self.act, name="cv3", **kw)(
            jnp.concatenate([y1, y2], -1), train
        )


class RealVGGBlock(nn.Module):
    """Plain conv3x3+BN+ReLU — the RepOpt target topology
    (reference common.py:1612-1630). Trained with the RepVGGOptimizer
    gradient masks (train/repopt.py)."""

    c2: int
    k: int = 3
    s: int = 1
    act: Any = "relu"
    deploy: bool = False  # unused; single-branch already
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.c2, (self.k, self.k), (self.s, self.s),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3,
                         axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name="bn")(x)
        return get_activation(self.act)(x)


class LinearAddBlock(nn.Module):
    """CSLA/RepScale block: scale_conv*conv3x3 + scale_1x1*conv1x1
    (+ scale_identity*x), then BN+ReLU (reference common.py:1650-1678).
    Training this topology yields the per-channel scales the RepOptimizer
    consumes (models/optimizers/RepOptimizer.py:18-29)."""

    c2: int
    k: int = 3
    s: int = 1
    act: Any = "relu"
    deploy: bool = False
    conv_scale_init: float = 1.0
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        init = lambda v: (lambda key, shape, dtype=jnp.float32:
                          jnp.full(shape, v, dtype))
        y = nn.Conv(self.c2, (3, 3), (self.s, self.s),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        sc = self.param("scale_conv", init(self.conv_scale_init), (self.c2,))
        y = y * sc.astype(y.dtype)
        y1 = nn.Conv(self.c2, (1, 1), (self.s, self.s), padding="VALID",
                     use_bias=False, dtype=self.dtype, name="conv_1x1")(x)
        s1 = self.param("scale_1x1", init(self.conv_scale_init), (self.c2,))
        y = y + y1 * s1.astype(y.dtype)
        if c1 == self.c2 and self.s == 1:
            si = self.param("scale_identity", init(1.0), (self.c2,))
            y = y + x * si.astype(y.dtype)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3,
                         axis_name=self.axis_name if train else None,
                         dtype=self.dtype, name="bn")(y)
        return get_activation(self.act)(y)


VGG_BLOCKS = {
    "repvgg": RepVGGBlock,
    "realvgg": RealVGGBlock,
    "linearadd": LinearAddBlock,
    # QARepVGG shares the RepVGG train topology here (its delta is the
    # BN placement for quantization friendliness; fusion path identical)
    "qarep": RepVGGBlock,
}
