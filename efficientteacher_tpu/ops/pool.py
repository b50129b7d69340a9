"""Max pooling with a GSPMD-safe, TPU-friendly backward pass.

XLA differentiates `reduce_window(max)` through `select-and-scatter`,
which (a) partitions INCORRECTLY under spatial sharding — on an H-sharded
input the gradient silently diverges from the unsharded result (repro in
tests/test_spatial_mesh.py::test_maxpool_grad_sharded; forward is exact,
only the scatter is wrong) — and (b) is one of the slowest ops in XLA:TPU.
These pools keep the forward as `reduce_window` but define the VJP as k^2
static shift/compare/add passes: pure pad/slice/elementwise work that
GSPMD partitions exactly and XLA fuses.

Gradient-of-ties semantics: the cotangent is split equally among tied
window maxima (the `jnp.max`-over-axis convention) instead of
select-and-scatter's first-index pick. Ties are measure-zero on real
activations; total gradient mass is identical either way.

Used by the SPP family (SPPF/SPP/SimSPPF/SPPCSPC, models/common.py — the
reference's nn.MaxPool2d(k, 1, k//2) chains, reference common.py:655-697)
and the strided pools (MP blocks common.py:1191, ResNet stem).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["max_pool_same", "max_pool_2x2", "max_pool_strided"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_same(x, k: int):
    """k x k / stride 1 max pool, symmetric SAME padding (odd k), NHWC.

    Equivalent to the reference's nn.MaxPool2d(kernel_size=k, stride=1,
    padding=k//2).
    """
    return _reduce_max(x, k)


def _reduce_max(x, k: int):
    p = k // 2
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (p, p), (p, p), (0, 0)],
    )


def _mp_fwd(x, k: int):
    y = _reduce_max(x, k)
    return y, (x, y)


def _mp_bwd(k: int, res, ct):
    x, y = res
    p = k // 2
    _, h, w, _ = x.shape
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), constant_values=neg)
    shifts = [(dy, dx) for dy in range(k) for dx in range(k)]
    # per-window tie count (>=1: the all-pad window cannot occur because
    # the window center is always a real element)
    cnt = jnp.zeros(y.shape, jnp.float32)
    for dy, dx in shifts:
        cnt = cnt + (xp[:, dy:dy + h, dx:dx + w, :] == y)
    scaled = (ct.astype(jnp.float32) / cnt).astype(ct.dtype)
    gp = jnp.zeros(xp.shape, ct.dtype)
    zero = jnp.zeros((), ct.dtype)
    for dy, dx in shifts:
        m = xp[:, dy:dy + h, dx:dx + w, :] == y
        gp = gp.at[:, dy:dy + h, dx:dx + w, :].add(
            jnp.where(m, scaled, zero))
    return (gp[:, p:p + h, p:p + w, :].astype(x.dtype),)


max_pool_same.defvjp(_mp_fwd, _mp_bwd)


def max_pool_2x2(x):
    """2x2 / stride 2 max pool (reference MP block, common.py:1191) as a
    reshape-max: non-overlapping windows need no halo, and autodiff of
    `jnp.max` over the window axes is GSPMD-exact."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def max_pool_strided(x, k: int, s: int):
    """k x k / stride s max pool with the centered padding the reference
    uses (nn.MaxPool2d(k, s, padding=k//2), e.g. the ResNet stem's
    3x3/2): the stride-1 SAME pool subsampled — identical windows, and
    the subsample's transpose (zero-interleave) shards cleanly."""
    return max_pool_same(x, k)[:, ::s, ::s, :]
