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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def max_pool_strided(x, k: int, s: int):
    """k x k / stride s max pool with the centered padding the reference
    uses (nn.MaxPool2d(k, s, padding=k//2), e.g. the ResNet stem's
    3x3/2). A genuinely strided window (not the stride-1 pool
    subsampled, which computes s^2 the work and runs the k^2-pass VJP
    at full resolution)."""
    return _reduce_max_strided(x, k, s)


def _neg_inf(dtype):
    return (-jnp.inf if jnp.issubdtype(dtype, jnp.floating)
            else jnp.iinfo(dtype).min)


def _reduce_max_strided(x, k: int, s: int):
    p = k // 2
    return jax.lax.reduce_window(
        x, _neg_inf(x.dtype), jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (p, p), (p, p), (0, 0)],
    )


def _mps_fwd(x, k: int, s: int):
    y = _reduce_max_strided(x, k, s)
    return y, (x, y)


def _mps_bwd(k: int, s: int, res, ct):
    """Strided analogue of _mp_bwd: k^2 strided-slice compare passes at
    OUTPUT resolution, scattered back via lax.pad interior padding
    (zero-interleave) — pure pad/slice/elementwise, so GSPMD partitions
    it exactly (the reason these custom VJPs exist; see module
    docstring)."""
    x, y = res
    p = k // 2
    _, h, w, _ = x.shape
    _, ho, wo, _ = y.shape
    hp, wp = h + 2 * p, w + 2 * p
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)),
                 constant_values=_neg_inf(x.dtype))
    shifts = [(dy, dx) for dy in range(k) for dx in range(k)]

    def win(dy, dx):
        # the (ho, wo) strided view of xp that window offset (dy, dx) sees
        return jax.lax.slice(
            xp, (0, dy, dx, 0),
            (xp.shape[0], dy + (ho - 1) * s + 1, dx + (wo - 1) * s + 1,
             xp.shape[3]),
            (1, s, s, 1),
        )

    cnt = jnp.zeros(y.shape, jnp.float32)
    for dy, dx in shifts:
        cnt = cnt + (win(dy, dx) == y)
    scaled = (ct.astype(jnp.float32) / cnt).astype(ct.dtype)
    zero = jnp.zeros((), ct.dtype)
    gp = jnp.zeros(xp.shape, ct.dtype)
    for dy, dx in shifts:
        contrib = jnp.where(win(dy, dx) == y, scaled, zero)
        # zero-interleave to stride s and place at offset (dy, dx)
        gp = gp + jax.lax.pad(
            contrib, zero,
            ((0, 0, 0),
             (dy, hp - dy - ((ho - 1) * s + 1), s - 1),
             (dx, wp - dx - ((wo - 1) * s + 1), s - 1),
             (0, 0, 0)),
        )
    return (gp[:, p:p + h, p:p + w, :].astype(x.dtype),)


max_pool_strided.defvjp(_mps_fwd, _mps_bwd)
