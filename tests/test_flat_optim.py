"""Fused single-map optimizer path (where-select, no lax.cond) vs the
per-leaf multi-map pytree formulation: element-wise identical math, so results must match to float
round-off across accumulate boundaries, EMA ramps, and the SSOD
semi-EMA chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientteacher_tpu.train import OptimizerConfig
from efficientteacher_tpu.train.ssod_step import create_ssod_train_state
from efficientteacher_tpu.train.train_state import (
    apply_gradients_accumulating, apply_gradients_accumulating_tree,
    create_train_state, ema_update, sgd_update,
)


def _tree(rng, scale=1.0):
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * scale)
    return {
        "backbone": {
            "conv": {"kernel": mk(3, 3, 8, 16), "bias": mk(16)},
            "bn": {"scale": mk(16), "bias": mk(16)},
        },
        "head": {
            "m_0": {"kernel": mk(1, 1, 16, 24), "bias": mk(24)},
            "implicit": mk(1, 1, 24),  # 1-D-ish misc -> bn group
        },
    }


def _stats(rng):
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    return {"backbone": {"bn": {"mean": mk(16), "var": mk(16) ** 2}}}


@pytest.mark.parametrize("accumulate", [1, 2])
def test_flat_matches_tree_sgd_ema(accumulate):
    rng = np.random.default_rng(1)
    params = _tree(rng)
    stats = _stats(rng)
    oc = OptimizerConfig(lr0=0.01, weight_decay=5e-4, epochs=10)
    s_flat = create_train_state(params, stats, oc)
    s_tree = create_train_state(params, stats, oc)

    for it in range(4):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape).astype(np.float32) * 0.01
            ).astype(jnp.bfloat16),
            params,
        )
        new_stats = jax.tree.map(
            lambda s: s + 0.01 * it, stats)
        kw = dict(lr_bias=jnp.float32(0.05), lr_rest=jnp.float32(0.01),
                  momentum=jnp.float32(0.9), accumulate=jnp.int32(accumulate),
                  ema_decay=jnp.float32(0.9999), new_batch_stats=new_stats)
        s_flat = apply_gradients_accumulating(s_flat, grads, oc, **kw)
        s_tree = apply_gradients_accumulating_tree(s_tree, grads, oc, **kw)

    for name, a, b in [
        ("params", s_flat.params, s_tree.params),
        ("momentum", s_flat.opt.momentum_buf, s_tree.opt.momentum_buf),
        ("acc", s_flat.acc_grads, s_tree.acc_grads),
        ("ema_p", s_flat.ema.params, s_tree.ema.params),
        ("ema_bs", s_flat.ema.batch_stats, s_tree.ema.batch_stats),
    ]:
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=1e-6, atol=1e-7,
                err_msg=name)
    assert int(s_flat.ema.updates) == int(s_tree.ema.updates)
    assert int(s_flat.acc_count) == int(s_tree.acc_count)
    assert int(s_flat.opt.step) == int(s_tree.opt.step)


def test_flat_semi_ema_chain_matches_manual():
    """SSOD double-EMA: fused update == sgd_update + ema(ramp) + semi(const)."""
    rng = np.random.default_rng(2)
    params = _tree(rng)
    stats = _stats(rng)
    oc = OptimizerConfig(lr0=0.01, weight_decay=5e-4, epochs=10)
    state = create_ssod_train_state(params, stats, oc)
    grads = jax.tree.map(
        lambda p: jnp.asarray(
            rng.normal(size=p.shape).astype(np.float32) * 0.01), params)
    new_stats = jax.tree.map(lambda s: s + 0.5, stats)

    out = apply_gradients_accumulating(
        state, grads, oc, lr_bias=0.05, lr_rest=0.01, momentum=0.9,
        accumulate=1, ema_decay=0.9999, new_batch_stats=new_stats,
        semi_decay=jnp.float32(0.996))

    # manual reference chain (the pre-fusion formulation)
    acc = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
    m_params, m_opt = sgd_update(state.params, acc, state.opt, oc,
                                 0.05, 0.01, 0.9)
    m_ema = ema_update(state.ema, m_params, new_stats, 0.9999, ramp=True)
    m_semi = ema_update(state.semi_ema, m_ema.params, m_ema.batch_stats,
                        0.996, ramp=False)

    for a, b in zip(jax.tree.leaves(out.params), jax.tree.leaves(m_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out.ema.params),
                    jax.tree.leaves(m_ema.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out.semi_ema.params),
                    jax.tree.leaves(m_semi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out.semi_ema.batch_stats),
                    jax.tree.leaves(m_semi.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert int(out.semi_ema.updates) == 1


def test_flat_hold_branch_keeps_state():
    """accumulate=4: the first micro-steps must not move params/EMA."""
    rng = np.random.default_rng(3)
    params = _tree(rng)
    stats = _stats(rng)
    oc = OptimizerConfig(lr0=0.01, weight_decay=5e-4, epochs=10)
    state = create_train_state(params, stats, oc)
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)
    out = apply_gradients_accumulating(
        state, grads, oc, lr_bias=0.05, lr_rest=0.01, momentum=0.9,
        accumulate=4, ema_decay=0.9999, new_batch_stats=stats)
    for a, b in zip(jax.tree.leaves(out.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a in jax.tree.leaves(out.acc_grads):
        assert np.allclose(np.asarray(a), 0.1)
    assert int(out.acc_count) == 1
    assert int(out.ema.updates) == 0


@pytest.mark.parametrize("accumulate", [1, 2])
def test_adam_semi_ema_chain(accumulate):
    """SSOD training with cfg.adam=True must advance the semi_ema teacher
    chain instead of crashing (regression: the fused path asserted
    semi_decay is None for Adam). Equivalence oracle: tree-path AdamW +
    manual semi_ema.update(ema) on fired steps."""
    rng = np.random.default_rng(4)
    params = _tree(rng)
    stats = _stats(rng)
    oc = OptimizerConfig(lr0=0.001, weight_decay=5e-4, epochs=10, adam=True)
    state = create_ssod_train_state(params, stats, oc)
    manual = create_ssod_train_state(params, stats, oc)

    for it in range(3):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape).astype(np.float32) * 0.01), params)
        new_stats = jax.tree.map(lambda s: s + 0.1 * it, stats)
        kw = dict(lr_bias=0.05, lr_rest=0.01, momentum=0.9,
                  accumulate=jnp.int32(accumulate), ema_decay=0.9999,
                  new_batch_stats=new_stats)
        state = apply_gradients_accumulating(
            state, grads, oc, semi_decay=jnp.float32(0.996), **kw)
        fired = int(manual.acc_count) + 1 >= accumulate
        m_semi = manual.semi_ema
        manual = apply_gradients_accumulating_tree(manual, grads, oc, **kw)
        if fired:
            m_semi = ema_update(m_semi, manual.ema.params,
                                manual.ema.batch_stats, 0.996, ramp=False)
        manual = manual.replace(semi_ema=m_semi)

    for name, a, b in (
        ("params", state.params, manual.params),
        ("ema", state.ema.params, manual.ema.params),
        ("semi", state.semi_ema.params, manual.semi_ema.params),
        ("semi_stats", state.semi_ema.batch_stats,
         manual.semi_ema.batch_stats),
    ):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7,
                err_msg=name)
    assert int(state.semi_ema.updates) == int(manual.semi_ema.updates)
    assert int(state.semi_ema.updates) == (3 if accumulate == 1 else 1)
