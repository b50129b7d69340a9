"""Optimizer schedules and torch-SGD semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.train.optim import (
    OptimizerConfig,
    init_opt_state,
    one_cycle,
    sgd_update,
)


def test_one_cycle_endpoints():
    f = one_cycle(1.0, 0.01, 100)
    assert f(0) == pytest.approx(1.0)
    assert f(100) == pytest.approx(0.01)
    assert f(50) == pytest.approx((1.0 + 0.01) / 2)


def test_multi_step_schedule():
    cfg = get_cfg()
    cfg.SSOD.multi_step_lr = True
    cfg.SSOD.milestones = [10, 20]
    oc = OptimizerConfig.from_cfg(cfg, 0.0005)
    assert oc.lf(5) == 1.0
    assert oc.lf(10) == pytest.approx(0.1)
    assert oc.lf(25) == pytest.approx(0.01)


def test_warmup_schedule():
    oc = OptimizerConfig(lr0=0.01, warmup_epochs=3, warmup_bias_lr=0.1,
                         warmup_momentum=0.8, momentum=0.937, epochs=100)
    s0 = oc.schedule(0, 0, nw=100)
    assert s0["lr_bias"] == pytest.approx(0.1)    # bias falls from 0.1
    assert s0["lr_rest"] == pytest.approx(0.0)    # others rise from 0
    assert s0["momentum"] == pytest.approx(0.8)
    s_end = oc.schedule(100, 0, nw=100)
    assert s_end["lr_bias"] == pytest.approx(s_end["lr_rest"])
    assert s_end["momentum"] == pytest.approx(0.937)


def test_sgd_matches_torch_nesterov():
    """One step of our SGD equals torch.optim.SGD(nesterov=True)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    w0 = rng.normal(0, 1, (4, 3)).astype(np.float32)
    g = rng.normal(0, 1, (4, 3)).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tw], lr=0.01, momentum=0.9, nesterov=True,
                          weight_decay=0.0005)
    tw.grad = torch.from_numpy(g.copy())
    opt.step()
    tw.grad = torch.from_numpy(g.copy())
    opt.step()
    want = tw.detach().numpy()

    oc = OptimizerConfig(lr0=0.01, momentum=0.9, weight_decay=0.0005)
    params = {"layer": {"kernel": jnp.asarray(w0)}}
    grads = {"layer": {"kernel": jnp.asarray(g)}}
    state = init_opt_state(params, oc)
    for _ in range(2):
        params, state = sgd_update(params, grads, state, oc,
                                   lr_bias=0.01, lr_rest=0.01, momentum=0.9)
    got = np.asarray(params["layer"]["kernel"])
    np.testing.assert_allclose(got, want, atol=1e-6)
