"""Model profiling: parameter/FLOP counting and op micro-benchmarks.

Parity with reference utils/profile.py:39-150 (thop-style hook counters) and
utils/torch_utils.py:94-145/222-244 (`profile`, `model_info`) — but the
TPU-native route is XLA's own cost model: `jit(...).lower().compile().
cost_analysis()` reports the exact FLOPs of the compiled program, which is
both simpler and more truthful than per-module hooks.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def model_flops(model, variables, img_size: int = 640, ch: int = 3,
                batch: int = 1) -> float:
    """FLOPs of one eval forward from XLA cost analysis."""
    x = jnp.zeros((batch, img_size, img_size, ch))

    def fwd(v, x):
        return model.apply(v, x, train=False)

    compiled = jax.jit(fwd).lower(variables, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0))


def model_info(model, variables, img_size: int = 640,
               verbose: bool = False) -> Dict[str, Any]:
    """Summary dict (reference model_info, torch_utils.py:222-244)."""
    n_params = count_params(variables["params"])
    try:
        flops = model_flops(model, variables, img_size)
    except Exception:
        flops = 0.0
    info = {
        "params": n_params,
        "params_m": n_params / 1e6,
        "gflops": flops / 1e9,
        "img_size": img_size,
    }
    if verbose:
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables["params"]
        )[0]:
            name = "/".join(
                str(p.key if hasattr(p, "key") else p) for p in path
            )
            print(f"{name:80s} {tuple(leaf.shape)}")
    return info


def profile_fn(fn: Callable, *args, iters: int = 10,
               warmup: int = 2) -> Dict[str, float]:
    """Micro-benchmark a jitted function with honest host sync
    (reference torch_utils.profile, :94-145)."""
    jitted = jax.jit(fn)
    for _ in range(warmup):
        out = jitted(*args)
        _sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jitted(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return {
        "mean_ms": float(np.mean(ts) * 1e3),
        "min_ms": float(np.min(ts) * 1e3),
        "std_ms": float(np.std(ts) * 1e3),
    }


def _sync(tree):
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    if leaves:
        # device-to-host pull = true sync even through the axon tunnel
        np.asarray(jnp.ravel(leaves[0])[:1])


def time_sync() -> float:
    """Host wall clock (device work must be synced by the caller via
    materialization; cuda.synchronize has no analogue here)."""
    return time.perf_counter()
