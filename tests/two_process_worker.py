"""Worker script for test_distributed.py: one of two JAX processes.

Validates the multi-host path end to end on CPU: distributed init from env,
global mesh over both processes' virtual devices, per-process data sharding
(process_slice), and a jitted global reduction over a batch assembled with
make_global_batch.
"""

import os
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from efficientteacher_tpu.parallel.distributed import (
        is_main_process,
        make_global_batch,
        maybe_initialize,
        per_process_batch,
        process_slice,
    )
    from efficientteacher_tpu.parallel.mesh import make_mesh

    assert maybe_initialize(), "distributed init did not trigger"
    pid = jax.process_index()
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 virtual CPU devices per process
    assert len(jax.local_devices()) == 2
    assert is_main_process() == (pid == 0)

    # identical global order on both hosts -> disjoint strided shares
    idx = list(range(8))
    mine = process_slice(idx)
    assert mine == idx[pid::2]
    assert per_process_batch(8) == 4

    # local shard (4, 8) of a global (8, 8) batch; global mean must see all
    mesh = make_mesh()  # over ALL devices, both processes
    local = np.arange(64, dtype=np.float32).reshape(8, 8)[pid::2]
    (gbatch,) = make_global_batch(mesh, (local,))
    assert gbatch.shape == (8, 8)

    @jax.jit
    def global_mean(x):
        return jnp.mean(x)

    got = float(global_mean(gbatch))
    want = float(np.arange(64, dtype=np.float32).mean())
    assert abs(got - want) < 1e-5, (got, want)
    print(f"WORKER_{pid}_OK {got:.3f}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    main()
