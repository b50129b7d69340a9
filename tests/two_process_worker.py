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
    ldev = int(os.environ.get("WORKER_LOCAL_DEVICES", "2"))
    assert jax.process_count() == 2
    assert len(jax.devices()) == 2 * ldev
    assert len(jax.local_devices()) == ldev
    assert is_main_process() == (pid == 0)

    # identical global order on both hosts -> disjoint strided shares
    idx = list(range(8))
    mine = process_slice(idx)
    assert mine == idx[pid::2]
    assert per_process_batch(8) == 4

    # local shard of a global (2*ldev*2, 8) batch; global mean must see all
    mesh = make_mesh()  # over ALL devices, both processes
    rows = 4 * ldev
    local = np.arange(rows * 8, dtype=np.float32).reshape(rows, 8)[pid::2]
    (gbatch,) = make_global_batch(mesh, (local,))
    assert gbatch.shape == (rows, 8)

    @jax.jit
    def global_mean(x):
        return jnp.mean(x)

    got = float(global_mean(gbatch))
    want = float(np.arange(rows * 8, dtype=np.float32).mean())
    assert abs(got - want) < 1e-5, (got, want)

    # LabelMatch across processes (reference utils/labelmatch.py:100-117
    # all_gather of per-rank score lists): each process contributes a
    # DISJOINT local shard of pseudo-label (conf, cls) rows; to_host
    # all-gathers the global arrays so both processes fit identical
    # thresholds that reflect BOTH processes' scores.
    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.parallel.distributed import to_host
    from efficientteacher_tpu.ssod.labelmatch import LabelMatch

    rng = np.random.default_rng(0)  # same seed: global arrays identical,
    # but each process only FEEDS its own strided rows into the mesh
    g_scores = rng.uniform(0.05, 1.0, (rows,)).astype(np.float32)
    g_cls = (np.arange(rows) % 2).astype(np.float32)
    sc_g, cls_g = make_global_batch(
        mesh, (g_scores[pid::2], g_cls[pid::2]))
    lm = LabelMatch(get_cfg(), target_data_len=rows, label_num_per_img=1.0,
                    cls_ratio_gt=np.array([0.5, 0.5]))
    lm.collect(to_host(sc_g), to_host(cls_g))
    n_seen = sum(len(s) for s in lm.score_list_epoch)
    assert n_seen == rows, (
        f"LabelMatch saw {n_seen} scores, want all {rows} across processes")
    lm.update_epoch_cls_thr(0)
    thr = np.concatenate([lm.cls_thr_high, lm.cls_thr_low])
    print(f"WORKER_{pid}_OK {got:.3f} thr={np.round(thr, 4).tolist()}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    main()
