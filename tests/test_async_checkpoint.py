"""AsyncCheckpointer (utils/checkpoint.py): background writes.

The trainers' _save_ckpt path — the TPU-native replacement for the
reference's in-loop torch.save (trainer/trainer.py:474-491) — snapshots
on-device and serializes off-thread; these tests pin the contract:
round-trip fidelity, write ordering across successive saves, and
failure propagation at wait().
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientteacher_tpu.utils.checkpoint import (
    AsyncCheckpointer, load_checkpoint,
)


def _tree(seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return {
        "conv": {"kernel": jnp.asarray(
            rng.normal(size=(3, 3, 4, 8)) * scale, jnp.float32)},
        "bn": {"scale": jnp.asarray(rng.normal(size=(8,)), jnp.float32)},
    }


def test_round_trip(tmp_path):
    ck = AsyncCheckpointer()
    params = _tree(0)
    bs = {"bn": {"mean": jnp.zeros((8,)), "var": jnp.ones((8,))}}
    path = tmp_path / "w" / "last.ckpt"
    ck.save(path, params=params, batch_stats=bs, epoch=3,
            best_fitness=0.5, half=False)
    ck.wait()
    out = load_checkpoint(path)
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(out["model"]["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert out["meta"]["epoch"] == 3


def test_snapshot_isolated_from_later_mutation(tmp_path):
    """The values written must be the values at save() time, even though
    the caller's arrays are rebound/updated immediately afterwards (in
    the trainers the next donated train step overwrites the live state
    buffers while the writer thread is still serializing)."""
    ck = AsyncCheckpointer()
    params = _tree(1)
    expect = jax.device_get(params)
    path = tmp_path / "last.ckpt"
    ck.save(path, params=params, batch_stats={}, half=False)
    # mutate what the caller holds before the writer finishes
    params["conv"]["kernel"] = params["conv"]["kernel"] * 0.0
    ck.wait()
    out = load_checkpoint(path)
    np.testing.assert_array_equal(out["model"]["params"]["conv"]["kernel"],
                                  expect["conv"]["kernel"])


def test_successive_saves_serialize(tmp_path):
    ck = AsyncCheckpointer()
    path = tmp_path / "last.ckpt"
    ck.save(path, params=_tree(2, scale=1.0), batch_stats={}, half=False)
    second = _tree(2, scale=2.0)
    ck.save(path, params=second, batch_stats={}, half=False)  # joins first
    ck.wait()
    out = load_checkpoint(path)
    np.testing.assert_array_equal(out["model"]["params"]["conv"]["kernel"],
                                  np.asarray(second["conv"]["kernel"]))


def test_failure_surfaces_at_wait(tmp_path):
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file, not dir")
    ck = AsyncCheckpointer()
    ck.save(blocker / "weights" / "last.ckpt",
            params=_tree(3), batch_stats={}, half=False)
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        ck.wait()
    # and the checkpointer is reusable afterwards
    ok = tmp_path / "ok.ckpt"
    ck.save(ok, params=_tree(4), batch_stats={}, half=False)
    ck.wait()
    assert ok.exists()
