"""Batch engines: forked shared-memory process loader and the thread
fallback must both yield every batch exactly once with intact content."""

import random

import numpy as np
import pytest

from efficientteacher_tpu.data.datasets import BatchLoader
from efficientteacher_tpu.data.parallel_loader import (
    _FORK_OK,
    iter_batches_processes,
    iter_batches_threads,
)


class StubDataset:
    """Deterministic fixed-shape items keyed by index."""

    def __init__(self, n=20, s=32, m=4):
        self.n, self.s, self.m = n, s, m
        self.img_files = [f"/img/{i}.jpg" for i in range(n)]
        self.rng = random.Random(0)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((self.s, self.s, 3), i, np.uint8)
        labels = np.full((self.m, 5), float(i), np.float32)
        mask = np.zeros((self.m,), bool)
        mask[: i % self.m] = True
        return img, labels, mask, (self.s, self.s)


def _check_epoch(loader, n_batches, bs):
    seen = set()
    for batch in loader:
        assert batch["images"].shape == (bs, 32, 32, 3)
        for k, i in enumerate(batch["indices"]):
            # content must match the index that produced it
            assert int(batch["images"][k, 0, 0, 0]) == i % 256
            assert float(batch["labels"][k, 0, 0]) == float(i)
            assert batch["paths"][k] == f"/img/{i}.jpg"
            seen.add(i)
    assert len(seen) == n_batches * bs


@pytest.mark.parametrize("mode", ["thread", "process"])
def test_batch_loader_engines(mode):
    if mode == "process" and not _FORK_OK:
        pytest.skip("no fork on this platform")
    ds = StubDataset(n=20)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, workers=3,
                         mode=mode)
    _check_epoch(iter(loader), n_batches=5, bs=4)
    assert loader.epoch == 1
    _check_epoch(iter(loader), n_batches=5, bs=4)  # second epoch reshuffles


def test_engines_match_synchronous():
    """Same batches, any order: engine output equals a synchronous build."""
    ds = StubDataset(n=12)
    batches = [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]

    def build(bidx):
        items = [ds[i] for i in bidx]
        return {
            "images": np.stack([it[0] for it in items]),
            "indices": bidx,
        }

    want = {tuple(b): build(b)["images"].copy() for b in batches}
    for it in (
        iter_batches_threads(build, batches, workers=2),
        iter_batches_processes(build, batches, workers=2,
                               reseed=lambda w: None)
        if _FORK_OK else [],
    ):
        got = {}
        for batch in it:
            got[tuple(batch["indices"])] = batch["images"].copy()
        if got:
            assert set(got) == set(want)
            for k in want:
                np.testing.assert_array_equal(got[k], want[k])


def test_process_loader_slot_recycling():
    """More batches than slots: the ring must recycle without corruption."""
    if not _FORK_OK:
        pytest.skip("no fork")
    ds = StubDataset(n=64)
    batches = [[i, i + 1] for i in range(0, 64, 2)]

    def build(bidx):
        items = [ds[i] for i in bidx]
        return {
            "images": np.stack([it[0] for it in items]),
            "indices": bidx,
        }

    seen = []
    for batch in iter_batches_processes(build, batches, workers=2,
                                        reseed=lambda w: None, n_slots=3):
        for k, i in enumerate(batch["indices"]):
            assert int(batch["images"][k, 0, 0, 0]) == i
        seen.extend(batch["indices"])
    assert sorted(seen) == list(range(64))


def test_process_loader_surfaces_worker_errors():
    """A crashing build_batch must raise in the parent, not hang."""
    if not _FORK_OK:
        pytest.skip("no fork")

    def bad_build(bidx):
        if bidx[0] >= 4:
            raise ValueError("boom")
        return {"images": np.zeros((2, 4, 4, 3), np.uint8),
                "indices": bidx}

    batches = [[i, i + 1] for i in range(0, 10, 2)]
    with pytest.raises(RuntimeError, match="boom|exited early"):
        for _ in iter_batches_processes(bad_build, batches, workers=2,
                                        reseed=lambda w: None):
            pass


def test_process_loader_detects_partial_hard_death():
    """ONE worker SIGKILLed mid-task (its batch is lost, its slot leaks)
    while the others stay alive: the in-order cursor can never advance
    past the lost seq and the survivors eventually starve on the slot
    ring — the parent must raise, not hang. (An all-dead liveness check
    misses this: the survivors are alive, just deadlocked.)"""
    if not _FORK_OK:
        pytest.skip("no fork")
    import os
    import signal

    def build(bidx):
        if bidx[0] == 6:  # a mid-epoch batch built by a forked worker
            os.kill(os.getpid(), signal.SIGKILL)
        return {"images": np.full((2, 4, 4, 3), bidx[0], np.uint8),
                "indices": bidx}

    batches = [[i, i + 1] for i in range(0, 24, 2)]
    with pytest.raises(RuntimeError, match="died without reporting"):
        for _ in iter_batches_processes(build, batches, workers=3,
                                        reseed=lambda w: None, n_slots=3,
                                        poll_timeout=1.0):
            pass


def test_process_loader_deterministic_order_and_content():
    """Reproducibility contract (parallel_loader.py determinism note):
    batches arrive in task order with content seeded per batch index —
    identical across runs and worker counts, like the reference torch
    DataLoader."""
    if not _FORK_OK:
        pytest.skip("no fork")
    ds = StubDataset(n=48)
    batches = [[i, i + 1] for i in range(0, 48, 2)]
    state = {"rng": None}

    def reseed(seq):
        import random

        state["rng"] = random.Random(1000 + seq)

    def build(bidx):
        items = [ds[i] for i in bidx]
        jitter = state["rng"].random()  # per-batch aug stand-in
        return {
            "images": np.stack([it[0] for it in items]),
            "jitter": jitter,
            "indices": bidx,
        }

    def run(workers):
        out = []
        for b in iter_batches_processes(build, batches, workers=workers,
                                        reseed=reseed, n_slots=3):
            out.append((tuple(b["indices"]), round(b["jitter"], 12)))
        return out

    r1, r2, r4 = run(1), run(2), run(4)
    assert [o[0] for o in r1] == [tuple(b) for b in batches]  # task order
    assert r1 == r2 == r4  # content independent of scheduling


def test_thread_engine_in_order_delivery():
    """Thread engine yields batch i i-th even under adversarial scheduling
    (round-4 regression: completion-order delivery let host load reorder
    validation batches, flipping equal-confidence ties in ap_per_class's
    sort and byte-diverging results.csv between identical-seed runs)."""
    import time

    batches = [[i] for i in range(24)]

    def build(bidx):
        # later batches finish FIRST if delivery follows completion order
        time.sleep(0.02 * (24 - bidx[0]) / 24)
        return {"indices": bidx}

    for workers in (2, 4, 8):
        got = [b["indices"][0]
               for b in iter_batches_threads(build, batches, workers=workers)]
        assert got == list(range(24)), (workers, got)


def test_thread_engine_propagates_errors():
    batches = [[i] for i in range(8)]

    def build(bidx):
        if bidx[0] == 5:
            raise ValueError("boom")
        return {"indices": bidx}

    with pytest.raises(ValueError, match="boom"):
        list(iter_batches_threads(build, batches, workers=3))
