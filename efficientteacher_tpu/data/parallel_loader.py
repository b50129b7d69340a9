"""Multiprocess batch engine: fork workers + shared-memory slot ring.

Replaces the reference's torch DataLoader worker pool (utils/datasets.py
InfiniteDataLoader, num_workers) for this framework's host pipeline. The
GIL makes Python threads insufficient for cv2 mosaic at TPU train rates
(VERDICT r1: 4 decodes/sample at 640px, doubled for the SSOD dual view), so
train loaders fork `workers` processes that each build whole batches and
write the stacked arrays into pre-allocated shared-memory slots; the parent
copies each slot once at yield time (a ~5 ms b32@640 memcpy — consumers may
cache batches and JAX h2d copies are async, so yielded arrays must own
their memory) and recycles the slot.

Design notes:
  - fork start method: the dataset (file lists, label arrays, RAM cache) is
    inherited copy-on-write — no pickling, no re-import of jax in children.
  - children only touch numpy/cv2 (cv2.setNumThreads(0) per worker, the
    yolov5 fork-safety convention); they never call into JAX.
  - fixed shapes everywhere (CLAUDE.md invariant) make the slot ring
    possible: every batch of a loader has identical array shapes/dtypes.
  - DETERMINISM: batches are yielded in task order (out-of-turn
    completions wait in their slots, so in-flight memory is bounded by
    n_slots) and the augmentation RNG is re-seeded per BATCH (not per
    worker), so epoch content and order are exactly reproducible
    regardless of worker scheduling — matching the reference torch
    DataLoader's in-order, worker-count-independent semantics. (The
    thread fallback yields in completion order and shares the parent
    RNG; it is only deterministic at workers=1 — BatchLoader warns when
    it runs threads with workers>1. Auto mode therefore picks processes
    whenever fork exists and workers>1, even on 1-core hosts: threads
    would be no faster there and would void the reproducibility
    contract. Determinism precondition, exactly: fork-capable OS AND
    (loader in {'auto','process'} with workers>1, or workers<=1).)
"""

from __future__ import annotations

import ctypes
import itertools
import multiprocessing
import os
import queue as _queue
from typing import Callable, Dict, Iterator, List

import numpy as np

_FORK_OK = hasattr(os, "fork")


def _alloc_slot(template: Dict[str, np.ndarray]):
    """One shared-memory slot: a RawArray-backed view per array field."""
    views = {}
    for k, v in template.items():
        raw = multiprocessing.RawArray(ctypes.c_uint8, v.nbytes)
        views[k] = np.frombuffer(raw, dtype=v.dtype).reshape(v.shape)
    return views


def iter_batches_processes(
    build_batch: Callable[[List[int]], Dict],
    batches: List[List[int]],
    workers: int,
    reseed: Callable[[int], None],
    n_slots: int = 0,
    poll_timeout: float = 30.0,
) -> Iterator[Dict]:
    """Yield build_batch(bidx) for every bidx in `batches`, built by forked
    worker processes through a shared-memory slot ring."""
    if not batches:
        return
    workers = max(1, min(workers, len(batches)))
    n_slots = n_slots or max(2 * workers, 4)

    # probe: the first batch is built in-parent and defines the slot layout
    reseed(0)  # per-batch seeding: batch 0's content is scheduling-free too
    first = build_batch(batches[0])
    arrays = {k: v for k, v in first.items() if isinstance(v, np.ndarray)}
    ctx = multiprocessing.get_context("fork")
    slots = [_alloc_slot(arrays) for _ in range(n_slots)]
    task_q = ctx.Queue()
    done_q = ctx.Queue()
    free_q = ctx.Queue()
    for sid in range(n_slots):
        free_q.put(sid)
    for seq, b in enumerate(batches[1:], start=1):
        task_q.put((seq, b))
    for _ in range(workers):
        task_q.put(None)

    def worker(wid: int):
        try:
            import cv2

            cv2.setNumThreads(0)
        except Exception:
            pass
        while True:
            # acquire the slot BEFORE the task: every task-holder owns a
            # slot, so the batch the parent's in-order cursor waits for can
            # always complete — the memory-bound invariant below depends on
            # this order (slot-less task-holders could deadlock against a
            # parent that only frees slots at in-order yield)
            sid = free_q.get()
            task = task_q.get()
            if task is None:
                free_q.put(sid)
                break
            seq, bidx = task
            try:
                # seed by BATCH index: content is independent of which
                # worker draws the task (determinism note above)
                reseed(seq)
                batch = build_batch(bidx)
            except BaseException:
                import traceback

                # surface the failure instead of hanging the parent on
                # done_q.get()
                free_q.put(sid)
                done_q.put(("error", traceback.format_exc()))
                break
            for k in arrays:
                slots[sid][k][...] = batch[k]
            meta = {k: v for k, v in batch.items() if k not in arrays}
            done_q.put((sid, seq, meta))
        done_q.put(None)

    procs = [ctx.Process(target=worker, args=(w,), daemon=True)
             for w in range(workers)]
    for p in procs:
        p.start()
    try:
        yield first
        finished = 0
        remaining = len(batches) - 1
        pending: Dict[int, tuple] = {}  # seq -> (sid, meta) awaiting turn
        next_seq = 1
        while remaining > 0:
            try:
                # bounded wait + liveness check: a worker that dies HARD
                # (signal, fork-inherited lock corruption) sends neither a
                # result nor its exit sentinel — without this the parent
                # blocks on the queue pipe forever (observed: forked
                # children dying at startup under a heavily multithreaded
                # JAX parent left pytest hung for an hour)
                msg = done_q.get(timeout=poll_timeout)
            except _queue.Empty:
                # A worker that exits CLEANLY always posts its None exit
                # sentinel (or an ("error", tb) message) first — so any
                # dead process beyond the sentinels received died hard,
                # and its in-flight batch is lost. This must also catch
                # PARTIAL death: survivors keep producing, but the
                # in-order cursor waits on the lost seq forever while the
                # dead worker's leaked slot starves the ring, deadlocking
                # the survivors on free_q (they stay alive, so an
                # all-dead check never fires).
                dead = sum(1 for p in procs if not p.is_alive())
                if dead > finished:
                    raise RuntimeError(
                        f"{dead - finished} loader worker process(es) "
                        "died without reporting (hard kill / fork-unsafe "
                        f"crash); {remaining} batches missing, exitcodes="
                        f"{[p.exitcode for p in procs]} — use "
                        "Dataset.loader='thread' in fork-hostile contexts")
                continue
            if msg is None:
                finished += 1
                if finished >= workers and remaining > 0:
                    raise RuntimeError(
                        "loader workers exited early "
                        f"({remaining} batches missing)"
                    )
                continue
            if msg[0] == "error":
                raise RuntimeError(f"loader worker failed:\n{msg[1]}")
            sid, seq, meta = msg
            # in-order delivery with BOUNDED memory: out-of-turn batches
            # stay in their shared-memory slots (at most n_slots in flight —
            # workers block on free_q until the cursor advances); the copy
            # out happens only at yield time. Yielded arrays must own their
            # memory — consumers cache batches (itertools.cycle in the SSOD
            # trainer) and JAX's h2d copy is async (PJRT may still be
            # reading the buffer when the next batch wants the slot). A
            # b32@640 memcpy is ~5 ms.
            pending[seq] = (sid, meta)
            while next_seq in pending:
                psid, pmeta = pending.pop(next_seq)
                out = {k: v.copy() for k, v in slots[psid].items()}
                out.update(pmeta)
                free_q.put(psid)
                remaining -= 1
                next_seq += 1
                yield out
    finally:
        for p in procs:
            if p.is_alive():
                p.terminate()
        for p in procs:
            p.join(timeout=5)


def iter_batches_threads(
    build_batch: Callable[[List[int]], Dict],
    batches: List[List[int]],
    workers: int,
    prefetch: int = 4,
) -> Iterator[Dict]:
    """Thread-pool engine (fork-less platforms, explicit
    Dataset.loader='thread', and augment=False validation loaders):
    `workers` producer threads over a bounded in-flight window with
    IN-ORDER delivery — batch i is always yielded i-th. Loaders whose
    per-batch build is RNG-free (augment=False) are therefore fully
    deterministic under threads regardless of scheduling; batch ORDER
    nondeterminism here used to flip equal-confidence tie order in
    ap_per_class's sort and byte-diverge results.csv under host load.
    Augmenting thread loaders remain nondeterministic at workers>1
    (workers share the parent's RNG mid-build), which is what the
    BatchLoader warning covers."""
    if not batches:
        return
    workers = max(1, min(workers, len(batches)))
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    window = max(prefetch, workers)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs = deque()
        it = iter(batches)
        for b in itertools.islice(it, window):
            futs.append(ex.submit(build_batch, b))
        while futs:
            f = futs.popleft()
            nxt = next(it, None)
            if nxt is not None:  # keep the window full before blocking
                futs.append(ex.submit(build_batch, nxt))
            yield f.result()
