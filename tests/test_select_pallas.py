"""Exact-selection kernel parity: ops/select_pallas engines must
reproduce jax.lax.top_k row-for-row — scores everywhere, indices wherever a
real candidate was selected, INCLUDING the lowest-index-first tie rule —
because they replace the lax.top_k candidate cap in eval NMS (reference
utils/general.py:1024,1061 max_nms semantics). Runs the Pallas kernels in
interpreter mode on CPU.

Two engines share the contract and the suite:
  rows  (exact_topk_rows)  — live-128-lane-row compaction, r4
  elems (exact_topk_elems) — element compaction + value bisection, r5

N must exceed the engines' small-lattice early exits for the kernel paths
to engage; smaller lattices take the plain lax.top_k escape."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.ops.select_pallas import (
    exact_topk_elems, exact_topk_rows,
)

_N = 65536  # 512 rows of 128 — row-kernel path engages (r1 = 256 rows)

_ENGINES = {"rows": exact_topk_rows, "elems": exact_topk_elems}


@pytest.fixture(params=sorted(_ENGINES))
def engine(request):
    return _ENGINES[request.param]


def _check(engine, scores: np.ndarray, k: int):
    x = jnp.asarray(scores)
    ts, ti = map(np.asarray, engine(x, k, interpret=True))
    rs, ri = map(np.asarray, jax.lax.top_k(x, k))
    np.testing.assert_array_equal(ts, rs)
    valid = rs > 0
    np.testing.assert_array_equal(ti[valid], ri[valid])


def _masked(rng, b, n, npos_per_row):
    sc = np.full((b, n), -1.0, np.float32)
    for i, npos in enumerate(npos_per_row):
        pos = rng.choice(n, npos, replace=False)
        sc[i, pos] = rng.uniform(1e-4, 1.0, npos).astype(np.float32)
    return sc


def _clustered(rng, b, n, runs, run_len=80):
    """Hot-anchor-like clustering: runs of consecutive live lanes."""
    sc = np.full((b, n), -1.0, np.float32)
    for i in range(b):
        starts = rng.choice(n - run_len, runs, replace=False)
        for s in starts:
            sc[i, s:s + run_len] = rng.uniform(
                1e-4, 1.0, run_len).astype(np.float32)
    return sc


def test_sparse_tier1(engine):
    # few live rows: smallest row tier / direct element compaction
    rng = np.random.default_rng(0)
    _check(engine, _clustered(rng, 3, _N, runs=12), 1000)


def test_spread_tier2(engine):
    # uniformly spread candidates light > r1 rows -> 4x row tier
    rng = np.random.default_rng(1)
    _check(engine, _masked(rng, 2, _N, [5000, 20000]), 1000)


def test_dense_fallback(engine):
    # nearly every row live in a big lattice -> raw top_k fallback for the
    # row engine, bisection for the element engine
    rng = np.random.default_rng(2)
    n = 262144  # r=2048 rows > r2=1024
    _check(engine, _masked(rng, 1, n, [150000]), 500)


def test_elems_bisect_tier():
    """Candidate counts above the element buffer (k + slack) force the
    value-bisection path; must stay exact, incl. a mixed batch where one
    image fits the buffer and the other bisects."""
    rng = np.random.default_rng(9)
    n = 262144
    # k=500 -> capb ~ 500+32768+1280: image 0 (200k cands) bisects,
    # image 1 (2k) takes tau=0 directly
    sc = _masked(rng, 2, n, [200000, 2000])
    _check(exact_topk_elems, sc, 500)


def test_elems_bisect_with_tie_blocks():
    """Bisection tau landing inside/near large tie classes: >= keeps all
    ties at tau, so the small top_k reproduces the index tie rule."""
    rng = np.random.default_rng(10)
    n = 262144
    sc = _masked(rng, 1, n, [150000])
    sc[0, 10000:60000] = 0.5  # 50k-wide tie class dominating the spectrum
    _check(exact_topk_elems, sc, 500)


def test_elems_degenerate_all_equal_falls_back():
    """All candidates one value and more of them than the buffer: no tau
    window exists — the engine must concede to raw top_k, still exact."""
    n = 262144
    sc = np.full((1, n), -1.0, np.float32)
    sc[0, ::2] = 0.25  # 131072 identical scores > capb for k=500
    _check(exact_topk_elems, sc, 500)


def test_exact_ties_at_boundary(engine):
    # degenerate: one giant tie class straddling k — kept rows must be the
    # lowest-index ties, exactly lax.top_k's documented rule
    sc = np.full((2, _N), -1.0, np.float32)
    sc[0, ::2] = 0.5                      # 32768 identical scores
    sc[1, 100:3100] = 0.25                # 3000 identical scores
    sc[1, 5] = 0.9                        # plus one clear winner
    _check(engine, sc, 256)


def test_mixed_ties_and_distinct(engine):
    rng = np.random.default_rng(3)
    sc = _clustered(rng, 2, _N, runs=30)
    sc[0, 1000:1900] = 0.123              # tie block inside a live region
    _check(engine, sc, 256)


def test_counts_at_row_boundaries(engine):
    # live-row counts straddling the r1=256 tier boundary
    rng = np.random.default_rng(4)
    for rows in (255, 256, 257, 300):
        sc = np.full((1, _N), -1.0, np.float32)
        rsel = rng.choice(_N // 128, rows, replace=False)
        for rr in rsel:
            sc[0, rr * 128 + 3] = np.float32(rng.uniform(0.1, 1.0))
        _check(engine, sc, 1000)


def test_all_empty(engine):
    sc = np.full((2, _N), -1.0, np.float32)
    x = jnp.asarray(sc)
    ts, _ = map(np.asarray, engine(x, 128, interpret=True))
    assert (ts <= 0).all()


def test_small_lattice_falls_back(engine):
    # small n: plain lax.top_k early exit, still exact
    rng = np.random.default_rng(5)
    _check(engine, _masked(rng, 2, 4096, [100, 1000]), 512)


def test_unpadded_n(engine):
    # n not a multiple of 128: padding lanes must never be selected
    rng = np.random.default_rng(6)
    _check(engine, _clustered(rng, 2, 65519, runs=10), 500)


def test_batched_nms_pallas_selection_parity():
    """Whole-NMS parity: every pallas selection engine returns the
    identical kept rows as the exact path on realistic decoded
    predictions."""
    from efficientteacher_tpu.ops.nms import batched_nms

    rng = np.random.default_rng(7)
    b, n, nc = 2, 2048, 32  # pair lattice 65536 -> kernel path engages
    pred = np.zeros((b, n, 5 + nc), np.float32)
    pred[..., 0:2] = rng.uniform(0, 640, (b, n, 2))
    pred[..., 2:4] = rng.uniform(8, 120, (b, n, 2))
    pred[..., 4] = rng.uniform(0, 1, (b, n)) ** 3
    pred[..., 5:] = rng.uniform(0, 1, (b, n, nc))
    x = jnp.asarray(pred)
    kw = dict(nc=nc, conf_thres=0.05, iou_thres=0.6, multi_label=True,
              max_nms=2048, max_det=100, use_pallas=False)
    exact = batched_nms(x, selection="exact", **kw)
    for sel in ("pallas", "pallas_rows", "pallas_elems"):
        fast = batched_nms(x, selection=sel, **kw)
        np.testing.assert_array_equal(np.asarray(exact.valid),
                                      np.asarray(fast.valid))
        ev, fv = np.asarray(exact.detections), np.asarray(fast.detections)
        np.testing.assert_allclose(ev[np.asarray(exact.valid)],
                                   fv[np.asarray(fast.valid)], atol=1e-6)


@pytest.mark.slow
def test_fuzz_parity(engine):
    rng = np.random.default_rng(8)
    for trial in range(6):
        b = int(rng.integers(1, 3))
        n = int(rng.choice([49152, 65536, 98304]))
        k = int(rng.choice([128, 500, 1000]))
        if rng.random() < 0.5:
            sc = _clustered(rng, b, n, runs=int(rng.integers(1, 60)))
        else:
            npos = [int(rng.integers(0, 20000)) for _ in range(b)]
            sc = _masked(rng, b, n, npos)
        if rng.random() < 0.5:  # inject a tie block
            lo = int(rng.integers(0, n - 800))
            sc[rng.integers(0, b), lo:lo + 800] = np.float32(rng.random())
        _check(engine, sc, k)
