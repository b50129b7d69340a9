"""Exact top-k candidate selection over the NMS pair lattice (Pallas TPU).

Replaces `jax.lax.top_k` over the flat (anchors * classes) multi-label
candidate lattice in eval NMS (reference utils/general.py:1024,1061 —
the max_nms=30000 candidate cap + score sort). XLA's exact TopK is the
measured eval-serving floor on TPU: ~129 ms of a 160 ms b32@640 batch,
~20x off bandwidth and ~flat in k and shape, because its sort network
touches every element O(log) times. TPU has no fast global
scatter/compaction either (cumsum+scatter of the lattice: 648 ms), so
this module implements selection the TPU way, at 128-lane ROW
granularity (candidates cluster into rows: one hot anchor lights a run
of class columns):

  1. one bandwidth pass marks live rows of the (B, N/128, 128) lattice;
  2. the Pallas compaction kernel packs the live ROW INDICES in
     ascending order — a ~16k-element problem, ~1 ms;
  3. an XLA row-gather assembles the live rows into a dense
     (rows_cap * 128) buffer — 64x smaller than the lattice;
  4. a small `lax.top_k` orders the buffer. Buffer order =
     (ascending row, ascending lane) = ascending flat index, so the
     tie semantics match exact TopK row-for-row.

Tiering keeps it exact at any density: rows_cap 256 normally, 1024 when
crowded, raw lax.top_k for the pathological tail (untrained model at
eval thresholds) — chosen by one `lax.cond` on the batch's max live-row
count, so only the taken tier executes.

The compaction kernel packs survivors with the classic TPU idiom:
within-block positions via a triangular-matrix matmul (MXU cumsum),
block-local compaction as a one-hot permutation matmul (HIGHEST
precision — the one-hot is bf16-exact so the product is bit-exact),
and a running write offset across the sequential grid kept in SMEM.
Mosaic only lowers lane-dim dynamic stores at 128-aligned offsets, so
the offset advances in whole 128-lane groups with a (3, 128) carry
buffer holding the remainder (see _compact_kernel).

Measured (v5e, b32, (25200 x 80) lattice — r5 xprof attribution,
scripts/profile_eval.py, recorded in STATUS.md): at representative eval
density (sparse candidate field, tier r1) selection costs ~17.5 ms/batch
(row-gather 16.6 + compaction 0.16 + the small top_k 0.76) where XLA's
exact TopK costs ~129 ms; the full eval program (bf16 forward + decode +
NMS) runs 67 ms/batch = 2.1 ms/img. At pathological density (saturated
objectness, every row live) the dense tail is handled by the r5
ELEMENT-granularity engine (`exact_topk_elems` below): a per-image value
bisection bounds the compaction buffer so cost tracks the candidate
count, not the row spread — 162 ms/batch = 5.1 ms/img where the r4
raw-top_k fallback re-paid the 194 ms XLA floor (r5 on-chip A/B,
scripts/ab_selection.py; both regimes recorded each round by bench.py).

Exactness contract (both engines): the returned SCORES are bit-identical
to lax.top_k, every returned index is a distinct genuine candidate
carrying exactly that score, and every tie class strictly above the k-th
score has identical membership. Tie ORDER among bit-equal scores is
backend-defined: on CPU it is lax.top_k's lowest-index-first rule
(pinned by the interpreter-mode suite); on TPU, XLA's OWN top_k is not
index-stable — measured r5 on hardware: it returned the higher index of
a bit-equal random-collision pair first — so no engine (including
lax.top_k itself) defines a stable cross-backend tie order. The
reference has the same instability (CUDA torch.sort is unstable).
A stable buffer sort would pin ascending-index ties for +10 ms/batch
(measured jnp.argsort(stable=True) 13.0 vs top_k 2.9 at (32, 63488));
not taken. scripts/ab_selection.py carries the tie-aware hardware fuzz.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_S = 512           # sub-block size (one compaction unit), 4 x 128 lanes
_W = _S + 128       # combined slab width: carry row + sub-block survivors
_IDX_SPLIT = 4096  # flat index carried as (idx // 4096, idx % 4096) f32 planes


def _compact_kernel(tau_lo_ref, tau_hi_ref, scores_ref, out_ref,
                    off_ref, clen_ref, carry_ref, comb_ref, *,
                    chunk: int, capb: int):
    """One grid step: compact survivors of `tau_lo <= s <= tau_hi` from a
    (1, 1, chunk/128, 128) score block into out (1, 3, capb) planes
    [score, idx_hi, idx_lo] in ascending flat-index order.

    Mosaic only lowers LANE-dim dynamic stores at 128-aligned offsets, so
    the running offset advances in whole 128-lane groups and a (3, 128)
    carry buffer holds the `total % 128` remainder between sub-blocks:
    each sub-block emits carry+survivors as a (3, W) slab via a one-hot
    permutation matmul (the TPU compaction idiom), writes the whole slab
    at the aligned offset (its tail is provisional and is re-written by
    the next slab, whose first lanes are exactly the carry), then keeps
    the sub-128 remainder as the new carry. The final remainder is
    flushed on the last grid step."""
    g = pl.program_id(1)
    num_g = pl.num_programs(1)

    @pl.when(g == 0)
    def _init():
        off_ref[0] = 0
        clen_ref[0] = 0
        carry_ref[:, :] = jnp.zeros((3, 128), jnp.float32)
        out_ref[:, 0, :] = jnp.full((1, capb), -1.0, jnp.float32)
        out_ref[:, 1, :] = jnp.zeros((1, capb), jnp.float32)
        out_ref[:, 2, :] = jnp.zeros((1, capb), jnp.float32)

    i = pl.program_id(0)
    tlo = tau_lo_ref[i, 0]
    thi = tau_hi_ref[i, 0]
    base = g * chunk

    # constants hoisted out of the sub-block loop
    ii = jax.lax.broadcasted_iota(jnp.int32, (_S, _S), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (_S, _S), 1)
    tri = (ii < kk).astype(jnp.float32)              # strict upper-tri mask
    kkw = jax.lax.broadcasted_iota(jnp.int32, (_S, _W), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _S), 1)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def sub(sb, _):
        s4 = scores_ref[0, 0, pl.ds(sb * (_S // 128), _S // 128), :]
        m4 = (s4 >= tlo) & (s4 <= thi)
        cnt = jnp.sum(m4.astype(jnp.int32))

        @pl.when(cnt > 0)
        def _():
            off = pl.multiple_of(off_ref[0], 128)

            @pl.when(off + _W <= capb)
            def _():
                clen = clen_ref[0]
                s = s4.reshape(1, _S)                 # row-major == index order
                # recompute the mask in flat form (Mosaic cannot reshape i1)
                m = (s >= tlo) & (s <= thi)
                mf = m.astype(jnp.float32)
                # dest slot = carry_len + exclusive prefix count, via an
                # MXU cumsum: pos[j] = clen + sum_{i<j} m_i. DEFAULT
                # precision is exact here: both operands are 0/1
                # (bf16-exact) and the MXU accumulates in f32, so the
                # counts (<= S) are exact integers — unlike the vals slab
                # below, whose f32 scores need HIGHEST
                pos = (jax.lax.dot_general(
                    mf, tri, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + clen.astype(jnp.float32)).astype(jnp.int32)
                # one-hot permutation: onehot[j, k] = (pos_j == k) & m_j;
                # the mask folds into pos as an out-of-range dest (-1)
                # because Mosaic cannot reshape i1 vectors
                pos = jnp.where(m, pos, -1)
                onehot = (kkw == pos.reshape(_S, 1)).astype(
                    jnp.float32)                       # (S, W)
                jg = base + sb * _S + lane            # (1, S) flat indices
                vals = jnp.concatenate(
                    [s,
                     (jg // _IDX_SPLIT).astype(jnp.float32),
                     (jg % _IDX_SPLIT).astype(jnp.float32)], axis=0)  # (3, S)
                # HIGHEST precision: the one-hot is exact in bf16, so the
                # 3-term f32 decomposition reproduces vals bit-exactly —
                # default MXU precision would round scores/indices to bf16
                slab = jax.lax.dot_general(
                    vals, onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                     # (3, W)
                # combined = carry (cols < clen; zeros beyond) + slab
                comb = slab + jnp.concatenate(
                    [carry_ref[:, :],
                     jnp.zeros((3, _S), jnp.float32)], axis=1)
                total = clen + cnt
                srow = jnp.where(lane_w < total, comb[0:1], -1.0)
                out_ref[:, 0, pl.ds(off, _W)] = srow
                out_ref[:, 1, pl.ds(off, _W)] = comb[1:2]
                out_ref[:, 2, pl.ds(off, _W)] = comb[2:3]
                # new carry = the sub-128 remainder of the combined slab
                full = total // 128
                newc = total - full * 128
                comb_ref[0:1, 0:_W] = srow
                comb_ref[1:2, 0:_W] = comb[1:2]
                comb_ref[2:3, 0:_W] = comb[2:3]
                tail = comb_ref[:, pl.ds(pl.multiple_of(full * 128, 128),
                                         128)]
                carry_ref[:, :] = jnp.where(lane_c < newc, tail, 0.0)
                off_ref[0] = off + full * 128
                clen_ref[0] = newc

        return 0

    jax.lax.fori_loop(0, chunk // _S, sub, 0)

    @pl.when(g == num_g - 1)
    def _flush():
        off = pl.multiple_of(off_ref[0], 128)
        clen = clen_ref[0]

        @pl.when((clen > 0) & (off + 128 <= capb))
        def _():
            srow = jnp.where(lane_c < clen, carry_ref[0:1, :], -1.0)
            out_ref[:, 0, pl.ds(off, 128)] = srow
            out_ref[:, 1, pl.ds(off, 128)] = carry_ref[1:2, :]
            out_ref[:, 2, pl.ds(off, 128)] = carry_ref[2:3, :]


@functools.partial(jax.jit, static_argnames=("capb", "interpret"))
def _threshold_compact(scores, tau_lo, tau_hi, capb: int, interpret: bool):
    """Pack survivors of tau_lo <= s <= tau_hi (per image) into a
    (B, 3, capb) buffer [score, idx_hi, idx_lo], ascending index order,
    -1 score padding. Survivors beyond capb - W are dropped (later index
    first) — callers size capb so genuine candidates never drop."""
    b, n = scores.shape
    chunk = _S * min(64, pl.cdiv(n, _S))
    n_pad = pl.cdiv(n, chunk) * chunk
    if n_pad != n:
        scores = jnp.pad(scores, ((0, 0), (0, n_pad - n)),
                         constant_values=-1.0)
    grid = (b, n_pad // chunk)
    scores4 = scores.reshape(b, n_pad // chunk, chunk // 128, 128)
    return pl.pallas_call(
        functools.partial(_compact_kernel, chunk=chunk, capb=capb),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, chunk // 128, 128), lambda i, g: (i, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, capb), lambda i, g: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, capb), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((3, 128), jnp.float32),
            pltpu.VMEM((3, _W + 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(tau_lo.reshape(b, 1), tau_hi.reshape(b, 1), scores4)


_T_BISECT = 8   # thresholds counted per bisection pass (one bandwidth read)
_P_BISECT = 5   # max bisection passes before conceding to raw top_k
_SLACK = 32768  # capacity beyond k: wide count window => few passes land it


def _count_ge(scores, taus):
    """counts[b, t] = #{n : scores[b, n] >= taus[b, t]} — ONE bandwidth
    pass: the broadcast compare fuses into the reduction (no (B, N, T)
    materialization)."""
    return jnp.sum(
        (scores[:, :, None] >= taus[:, None, :]).astype(jnp.int32), axis=1)


def _elems_impl(scores, k: int, interpret: bool):
    """Traceable body of `exact_topk_elems` — also the dense-tail
    fallback tier inside `exact_topk_rows` (the hybrid "pallas" engine),
    where it replaces raw lax.top_k: measured r5 A/B
    (scripts/ab_selection.py), bisection costs 162 ms/batch where the
    raw fallback re-pays XLA's 193 ms exact-TopK floor."""
    b, n = scores.shape
    capb = pl.cdiv(k + _SLACK + 2 * _W, 128) * 128
    if n <= capb + 4096:  # compaction can't beat sorting the lattice
        return tuple(jax.lax.top_k(scores, k))
    cap_use = capb - _W - 128  # survivors beyond capb - W would drop

    total = jnp.sum((scores > 0.0).astype(jnp.int32), axis=1)   # (B,)
    kmin = jnp.minimum(k, total)
    inf = jnp.full((b,), jnp.float32(jnp.inf))

    def compact_tier(tau):
        def f():
            buf = _threshold_compact(scores, tau, inf, capb, interpret)
            ts, pos = jax.lax.top_k(buf[:, 0, :], k)
            idx = (jnp.take_along_axis(buf[:, 1, :], pos, axis=1)
                   * _IDX_SPLIT
                   + jnp.take_along_axis(buf[:, 2, :], pos, axis=1)
                   ).astype(jnp.int32)
            return ts, jnp.where(ts > 0.0, idx, 0)
        return f

    def fallback():
        return tuple(jax.lax.top_k(scores, k))

    def bisect():
        # per-image value bisection for tau with count(s >= tau) in
        # [kmin, cap_use]; counts are monotone non-increasing in tau, so
        # (count > cap) is a prefix of each pass's tau grid and
        # (count < kmin) a suffix — the bracket narrows ~(T+1)x per pass
        smax = jnp.max(scores, axis=1)
        found0 = total <= cap_use  # these images take tau=0 (all cands)
        tau0 = jnp.zeros((b,), jnp.float32)
        fr = jnp.arange(1, _T_BISECT + 1, dtype=jnp.float32) / (
            _T_BISECT + 1)

        def cond(st):
            it = st[0]
            return (it < _P_BISECT) & ~jnp.all(st[3])

        def body(st):
            it, lo, hi, found, tau = st
            taus = lo[:, None] + fr[None, :] * (hi - lo)[:, None]
            counts = _count_ge(scores, taus)                    # (B, T)
            ok = (counts >= kmin[:, None]) & (counts <= cap_use)
            any_ok = jnp.any(ok, axis=1)
            first = jnp.argmax(ok, axis=1)
            tau_ok = jnp.take_along_axis(taus, first[:, None], 1)[:, 0]
            tau = jnp.where(~found & any_ok, tau_ok, tau)
            n_gt = jnp.sum((counts > cap_use).astype(jnp.int32), axis=1)
            new_lo = jnp.where(
                n_gt > 0,
                jnp.take_along_axis(
                    taus, jnp.maximum(n_gt - 1, 0)[:, None], 1)[:, 0],
                lo)
            n_lt = jnp.sum((counts < kmin[:, None]).astype(jnp.int32),
                           axis=1)
            new_hi = jnp.where(
                n_lt > 0,
                jnp.take_along_axis(
                    taus,
                    jnp.minimum(_T_BISECT - n_lt,
                                _T_BISECT - 1)[:, None], 1)[:, 0],
                hi)
            upd = ~(found | any_ok)
            return (it + 1, jnp.where(upd, new_lo, lo),
                    jnp.where(upd, new_hi, hi), found | any_ok, tau)

        st = (jnp.int32(0), jnp.zeros((b,), jnp.float32), smax,
              found0, tau0)
        _, _, _, found, tau = jax.lax.while_loop(cond, body, st)
        return jax.lax.cond(jnp.all(found), compact_tier(tau), fallback)

    return jax.lax.cond(jnp.max(total) <= cap_use,
                        compact_tier(jnp.zeros((b,), jnp.float32)),
                        bisect)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def exact_topk_elems(scores, k: int, interpret: bool = False):
    """Exact `lax.top_k(scores, k)` over (B, N) masked score rows
    (non-candidates = -1, candidates strictly > 0) — ELEMENT-granularity
    engine. Tie order among bit-equal scores is backend-defined (module
    docstring: exact score multiset + tie-class membership everywhere;
    lowest-index-first on CPU).

    Where `exact_topk_rows` selects live 128-lane ROWS (and would
    otherwise fall back to raw top_k when more than its row cap light
    up), this engine compacts surviving ELEMENTS, so its cost depends
    only on the candidate count, never on how they spread across rows:

      1. one bandwidth pass counts candidates per image;
      2. if every image fits the k + _SLACK buffer, the compaction
         kernel packs ALL candidates [score, idx] in ascending index
         order (tau = 0 keeps exactly the strictly-positive scores);
      3. else a per-image VALUE bisection finds tau with
         count(s >= tau) in [k, cap] — _T_BISECT thresholds per
         bandwidth pass, <= _P_BISECT passes — and compacts s >= tau
         (>= keeps all ties at tau, so every tie class above the k-th
         score keeps full membership); degenerate spectra (> cap
         candidates inside one ulp) concede to raw lax.top_k, keeping
         every path exact;
      4. a small lax.top_k orders the buffer; buffer order = ascending
         flat index, so the small top_k sees candidates in index
         order (ties then resolve by the backend top_k's rule).

    Indices where the returned score is <= 0 are 0 (same contract as
    exact_topk_rows: callers gate on score > 0)."""
    return _elems_impl(scores, k, interpret)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def exact_topk_rows(scores, k: int, interpret: bool = False):
    """Exact `lax.top_k(scores, k)` over (B, N) masked score rows
    (non-candidates = -1, candidates strictly > 0). Returns
    (top_scores, top_idx) (B, k). Tie order among bit-equal scores is
    backend-defined (module docstring; lowest-index-first on CPU).
    ROW-granularity engine (r4); see exact_topk_elems for the r5
    element-granularity engine whose cost is density-independent.

    Row-granularity selection: candidates only exist in "live" 128-lane
    rows of the lattice (a hot anchor lights a run of class columns), so
    one bandwidth pass marks live rows, the Pallas compaction kernel
    packs the live ROW INDICES in ascending order (a ~16k-element
    problem, ~1 ms), an XLA row-gather assembles the live rows into a
    dense (rows_cap * 128) buffer, and a small lax.top_k orders it.
    Buffer order = (ascending row, ascending lane) = ascending flat
    index, so the small top_k sees candidates in flat-index order
    (ties then resolve by the backend top_k's rule).

    Tiered: a compact rows_cap when the densest image fits it (the
    common case at eval thresholds), 4x when crowded, and the element
    engine's value bisection (`_elems_impl`) for the pathological tail
    (an untrained model at eval thresholds) — measured r5 A/B
    (scripts/ab_selection.py, b32@640 eval program): representative
    regime 64.6 ms/batch (vs 189.7 raw exact TopK), pathological 162
    ms/batch via the bisection tier (vs 193 when the tail fell back to
    raw top_k). Every tier returns the exact top-k score multiset of
    lax.top_k.

    `interpret=True` runs the compaction kernel in the Pallas
    interpreter (CPU test path)."""
    b, n = scores.shape
    r = pl.cdiv(n, 128)
    rpad = pl.cdiv(r, 128) * 128
    r1 = min(pl.cdiv(max(pl.cdiv(k, 128) + 8, 256), 128) * 128, rpad)
    r2 = min(4 * r1, rpad)
    if r1 * 128 >= n:
        return tuple(jax.lax.top_k(scores, k))

    npad = r * 128
    if npad != n:
        scores_p = jnp.pad(scores, ((0, 0), (0, npad - n)),
                           constant_values=-1.0)
    else:
        scores_p = scores
    s3 = scores_p.reshape(b, r, 128)
    rowlive = jnp.any(s3 > 0.0, axis=-1)                 # (B, r)
    nmax = jnp.max(jnp.sum(rowlive, axis=-1))

    rowscore = rowlive.astype(jnp.float32)               # 1.0 live, 0.0 dead
    half = jnp.full((b,), 0.5, jnp.float32)
    inf = jnp.full((b,), jnp.float32(jnp.inf))

    def tier(rows_cap):
        capr = pl.cdiv(rows_cap + _W, 128) * 128

        def f():
            buf = _threshold_compact(rowscore, half, inf, capr, interpret)
            live = buf[:, 0, :rows_cap] > 0.0            # (B, rows_cap)
            rsel = (buf[:, 1, :rows_cap] * _IDX_SPLIT
                    + buf[:, 2, :rows_cap]).astype(jnp.int32)
            rows = jnp.take_along_axis(s3, rsel[:, :, None], axis=1)
            rows = jnp.where(live[:, :, None], rows, -1.0)
            ts, pos = jax.lax.top_k(rows.reshape(b, rows_cap * 128), k)
            srow = jnp.take_along_axis(rsel, pos // 128, axis=1)
            idx = srow * 128 + pos % 128
            return ts, jnp.where(ts > 0.0, idx, 0)

        return f

    def fallback():
        # dense tail: element-granularity bisection (162 vs 193 ms/batch
        # raw top_k at pathological density, r5 A/B); _elems_impl itself
        # concedes to raw top_k on degenerate spectra, so every path
        # stays exact
        return _elems_impl(scores, k, interpret)

    if r2 > r1:
        crowded = lambda: jax.lax.cond(nmax <= r2, tier(r2), fallback)
    else:
        crowded = fallback
    return jax.lax.cond(nmax <= r1, tier(r1), crowded)


# Default engine behind ops/nms.batched_nms(selection="pallas") and the
# historical import name: the hybrid — row granularity for the sparse
# tiers (2.0 ms/img representative eval serving, r5 A/B), element-
# granularity bisection for the dense tail (5.1 ms/img pathological).
exact_topk_flat = exact_topk_rows
