"""Batched fixed-shape non-maximum suppression for TPU.

Replaces the reference's host-side loop over `torchvision.ops.nms`
(reference: utils/general.py:994-1098 `non_max_suppression`,
utils/general.py:887-992 `non_max_suppression_ssod`) with a fully
jittable, fixed-shape, on-device algorithm so teacher pseudo-label
generation and eval decoding never round-trip to the host.

Algorithm: boxes are score-sorted and processed in tiles. Each tile is
first suppressed by the already-resolved keep set of earlier tiles
(dense tile×tile IoU, MXU/VPU friendly), then within-tile suppression is
resolved by fixpoint iteration of the monotone operator
    a[j] <- base[j] and not any_i (a[i] and iou[i, j] > t, i < j)
which converges to the exact greedy-NMS solution in (suppression-chain
depth) iterations on the DAG of score-ordered overlaps. Sequential step
count is O((K/tile)^2 + fixpoint) instead of O(K) for naive greedy.

Semantics parity notes (vs reference non_max_suppression):
  - candidate gate: obj > conf AND max cls prob > conf (general.py:1005)
  - conf = obj_conf * cls_conf (general.py:1049)
  - multi-label expansion over classes above threshold (general.py:1058)
  - class-offset trick with max_wh = 7680 (general.py:1080)
  - outputs capped at max_det = 300, sorted by confidence
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import box_iou, xywh2xyxy

MAX_WH = 7680.0  # class-offset magnitude (reference general.py:1035)


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return box_iou(a, b)


def greedy_nms_keep(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thres: float,
    tile: int = 256,
    stop_at: int | None = None,
) -> jnp.ndarray:
    """Exact greedy NMS keep-mask over score-sorted `boxes` (K, 4) xyxy.

    `valid` (K,) bool marks real candidates (padding rows must be False).
    Returns a (K,) bool keep mask. K must be a multiple of `tile`.

    `stop_at`: early-exit once that many rows are kept — later rows cannot
    influence earlier keeps in greedy NMS, so the mask stays exact for the
    first `stop_at` kept rows (all a max_det-capped consumer reads); tiles
    after the exit keep their `valid` initialization and must be ignored
    beyond that point. This is what makes the reference's max_nms=30000
    candidate cap (general.py:1024,1061) affordable on TPU: crowded images
    resolve in the first few tiles instead of sweeping all ~120.

    The sweep is additionally bounded by the LAST valid row: tiles past it
    are all-padding, whose greedy result IS their `valid` initialization
    (all False, and rows that keep nothing suppress nothing), so skipping
    them is exact for ANY valid mask. Without this bound a sparse candidate
    field is the worst case — `cnt` never reaches `stop_at` and the sweep
    grinds every tile of the max_nms buffer's O(tiles^2) cross pass
    (measured 208 ms/batch of the b32@640 eval program, scripts/
    profile_eval.py r5); density-bounded it costs only what's live.
    """
    k = boxes.shape[0]
    assert k % tile == 0, f"K={k} must be a multiple of tile={tile}"
    num_tiles = k // tile
    last_valid = jnp.max(jnp.where(valid, jnp.arange(k, dtype=jnp.int32),
                                   jnp.int32(-1)))
    valid_tiles = (last_valid + tile) // tile  # ceil((last+1)/tile); 0 if none
    tri = jnp.triu(jnp.ones((tile, tile), dtype=bool), 1)  # i < j strict

    def outer(ti, keep):
        row0 = ti * tile
        tile_boxes = jax.lax.dynamic_slice(boxes, (row0, 0), (tile, 4))
        base = jax.lax.dynamic_slice(valid, (row0,), (tile,))

        def cross(tj, act):
            prev_boxes = jax.lax.dynamic_slice(boxes, (tj * tile, 0), (tile, 4))
            prev_keep = jax.lax.dynamic_slice(keep, (tj * tile,), (tile,))
            iou = _pairwise_iou(prev_boxes, tile_boxes)
            sup = jnp.any((iou > iou_thres) & prev_keep[:, None], axis=0)
            return act & ~sup

        base = jax.lax.fori_loop(0, ti, cross, base)

        iou = _pairwise_iou(tile_boxes, tile_boxes)
        sup_mat = (iou > iou_thres) & tri  # [i, j]: i may suppress j

        def fix_cond(state):
            _, changed, it = state
            return changed & (it < tile)

        def fix_body(state):
            act, _, it = state
            new = base & ~jnp.any(sup_mat & act[:, None], axis=0)
            return new, jnp.any(new != act), it + 1

        act, _, _ = jax.lax.while_loop(
            fix_cond, fix_body, (base, jnp.bool_(True), jnp.int32(0))
        )
        return jax.lax.dynamic_update_slice(keep, act, (row0,))

    if stop_at is None:
        return jax.lax.fori_loop(0, valid_tiles, outer, valid)

    def sweep_cond(state):
        ti, _, cnt = state
        return (ti < valid_tiles) & (cnt < stop_at)

    def sweep_body(state):
        ti, keep, cnt = state
        keep = outer(ti, keep)
        act = jax.lax.dynamic_slice(keep, (ti * tile,), (tile,))
        return ti + 1, keep, cnt + jnp.sum(act)

    _, keep, _ = jax.lax.while_loop(
        sweep_cond, sweep_body, (jnp.int32(0), valid, jnp.int32(0))
    )
    return keep


def _compact_keep(rows: jnp.ndarray, keep: jnp.ndarray, max_det: int):
    """Scatter kept rows (already score-ordered) into a (max_det, C) output."""
    slots = jnp.cumsum(keep) - 1
    slots = jnp.where(keep, slots, max_det)  # out-of-bounds rows are dropped
    out = jnp.zeros((max_det, rows.shape[-1]), rows.dtype)
    out = out.at[slots].set(rows, mode="drop")
    n = jnp.minimum(jnp.sum(keep), max_det)
    valid = jnp.arange(max_det) < n
    return out, valid


class NMSOutput(NamedTuple):
    """Fixed-shape detections: rows beyond `valid` are zero padding."""

    detections: jnp.ndarray  # (B, max_det, C) - [xyxy, conf, cls, ...]
    valid: jnp.ndarray       # (B, max_det) bool


def _gate_and_extras(pred, nc, conf_thres, ssod, n_extra, obj_gate, classes):
    """Shared candidate gating: boxes, per-(row, class) confidences, the
    row gate, optional extra columns, and the `classes` filter mask.

    classes: keep only these class indices (reference non_max_suppression's
    `classes` filter, utils/general.py:1049-1051 `x[(x[:, 5:6] ==
    classes).any(1)]`) — applied before the max_nms candidate cap, as
    upstream filters before its top-k truncation.

    n_extra > 0 carries the trailing prediction columns (keypoint/landmark
    channels and any extras) through selection into the output rows —
    reference non_max_suppression_lmk_and_bbox (utils/general.py:778-885)
    appends x[:, 5+nc:] to every kept row. obj_gate mirrors that variant's
    candidate gate (obj > conf only, general.py:791)."""
    obj = pred[:, 4]
    clsp = pred[:, 5 : 5 + nc]
    boxes_xyxy = xywh2xyxy(pred[:, :4])
    conf_mat = clsp * obj[:, None]  # conf = obj_conf * cls_conf

    if ssod or obj_gate:
        # reference non_max_suppression_ssod / _lmk_and_bbox gate:
        # obj > conf only
        gate = obj > conf_thres
    else:
        gate = (obj > conf_thres) & (jnp.max(clsp, axis=-1) > conf_thres)

    if ssod:
        # [obj_conf, cls_conf] columns (general.py:887 ssod variant)
        extra_mat = jnp.stack([obj, jnp.max(clsp, axis=-1)], axis=-1)
    elif n_extra:
        extra_mat = pred[:, 5 + nc : 5 + nc + n_extra]
    else:
        extra_mat = None

    allowed = None
    if classes is not None:
        allowed = jnp.zeros((nc,), bool).at[jnp.asarray(classes)].set(True)
    return boxes_xyxy, conf_mat, gate, extra_mat, allowed


def _pair_scores(pred, nc, conf_thres, ssod, n_extra, obj_gate, classes):
    """Multi-label (anchor, class) pair lattice: masked flat scores
    (anchors * nc,) with non-candidates at -1, candidates strictly > 0
    (reference general.py:1058 multi-label expansion)."""
    boxes_xyxy, conf_mat, gate, extra_mat, allowed = _gate_and_extras(
        pred, nc, conf_thres, ssod, n_extra, obj_gate, classes)
    keep_pair = gate[:, None] & (conf_mat > conf_thres)
    if allowed is not None:
        keep_pair = keep_pair & allowed[None, :]
    score = jnp.where(keep_pair, conf_mat, -1.0)
    return score.reshape(-1), boxes_xyxy, extra_mat


def _finish_candidates(top_scores, cand_boxes, cls, extra, agnostic, tile):
    """Score-sorted candidates -> tile-padded offset boxes + output rows."""
    k_eff = cand_boxes.shape[0]
    cand_valid = top_scores > 0
    tile = min(tile, max(128, 1 << (k_eff - 1).bit_length()))
    k_pad = -(-k_eff // tile) * tile
    if k_pad != k_eff:
        pad = k_pad - k_eff
        cand_boxes = jnp.pad(cand_boxes, ((0, pad), (0, 0)))
        cls = jnp.pad(cls, (0, pad))
        top_scores = jnp.pad(top_scores, (0, pad), constant_values=-1.0)
        cand_valid = jnp.pad(cand_valid, (0, pad))
        if extra is not None:
            extra = jnp.pad(extra, ((0, pad), (0, 0)))

    offset = jnp.where(agnostic, 0.0, MAX_WH)
    nms_boxes = cand_boxes + (cls * offset)[:, None]

    cols = [cand_boxes, top_scores[:, None], cls[:, None]]
    if extra is not None:
        cols += [extra]
    rows = jnp.concatenate(cols, axis=-1)
    return nms_boxes, cand_valid, rows


def _finish_pairs(top_scores, top_idx, boxes_xyxy, extra_mat, nc, agnostic,
                  tile):
    """Gather selected (anchor, class) pairs into candidate rows."""
    anchor = top_idx // nc
    cls = (top_idx % nc).astype(jnp.float32)
    cand_boxes = boxes_xyxy[anchor]
    extra = extra_mat[anchor] if extra_mat is not None else None
    return _finish_candidates(top_scores, cand_boxes, cls, extra, agnostic,
                              tile)


def _prep_candidates_single(
    pred: jnp.ndarray,
    nc: int,
    conf_thres: float,
    max_nms: int,
    ssod: bool,
    tile: int,
    agnostic: bool,
    n_extra: int = 0,
    obj_gate: bool = False,
    classes: tuple | None = None,
):
    """Single-label path (best class per row, reference general.py:1061):
    one image of raw predictions -> score-sorted padded candidates."""
    boxes_xyxy, conf_mat, gate, extra_mat, allowed = _gate_and_extras(
        pred, nc, conf_thres, ssod, n_extra, obj_gate, classes)
    best_conf = jnp.max(conf_mat, axis=-1)
    best_idx = jnp.argmax(conf_mat, axis=-1)
    best_cls = best_idx.astype(jnp.float32)
    keep_row = gate & (best_conf > conf_thres)
    if allowed is not None:
        # reference filters rows by their argmax class, it does not
        # re-argmax over the allowed subset (general.py:1049-1051)
        keep_row = keep_row & allowed[best_idx]
    score = jnp.where(keep_row, best_conf, -1.0)
    k_eff = min(max_nms, score.shape[0])
    top_scores, top_idx = jax.lax.top_k(score, k_eff)
    cand_boxes = boxes_xyxy[top_idx]
    cls = best_cls[top_idx]
    extra = extra_mat[top_idx] if extra_mat is not None else None
    return _finish_candidates(top_scores, cand_boxes, cls, extra, agnostic,
                              tile)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nc", "conf_thres", "iou_thres", "multi_label", "agnostic",
        "max_nms", "max_det", "ssod", "tile", "use_pallas", "approx_topk",
        "n_extra", "obj_gate", "classes", "selection",
    ),
)
def batched_nms(
    prediction: jnp.ndarray,
    *,
    nc: int,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    multi_label: bool = False,
    agnostic: bool = False,
    max_nms: int = 30000,
    max_det: int = 300,
    ssod: bool = False,
    tile: int = 256,
    use_pallas: bool | None = None,
    approx_topk: bool = False,
    n_extra: int = 0,
    obj_gate: bool = False,
    classes: tuple | None = None,
    selection: str | None = None,
) -> NMSOutput:
    """Batched NMS over raw decoded predictions (B, N, 5+nc+n_extra).

    Returns fixed-shape `NMSOutput`:
      ssod=False -> detections (B, max_det, 6) = [x1 y1 x2 y2, conf, cls]
                    (reference non_max_suppression, general.py:994)
      ssod=True  -> detections (B, max_det, 8) = [..., obj_conf, cls_conf]
                    (reference non_max_suppression_ssod, general.py:887)
      n_extra>0  -> detections (B, max_det, 6+n_extra): the trailing
                    prediction columns (keypoints etc.) ride along
                    (reference non_max_suppression_lmk_and_bbox,
                    general.py:778); obj_gate=True mirrors its obj-only
                    candidate gate

    `selection` picks the multi-label max_nms candidate-selection engine
    (reference general.py:1024,1061 top-k cap semantics):
      "pallas" — EXACT selection via the threshold-compaction kernels
                 (ops/select_pallas.py): bit-identical scores and tie-class
                 membership vs lax.top_k at a fraction of the cost on TPU
                 (tie ORDER among bit-equal scores is backend-defined —
                 XLA:TPU's own top_k is not index-stable; see the
                 select_pallas module docstring)
      "exact"  — jax.lax.top_k (the measured TPU serving floor)
      "approx" — lax.approx_max_k, recall 0.95 over the sub-threshold
                 tail (legacy serving knob; approx_topk=True maps here)
      None     — auto: "pallas" on TPU when the pair lattice is large
                 enough to pay for it, else "exact".
    """
    prediction = prediction.astype(jnp.float32)
    if multi_label and nc > 1:
        build = functools.partial(
            _pair_scores, nc=nc, conf_thres=conf_thres, ssod=ssod,
            n_extra=n_extra, obj_gate=obj_gate, classes=classes,
        )
        flat, boxes_xyxy, extra_mat = jax.vmap(build)(prediction)
        k_eff = min(max_nms, flat.shape[1])
        if selection is None:
            if approx_topk and k_eff < flat.shape[1]:
                selection = "approx"
            elif (jax.default_backend() == "tpu"
                  and flat.shape[1] >= 4 * k_eff):
                selection = "pallas"
            else:
                selection = "exact"
        if selection in ("pallas", "pallas_rows", "pallas_elems"):
            from .select_pallas import exact_topk_elems, exact_topk_rows

            # "pallas" = the hybrid: row-granularity tiers for sparse
            # fields (2.0 ms/img representative eval serving), element-
            # granularity bisection as the dense tail (5.1 ms/img
            # pathological) — r5 on-chip A/B, scripts/ab_selection.py.
            # Explicit names pin an engine for tests/experiments.
            engine = (exact_topk_elems if selection == "pallas_elems"
                      else exact_topk_rows)
            top_scores, top_idx = engine(
                flat, k_eff, interpret=jax.default_backend() != "tpu")
        elif selection == "approx" and k_eff < flat.shape[1]:
            # recall-0.95 approximate selection: only the lowest-conf
            # candidate tail can differ; the greedy sweep stays exact
            top_scores, top_idx = jax.lax.approx_max_k(
                flat, k_eff, recall_target=0.95)
        else:
            top_scores, top_idx = jax.lax.top_k(flat, k_eff)
        finish = functools.partial(_finish_pairs, nc=nc, agnostic=agnostic,
                                   tile=tile)
        if extra_mat is None:
            nms_boxes, cand_valid, rows = jax.vmap(
                lambda s, i, bx: finish(s, i, bx, None)
            )(top_scores, top_idx, boxes_xyxy)
        else:
            nms_boxes, cand_valid, rows = jax.vmap(finish)(
                top_scores, top_idx, boxes_xyxy, extra_mat)
    else:
        prep = functools.partial(
            _prep_candidates_single,
            nc=nc,
            conf_thres=conf_thres,
            max_nms=max_nms,
            ssod=ssod,
            tile=tile,
            agnostic=agnostic,
            n_extra=n_extra,
            obj_gate=obj_gate,
            classes=classes,
        )
        nms_boxes, cand_valid, rows = jax.vmap(prep)(prediction)
    k = nms_boxes.shape[1]
    eff_tile = min(tile, k)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .nms_pallas import greedy_nms_keep_pallas

        keep = greedy_nms_keep_pallas(nms_boxes, cand_valid, iou_thres,
                                      tile=eff_tile, stop_at=max_det)
    else:
        keep = jax.vmap(
            lambda b, v: greedy_nms_keep(b, v, iou_thres, tile=eff_tile,
                                         stop_at=max_det)
        )(nms_boxes, cand_valid)
    dets, valid = jax.vmap(
        functools.partial(_compact_keep, max_det=max_det)
    )(rows, keep)
    return NMSOutput(dets, valid)


def non_max_suppression(
    prediction,
    conf_thres=0.25,
    iou_thres=0.45,
    classes=None,
    agnostic=False,
    multi_label=False,
    max_det=300,
    max_nms=30000,
):
    """Reference-shaped convenience wrapper (returns NMSOutput)."""
    nc = prediction.shape[2] - 5
    return batched_nms(
        prediction,
        nc=nc,
        conf_thres=float(conf_thres),
        iou_thres=float(iou_thres),
        multi_label=bool(multi_label),
        agnostic=bool(agnostic),
        max_nms=max_nms,
        max_det=max_det,
        ssod=False,
        classes=tuple(classes) if classes is not None else None,
    )


def non_max_suppression_lmk_and_bbox(
    prediction,
    conf_thres=0.25,
    iou_thres=0.45,
    agnostic=False,
    num_points=0,
    multi_label=False,
    max_det=300,
    max_nms=30000,
):
    """Keypoint/landmark NMS (reference utils/general.py:778-885
    non_max_suppression_lmk_and_bbox): prediction layout
    [xywh, obj, nc cls cols, 2*num_points keypoint cols, 1 trailing col];
    kept rows are [xyxy, conf, cls, keypoints..., trailing]. Candidate gate
    is obj > conf only (general.py:791), unlike the standard variant."""
    nc = prediction.shape[2] - 5 - num_points * 2 - 1
    return batched_nms(
        prediction,
        nc=nc,
        conf_thres=float(conf_thres),
        iou_thres=float(iou_thres),
        multi_label=bool(multi_label),
        agnostic=bool(agnostic),
        max_nms=max_nms,
        max_det=max_det,
        n_extra=num_points * 2 + 1,
        obj_gate=True,
    )


def non_max_suppression_ssod(
    prediction,
    conf_thres=0.25,
    iou_thres=0.45,
    agnostic=False,
    multi_label=False,
    max_det=300,
    max_nms=2048,
):
    """SSOD pseudo-label NMS carrying [xyxy, conf, cls, obj_conf, cls_conf]."""
    nc = prediction.shape[2] - 5
    return batched_nms(
        prediction,
        nc=nc,
        conf_thres=float(conf_thres),
        iou_thres=float(iou_thres),
        multi_label=bool(multi_label),
        agnostic=bool(agnostic),
        max_nms=max_nms,
        max_det=max_det,
        ssod=True,
    )
