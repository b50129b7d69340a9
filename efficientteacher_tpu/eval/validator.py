"""Validation runner: forward + on-device NMS + host mAP accumulation.

Parity with reference val.py:148-465 `val.run`:
  - multi-label NMS at conf 0.001 / iou 0.6 (val.py:335)
  - detections rescaled to native image space before matching (val.py:340-376)
  - IoU@[.5:.95] TP matrix via process_batch
  - returns ((P, R, mAP50, mAP), per-class maps, cls_thr) where cls_thr are
    the per-class best-F1 thresholds the SSOD trainer consumes (val.py:462-465)

TPU-first: forward+decode+NMS is one jitted fixed-shape program; only the
compact (max_det, 6) detections travel to host. Ragged final batches are
padded to the compiled batch size.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import batched_nms
from .metrics import ap_per_class, process_batch


def _scale_to_native(boxes: np.ndarray, letterbox_hw: Tuple[int, int],
                     native_hw: Tuple[int, int],
                     ratio_pad=None) -> np.ndarray:
    """Undo letterbox: boxes xyxy in the square frame -> native pixels
    (reference utils/general.py:702-718 scale_coords).

    When the loader recorded the actual transform, `ratio_pad` =
    ((rh, rw), (dw, dh)) is used exactly like the reference's explicit
    ratio_pad argument (gain = rh, val.py:340) — the min-gain recomputation
    below is only correct for TIGHT letterboxes and over-scales boxes on
    loose rect canvases."""
    lh, lw = letterbox_hw
    nh, nw = native_hw
    if ratio_pad is not None:
        gain = ratio_pad[0][0]
        padw, padh = ratio_pad[1]
    else:
        gain = min(lh / nh, lw / nw)
        padw = (lw - nw * gain) / 2
        padh = (lh - nh * gain) / 2
    out = boxes.copy()
    out[:, [0, 2]] = (out[:, [0, 2]] - padw) / gain
    out[:, [1, 3]] = (out[:, [1, 3]] - padh) / gain
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, nw)
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, nh)
    return out


def make_infer_fn(model, nc: int, conf_thres: float, iou_thres: float,
                  max_det: int, max_nms: int, norm_scale: float,
                  compute_dtype=jnp.bfloat16, approx_topk: bool = False,
                  num_points: int = 0, selection: str | None = None,
                  mesh=None):
    """`selection`: candidate-selection engine (ops/nms.py batched_nms) —
    None auto-picks the exact Pallas row-gather path on TPU.
    `approx_topk`: legacy serving knob — approximate candidate selection
    (recall 0.95); the Pallas path is both exact AND faster, so this is
    kept only for comparison.
    `num_points > 0`: keypoint models — keypoint channels ride through NMS
    and the candidate gate/multi-label settings mirror the reference's
    landmark path (val.py:333 calls non_max_suppression_lmk_and_bbox with
    multi_label left False; gate is obj-only, general.py:791).
    `mesh`: shard validation over a device mesh (TPU-first deviation from
    the reference's rank-0-only val, trainer/trainer.py:445-457): the
    batch dim is split over EVERY mesh axis via shard_map — params
    replicated, each device runs forward + NMS on its own shard with zero
    collectives (eval has no cross-batch coupling; BN uses stored stats).
    shard_map rather than bare GSPMD so the Pallas NMS/selection kernels
    execute per-device instead of being gathered to a replicated custom
    call. The global batch must divide the mesh size."""
    def infer_body(variables, images_u8):
        x = images_u8.astype(compute_dtype) / norm_scale
        out = model.apply(variables, x, train=False)
        if isinstance(out, tuple) and len(out) == 2 and not isinstance(
            out[0], (list, tuple)
        ):
            decoded = out[0]
        else:  # SSOD model returns ((decoded, raw), domain)
            decoded = out[0][0]
        return batched_nms(
            decoded, nc=nc, conf_thres=conf_thres, iou_thres=iou_thres,
            multi_label=num_points == 0, max_nms=max_nms, max_det=max_det,
            approx_topk=approx_topk, n_extra=2 * num_points,
            obj_gate=num_points > 0, selection=selection,
        )

    if mesh is None:
        return jax.jit(infer_body)
    from jax.sharding import PartitionSpec as P

    bspec = P(tuple(mesh.axis_names))  # batch over ALL axes (dp, or dp x sp)
    # check_vma=False: the NMS sweep's while_loop carries mix unvarying
    # literals with per-shard values, which the varying-manual-axes type
    # check rejects; the body is per-shard pure (no collectives), so the
    # check adds nothing here
    return jax.jit(jax.shard_map(
        infer_body, mesh=mesh, in_specs=(P(), bspec), out_specs=bspec,
        check_vma=False,
    ))


def _scale_landmarks_to_native(kps: np.ndarray, letterbox_hw, native_hw,
                               ratio_pad=None,
                               preserve_invisible: bool = False) -> np.ndarray:
    """Host-side mirror of ops/boxes.scale_coords_landmarks (reference
    utils/general.py:717-750) over interleaved (N, 2*np) pixel columns.
    Predicted keypoints are clamped to [0, native] per coordinate like the
    reference (general.py:731-735 clamp_). `preserve_invisible=True` is the
    GT path only: coordinates < 0 mark invisible points in the dataset's
    label contract (data/datasets.py verify_image_label) and ride through
    unchanged so OKS sees them exactly as stored."""
    lh, lw = letterbox_hw
    nh, nw = native_hw
    if ratio_pad is not None:
        gain = ratio_pad[0][0]
        padw, padh = ratio_pad[1]
    else:
        gain = min(lh / nh, lw / nw)
        padw = (lw - nw * gain) / 2
        padh = (lh - nh * gain) / 2
    out = kps.astype(np.float32).copy()
    invisible = out < 0
    out[:, 0::2] = ((out[:, 0::2] - padw) / gain).clip(0, nw)
    out[:, 1::2] = ((out[:, 1::2] - padh) / gain).clip(0, nh)
    if preserve_invisible:
        out[invisible] = -1.0
    return out


def run(
    model,
    variables,
    loader,
    nc: int,
    conf_thres: float = 0.001,
    iou_thres: float = 0.6,
    max_det: int = 300,
    max_nms: int = 30000,
    norm_scale: float = 255.0,
    compute_dtype=jnp.bfloat16,
    img_size: Optional[int] = None,
    save_json: Optional[str] = None,
    coco_gt_json: Optional[str] = None,
    confusion: bool = False,
    is_coco: bool = False,
    plots_dir=None,
    names=(),
    num_points: int = 0,
    val_kp: bool = False,
    selection: Optional[str] = None,
    approx_topk: bool = False,
    mesh=None,
):
    """Evaluate `model(variables)` over `loader`. Returns
    ((mp, mr, map50, map), per_class_maps, cls_thr).

    mesh: shard the jitted infer over a device mesh (batch split over all
    mesh axes, see make_infer_fn) so epoch-end validation uses every chip
    instead of leaving n-1 idle; host-side metric accumulation is
    unchanged. Falls back to single-device when the batch size does not
    divide the mesh.

    save_json: path for COCO-format predictions with reference semantics —
    image_id from the filename stem (reference val.py:67-74) and, when
    is_coco, category_id through the 80->91 map (reference val.py:263).
    COCOeval runs on it when coco_gt_json is given: official pycocotools if
    present, else the vendor-free re-scorer in eval/coco.py.
    confusion: also accumulate a ConfusionMatrix (reference val.py).
    num_points > 0: keypoint model — detections carry 2*num_points keypoint
    columns through NMS (reference val.py:333). val_kp switches the TP
    matrix from box IoU to OKS matching (reference val.py:363-366 +
    process_batch_oks :80-96); with val_kp False, keypoints are detected
    but only boxes are validated, as upstream."""
    from .coco import (coco80_to_coco91_class, coco_image_id,
                       detections_to_json, run_cocoeval)
    from .metrics import ConfusionMatrix

    class_map = (coco80_to_coco91_class() if is_coco
                 else list(range(max(nc, 1000))))

    iouv = np.linspace(0.5, 0.95, 10)
    stats = []
    json_preds = []
    cm = ConfusionMatrix(nc) if confusion else None
    infer = None  # built at the first batch (mesh divisibility is bs-aware)

    def _build_infer(bs):
        m = mesh
        if m is not None and bs % m.size:
            import logging

            logging.getLogger(__name__).warning(
                "sharded val disabled: batch %d does not divide mesh "
                "size %d", bs, m.size)
            m = None
        return make_infer_fn(model, nc, conf_thres, iou_thres, max_det,
                             max_nms, norm_scale, compute_dtype,
                             num_points=num_points, selection=selection,
                             approx_topk=approx_topk, mesh=m)

    compiled_bs = None
    import time as _time

    t_infer = 0.0
    t_host = 0.0
    n_images = 0

    def _host_batch(out, batch, bs, lh, lw, base_idx):
        """Materialize one batch's device output and fold it into the mAP
        accumulators. Called one batch BEHIND the jitted infer dispatch so
        host metric work overlaps the next batch's device compute (JAX
        async dispatch; only the compact (max_det, 6+) detections sync)."""
        nonlocal t_infer, t_host
        t0 = _time.perf_counter()
        dets = np.asarray(out.detections)[:bs]
        valid = np.asarray(out.valid)[:bs]
        t_infer += _time.perf_counter() - t0  # device wait, if any
        t0 = _time.perf_counter()

        for bi in range(bs):
            det = dets[bi][valid[bi]]
            lab = batch["labels"][bi][batch["mask"][bi]]  # (n, 5) cls+xywhn
            shapes = batch["shapes"][bi]
            native_hw = shapes if shapes is not None else (lh, lw)
            rp = batch.get("ratio_pad")
            rp = rp[bi] if rp is not None else None
            # labels: normalized xywh on the letterboxed frame -> native xyxy
            if len(lab):
                lxyxy = np.zeros((len(lab), 5), np.float32)
                lxyxy[:, 0] = lab[:, 0]
                cx, cy, w, h = lab[:, 1] * lw, lab[:, 2] * lh, \
                lab[:, 3] * lw, lab[:, 4] * lh
                lxyxy[:, 1], lxyxy[:, 2] = cx - w / 2, cy - h / 2
                lxyxy[:, 3], lxyxy[:, 4] = cx + w / 2, cy + h / 2
                lxyxy[:, 1:] = _scale_to_native(
                    lxyxy[:, 1:], (lh, lw), native_hw, ratio_pad=rp)
            else:
                lxyxy = np.zeros((0, 5), np.float32)
            if len(det):
                det = det.copy()
                det[:, :4] = _scale_to_native(
                    det[:, :4], (lh, lw), native_hw, ratio_pad=rp)
                if num_points > 0:  # keypoint cols follow [xyxy, conf, cls]
                    det[:, 6:6 + 2 * num_points] = _scale_landmarks_to_native(
                        det[:, 6:6 + 2 * num_points], (lh, lw), native_hw,
                        ratio_pad=rp)
            if cm is not None:
                cm.process_batch(det, lxyxy)
            if save_json is not None and len(det):
                paths = batch.get("paths")
                indices = batch.get("indices")
                img_id = coco_image_id(
                    paths[bi] if paths else None,
                    indices[bi] if indices is not None else base_idx + bi,
                )
                # detections_to_json unpacks 6-column rows; keypoint columns
                # (cols 6+) must not leak into its `*xyxy, conf, cls` unpack
                json_preds.extend(
                    detections_to_json(det[:, :6], img_id, class_map))
            if num_points > 0 and val_kp:
                # OKS TP matrix (reference val.py:363-366, process_batch_oks
                # :80-96): GT keypoints normalized-letterbox -> native px
                # (invisible <0 preserved on the GT path only); similarity
                # scale = GT keypoint-hull area inside oks (metrics.py:453)
                from .keypoint_metrics import process_batch_kp

                n2 = 2 * num_points
                if len(lab):
                    gt_kp = lab[:, 5:5 + n2].astype(np.float32).copy()
                    inv = gt_kp < 0
                    gt_kp[:, 0::2] *= lw
                    gt_kp[:, 1::2] *= lh
                    gt_kp[inv] = -1.0
                    gt_kp = _scale_landmarks_to_native(
                        gt_kp, (lh, lw), native_hw, ratio_pad=rp,
                        preserve_invisible=True)
                else:
                    gt_kp = np.zeros((0, n2), np.float32)
                correct = process_batch_kp(
                    det[:, 6:6 + n2].reshape(-1, num_points, 2),
                    det[:, 4] if len(det) else np.zeros(0),
                    det[:, 5] if len(det) else np.zeros(0),
                    gt_kp.reshape(-1, num_points, 2),
                    lxyxy[:, 0], iouv,
                )
            else:
                correct = process_batch(det, lxyxy, iouv)
            stats.append((
                correct,
                det[:, 4] if len(det) else np.zeros(0),
                det[:, 5] if len(det) else np.zeros(0),
                lxyxy[:, 0],
            ))
        t_host += _time.perf_counter() - t0

    pending = None
    for batch in loader:
        images = batch["images"]
        bs = images.shape[0]
        base_idx = n_images
        n_images += bs
        if compiled_bs is None:
            compiled_bs = bs
            infer = _build_infer(bs)
        if bs < compiled_bs:  # pad ragged final batch to compiled batch dim
            pad = compiled_bs - bs
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
            )
        # rect loaders emit a bounded set of (h, w) shapes; the jitted infer
        # compiles once per distinct shape
        t0 = _time.perf_counter()
        out = infer(variables, jnp.asarray(images))
        t_infer += _time.perf_counter() - t0  # async dispatch cost
        if pending is not None:
            _host_batch(*pending)
        pending = (out, batch, bs, images.shape[1], images.shape[2],
                   base_idx)
    if pending is not None:
        _host_batch(*pending)

    if n_images:
        # speed split (reference val.py:416-420 prints pre/inference/NMS;
        # here forward+decode+NMS is ONE jitted program)
        import logging

        logging.getLogger(__name__).info(
            "Speed: %.1f ms inference+NMS (fused), %.1f ms host metrics "
            "per image at shape (%d, %d, %d)",
            t_infer / n_images * 1e3, t_host / n_images * 1e3,
            compiled_bs or 0, img_size or 0, img_size or 0,
        )

    if save_json is not None:
        import json

        with open(save_json, "w") as f:
            json.dump(json_preds, f)
        # COCOeval on the saved JSON (reference val.py:427-452); falls back
        # to the vendor-free re-scorer when pycocotools is absent
        if coco_gt_json:
            j50, j = run_cocoeval(save_json, coco_gt_json)
            print(f"COCOeval: mAP@0.5 {j50:.4f}  mAP@[.5:.95] {j:.4f}")

    stats = [np.concatenate(x, 0) for x in zip(*stats)]
    if len(stats) and stats[0].any():
        p, r, ap, f1, ap_class, cls_thr = ap_per_class(
            *stats, plot_dir=plots_dir, names=names
        )
        ap50, ap_all = ap[:, 0], ap.mean(1)
        mp, mr, map50, map_ = p.mean(), r.mean(), ap50.mean(), ap_all.mean()
        maps = np.zeros(nc)
        for i, c in enumerate(ap_class):
            maps[c] = ap_all[i]
    else:
        mp = mr = map50 = map_ = 0.0
        maps = np.zeros(nc)
        cls_thr = [conf_thres] * nc
    out = ((float(mp), float(mr), float(map50), float(map_)), maps, cls_thr)
    if cm is not None:
        return out + (cm,)
    return out
