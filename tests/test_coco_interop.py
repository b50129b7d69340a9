"""COCO interop: 80->91 category map, filename-stem image ids, and the
vendor-free COCOeval fallback on a hand-computable 2-image synthetic set
(reference val.py:67-74,263,427-452)."""

import json

import numpy as np

from efficientteacher_tpu.eval.coco import (
    coco80_to_coco91_class,
    coco_image_id,
    detections_to_json,
    evaluate_predictions_json,
)


def test_coco80_to_91_map():
    m = coco80_to_coco91_class()
    assert len(m) == 80
    assert m[0] == 1  # person
    assert m[11] == 13  # stop sign (first gap: 12 is skipped)
    assert m[79] == 90  # toothbrush
    assert len(set(m)) == 80 and all(1 <= c <= 90 for c in m)


def test_coco_image_id_stem():
    assert coco_image_id("/data/val2017/000000000139.jpg", 7) == 139
    assert coco_image_id("/data/imgs/street_01.png", 7) == "street_01"
    assert coco_image_id(None, 7) == 7


def test_detections_to_json_mapping():
    det = np.array([[10.0, 20.0, 110.0, 70.0, 0.9, 0.0],
                    [5.0, 5.0, 25.0, 45.0, 0.8, 79.0]], np.float32)
    rows = detections_to_json(det, 139, coco80_to_coco91_class())
    assert rows[0]["image_id"] == 139
    assert rows[0]["category_id"] == 1
    assert rows[0]["bbox"] == [10.0, 20.0, 100.0, 50.0]  # xywh top-left
    assert rows[1]["category_id"] == 90
    assert rows[0]["score"] == 0.9


def _gt_json(tmp_path):
    gt = {
        "images": [{"id": 139, "width": 640, "height": 480},
                   {"id": 285, "width": 640, "height": 480}],
        "categories": [{"id": 1, "name": "person"},
                       {"id": 90, "name": "toothbrush"}],
        "annotations": [
            {"id": 1, "image_id": 139, "category_id": 1,
             "bbox": [100, 100, 50, 80], "area": 4000, "iscrowd": 0},
            {"id": 2, "image_id": 285, "category_id": 1,
             "bbox": [300, 200, 60, 90], "area": 5400, "iscrowd": 0},
            {"id": 3, "image_id": 285, "category_id": 90,
             "bbox": [50, 50, 20, 30], "area": 600, "iscrowd": 0},
        ],
    }
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(gt))
    return str(p)


def test_vendor_free_cocoeval(tmp_path):
    """person: 2 perfect TPs -> AP 1.0; toothbrush: FP above a TP ->
    AP 0.5. mAP50 = 0.75 by hand."""
    gt_path = _gt_json(tmp_path)
    preds = [
        {"image_id": 139, "category_id": 1,
         "bbox": [100, 100, 50, 80], "score": 0.9},
        {"image_id": 285, "category_id": 1,
         "bbox": [300, 200, 60, 90], "score": 0.85},
        # toothbrush: a high-scored FP in an empty corner, then the TP
        {"image_id": 139, "category_id": 90,
         "bbox": [500, 400, 20, 30], "score": 0.8},
        {"image_id": 285, "category_id": 90,
         "bbox": [50, 50, 20, 30], "score": 0.7},
    ]
    pred_path = tmp_path / "preds.json"
    pred_path.write_text(json.dumps(preds))
    map50, map_ = evaluate_predictions_json(str(pred_path), gt_path)
    assert abs(map50 - 0.75) < 0.02, map50
    # perfect boxes are TPs at every IoU threshold, so map == map50
    assert abs(map_ - map50) < 0.02


def test_vendor_free_cocoeval_perfect(tmp_path):
    gt_path = _gt_json(tmp_path)
    preds = [
        {"image_id": 139, "category_id": 1,
         "bbox": [100, 100, 50, 80], "score": 0.9},
        {"image_id": 285, "category_id": 1,
         "bbox": [300, 200, 60, 90], "score": 0.85},
        {"image_id": 285, "category_id": 90,
         "bbox": [50, 50, 20, 30], "score": 0.7},
    ]
    pred_path = tmp_path / "preds.json"
    pred_path.write_text(json.dumps(preds))
    map50, map_ = evaluate_predictions_json(str(pred_path), gt_path)
    assert map50 > 0.99 and map_ > 0.99
