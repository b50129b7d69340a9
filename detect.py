"""Inference CLI (parity: reference detect.py:34-...).

Usage:
    python detect.py --cfg <yaml> --weights best.ckpt --source img_or_dir \
        [--conf-thres 0.25 --iou-thres 0.45 --save-dir runs/detect]

Loads images/dirs/txt lists, letterboxes, runs the jitted forward+NMS, and
writes annotated images plus optional YOLO-format .txt label files.
"""

import argparse
import logging
from pathlib import Path


def parse_opt():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--weights", type=str, required=True)
    parser.add_argument("--source", type=str, required=True)
    parser.add_argument("--img-size", type=int, default=640)
    parser.add_argument("--conf-thres", type=float, default=0.25)
    parser.add_argument("--iou-thres", type=float, default=0.45)
    parser.add_argument("--max-det", type=int, default=300)
    parser.add_argument("--classes", type=int, nargs="+", default=None,
                        help="filter detections to these class indices "
                             "(reference detect.py --classes)")
    parser.add_argument("--agnostic-nms", action="store_true",
                        help="class-agnostic NMS (reference detect.py "
                             "--agnostic-nms)")
    parser.add_argument("--save-dir", type=str, default="runs/detect")
    parser.add_argument("--save-txt", action="store_true")
    parser.add_argument("--save-crop", action="store_true",
                        help="save cropped detection patches")
    parser.add_argument("--save-xml", action="store_true",
                        help="save PASCAL-VOC style XML annotations")
    parser.add_argument("--nosave", action="store_true")
    parser.add_argument("--visualize", action="store_true",
                        help="dump pyramid feature-map grids per image")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parser.parse_args()


def main(opt):
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.data.loaders import LoadImages
    from efficientteacher_tpu.eval.validator import (
        _scale_landmarks_to_native, _scale_to_native,
    )
    from efficientteacher_tpu.models import build_model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.ops import batched_nms
    from efficientteacher_tpu.utils.checkpoint import load_eval_variables
    from efficientteacher_tpu.utils.general import increment_path

    cfg = get_cfg()
    cfg.merge_from_file(opt.cfg)
    if opt.opts:
        cfg.merge_from_list(opt.opts)
    cfg.freeze()

    spec = spec_from_cfg(cfg)
    model = build_model(spec, ssod=False, dtype=jnp.bfloat16)
    if opt.weights.endswith(".pt"):
        from efficientteacher_tpu.utils.torch_import import load_torch_weights

        variables = load_torch_weights(opt.weights, spec)
        variables = {
            k: jax.tree.map(jnp.asarray, v) for k, v in variables.items()
        }
    else:
        variables = load_eval_variables(opt.weights)

    names = list(cfg.Dataset.names) or [str(i) for i in range(spec.nc)]
    save_dir = increment_path(Path(opt.save_dir) / "exp", mkdir=True)

    # keypoint models: keypoint columns ride through NMS with the obj-only
    # candidate gate (reference detect.py:206 non_max_suppression_lmk_and_bbox)
    npk = int(cfg.Dataset.np)

    @jax.jit
    def infer(v, x):
        decoded, _ = model.apply(v, x.astype(jnp.bfloat16) / 255.0,
                                 train=False)
        return batched_nms(
            decoded, nc=spec.nc, conf_thres=opt.conf_thres,
            iou_thres=opt.iou_thres, max_det=opt.max_det, max_nms=2048,
            n_extra=2 * npk, obj_gate=npk > 0,
            classes=tuple(opt.classes) if opt.classes else None,
            agnostic=opt.agnostic_nms,
        )

    for img_path, rgb, img0, _ in LoadImages(opt.source, opt.img_size):
        x = jnp.asarray(rgb)[None]
        if opt.visualize:
            # pyramid feature-map grids (reference detect.py --visualize /
            # utils/plots.py feature_visualization)
            from efficientteacher_tpu.utils.plots import (
                feature_visualization,
            )

            bound = model.bind(variables)
            xin = x.astype(jnp.bfloat16) / 255.0
            feats = bound.neck(bound.backbone(xin, False), False)
            stem = Path(img_path.split("#")[0]).stem
            feature_visualization(
                [np.asarray(f, np.float32) for f in feats],
                save_dir / f"{stem}_features.png",
            )
        out = infer(variables, x)
        det = np.asarray(out.detections)[0][np.asarray(out.valid)[0]]
        if len(det):
            det[:, :4] = _scale_to_native(
                det[:, :4], (opt.img_size, opt.img_size), img0.shape[:2]
            )
            if npk:
                det[:, 6:6 + 2 * npk] = _scale_landmarks_to_native(
                    det[:, 6:6 + 2 * npk], (opt.img_size, opt.img_size),
                    img0.shape[:2],
                )
        print(f"{img_path}: {len(det)} detections")
        if opt.save_txt:
            lines = []
            h0, w0 = img0.shape[:2]
            for row in det:
                xyxy, conf, cls = row[:4], row[4], row[5]
                cx = (xyxy[0] + xyxy[2]) / 2 / w0
                cy = (xyxy[1] + xyxy[3]) / 2 / h0
                bw = (xyxy[2] - xyxy[0]) / w0
                bh = (xyxy[3] - xyxy[1]) / h0
                lines.append(f"{int(cls)} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f} {conf:.4f}")
            stem = Path(img_path.split("#")[0]).stem
            (save_dir / (stem + ".txt")).write_text(
                "\n".join(lines)
            )
        if opt.save_crop and len(det):
            crop_dir = save_dir / "crops"
            crop_dir.mkdir(exist_ok=True)
            stem = Path(img_path.split("#")[0]).stem
            for j, row in enumerate(det):
                xyxy = row[:4]
                x1, y1 = max(0, int(xyxy[0])), max(0, int(xyxy[1]))
                x2, y2 = int(xyxy[2]), int(xyxy[3])
                if x2 > x1 and y2 > y1:
                    cv2.imwrite(str(crop_dir / f"{stem}_{j}.jpg"),
                                img0[y1:y2, x1:x2])
        if opt.save_xml:
            stem = Path(img_path.split("#")[0]).stem
            h0, w0 = img0.shape[:2]
            objs = "".join(
                f"<object><name>{names[int(c)] if int(c) < len(names) else int(c)}"
                f"</name><bndbox><xmin>{int(x1)}</xmin><ymin>{int(y1)}</ymin>"
                f"<xmax>{int(x2)}</xmax><ymax>{int(y2)}</ymax></bndbox>"
                f"</object>"
                for x1, y1, x2, y2, cf, c in det[:, :6]
            )
            (save_dir / (stem + ".xml")).write_text(
                f"<annotation><size><width>{w0}</width>"
                f"<height>{h0}</height></size>{objs}</annotation>"
            )
        if not opt.nosave:
            for row in det:
                xyxy, conf, cls = row[:4], row[4], row[5]
                c = int(cls)
                color = (37 * c % 255, 17 * c % 255, 29 * c % 255)
                cv2.rectangle(img0, (int(xyxy[0]), int(xyxy[1])),
                              (int(xyxy[2]), int(xyxy[3])), color, 2)
                label = f"{names[c] if c < len(names) else c} {conf:.2f}"
                cv2.putText(img0, label, (int(xyxy[0]), int(xyxy[1]) - 4),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
                for k in range(npk):
                    px, py = row[6 + 2 * k], row[7 + 2 * k]
                    cv2.circle(img0, (int(px), int(py)), 3, color, -1)
            cv2.imwrite(str(save_dir / Path(img_path.split("#")[0]).name),
                        img0)
    print(f"results saved to {save_dir}")


if __name__ == "__main__":
    main(parse_opt())
