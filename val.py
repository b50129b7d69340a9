"""Standalone validation CLI (parity: reference val.py:468-512).

Usage:
    python val.py --cfg <yaml> --weights runs/train/exp/weights/best.ckpt
"""

import argparse
import logging


def parse_opt():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--weights", type=str, required=True)
    parser.add_argument("--conf-thres", type=float, default=0.001)
    parser.add_argument("--iou-thres", type=float, default=0.6)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--save-json", type=str, default=None,
                        help="write COCO-format predictions JSON")
    parser.add_argument("--coco-gt", type=str, default=None,
                        help="COCO annotation JSON for official COCOeval "
                             "(needs pycocotools)")
    parser.add_argument("--confusion", action="store_true",
                        help="print the confusion matrix")
    parser.add_argument("--plots", type=str, default=None, metavar="DIR",
                        help="write PR/F1/P/R curve family (and the "
                             "confusion-matrix heatmap with --confusion)")
    parser.add_argument("--val-kp", action="store_true",
                        help="keypoint models (Dataset.np > 0): score with "
                             "OKS matching instead of box IoU (reference "
                             "val.py val_kp)")
    parser.add_argument("--selection", type=str, default=None,
                        choices=["pallas", "exact", "approx"],
                        help="NMS candidate-selection engine (default: "
                             "auto — exact Pallas row-gather on TPU). "
                             "'approx' = lax.approx_max_k recall 0.95; "
                             "measured mAP cost documented in STATUS.md")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parser.parse_args()


def main(opt):
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    import jax.numpy as jnp

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.data.datasets import create_dataloader
    from efficientteacher_tpu.eval import validator
    from efficientteacher_tpu.models import build_model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.utils.checkpoint import load_eval_variables

    cfg = get_cfg()
    cfg.merge_from_file(opt.cfg)
    if opt.opts:
        cfg.merge_from_list(opt.opts)
    cfg.freeze()

    spec = spec_from_cfg(cfg)
    model = build_model(spec, ssod=False, dtype=jnp.bfloat16)
    if opt.weights.endswith(".pt"):
        import jax

        from efficientteacher_tpu.utils.torch_import import load_torch_weights

        variables = load_torch_weights(opt.weights, spec)
        variables = {
            k: jax.tree.map(jnp.asarray, v) for k, v in variables.items()
        }
    else:
        variables = load_eval_variables(opt.weights)
    loader = create_dataloader(cfg, "val", augment=False,
                               batch_size=opt.batch_size)
    # COCO val set -> 80->91 category ids in the JSON (reference val.py:263)
    is_coco = "coco" in str(cfg.Dataset.val).lower() and spec.nc == 80
    out = validator.run(
        model, variables, loader, nc=spec.nc,
        conf_thres=opt.conf_thres, iou_thres=opt.iou_thres,
        save_json=opt.save_json, coco_gt_json=opt.coco_gt,
        confusion=opt.confusion, is_coco=is_coco,
        plots_dir=opt.plots, names=list(cfg.Dataset.names),
        num_points=int(cfg.Dataset.np), val_kp=opt.val_kp,
        selection=opt.selection,
    )
    results, maps, cls_thr = out[:3]
    print("P=%.4f R=%.4f mAP50=%.4f mAP50-95=%.4f" % results)
    if opt.confusion:
        cm = out[3]
        print("confusion matrix (pred x true):")
        import numpy as np

        with np.printoptions(precision=0, suppress=True):
            print(cm.matrix)
        if opt.plots:
            from pathlib import Path

            from efficientteacher_tpu.utils.plots import (
                plot_confusion_matrix,
            )

            plot_confusion_matrix(
                cm.matrix, Path(opt.plots) / "confusion_matrix.png",
                names=list(cfg.Dataset.names),
            )
    if opt.save_json:
        print(f"predictions JSON -> {opt.save_json}")
    return results


if __name__ == "__main__":
    main(parse_opt())
