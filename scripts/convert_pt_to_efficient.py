"""Convert a reference/ultralytics torch checkpoint (.pt) into this
framework's checkpoint format.

Parity with scripts/mula_convertor/convert_pt_to_efficient.py:16-48 in the
reference: reads `ckpt['ema'] or ckpt['model']` (pickled module or
state_dict), maps names/layouts into flax pytrees, verifies shapes against a
freshly-built model from the given config, and writes a .ckpt loadable by
val.py/detect.py/train.py --weights.

Usage:
    python scripts/convert_pt_to_efficient.py \
        --pt efficient-yolov5s.pt --cfg configs/sup/public/yolov5s_coco.yaml \
        --out yolov5s_converted.ckpt
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pt", required=True)
    p.add_argument("--cfg", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--no-ema", action="store_true",
                   help="prefer the raw model entry over EMA")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.models import build_model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.utils.checkpoint import (
        intersect_trees, save_checkpoint,
    )
    from efficientteacher_tpu.utils.torch_import import load_torch_weights

    cfg = get_cfg()
    cfg.merge_from_file(args.cfg)
    cfg.freeze()
    spec = spec_from_cfg(cfg)

    src = load_torch_weights(args.pt, spec, prefer_ema=not args.no_ema)
    model = build_model(spec, ssod=False)
    x0 = jnp.zeros((1, cfg.Dataset.img_size, cfg.Dataset.img_size, 3))
    ref = model.init(jax.random.PRNGKey(0), x0, train=False)

    params, c1, t1 = intersect_trees(src["params"], ref["params"])
    stats, c2, t2 = intersect_trees(src["batch_stats"], ref["batch_stats"])
    print(f"matched {c1}/{t1} params, {c2}/{t2} batch stats")
    if c1 < t1 * 0.95:
        print("WARNING: <95% of parameters matched — check the config")

    save_checkpoint(args.out, params=params, batch_stats=stats,
                    cfg_yaml=cfg.dump())
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
