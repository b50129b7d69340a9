"""Convert this framework's checkpoint back to a reference-style torch
state_dict (the convert_efficient_to_yolov5 direction of the reference's
mula convertor, scripts/mula_convertor/convert_pt_to_efficient.py:52-99).

Writes a torch-loadable .pt (state_dict entry) when torch is importable,
else a .npz with the same flat names.

Usage:
    python scripts/convert_efficient_to_pt.py \
        --ckpt runs/train/exp/weights/best.ckpt --out yolov5s_export.pt
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import numpy as np

    from efficientteacher_tpu.utils.checkpoint import load_checkpoint
    from efficientteacher_tpu.utils.torch_import import (
        export_to_torch_state_dict,
    )

    ckpt = load_checkpoint(args.ckpt)
    entry = ckpt.get("ema") or ckpt["model"]
    sd = export_to_torch_state_dict(entry["params"], entry["batch_stats"])
    print(f"{len(sd)} tensors")

    try:
        import torch

        tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
        torch.save({"model": tsd, "ema": None,
                    "epoch": ckpt.get("meta", {}).get("epoch", -1)}, args.out)
        print(f"wrote torch checkpoint {args.out}")
    except ImportError:
        out = Path(args.out).with_suffix(".npz")
        np.savez(out, **sd)
        print(f"torch unavailable; wrote {out}")


if __name__ == "__main__":
    main()
