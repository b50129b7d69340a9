"""Attribute the eval serving program's device time (VERDICT r4 #1a).

The validator's jitted program (bf16 forward + decode + multi-label exact
NMS at reference eval settings conf 0.001 / iou 0.6 / max_nms 30000,
reference utils/general.py:994-1098) is xprof-traced at b32@640 YOLOv5l in
TWO weight regimes and every ms/batch is bucketed:

  representative: FRESH smart-bias init — obj sits at the focal prior
      log(8/grid^2) so the 0.001 eval gate sees the sparse candidate field
      a converged detector produces;
  pathological:   obj bias +10 — every anchor's objectness saturates, ~all
      lattice rows light, driving the hybrid selection engine onto its
      dense-tail element-bisection path (ops/select_pallas).

Regime construction is shared with bench.py / ab_selection.py via
utils/eval_regimes (saturate_obj, yolov5l_eval_cfg).

Buckets: forward conv / decode+elementwise / selection top_k (XLA sort) /
Pallas compaction kernel / row gather / Pallas greedy NMS / copies / other.
Prints one JSON line per regime plus the top raw events with their JAX
op_name provenance.

Usage (TPU default env): python scripts/profile_eval.py [--reps 4]
"""

import argparse
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# (bucket, event-name regex, op_name regex) — first match wins
RULES = [
    ("select_pallas", r"", r"_threshold_compact|compact_kernel"),
    ("nms_pallas", r"", r"greedy_nms|nms_pallas"),
    ("pallas_other", r"", r"pallas_call"),
    ("topk_sort", r"sort|top-k|topk", None),
    ("topk_sort", r"", r"top_k|sort"),
    ("row_gather", r"gather", None),
    ("row_gather", r"", r"take_along_axis|\bgather\b"),
    ("conv_fwd", r"^%?(convolution|conv)", None),
    ("conv_fwd", r"", r"conv_general_dilated"),
    ("while_loops", r"while", None),
    ("copy", r"^%?(copy|transpose|bitcast)", None),
    ("reduce", r"reduce", None),
]


def classify(events, op_names, conv_map, steps):
    from collections import defaultdict

    buckets = defaultdict(float)
    rows = []
    for ev in events:
        key = re.match(r"%?([\w.-]+)", ev.name)
        key = key.group(1) if key else ev.name
        op = op_names.get(key, "")
        cat = None
        if conv_map.get(key, False):
            cat = "conv_fwd"
        else:
            for c, ev_pat, op_pat in RULES:
                if ev_pat and not re.search(ev_pat, ev.name, re.I):
                    continue
                if op_pat and not re.search(op_pat, op, re.I):
                    continue
                cat = c
                break
        cat = cat or "other"
        buckets[cat] += ev.total_ms / steps
        rows.append((ev.total_ms / steps, key, cat, op[-90:]))
    rows.sort(reverse=True)
    return dict(buckets), rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from efficientteacher_tpu.eval.validator import make_infer_fn
    from efficientteacher_tpu.models import Model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.utils.eval_regimes import (
        saturate_obj, yolov5l_eval_cfg)
    from efficientteacher_tpu.utils.xprof import (
        capture, hlo_op_names, _conv_instructions,
    )

    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    cfg = yolov5l_eval_cfg()
    spec = spec_from_cfg(cfg)
    model = Model(spec=spec, dtype=jnp.bfloat16)
    b, img = args.batch, 640
    fresh = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, img, img, 3), jnp.bfloat16),
                       train=False)
    fresh = {"params": fresh["params"],
             "batch_stats": fresh["batch_stats"]}

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (b, img, img, 3), np.uint8))

    infer = make_infer_fn(model, nc=80, conf_thres=0.001, iou_thres=0.6,
                          max_det=300, max_nms=30000, norm_scale=255.0)
    hlo = infer.lower(fresh, images).compile().as_text()
    op_names = hlo_op_names(hlo)
    conv_map = _conv_instructions(hlo)

    for tag, variables in (
        ("representative", fresh),
        ("pathological", saturate_obj(fresh)),
    ):
        for _ in range(8):
            det, _ = infer(variables, images)[:2]
            float(jnp.asarray(det).sum())
        t0 = time.perf_counter()
        for _ in range(10):
            det, _ = infer(variables, images)[:2]
        float(jnp.asarray(det).sum())
        wall_ms = (time.perf_counter() - t0) / 10 * 1e3

        def run():
            det, _ = infer(variables, images)[:2]
            float(jnp.asarray(det).sum())

        events = capture(run, steps=args.reps)
        buckets, rows = classify(events, op_names, conv_map, args.reps)
        total = sum(buckets.values())
        print(json.dumps({
            "regime": tag,
            "wall_ms_per_batch": round(wall_ms, 1),
            "wall_ms_per_img": round(wall_ms / b, 2),
            "device_ms_per_batch": round(total, 1),
            "buckets_ms": {k: round(v, 2) for k, v in sorted(
                buckets.items(), key=lambda kv: -kv[1])},
        }), flush=True)
        print(f"-- {tag}: top {args.top} events (ms/batch)", file=sys.stderr)
        for ms, key, cat, op in rows[:args.top]:
            print(f"  {ms:8.3f}  {cat:14s} {key:40s} {op}", file=sys.stderr)


if __name__ == "__main__":
    main()
