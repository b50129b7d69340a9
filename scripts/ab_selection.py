"""A/B the candidate-selection engines inside the full eval program (r5).

Times eval/validator.make_infer_fn (YOLOv5l bf16 b32@640, reference eval
settings conf 0.001 / iou 0.6 / max_nms 30000 — utils/general.py:994-1098)
with selection = pallas_rows / pallas_elems / exact, in both weight
regimes (representative fresh-init sparse field; pathological saturated
objectness), and fuzz-checks elems == exact bit-identically ON HARDWARE
(not just interpreter mode). Decides which engine "pallas" should alias.

Usage (TPU default env): python scripts/ab_selection.py [--reps 12]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from efficientteacher_tpu.eval.validator import make_infer_fn
    from efficientteacher_tpu.utils.eval_regimes import (
        saturate_obj, yolov5l_eval_cfg)
    from efficientteacher_tpu.models import Model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.ops.select_pallas import (
        exact_topk_elems, exact_topk_rows,
    )

    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    # --- hardware exactness fuzz: engines vs lax.top_k on the real chip.
    # Scores must be bit-identical. Index comparison is TIE-AWARE: XLA:TPU's
    # own lax.top_k is NOT index-stable on ties (measured r5: it returned
    # the HIGHER index of a bit-equal score pair first), so among bit-equal
    # scores only SET membership is comparable — per non-boundary tie class
    # the index sets must match; the boundary class (the k-th score) may
    # legitimately differ in membership; every returned index must be a
    # genuine candidate with exactly the returned score, all distinct.
    def tie_aware_check(sc, ts, ti, rs, ri, what):
        np.testing.assert_array_equal(ts, rs, err_msg=f"{what}: scores")
        for b in range(sc.shape[0]):
            v = rs[b] > 0
            ours, ref = ti[b][v], ri[b][v]
            rsc = rs[b][v]
            assert len(set(ours.tolist())) == len(ours), f"{what}: dup idx"
            np.testing.assert_array_equal(
                sc[b][ours], rsc, err_msg=f"{what}: idx->score")
            if len(rsc) == 0:
                continue
            boundary = rsc.min()
            for val in np.unique(rsc):
                if val == boundary:
                    continue
                m = rsc == val
                assert set(ours[m].tolist()) == set(ref[m].tolist()), (
                    f"{what}: tie class {val} membership")

    rng = np.random.default_rng(0)
    for trial in range(6):
        n = int(rng.choice([262144, 2016000]))
        npos = int(rng.integers(0, min(n, 400000)))
        sc = np.full((2, n), -1.0, np.float32)
        for b in range(2):
            pos = rng.choice(n, npos, replace=False)
            sc[b, pos] = rng.uniform(1e-5, 1.0, npos).astype(np.float32)
        if rng.random() < 0.5:
            lo = int(rng.integers(0, n - 50000))
            sc[0, lo:lo + 50000] = np.float32(rng.random())
        k = int(rng.choice([300, 30000]))
        x = jnp.asarray(sc)
        rs, ri = map(np.asarray, jax.lax.top_k(x, k))
        for name, eng in (("elems", exact_topk_elems),
                          ("rows", exact_topk_rows)):
            ts, ti = map(np.asarray, eng(x, k))
            tie_aware_check(sc, ts, ti, rs, ri, f"{name} t{trial}")
        print(f"hw exactness trial {trial}: ok (n={n}, npos={npos}, k={k})",
              file=sys.stderr)
    print(json.dumps({"hw_exactness": "ok", "trials": 6}), flush=True)

    # --- timing inside the full eval program, both regimes ---
    cfg = yolov5l_eval_cfg()
    spec = spec_from_cfg(cfg)
    model = Model(spec=spec, dtype=jnp.bfloat16)
    b, img = args.batch, 640
    fresh = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, img, img, 3), jnp.bfloat16),
                       train=False)
    fresh = {"params": fresh["params"],
             "batch_stats": fresh["batch_stats"]}

    images = jnp.asarray(rng.integers(0, 255, (b, img, img, 3), np.uint8))

    for tag, variables in (("representative", fresh),
                           ("pathological", saturate_obj(fresh))):
        row = {"regime": tag}
        for sel in ("pallas_elems", "pallas_rows", "exact"):
            infer = make_infer_fn(model, nc=80, conf_thres=0.001,
                                  iou_thres=0.6, max_det=300,
                                  max_nms=30000, norm_scale=255.0,
                                  selection=sel)
            for _ in range(8):
                det, _ = infer(variables, images)[:2]
                float(jnp.asarray(det).sum())
            t0 = time.perf_counter()
            for _ in range(args.reps):
                det, _ = infer(variables, images)[:2]
            float(jnp.asarray(det).sum())
            dt = (time.perf_counter() - t0) / args.reps
            row[f"{sel}_ms_per_img"] = round(dt / b * 1e3, 3)
            row[f"{sel}_ms_per_batch"] = round(dt * 1e3, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
