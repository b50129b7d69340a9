"""Bounded wgrad experiments (VERDICT r3 Next #6): the YOLOv5l b32@640 step
is 77% convolution with backward conv 2.6x forward (STATUS round-3 xprof
attribution). Three knobs that could plausibly move the weight-gradient
contractions, each measured once, then the axis is closed in STATUS:

  (a) explicit conv/matmul precision at trace time
      (jax.default_matmul_precision) — default vs "bfloat16" (assert the
      default already is the low-precision MXU path) vs "float32"
      (expected slower; quantifies what the emitter pays for accumulation
      width, i.e. whether precision choice is load-bearing at all);
  (b) layout: NHWC (ours) vs NCHW micro-bench of a representative
      mid-network conv fwd+bwd — if XLA's emitter preferred the other
      layout, the full model would be worth re-plumbing;
  (c) scoped-vmem retune via LIBTPU_INIT_ARGS subprocess sweep
      (r3 tried one value, 135 ms vs 130 baseline; this sweeps a range).

Usage (TPU default env): python scripts/wgrad_experiments.py [--skip-vmem]
Prints one JSON line per experiment.
"""

import argparse
import functools
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

STEP_ITERS = 10


def build_step_inputs():
    import jax
    import jax.numpy as jnp

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.losses.yolov5_loss import YoloV5LossConfig
    from efficientteacher_tpu.models import Model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.train import (
        OptimizerConfig, Schedule, create_train_state,
        make_supervised_train_step,
    )

    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 1.0
    cfg.Model.depth_multiple = 1.0
    cfg.Dataset.nc = 80
    cfg.Dataset.img_size = 640

    spec = spec_from_cfg(cfg)
    model = Model(spec=spec, dtype=jnp.bfloat16)
    b, img, m = 32, 640, 60
    x0 = jnp.zeros((1, img, img, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    oc = OptimizerConfig(epochs=300)
    state = create_train_state(variables["params"], variables["batch_stats"],
                               oc)
    lc = YoloV5LossConfig.from_cfg(cfg)
    anchors = np.asarray(spec.anchors, np.float32).reshape(3, 3, 2) / \
        np.array([8.0, 16.0, 32.0]).reshape(3, 1, 1)
    step = make_supervised_train_step(model, lc, anchors, oc)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (b, img, img, 3), np.uint8))
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    for bi in range(b):
        n = rng.integers(1, 20)
        labels[bi, :n, 0] = rng.integers(0, 80, n)
        labels[bi, :n, 1:3] = rng.uniform(0.2, 0.8, (n, 2))
        labels[bi, :n, 3:5] = rng.uniform(0.05, 0.4, (n, 2))
        mask[bi, :n] = True
    labels, mask = jnp.asarray(labels), jnp.asarray(mask)
    sched = Schedule.make(0.01, 0.01, 0.937, 2)
    return step, state, images, labels, mask, sched, b


def time_step(step, state, images, labels, mask, sched, warm=8,
              iters=STEP_ITERS):
    for _ in range(warm):
        state, parts = step(state, images, labels, mask, sched)
        float(parts["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, parts = step(state, images, labels, mask, sched)
    float(parts["loss"])
    return (time.perf_counter() - t0) / iters


def exp_precision():
    """(a): default vs explicit matmul/conv precision at trace time."""
    import jax

    step, state, images, labels, mask, sched, b = build_step_inputs()
    out = {}
    dt = time_step(step, state, images, labels, mask, sched)
    out["default_ms"] = round(dt * 1e3, 1)
    out["default_imgs_per_sec"] = round(b / dt, 1)
    for prec in ("bfloat16", "float32"):
        with jax.default_matmul_precision(prec):
            # re-jit under the precision context (precision is a
            # trace-time property of every dot/conv primitive)
            step2, state2, *rest = build_step_inputs()
            dt = time_step(step2, state2, *rest[:-1])
        out[f"{prec}_ms"] = round(dt * 1e3, 1)
        out[f"{prec}_imgs_per_sec"] = round(b / dt, 1)
    print(json.dumps({"experiment": "precision", **out}))
    return out


def exp_layout():
    """(b): NHWC vs NCHW fwd+bwd micro-bench on a mid-network conv shape.

    (32, 80, 80, 256) x 3x3x256x256 — a P3-level YOLOv5l block conv; the
    value-and-grad wraps it exactly as the train step does (wgrad +
    dgrad both execute)."""
    import jax
    import jax.numpy as jnp

    shapes = {
        "p3_3x3_256": ((32, 80, 80, 256), (3, 3, 256, 256)),
        "p2_3x3_128": ((32, 160, 160, 128), (3, 3, 128, 128)),
    }
    out = {}
    for name, (xs, ws) in shapes.items():
        x_nhwc = jnp.ones(xs, jnp.bfloat16)
        w_hwio = jnp.ones(ws, jnp.bfloat16)
        x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
        w_oihw = jnp.transpose(w_hwio, (3, 2, 0, 1))

        def loss_nhwc(w, x):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32))

        def loss_nchw(w, x):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return jnp.sum(y.astype(jnp.float32))

        for tag, fn, w, x in (("nhwc", loss_nhwc, w_hwio, x_nhwc),
                              ("nchw", loss_nchw, w_oihw, x_nchw)):
            g = jax.jit(jax.grad(fn, argnums=(0, 1)))
            for _ in range(6):
                gw, gx = g(w, x)
                float(gw.astype(jnp.float32).sum())
            t0 = time.perf_counter()
            for _ in range(20):
                gw, gx = g(w, x)
            float(gw.astype(jnp.float32).sum())
            out[f"{name}_{tag}_ms"] = round(
                (time.perf_counter() - t0) / 20 * 1e3, 2)
    print(json.dumps({"experiment": "layout", **out}))
    return out


VMEM_CHILD = """
import sys, json
sys.path.insert(0, {repo!r})
from scripts.wgrad_experiments import build_step_inputs, time_step
step, state, images, labels, mask, sched, b = build_step_inputs()
dt = time_step(step, state, images, labels, mask, sched, warm=6, iters=8)
print(json.dumps({{"ms": round(dt * 1e3, 1), "imgs_per_sec": round(b/dt, 1)}}))
"""


def exp_vmem(values=(0, 32768, 65536, 98304)):
    """(c): scoped-vmem limit sweep. Each value needs a fresh TPU client,
    so each runs in a subprocess; the compile cache is DISABLED there
    (libtpu flags are not part of the cache key — a cached executable
    from another flag value would silently mis-attribute)."""
    repo = str(Path(__file__).resolve().parent.parent)
    out = {}
    for v in values:
        env = dict(os.environ)
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        tag = "default" if v == 0 else str(v)
        if v:
            env["LIBTPU_INIT_ARGS"] = (
                env.get("LIBTPU_INIT_ARGS", "") +
                f" --xla_tpu_scoped_vmem_limit_kib={v}").strip()
        try:
            r = subprocess.run(
                [sys.executable, "-c", VMEM_CHILD.format(repo=repo)],
                env=env, capture_output=True, text=True, timeout=2400)
            if r.returncode == 0 and r.stdout.strip():
                out[tag] = json.loads(r.stdout.strip().splitlines()[-1])
            else:
                out[tag] = {"error": (r.stderr or "")[-300:]}
        except subprocess.TimeoutExpired:
            # a fresh no-cache compile through a contended tunnel can blow
            # the window; record and keep sweeping (the sweep must never
            # lose earlier values to one stuck point)
            out[tag] = {"error": "timeout (2400s)"}
        print(json.dumps({"experiment": "vmem", "value": tag,
                          **out[tag]}), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-vmem", action="store_true")
    ap.add_argument("--only", choices=["precision", "layout", "vmem"])
    args = ap.parse_args()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    if args.only == "precision" or args.only is None:
        exp_precision()
    if args.only == "layout" or args.only is None:
        exp_layout()
    if (args.only == "vmem" or args.only is None) and not args.skip_vmem:
        exp_vmem()


if __name__ == "__main__":
    main()
