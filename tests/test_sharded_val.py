"""Sharded validation over the device mesh (VERDICT r4 #5).

The validator's jitted infer shard_maps the batch over every mesh axis so
epoch-end validation runs on all chips instead of one (TPU-first deviation
from the reference's rank-0-only val, trainer/trainer.py:445-457). These
tests pin, on the 8-device virtual CPU mesh:
  - make_infer_fn(mesh=...) numerics == single-device, bit-for-bit
  - validator.run(mesh=...) end-to-end mAP == single-device
  - the non-dividing-batch fallback stays single-device (and correct)
"""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientteacher_tpu.configs import get_cfg
from efficientteacher_tpu.eval import validator
from efficientteacher_tpu.models import build_model
from efficientteacher_tpu.models.spec import spec_from_cfg
from efficientteacher_tpu.parallel.mesh import make_mesh, make_mesh_2d


def _tiny_model(nc=3, img=128):
    cfg = get_cfg()
    cfg.Model.Backbone.name = "YoloV5"
    cfg.Model.Neck.name = "YoloV5"
    cfg.Model.Head.name = "YoloV5"
    cfg.Model.Neck.in_channels = [256, 512, 1024]
    cfg.Model.Neck.out_channels = [256, 512, 1024]
    cfg.Model.width_multiple = 0.125
    cfg.Model.depth_multiple = 0.34
    cfg.Dataset.nc = nc
    cfg.Dataset.img_size = img
    model = build_model(spec_from_cfg(cfg), ssod=False, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)), train=False)
    return model, variables


@pytest.mark.parametrize("mesh_kind", ["dp8", "dp4xsp2"])
def test_sharded_infer_matches_single_device(mesh_kind):
    """make_infer_fn over the mesh returns bit-identical detections to the
    single-device program for the same inputs."""
    model, variables = _tiny_model()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (8, 128, 128, 3), np.uint8))

    # conf floor BELOW the smart-bias init's obj*cls (~1e-5) so the fresh
    # model emits real detections and the equality below is non-vacuous
    kw = dict(nc=3, conf_thres=1e-7, iou_thres=0.6, max_det=50,
              max_nms=1024, norm_scale=255.0, compute_dtype=jnp.float32)
    ref = validator.make_infer_fn(model, **kw)(variables, images)
    mesh = (make_mesh(8) if mesh_kind == "dp8"
            else make_mesh_2d(dp=4, sp=2))
    out = validator.make_infer_fn(model, mesh=mesh, **kw)(variables, images)

    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    np.testing.assert_array_equal(np.asarray(ref.detections),
                                  np.asarray(out.detections))
    # there ARE detections — the equality above is not vacuous
    assert np.asarray(ref.valid).sum() > 0


@pytest.fixture(scope="module")
def val_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("shval")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(3)
    files = []
    for i in range(16):
        img = np.full((120, 160, 3), 60, np.uint8)
        rows = []
        for _ in range(int(rng.integers(1, 4))):
            cx, cy = rng.uniform(0.25, 0.75, 2)
            bw, bh = rng.uniform(0.15, 0.35, 2)
            cv2.rectangle(
                img,
                (int((cx - bw / 2) * 160), int((cy - bh / 2) * 120)),
                (int((cx + bw / 2) * 160), int((cy + bh / 2) * 120)),
                (0, 0, 250), -1)
            rows.append(f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        p = root / "images" / f"v{i}.jpg"
        cv2.imwrite(str(p), img)
        (root / "labels" / f"v{i}.txt").write_text("\n".join(rows) + "\n")
        files.append(str(p))
    (root / "val.txt").write_text("\n".join(files))
    return root


def test_sharded_validator_run_matches_single_device(val_data):
    """validator.run(mesh=...) produces the same (P, R, mAP50, mAP) as the
    single-device run over a real loader (padded final batch included)."""
    from efficientteacher_tpu.data.datasets import (
        BatchLoader, LoadImagesAndLabels,
    )

    model, variables = _tiny_model(nc=1)

    def make_loader():
        ds = LoadImagesAndLabels(str(val_data / "val.txt"), img_size=128,
                                 nc=1, max_targets=8)
        # thread mode: matches production validation loaders
        # (data/datasets.py picks 'thread' whenever augment=False) and
        # avoids forking under the mesh-compile-heavy JAX parent, where
        # forked children can die at startup (fork-with-threads hazard)
        return BatchLoader(ds, 8, shuffle=False, drop_last=False,
                           mode="thread")

    ref, ref_maps, _ = validator.run(
        model, variables, make_loader(), nc=1, compute_dtype=jnp.float32)
    out, out_maps, _ = validator.run(
        model, variables, make_loader(), nc=1, compute_dtype=jnp.float32,
        mesh=make_mesh(8))
    assert ref == out
    np.testing.assert_array_equal(ref_maps, out_maps)


def test_sharded_val_fallback_on_indivisible_batch(val_data):
    """Batch 6 does not divide an 8-device mesh: run() must fall back to the
    single-device program and still return the single-device numbers."""
    from efficientteacher_tpu.data.datasets import (
        BatchLoader, LoadImagesAndLabels,
    )

    model, variables = _tiny_model(nc=1)

    def make_loader():
        ds = LoadImagesAndLabels(str(val_data / "val.txt"), img_size=128,
                                 nc=1, max_targets=8)
        return BatchLoader(ds, 6, shuffle=False, drop_last=False,
                           mode="thread")  # see note above

    ref, _, _ = validator.run(
        model, variables, make_loader(), nc=1, compute_dtype=jnp.float32)
    out, _, _ = validator.run(
        model, variables, make_loader(), nc=1, compute_dtype=jnp.float32,
        mesh=make_mesh(8))
    assert ref == out
