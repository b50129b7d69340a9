"""CI dry-run of scripts/reproduce_parity.sh (VERDICT r3 #5): the COCO
parity runbook must be executable end-to-end TODAY, with only the
egress-gated steps (dataset download, released-weights download) mocked by
a synthetic set + a reference-format .pt. Everything else — pt->ckpt
conversion, val.py at reference eval settings, the table — runs for real,
so the moment real COCO + released weights land, 37.2/49.0 is one command.
Reference workflow being reproduced: /root/reference/README.md:117-212."""

import subprocess
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
NC = 3


def _write_dataset(root: Path, rng, n=8):
    img_dir, lab_dir = root / "images", root / "labels"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    files = []
    for i in range(n):
        img = np.full((320, 320, 3), 70, np.uint8)
        rows = []
        for _ in range(int(rng.integers(2, 5))):
            bw, bh = rng.uniform(0.2, 0.4, 2)
            cx = rng.uniform(bw / 2, 1 - bw / 2)
            cy = rng.uniform(bh / 2, 1 - bh / 2)
            c = int(rng.integers(0, NC))
            color = [(255, 80, 80), (80, 255, 80), (80, 80, 255)][c]
            cv2.rectangle(img, (int((cx - bw / 2) * 320),
                                int((cy - bh / 2) * 320)),
                          (int((cx + bw / 2) * 320),
                           int((cy + bh / 2) * 320)), color, -1)
            rows.append(f"{c} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        p = img_dir / f"im{i:02d}.jpg"
        cv2.imwrite(str(p), img)
        (lab_dir / f"im{i:02d}.txt").write_text("\n".join(rows) + "\n")
        files.append(str(p))
    lst = root / "val.txt"
    lst.write_text("\n".join(files) + "\n")
    return lst


@pytest.mark.slow
def test_reproduce_parity_dry_run(tmp_path):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.models.detector import build_model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.utils.torch_import import (
        export_to_torch_state_dict,
    )

    rng = np.random.default_rng(0)
    lst = _write_dataset(tmp_path / "ds", rng)

    # tiny cfg on disk (the dry-run stand-in for configs/sup/public/*)
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(
        "Model:\n"
        "  Backbone: {name: YoloV5}\n"
        "  Neck: {name: YoloV5, in_channels: [256, 512, 1024],"
        " out_channels: [256, 512, 1024]}\n"
        "  Head: {name: YoloV5}\n"
        "  width_multiple: 0.125\n"
        "  depth_multiple: 0.34\n"
        f"Dataset: {{nc: {NC}, img_size: 192, val: '{lst}',"
        f" names: ['0','1','2']}}\n"
        "Loss: {type: ComputeLoss}\n"
    )

    # reference-format .pt from a randomly initialized model (the dry-run
    # stand-in for the released checkpoint)
    cfg = get_cfg()
    cfg.merge_from_file(str(cfg_path))
    cfg.freeze()
    spec = spec_from_cfg(cfg)
    model = build_model(spec, ssod=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 192, 192, 3)), train=False)
    sd = export_to_torch_state_dict(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]))
    pt_path = tmp_path / "released.pt"
    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd.items()}}, str(pt_path))

    out = subprocess.run(
        ["bash", "scripts/reproduce_parity.sh",
         "--dry-run", str(lst), "--dry-cfg", str(cfg_path),
         "--dry-weights", str(pt_path), "--tol", "100"],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
        env={**__import__("os").environ,
             "PYTHONPATH": str(REPO) + ":" +
             __import__("os").environ.get("PYTHONPATH", "")},
    )
    sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    assert out.returncode == 0, "runbook dry-run failed"
    assert "VERDICT" in out.stdout and "PASS" in out.stdout
    assert "mAP50-95" in out.stdout


@pytest.mark.slow
def test_reproduce_parity_dry_run_ssod(tmp_path):
    """SSOD leg of the runbook (VERDICT r4 #8, north star 50.45 mAP —
    reference README.md:45): a released *-ssod checkpoint is the TEACHER
    saved as the `ema` entry next to a `model` entry that carries SSOD
    extras (domain discriminators; reference trainer/ssod_trainer.py
    :393-409 ckpt layout). The conversion must prefer `ema` and tolerate
    the extra keys; val.py then runs the shared supervised eval graph
    (reproduce_parity.sh cfg_for strips -ssod)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from efficientteacher_tpu.configs import get_cfg
    from efficientteacher_tpu.models.detector import build_model
    from efficientteacher_tpu.models.spec import spec_from_cfg
    from efficientteacher_tpu.utils.checkpoint import load_checkpoint
    from efficientteacher_tpu.utils.torch_import import (
        export_to_torch_state_dict,
    )

    rng = np.random.default_rng(1)
    lst = _write_dataset(tmp_path / "ds", rng)
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(
        "Model:\n"
        "  Backbone: {name: YoloV5}\n"
        "  Neck: {name: YoloV5, in_channels: [256, 512, 1024],"
        " out_channels: [256, 512, 1024]}\n"
        "  Head: {name: YoloV5}\n"
        "  width_multiple: 0.125\n"
        "  depth_multiple: 0.34\n"
        f"Dataset: {{nc: {NC}, img_size: 192, val: '{lst}',"
        f" names: ['0','1','2']}}\n"
        "Loss: {type: ComputeLoss}\n"
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(cfg_path))
    cfg.freeze()
    spec = spec_from_cfg(cfg)
    model = build_model(spec, ssod=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 192, 192, 3)), train=False)
    ema_sd = export_to_torch_state_dict(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]))
    # `model` entry: DECOY weights (same keys, different values) + SSOD
    # discriminator extras — the converter must take `ema`, not these
    model_sd = {k: np.asarray(rng.standard_normal(v.shape), v.dtype)
                for k, v in ema_sd.items()}
    for i in range(3):
        model_sd[f"netD{i + 1}.conv1.weight"] = np.zeros(
            (64, 256, 1, 1), np.float32)
    pt_path = tmp_path / "released-ssod.pt"
    tt = lambda d: {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in d.items()}
    torch.save({"model": tt(model_sd), "ema": tt(ema_sd)}, str(pt_path))

    out = subprocess.run(
        ["bash", "scripts/reproduce_parity.sh",
         "--dry-run", str(lst), "--dry-cfg", str(cfg_path),
         "--dry-weights", str(pt_path), "--tol", "100",
         "--dry-name", "tiny-ssod"],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
        env={**__import__("os").environ,
             "PYTHONPATH": str(REPO) + ":" +
             __import__("os").environ.get("PYTHONPATH", "")},
    )
    sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    assert out.returncode == 0, "ssod runbook dry-run failed"
    assert "tiny-ssod" in out.stdout and "PASS" in out.stdout

    # the converted ckpt carries the TEACHER (ema) weights, not the decoys
    ckpt = load_checkpoint(REPO / "runs" / "reproduce_parity"
                           / "tiny-ssod.ckpt")
    leaf_key = next(k for k in ema_sd if k.endswith("weight"))
    flat = jax.tree.leaves(ckpt["model"]["params"])
    src = np.concatenate([np.ravel(v) for v in ema_sd.values()])
    some = np.ravel(np.asarray(flat[0]))
    # every converted leaf's values must appear in the ema source; a decoy
    # load would make this first-leaf check fail with probability ~1
    assert any(np.allclose(some[: min(16, some.size)],
                           np.ravel(np.asarray(v))[: min(16, some.size)],
                           atol=1e-6)
               for v in ema_sd.values()), (
        f"converted params do not match the ema entry ({leaf_key})")
