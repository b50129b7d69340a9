"""wandb artifact surface (reference utils/loggers/wandb/wandb_utils.py),
tested offline against a stub wandb module — no network, no wandb install
needed (VERDICT r3 #10)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest


class _StubArtifact:
    def __init__(self, name, type=None, metadata=None):
        self.name = name
        self.type = type
        self.metadata = metadata or {}
        self.files = {}
        self.tables = {}
        self._download_dir = None

    def add_file(self, path, name=None):
        self.files[name or Path(path).name] = str(path)

    def add(self, obj, name):
        self.tables[name] = obj

    def download(self):
        return self._download_dir


class _StubTable:
    def __init__(self, columns):
        self.columns = columns
        self.rows = []

    def add_data(self, *row):
        self.rows.append(row)


class _StubImage:
    def __init__(self, path):
        self.path = path


class _StubRun:
    def __init__(self):
        self.id = "run123"
        self.logged = []          # (artifact, aliases)
        self.used = {}            # name -> artifact to serve

    def log_artifact(self, art, aliases=None):
        self.logged.append((art, aliases or []))

    def use_artifact(self, name):
        return self.used[name]


@pytest.fixture()
def stub_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.Artifact = _StubArtifact
    mod.Table = _StubTable
    mod.Image = _StubImage
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_artifact_path_helpers():
    from efficientteacher_tpu.utils.wandb_artifacts import (
        check_wandb_resume, is_artifact_path, remove_prefix,
    )

    assert is_artifact_path("wandb-artifact://me/proj/run_1_model:best")
    assert not is_artifact_path("runs/train/exp/weights/best.ckpt")
    assert remove_prefix("wandb-artifact://a/b/c:latest") == "a/b/c:latest"
    assert check_wandb_resume("wandb-artifact://a/b/c")
    assert not check_wandb_resume("last.ckpt")


def test_log_model_aliases(stub_wandb, tmp_path):
    from efficientteacher_tpu.utils.wandb_artifacts import WandbArtifacts

    run = _StubRun()
    wa = WandbArtifacts(run)
    ckpt = tmp_path / "best.ckpt"
    ckpt.write_bytes(b"x" * 16)
    assert wa.log_model(ckpt, epoch=4, fitness=0.7, best=True)
    art, aliases = run.logged[-1]
    assert art.name == "run_run123_model" and art.type == "model"
    assert art.metadata["epoch"] == 4
    assert "best.ckpt" in art.files
    assert aliases == ["latest", "epoch 5", "best"]
    # missing file: graceful skip, not an exception (async ckpt writer)
    assert not wa.log_model(tmp_path / "nope.ckpt", 0, 0.0, wait_s=0.05)


def test_download_model_artifact(stub_wandb, tmp_path):
    from efficientteacher_tpu.utils.wandb_artifacts import WandbArtifacts

    run = _StubRun()
    art = _StubArtifact("run_run123_model", metadata={"epoch": 9})
    d = tmp_path / "dl"
    d.mkdir()
    (d / "last.ckpt").write_bytes(b"y")
    art._download_dir = str(d)
    run.used["me/proj/run_run123_model:latest"] = art
    wa = WandbArtifacts(run)
    path, meta = wa.download_model_artifact(
        "wandb-artifact://me/proj/run_run123_model")  # alias defaulted
    assert path.name == "last.ckpt"
    assert meta["epoch"] == 9


def test_log_dataset_artifact(stub_wandb, tmp_path):
    import cv2

    from efficientteacher_tpu.utils.wandb_artifacts import WandbArtifacts

    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    paths = []
    for i in range(3):
        p = img_dir / f"i{i}.jpg"
        cv2.imwrite(str(p), np.full((32, 32, 3), 80, np.uint8))
        (lab_dir / f"i{i}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
        paths.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths))

    run = _StubRun()
    wa = WandbArtifacts(run)
    assert wa.log_dataset_artifact(lst, name="synth", names=["a"])
    art, _ = run.logged[-1]
    assert art.type == "dataset"
    assert art.metadata["count"] == 3
    assert "train.txt" in art.files
    assert "images/i0.jpg" in art.files and "labels/i2.txt" in art.files
    assert len(art.tables["preview"].rows) == 3


def test_loggers_on_model_save_hook(stub_wandb, tmp_path):
    """The Loggers bus forwards on_model_save into an artifact upload with
    the right alias set (best.ckpt -> 'best')."""
    from efficientteacher_tpu.utils.loggers import Loggers
    from efficientteacher_tpu.utils.wandb_artifacts import WandbArtifacts

    lg = Loggers(tmp_path, include=("csv",))
    run = _StubRun()
    lg.wandb_artifacts = WandbArtifacts(run)
    (tmp_path / "weights").mkdir()
    ck = tmp_path / "weights" / "best.ckpt"
    ck.write_bytes(b"z")
    lg.on_model_save(ck, epoch=2, fitness=0.5, name="best.ckpt")
    art, aliases = run.logged[-1]
    assert "best" in aliases and art.metadata["fitness"] == 0.5
