import textwrap

import pytest

from efficientteacher_tpu.configs import get_cfg


def test_defaults_tree():
    cfg = get_cfg()
    assert cfg.hyp.lr0 == 0.01
    assert cfg.Model.width_multiple == 1.0
    assert cfg.Loss.anchor_t == 4.0
    assert cfg.Dataset.nc == 80
    assert cfg.SSOD.ema_rate == 0.999
    assert len(cfg.Model.anchors) == 3


def test_merge_from_file(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text(
        textwrap.dedent(
            """
            Model:
              depth_multiple: 0.33
              width_multiple: 0.50
              Backbone:
                name: 'YoloV5'
            Dataset:
              nc: 20
            """
        )
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(y))
    assert cfg.Model.depth_multiple == 0.33
    assert cfg.Model.Backbone.name == "YoloV5"
    assert cfg.Dataset.nc == 20
    # untouched defaults survive the merge
    assert cfg.Model.Head.strides == [8, 16, 32]


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["hyp.lr0", 0.02, "Dataset.batch_size", 8])
    assert cfg.hyp.lr0 == 0.02
    assert cfg.Dataset.batch_size == 8
    with pytest.raises(KeyError):
        cfg.merge_from_list(["no.such.key", 1])


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.epochs = 5
    with pytest.raises(AttributeError):
        cfg.Model.ch = 1
    cfg.defrost()
    cfg.epochs = 5
    assert cfg.epochs == 5


def test_reference_yaml_zoo_loads():
    """Every YAML in the reference config zoo must load against our defaults."""
    import glob
    import os

    ref = "/root/reference/configs"
    if not os.path.isdir(ref):
        pytest.skip("reference not mounted")
    yamls = glob.glob(f"{ref}/**/*.yaml", recursive=True)
    assert yamls
    for path in yamls:
        cfg = get_cfg()
        cfg.merge_from_file(path)
        cfg.freeze()
