"""Torch checkpoint importer: name mapping, layout conversion, numeric
equivalence of a conv+BN block, and round-trip export."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from efficientteacher_tpu.models.common import ConvBase  # noqa: E402
from efficientteacher_tpu.utils.torch_import import (  # noqa: E402
    export_to_torch_state_dict,
    load_torch_state_dict,
    map_torch_name,
    state_dict_to_flax,
)


class TConv(nn.Module):
    """Reference-style Conv: conv + bn (+SiLU)."""

    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2)

    def forward(self, x):
        return torch.nn.functional.silu(self.bn(self.conv(x)))


class TBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.cv1 = TConv(3, 8, 3)
        self.m = nn.Sequential(TConv(8, 8, 1), TConv(8, 8, 3))
        self.head = nn.Conv2d(8, 6, 1, bias=True)

    def forward(self, x):
        return self.head(self.m(self.cv1(x)))


def test_name_mapping():
    path, leaf, coll = map_torch_name("backbone.stage2_2.cv1.conv.weight", 4)
    assert path == ("backbone", "stage2_2", "cv1", "conv") and leaf == "kernel"
    path, leaf, coll = map_torch_name("backbone.stage1.bn.weight", 1)
    assert leaf == "scale" and coll == "params"
    path, leaf, coll = map_torch_name("neck.C1.m.0.cv2.bn.running_mean", 1)
    assert path == ("neck", "C1", "m_0", "cv2", "bn")
    assert leaf == "mean" and coll == "batch_stats"
    _, _, coll = map_torch_name("head.anchors", 3)
    assert coll == "drop"
    _, leaf, _ = map_torch_name("head.m.2.bias", 1)
    assert leaf == "bias"


def test_pickled_module_checkpoint_roundtrip(tmp_path):
    """Save a reference-style {'model': nn.Module} pickle, reload, map."""
    m = TBlock().eval()
    # randomize BN stats so the mapping is observable
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.uniform_(-1, 1)
            mod.running_var.uniform_(0.5, 2)
    p = tmp_path / "w.pt"
    torch.save({"model": m, "ema": None, "epoch": 1}, p)
    sd = load_torch_state_dict(str(p), prefer_ema=True)  # falls back to model
    assert "cv1.conv.weight" in sd
    assert "m.0.conv.weight" in sd
    assert "head.bias" in sd

    tree = state_dict_to_flax(sd)
    assert tree["params"]["cv1"]["conv"]["kernel"].shape == (3, 3, 3, 8)
    assert tree["params"]["cv1"]["bn"]["scale"].shape == (8,)
    assert tree["batch_stats"]["cv1"]["bn"]["mean"].shape == (8,)
    assert "m_0" in tree["params"]  # torch `m.0` -> flax sibling `m_0`


def test_conv_bn_numeric_equivalence(tmp_path):
    """Imported weights reproduce the torch forward in flax."""
    tm = TConv(3, 8, 3).eval()
    for mod in tm.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.5, 0.5)
            mod.running_var.uniform_(0.5, 2)
            mod.weight.data.uniform_(0.5, 1.5)
            mod.bias.data.uniform_(-0.5, 0.5)
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        want = tm(x).numpy()

    p = tmp_path / "c.pt"
    torch.save({"model": tm}, p)
    sd = load_torch_state_dict(str(p))
    tree = state_dict_to_flax(sd)

    fm = ConvBase(8, 3, 1, bn_eps=1e-5)  # torch default BN eps
    variables = {
        "params": jax.tree.map(jnp.asarray, tree["params"]),
        "batch_stats": jax.tree.map(jnp.asarray, tree["batch_stats"]),
    }
    got = fm.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                   False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_export_roundtrip(tmp_path):
    m = TBlock().eval()
    p = tmp_path / "w.pt"
    torch.save({"model": m}, p)
    sd = load_torch_state_dict(str(p))
    tree = state_dict_to_flax(sd)
    back = export_to_torch_state_dict(tree["params"], tree["batch_stats"])
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        assert k in back, k
        np.testing.assert_allclose(back[k], v, atol=1e-6)


def test_strip_optimizer(tmp_path):
    """strip_optimizer drops training state and promotes EMA to model."""
    import jax.numpy as jnp

    from efficientteacher_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        strip_optimizer,
    )

    params = {"a": {"kernel": jnp.ones((2, 2))}}
    ema = {"a": {"kernel": jnp.full((2, 2), 3.0)}}
    bs = {"a": {"mean": jnp.zeros(2)}}
    path = tmp_path / "w.ckpt"
    save_checkpoint(path, params=params, batch_stats=bs,
                    ema_params=ema, ema_batch_stats=bs,
                    opt_state={"momentum": jnp.ones(4)},
                    epoch=7, best_fitness=0.5)
    ckpt = load_checkpoint(path)
    assert "optimizer" in ckpt and "ema" in ckpt

    strip_optimizer(path)
    stripped = load_checkpoint(path)
    assert "optimizer" not in stripped
    # EMA promoted into the model slot
    np.testing.assert_allclose(
        np.asarray(stripped["model"]["params"]["a"]["kernel"], np.float32),
        3.0,
    )
    assert stripped["meta"]["best_fitness"] == 0.5
