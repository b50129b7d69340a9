"""utils/xprof.py — xplane parsing + HLO attribution (CPU-plane smoke).

The reference's analogue is utils/torch_utils.py `profile` /
utils/profile.py (autograd-profiler layer timing); here the contract is
XLA-level: capture a jax.profiler trace, parse the xplane protobuf, join
to compiled-HLO op_name metadata.
"""

import jax
import jax.numpy as jnp
import pytest

from efficientteacher_tpu.utils import xprof


@pytest.fixture(scope="module")
def traced(tmp_path_factory):
    logdir = str(tmp_path_factory.mktemp("xprof"))
    f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
    x = jnp.ones((128, 128), jnp.float32)
    float(f(x))  # compile outside the trace

    def run():
        float(f(x))

    # CPU backend: XLA ops land on the host plane
    events = xprof.capture(run, steps=3, logdir=logdir,
                           plane_filter="/host:CPU")
    hlo = f.lower(x).compile().as_text()
    return events, hlo


def test_parse_returns_events(traced):
    events, _ = traced
    assert events, "no events parsed from xplane"
    assert all(e.occurrences > 0 for e in events)
    # host planes carry some zero-duration marker events; the real ops
    # must still have positive time
    assert any(e.total_ps > 0 for e in events)
    # sorted descending by duration
    durs = [e.total_ps for e in events]
    assert durs == sorted(durs, reverse=True)


def test_hlo_op_names_extracts_metadata(traced):
    _, hlo = traced
    names = xprof.hlo_op_names(hlo)
    assert names, "no op_name metadata parsed from compiled HLO"
    assert any("dot" in v or "tanh" in v for v in names.values())


def test_attribute_and_report(traced):
    events, hlo = traced
    cats = xprof.attribute(events, hlo, steps=3)
    assert cats and abs(
        sum(cats.values()) - sum(e.total_ms for e in events) / 3) < 1e-6
    report = xprof.format_report(events, hlo, steps=3, n=5)
    assert "device time" in report and "top events" in report


def test_missing_logdir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        xprof.parse_xplanes(str(tmp_path / "nope"))
