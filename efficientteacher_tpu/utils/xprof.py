"""xprof trace capture + HLO attribution for TPU train steps.

The reference ships a layer-timing profiler (utils/profile.py:1-103,
utils/torch_utils.py `profile`) built on `torch.autograd.profiler`; the
TPU-native equivalent is an XLA-level one: capture a `jax.profiler.trace`,
parse the xplane protobuf directly, and join device event names back to
the compiled HLO's `op_name` metadata so device time is attributable to
JAX source ops (conv fwd vs wgrad vs loss vs optimizer).

Why parse the xplane by hand: the tensorboard profile plugin's
`raw_to_tool_data` converter is broken against some TF builds (it was in
this environment), while the protobuf schema itself is stable. We force
the pure-python protobuf runtime for the same reason (the C++ runtime
rejects mixed-version descriptors).

Typical use (see also `scripts/profile_step.py`)::

    from efficientteacher_tpu.utils.xprof import capture, attribute
    events = capture(lambda: run_step(), steps=3)    # list of XEventStat
    report = attribute(events, hlo_text)             # category -> ms
"""

from __future__ import annotations

import glob
import os
import re
import tempfile
from collections import defaultdict
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

__all__ = [
    "XEventStat", "capture", "parse_xplanes", "attribute",
    "top_events", "hlo_op_names", "format_report",
]


@dataclass
class XEventStat:
    """Aggregated device-plane event: total self duration over the trace."""
    name: str
    total_ps: int
    occurrences: int

    @property
    def total_ms(self) -> float:
        return self.total_ps / 1e9


def _xplane_pb2():
    # Import deferred + runtime forced to pure python: the plugin's C++
    # protobuf runtime rejects this TF build's descriptors (see module
    # docstring).
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415
    return xplane_pb2


def parse_xplanes(logdir: str, plane_filter: str = "TPU",
                  line_filter: str = "XLA Ops") -> List[XEventStat]:
    """Parse every .xplane.pb under `logdir`; aggregate events on planes
    whose name contains `plane_filter` (e.g. "TPU", "/device:CPU").

    Only lines named `line_filter` are counted when the plane has one
    (TPU planes carry 'XLA Modules' — a per-step umbrella event — and
    'Async XLA Ops' — HBM<->VMEM prefetch copies that OVERLAP compute;
    summing either double-counts wall time. 'XLA Ops' is the
    non-overlapping op-level self-time line). Planes without a matching
    line fall back to all lines (the CPU host plane's line is 'python').

    Returns events sorted by total duration, descending. Durations are
    summed over the whole trace — divide by the step count for per-step
    figures.
    """
    pb2 = _xplane_pb2()
    totals: Dict[str, List[int]] = defaultdict(lambda: [0, 0])
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    for path in files:
        space = pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if plane_filter not in plane.name:
                continue
            names = {mid: m.name for mid, m in plane.event_metadata.items()}
            lines = [ln for ln in plane.lines if ln.name == line_filter]
            for line in lines or plane.lines:
                for ev in line.events:
                    t = totals[names.get(ev.metadata_id, "?")]
                    t[0] += ev.duration_ps
                    t[1] += 1
    stats = [XEventStat(n, d, c) for n, (d, c) in totals.items()]
    stats.sort(key=lambda s: -s.total_ps)
    return stats


def capture(run: Callable[[], None], steps: int = 3,
            logdir: Optional[str] = None,
            plane_filter: str = "TPU") -> List[XEventStat]:
    """Trace `steps` calls of `run()` and return parsed device events.

    `run` must materialize its own output (a host read — `float(x)` — not
    just block_until_ready, which returns early through remote-device
    tunnels)."""
    import jax

    logdir = logdir or tempfile.mkdtemp(prefix="etx_xprof_")
    with jax.profiler.trace(logdir):
        for _ in range(steps):
            run()
    return parse_xplanes(logdir, plane_filter=plane_filter)


def hlo_op_names(hlo_text: str) -> Dict[str, str]:
    """Map HLO instruction name -> JAX op_name metadata from compiled HLO
    text (`jitted.lower(...).compile().as_text()`).

    Device trace events are named after HLO instructions (`%fusion.123`
    strips to `fusion.123`); `metadata={op_name="jit(step)/convert_element
    _type" ...}` carries the JAX-level provenance XLA preserved through
    fusion (the fusion root's op_name).
    """
    out: Dict[str, str] = {}
    pat = re.compile(
        r"%?([\w.-]+)\s*=[^\n]*?metadata=\{[^}]*?op_name=\"([^\"]+)\"")
    for m in pat.finditer(hlo_text):
        out[m.group(1)] = m.group(2)
    return out


def _conv_instructions(hlo_text: str) -> Dict[str, bool]:
    """Map HLO instruction name -> "performs a convolution", including
    fusions whose called computation contains one.

    TPU convs usually live inside `%fusion.N`/`%convert_reduce_fusion.N`
    wrappers (the BN-stats reduce is the fusion root, the conv a
    custom-call inside), so event-name matching alone undercounts conv
    time ~2x; this follows `calls=%fused_computation.N` into the
    computation body.
    """
    conv_pat = re.compile(r"\bconvolution\b|custom-call[^\n]*conv")
    # computation name -> contains a conv
    comp_has: Dict[str, bool] = {}
    for m in re.finditer(r"%?([\w.-]+)\s+(?:\([^)]*\)\s*->\s*[^\n{]*)?\{",
                         hlo_text):
        start = m.end()
        end = hlo_text.find("\n}", start)
        comp_has[m.group(1)] = bool(
            conv_pat.search(hlo_text[start:end if end > 0 else None]))
    out: Dict[str, bool] = {}
    for m in re.finditer(
            r"%?([\w.-]+)\s*=[^\n]*?(convolution\(|calls=%?([\w.-]+))",
            hlo_text):
        name = m.group(1)
        out[name] = (m.group(2).startswith("convolution")
                     or comp_has.get(m.group(3) or "", False))
    return out


def _event_key(name: str) -> str:
    """First instruction token of an event name (xplane event names carry
    the full HLO instruction text, e.g. '%fusion.12 = (f32[...') ."""
    m = re.match(r"%?([\w.-]+)", name)
    return m.group(1) if m else name


# Category rules, first match wins: (category, event-name regex,
# op_name regex or None). Backward convs are split by XLA's autodiff
# op_name scoping ("transpose(jvp(...))" wraps the bwd pass).
_RULES = [
    ("conv_bwd", r"", r"transpose.*conv|conv.*(backward|_bwd)"
                      r"|(wgrad|igrad).*conv"),
    ("conv", r"^%?(convolution|conv)", None),
    ("conv", r"", r"conv_general_dilated"),
    ("matmul", r"", r"\bdot_general\b"),
    ("copy", r"^%?(copy|transpose|bitcast)", None),
    ("infeed/outfeed", r"(infeed|outfeed)", None),
    ("allreduce", r"(all-reduce|all-gather|reduce-scatter|collective)", None),
    ("fusion", r"fusion", None),
]


def attribute(events: Sequence[XEventStat], hlo_text: str = "",
              steps: int = 1) -> Dict[str, float]:
    """Bucket device events into coarse categories (ms per step).

    With `hlo_text` supplied (`jitted.lower(...).compile().as_text()`),
    fusion events are resolved through the HLO: a fusion whose called
    computation contains a convolution counts as conv (fwd/bwd split by
    the fusion root's autodiff op_name scope); without it, only
    event-name classification applies and conv time is undercounted.
    """
    op_names = hlo_op_names(hlo_text) if hlo_text else {}
    conv_map = _conv_instructions(hlo_text) if hlo_text else {}
    buckets: Dict[str, float] = defaultdict(float)
    for ev in events:
        key = _event_key(ev.name)
        op = op_names.get(key, "")
        if conv_map.get(key, False):
            cat = ("conv_bwd" if re.search(_RULES[0][2], op) else "conv")
            buckets[cat] += ev.total_ms / steps
            continue
        for cat, ev_pat, op_pat in _RULES:
            if ev_pat and not re.search(ev_pat, ev.name):
                continue
            if op_pat and not re.search(op_pat, op):
                continue
            if not ev_pat and not op_pat:
                continue
            buckets[cat] += ev.total_ms / steps
            break
        else:
            buckets["other"] += ev.total_ms / steps
    return dict(buckets)


def top_events(events: Sequence[XEventStat], n: int = 20,
               steps: int = 1) -> List[tuple]:
    """Top-n events as (name, ms_per_step, count) tuples."""
    return [(e.name, round(e.total_ms / steps, 3), e.occurrences)
            for e in events[:n]]


def format_report(events: Sequence[XEventStat], hlo_text: str = "",
                  steps: int = 1, n: int = 15) -> str:
    total = sum(e.total_ms for e in events) / steps
    lines = [f"device time: {total:.2f} ms/step ({steps}-step trace)"]
    for cat, ms in sorted(attribute(events, hlo_text, steps).items(),
                          key=lambda kv: -kv[1]):
        lines.append(f"  {cat:16s} {ms:8.2f} ms  ({ms / total * 100:4.1f}%)"
                     if total else f"  {cat:16s} {ms:8.2f} ms")
    lines.append("top events:")
    for name, ms, cnt in top_events(events, n, steps):
        lines.append(f"  {ms:8.3f} ms  x{cnt:<4d} {name}")
    return "\n".join(lines)
