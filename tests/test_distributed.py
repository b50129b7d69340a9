"""Multi-host readiness: 2 real JAX processes on CPU form a 4-device global
mesh, shard data per process, and agree on a jitted global reduction
(the v5p-16 multi-host story, BASELINE.md target platform)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
@pytest.mark.parametrize("local_devices", [2, 4])
def test_two_process_cpu_cluster(local_devices):
    """2 real JAX processes x `local_devices` virtual CPU devices each
    (the 4-device and the 2-proc x 4-dev = 8-device global topologies),
    incl. the LabelMatch score all-gather: both processes must derive
    IDENTICAL thresholds from the union of their disjoint score shards."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS":
                f"--xla_force_host_platform_device_count={local_devices}",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "WORKER_LOCAL_DEVICES": str(local_devices),
            "PYTHONPATH": f"{REPO}:{env.get('PYTHONPATH', '')}",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "two_process_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    assert "WORKER_0_OK" in outs[0]
    assert "WORKER_1_OK" in outs[1]
    # LabelMatch thresholds must agree across processes
    thr0 = outs[0].split("thr=")[1].splitlines()[0]
    thr1 = outs[1].split("thr=")[1].splitlines()[0]
    assert thr0 == thr1, f"cross-process thresholds diverged:\n{thr0}\n{thr1}"


def test_single_process_helpers_noop():
    """Without a cluster the helpers are identities."""
    from efficientteacher_tpu.parallel.distributed import (
        is_main_process, per_process_batch, process_slice,
    )

    assert process_slice([1, 2, 3]) == [1, 2, 3]
    assert per_process_batch(32) == 32
    assert is_main_process()
