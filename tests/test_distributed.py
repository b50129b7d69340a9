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
def test_two_process_cpu_cluster():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
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


def test_single_process_helpers_noop():
    """Without a cluster the helpers are identities."""
    from efficientteacher_tpu.parallel.distributed import (
        is_main_process, per_process_batch, process_slice,
    )

    assert process_slice([1, 2, 3]) == [1, 2, 3]
    assert per_process_batch(32) == 32
    assert is_main_process()
