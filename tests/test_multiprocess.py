"""Real multi-process `jax.distributed` drill (SURVEY.md §5 distributed-backend
row; VERDICT round-1 called this path "necessarily unexercised" — it isn't:
two OS processes with 4 virtual CPU devices each form an 8-device global mesh
through the coordination service, so cross-process collectives, global-array
sharding, and the runtime heartbeat failure detector all run for real).

Each drill spawns tools/multiproc_worker.py twice with a private coordinator
port and asserts both workers' verdicts. Kept small (64x96 pair) — the value
is the process topology, not the shapes.
"""

import os
import socket
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_ROOT, "tools", "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid: int, nprocs: int, port: int, mode: str) -> subprocess.Popen:
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS",)}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, _WORKER, str(pid), str(nprocs), str(port), mode],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def _run_drill(mode: str, expect_codes: dict[int, set[int]], timeout_s: float):
    port = _free_port()
    procs = [_spawn(i, 2, port, mode) for i in range(2)]
    deadline = time.monotonic() + timeout_s
    outs = {}
    try:
        for i, p in enumerate(procs):
            left = max(1.0, deadline - time.monotonic())
            outs[i], _ = p.communicate(timeout=left)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, p in enumerate(procs):
        assert p.returncode in expect_codes[i], (
            f"worker {i} rc={p.returncode}\n--- worker 0 ---\n{outs.get(0)}"
            f"\n--- worker 1 ---\n{outs.get(1)}"
        )
    return outs


def test_two_process_global_mesh_match():
    outs = _run_drill("match", {0: {0}, 1: {0}}, timeout_s=420)
    assert "match drill OK" in outs[0]
    assert "match drill OK" in outs[1]


def test_two_process_distributed_ba():
    # Distributed Schur-complement BA with observations sharded across the two
    # processes; every psum in the LM/CG loop is a real cross-process
    # collective. Both workers assert parity with a single-device solve.
    outs = _run_drill("ba", {0: {0}, 1: {0}}, timeout_s=420)
    assert "ba drill OK" in outs[0]
    assert "ba drill OK" in outs[1]


def test_two_process_heartbeat_failure_detection():
    # worker 1 hard-exits(42) mid-run; worker 0 must detect the dead peer
    # (heartbeat_timeout_s=10) instead of hanging. Detection surfaces through
    # one of two racing paths, both of which are the detector working:
    #   a) the barrier raises in Python -> worker prints "peer failure
    #      detected" and exits 0;
    #   b) the coordination service's error-polling thread wins the race and
    #      fail-fast terminates the process (absl FATAL, rc 1) with the
    #      unhealthy-tasks message before the Python except runs.
    outs = _run_drill("failure", {0: {0, 1}, 1: {42}}, timeout_s=420)
    assert (
        "peer failure detected" in outs[0]
        or "stopped sending heartbeats" in outs[0]
    ), outs[0]

def test_two_process_sgm_carry_relay():
    # Exact-mode sharded SGM: the vertical/diagonal scan carries relay
    # shard-to-shard via ppermute, crossing the OS-process boundary at the
    # shard-3 -> shard-4 hop. Both workers assert per-shard parity with the
    # unsharded backend.
    outs = _run_drill("sgm", {0: {0}, 1: {0}}, timeout_s=420)
    assert "sgm drill OK" in outs[0]
    assert "sgm drill OK" in outs[1]
