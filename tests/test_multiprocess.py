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


def test_two_process_supervised_resume_shrunken_mesh(tmp_path):
    """The full recovery chain as a capability (VERDICT r3 item 7): worker 1
    dies without goodbye after the first checkpointed BA segment; worker 0's
    coordination-service heartbeat fail-fasts it (detection); the supervisor
    relaunches the survivor single-process, which rebuilds its mesh from the
    4 devices it still owns (fusion.resumable.auto_mesh — the shrunken mesh)
    and resumes from the checkpoint to completion."""
    import numpy as np

    from stepth_tpu.utils import supervisor

    port = _free_port()
    env_common = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env_common["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env_common["PYTHONPATH"] = _ROOT + os.pathsep + env_common.get("PYTHONPATH", "")
    env_common["STEPTH_CKPT_DIR"] = str(tmp_path)

    # phase 1: 2-process run; worker 1 dies after iter 2 (segment 1)
    def spawn(pid, nprocs, extra_env):
        env = dict(env_common, **extra_env)
        return subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nprocs), str(port),
             "resumable"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )

    procs = [
        spawn(0, 2, {}),
        spawn(1, 2, {"STEPTH_DIE_AT": "2"}),
    ]
    outs = {}
    deadline = time.monotonic() + 420
    try:
        for i, p in enumerate(procs):
            left = max(1.0, deadline - time.monotonic())
            outs[i], _ = p.communicate(timeout=left)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert procs[1].returncode == 43, outs  # died as scripted
    # worker 0 must NOT have completed: it was fail-fasted by the heartbeat
    assert procs[0].returncode != 0, outs[0]
    assert "resumable drill OK" not in outs[0], outs[0]
    ckpt = tmp_path / "ba_resumable_p0.npz"
    assert ckpt.exists(), outs[0]

    # phase 2: supervisor relaunches the survivor standalone (shrunken mesh)
    logs = []
    rc = supervisor.supervise(
        lambda attempt: [sys.executable, _WORKER, "0", "1", str(port),
                         "resumable"],
        max_restarts=1, backoff_s=0.01, env=env_common,
        attempt_timeout_s=300, log=logs.append,
    )
    assert rc == 0, (logs, outs)
    final = np.load(tmp_path / "final_p0.npz")
    assert float(final["cost"]) < 1e-4, final["cost"]
