"""Real 2-process ``jax.distributed`` execution on CPU devices.

The single-process 8-device virtual mesh (conftest) cannot exercise the
coordinator handshake, cross-process global-array assembly
(``jax.make_array_from_process_local_data``), or the DCN-analog data path.
This test spawns two OS processes, each owning 2 virtual CPU devices and
half the channel axis, and asserts the channel-sharded batch step is
bit-identical to the single-process run (SURVEY §4; BASELINE "linear to
2 hosts"; reference analog: the per-channel process pool of
``/root/reference/sydr/channel/channelManager.py:54-127``).
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_batch_step():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + os.environ.get("PYTHONPATH", "").split(os.pathsep))
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} rc={p.returncode}\n{out[-4000:]}")
        assert f"WORKER_OK {pid}" in out, out[-4000:]
