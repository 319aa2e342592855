"""2-process jax.distributed run — the reference's `mpirun -np 2` CI
analog (testing/runtests.sh.in:38-47).  Spawns two fresh Python
processes that stitch 4 virtual CPU devices each into one 8-device
mesh, run a sharded MC3 block, and gather the checkpoint to process 0.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["MB_TPU_NO_CACHE"] = "1"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER {pid} OK" in out
    ckpt = json.load(open(tmp_path / "multihost_ckpt.json"))
    lnl = np.asarray(ckpt["lnL"])
    assert lnl.shape == (8,) and np.isfinite(lnl).all()
