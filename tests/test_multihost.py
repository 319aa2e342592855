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
from conftest import example

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


DRIVE = """#NEXUS
begin mrbayes;
    set autoclose=yes nowarnings=yes seed=21 swapseed=22;
    execute {primates};
    lset nst=2 rates=gamma;
    mcmc ngen=120 nruns=2 nchains=2 samplefreq=40 printfreq=120
         diagnfreq=120 checkfreq=120 file=dist;
    sumt;
    sump;
end;
"""


def test_two_process_full_driver(tmp_path):
    """The product path: the real CLI under a 2-process jax.distributed
    launch (--coordinator/--nprocs/--procid).  Chains shard across the
    8-device mesh; process 0 writes the sample files, checkpoint and
    summaries (reference: cold-chain owner -> rank 0 file writes,
    src/mcmc.c:13263-13410; gather src/mcmc.c:14313)."""
    (tmp_path / "drive.nex").write_text(
        DRIVE.format(primates=example("primates.nex")))
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["MB_TPU_NO_CACHE"] = "1"
    procs = [
        subprocess.Popen(
            [sys.executable,
             os.path.join(HERE, "multihost_cli_worker.py"),
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
        assert p.returncode == 0, f"cli worker {pid} failed:\n{out[-4000:]}"
        assert f"CLI WORKER {pid} OK" in out
    # process 0 wrote the full output set; sumt/sump ran
    for suffix in ("run1.p", "run2.p", "run1.t", "run2.t", "ckp",
                   "mcmc", "con.tre", "pstat", "trprobs"):
        assert (tmp_path / f"dist.{suffix}").exists(), suffix
    p_rows = (tmp_path / "dist.run1.p").read_text().splitlines()
    assert len(p_rows) >= 5            # header x2 + >=3 samples
    assert "Sharding over mesh" in outs[0]
    # workers wrote nothing visible
    assert "Consensus" not in outs[1]
