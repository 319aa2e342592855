"""One process of the 2-process full-driver distributed test: runs the
ACTUAL CLI (mrbayes_tpu.cli.main) under jax.distributed, the product
path of a multi-host launch (reference: any analysis under mpirun
unchanged, src/bayes.c:176-195).  Process 0 writes .p/.t/.ckp/.mcmc and
runs sumt/sump; workers compute the same sharded chains and skip
host-side output.

Usage: python multihost_cli_worker.py <pid> <nproc> <port> <workdir>
"""
import os
import sys

pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["MB_TPU_NO_CACHE"] = "1"
os.environ["MB_PLATFORM"] = "cpu"
os.chdir(workdir)

from mrbayes_tpu.cli import main  # noqa: E402

rc = main(["--coordinator", f"127.0.0.1:{port}", "--nprocs", str(nproc),
           "--procid", str(pid), "drive.nex"])
assert rc == 0
import jax  # noqa: E402

assert jax.process_count() == nproc
print(f"CLI WORKER {pid} OK", flush=True)
