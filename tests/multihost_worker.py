"""One process of the 2-process jax.distributed MC3 test.

The CPU analog of the reference's ``mpirun -np 2`` CI run
(testing/runtests.sh.in:38-47): every process owns 4 virtual CPU
devices, jax.distributed stitches them into one 8-device mesh, chains
are sharded across processes (the reference's only distributed axis,
src/mcmc.c:18331) and site patterns across the second mesh axis (the
axis the reference never built).  Identical seeds everywhere mirror the
reference's seed broadcast (src/bayes.c:499-541); swap decisions are
computed redundantly on both processes from the shared stream, so the
only cross-process traffic is the XLA-inserted collectives.  At the end
the full chain state is gathered and process 0 writes a checkpoint —
the ReassembleParamVals-to-rank-0 pattern (src/mcmc.c:14313).

Usage: python multihost_worker.py <pid> <nproc> <port> <outdir>
"""
import json
import os
import sys

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], sys.argv[4])

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["MB_TPU_NO_CACHE"] = "1"

import jax  # noqa: E402  (may be pre-imported by sitecustomize)

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

from mrbayes_tpu.data import DataSet, make_divisions  # noqa: E402
from mrbayes_tpu.mcmc.engine import Engine  # noqa: E402
from mrbayes_tpu.mcmc.settings import (DivisionSettings,  # noqa: E402
                                       McmcSettings)
from mrbayes_tpu.parallel.mesh import (make_mesh,  # noqa: E402
                                       shard_chains, shard_engine_data)

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())
assert len(jax.local_devices()) == 4

# deterministic dataset, identical on every process
rng = np.random.default_rng(7)
from mrbayes_tpu.nexus.datatypes import DataType, FormatInfo  # noqa: E402
from mrbayes_tpu.nexus.parser import CharacterMatrix  # noqa: E402

ntax, nchar = 6, 48
codes = (1 << rng.integers(0, 4, size=(ntax, nchar))).astype(np.uint32)
m = CharacterMatrix(taxa=[f"t{i}" for i in range(ntax)], nchar=nchar,
                    fmt=FormatInfo(datatype=DataType.DNA), codes=codes,
                    col_datatype=[DataType.DNA] * nchar)
ds = DataSet(taxa=m.taxa, nchar=nchar, divisions=make_divisions(m))
eng = Engine(ds, [DivisionSettings(nst="6", rates="gamma")],
             mcmc=McmcSettings(nruns=2, nchains=4, seed=11, swapseed=12))

# chains across processes (4 shards x 2 site shards over 8 devices;
# each chain shard spans both processes' devices)
mesh = make_mesh(4, 2)
shard_engine_data(eng, mesh)
states, bk = eng.init_chains()
states, bk = shard_chains(eng, mesh, states, bk)

states, bk = eng.run_block(states, bk, 60)

from jax.experimental import multihost_utils  # noqa: E402

full = jax.tree.map(
    lambda a: np.asarray(multihost_utils.process_allgather(
        a, tiled=True)),
    {"lnL": states["lnL"], "lnP": states["lnP"],
     "temp_id": bk["temp_id"], "gen": bk["gen"],
     "swap_tries": bk["swap_tries"]})
assert full["lnL"].shape == (8,)
assert np.isfinite(full["lnL"]).all(), full["lnL"]
assert int(full["gen"]) == 60
assert sorted(full["temp_id"][:4].tolist()) == [0, 1, 2, 3]
assert full["swap_tries"].sum() > 0

if pid == 0:
    # checkpoint gather to "rank 0"
    with open(os.path.join(outdir, "multihost_ckpt.json"), "w") as f:
        json.dump({k: np.asarray(v).tolist() for k, v in full.items()},
                  f)
print(f"WORKER {pid} OK lnL={full['lnL']}", flush=True)
