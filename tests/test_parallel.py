"""Sharded-execution tests on the virtual 8-device CPU mesh (the analog of
the reference CI's `mpirun -np 2` runs, testing/runtests.sh.in:38-47)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrbayes_tpu.data import DataSet, make_divisions
from mrbayes_tpu.mcmc.engine import Engine
from mrbayes_tpu.mcmc.settings import DivisionSettings, McmcSettings
from mrbayes_tpu.parallel.mesh import (make_mesh, shard_chains,
                                       shard_engine_data)


@pytest.fixture(scope="module")
def engine(primates):
    ds = DataSet(taxa=primates.taxa, nchar=primates.matrix.nchar,
                 divisions=make_divisions(primates.matrix))
    return lambda **kw: Engine(
        ds, [DivisionSettings(nst="6", rates="gamma")],
        mcmc=McmcSettings(**{"nruns": 2, "nchains": 4, "seed": 5, **kw}))


def test_chain_sharded_block_matches_unsharded(engine):
    eng = engine()
    states, bk = eng.init_chains()
    s1, b1 = eng.run_block(states, bk, 20)
    mesh = make_mesh(8, 1)
    with mesh:
        st, bk2 = shard_chains(eng, mesh, states, bk)
        s2, b2 = eng.run_block(st, bk2, 20)
    np.testing.assert_allclose(np.asarray(s1["lnL"]), np.asarray(s2["lnL"]),
                               rtol=2e-4)
    assert np.array_equal(np.asarray(b1["temp_id"]),
                          np.asarray(b2["temp_id"]))


def test_site_sharded_lnl_matches(engine):
    eng_ref = engine(nruns=1, nchains=2)
    states, bk = eng_ref.init_chains()
    want = np.asarray(states["lnL"])
    eng_sh = engine(nruns=1, nchains=2)
    mesh = make_mesh(2, 4)
    shard_engine_data(eng_sh, mesh)
    with mesh:
        st, bk2 = shard_chains(eng_sh, mesh, *eng_sh.init_chains())
        got = np.asarray(jax.vmap(eng_sh.log_likelihood)(
            {k: v for k, v in st.items() if k not in ("lnL", "lnP")}))
    np.testing.assert_allclose(want, got, rtol=2e-4)


def test_site_sharded_pallas_kernel_matches(engine):
    """The FUSED PALLAS kernel under sites sharding (shard_map per
    shard, interpret mode on the CPU mesh) == the unsharded scan pass.
    This exercises the flagship kernel + sharding composition
    (PruningPallasSharded): shard_engine_data rebuilds each division's
    pruner in the sharded layout when the Pallas path is enabled."""
    import os

    eng_ref = engine(nruns=1, nchains=2)
    states, bk = eng_ref.init_chains()
    want = np.asarray(states["lnL"])
    eng_sh = engine(nruns=1, nchains=2)
    mesh = make_mesh(2, 4)
    os.environ["MB_TPU_FORCE_PALLAS"] = "1"
    # plain interpret mode: the TPU-semantics interpreter is
    # pathologically slow under shard_map (see pruning_pallas._interp)
    os.environ["MB_PALLAS_INTERPRET"] = "1"
    try:
        shard_engine_data(eng_sh, mesh)
        from mrbayes_tpu.ops.pruning_pallas import PruningPallasSharded
        assert any(isinstance(p, PruningPallasSharded)
                   for p in eng_sh._pruners)
        with mesh:
            st, bk2 = shard_chains(eng_sh, mesh, states, bk)
            got = np.asarray(jax.jit(jax.vmap(eng_sh.log_likelihood))(
                {k: v for k, v in st.items() if k not in ("lnL", "lnP")}))
    finally:
        del os.environ["MB_TPU_FORCE_PALLAS"]
        del os.environ["MB_PALLAS_INTERPRET"]
    np.testing.assert_allclose(want, got, rtol=2e-4)


def test_graft_entry_dryrun():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_graft_entry_forward():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    v = jax.jit(fn)(*args)
    assert float(v) < 0


def test_site_sharded_mkv_coding_matches():
    """Site-sharded lnL equality for standard (Mkv, coding=variable)
    data: the ascertainment correction runs as a separate replicated
    dummy pass under sharding (division_loglik split_correction)."""
    from mrbayes_tpu.nexus.datatypes import DataType, FormatInfo
    from mrbayes_tpu.nexus.parser import CharacterMatrix

    rng = np.random.default_rng(9)
    ntax, nchar = 8, 40
    M = rng.integers(0, 2, size=(ntax, nchar))
    for j in range(nchar):
        if len(set(M[:, j].tolist())) == 1:
            M[0, j] = 1 - M[0, j]
    codes = (1 << M).astype(np.uint32)
    m = CharacterMatrix(taxa=[f"t{i}" for i in range(ntax)], nchar=nchar,
                        fmt=FormatInfo(datatype=DataType.STANDARD),
                        codes=codes,
                        col_datatype=[DataType.STANDARD] * nchar)
    ds = DataSet(taxa=m.taxa, nchar=nchar, divisions=make_divisions(m))

    def build():
        return Engine(ds, [DivisionSettings(rates="gamma")],
                      mcmc=McmcSettings(nruns=1, nchains=2, seed=5))

    eng_ref = build()
    assert eng_ref.div_cfg[0].settings.coding == "variable"   # default
    states, _ = eng_ref.init_chains()
    want = np.asarray(states["lnL"])

    eng_sh = build()
    mesh = make_mesh(2, 4)
    shard_engine_data(eng_sh, mesh)
    assert eng_sh._site_sharded
    with mesh:
        st, _ = shard_chains(eng_sh, mesh, *eng_sh.init_chains())
        got = np.asarray(jax.vmap(eng_sh.log_likelihood)(
            {k: v for k, v in st.items() if k not in ("lnL", "lnP")}))
    np.testing.assert_allclose(want, got, rtol=2e-4)
