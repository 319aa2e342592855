"""Unlinked topologies: `unlink topology=(all) brlens=(all)` gives each
partition its own tree parameter (reference DoLink/DoUnlink
src/model.c:2799; SetModelParams creates one tree param per unlinked
group, :19026; .t files named <file>.tree<i>.run<r>.t, src/mcmc.c:10510).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from mrbayes_tpu.data import DataSet, make_divisions
from mrbayes_tpu.mcmc.engine import Engine
from mrbayes_tpu.mcmc.settings import (DivisionSettings, McmcSettings,
                                       Prior)


def _two_part_dataset(ntax=7, nchar=60, seed=3):
    rng = np.random.default_rng(seed)
    from mrbayes_tpu.nexus.datatypes import DataType, FormatInfo
    from mrbayes_tpu.nexus.parser import CharacterMatrix
    codes = (1 << rng.integers(0, 4, size=(ntax, nchar))).astype(np.uint32)
    m = CharacterMatrix(taxa=[f"t{i}" for i in range(ntax)], nchar=nchar,
                        fmt=FormatInfo(datatype=DataType.DNA),
                        codes=codes,
                        col_datatype=[DataType.DNA] * nchar)
    half = nchar // 2
    divs = make_divisions(m, [list(range(half)),
                              list(range(half, nchar))])
    return DataSet(taxa=m.taxa, nchar=nchar, divisions=divs)


def _settings():
    return DivisionSettings(nst="1", rates="equal",
                            statefreqpr=Prior("fixed", ("equal",)))


def test_unlinked_topology_two_trees():
    ds = _two_part_dataset()
    links = {"topology": [0, 1], "brlens": [0, 1]}
    eng = Engine(ds, [_settings(), _settings()], links=links,
                 mcmc=McmcSettings(nruns=1, nchains=2, seed=5,
                                   samplefreq=10))
    assert eng.n_trees == 2
    assert eng.div_tree == [0, 1]
    states, bk = eng.init_chains()
    assert states["parent"].shape == (2, 2, 2 * ds.ntax - 1)
    assert np.isfinite(np.asarray(states["lnL"])).all()

    # additivity: total lnL = sum of single-division engines evaluated on
    # the matching tree slice
    total = float(states["lnL"][0])
    parts = 0.0
    for d in range(2):
        ds_d = DataSet(taxa=ds.taxa, nchar=ds.nchar,
                       divisions=[ds.divisions[d]])
        e_d = Engine(ds_d, [_settings()],
                     mcmc=McmcSettings(nruns=1, nchains=1, seed=5))
        view = {k: states[k][0, eng.div_tree[d]]
                for k in ("left", "right", "parent", "blen")}
        view = e_d.refresh_eigs(view)
        parts += float(e_d.log_likelihood(view))
    assert abs(total - parts) < 0.5

    # chains advance with finite posteriors and the two trees diverge
    states, bk = eng.run_block(states, bk, 200)
    assert np.isfinite(np.asarray(states["lnL"])).all()
    p = np.asarray(states["parent"][0])
    assert not np.array_equal(p[0], p[1]) or not np.array_equal(
        np.asarray(states["blen"][0, 0]), np.asarray(states["blen"][0, 1]))


def test_unlinked_cli_end_to_end(tmp_path):
    taxa = ["a", "b", "c", "d", "e", "f"]
    rng = np.random.default_rng(0)
    rows = ["".join("ACGT"[rng.integers(4)] for _ in range(40))
            for _ in taxa]
    mat = "\n".join(f"    {t} {r}" for t, r in zip(taxa, rows))
    nex = tmp_path / "unl.nex"
    out = tmp_path / "out"
    nex.write_text(f"""
#NEXUS
begin data;
  dimensions ntax=6 nchar=40;
  format datatype=dna;
  matrix
{mat}
  ;
end;
begin mrbayes;
  set autoclose=yes nowarn=yes;
  charset first = 1-20;
  charset second = 21-40;
  partition both = 2: first, second;
  set partition=both;
  unlink topology=(all) brlens=(all);
  mcmc ngen=200 nruns=1 nchains=1 samplefreq=50 printfreq=100
       diagnfreq=200 file={out};
  sumt;
end;
""")
    from mrbayes_tpu.cli import Interpreter
    msgs = []
    it = Interpreter(log=msgs.append)
    it.execute_file(str(nex))
    assert os.path.exists(f"{out}.tree1.run1.t")
    assert os.path.exists(f"{out}.tree2.run1.t")
    assert os.path.exists(f"{out}.tree1.con.tre")
    assert os.path.exists(f"{out}.tree2.con.tre")
    # .p has one TL column per tree
    header = open(f"{out}.run1.p").readlines()[1]
    assert "TL{1}" in header and "TL{2}" in header
