"""Swap bookkeeping, burned ASDSF, and output-file surface
(reference PrintSwapInfo src/mcmc.c:13579, CalcPartFreqStats :1750,
.mstat from PrintModelStats src/sumpt.c:2104)."""
import os

import numpy as np

from mrbayes_tpu.mcmc.diagnostics import SplitCounter
from mrbayes_tpu.trees import Tree
from conftest import example


def _chain_tree(order):
    """A 4-tip caterpillar tree over tips in the given order."""
    import numpy as np
    n = 4
    parent = np.full(2 * n - 1, -1)
    left = np.full(2 * n - 1, -1)
    right = np.full(2 * n - 1, -1)
    blen = np.full(2 * n - 1, 0.1)
    # internal 4 joins order[0],order[1]; 5 joins 4,order[2]; 6(root) joins
    left[4], right[4] = order[0], order[1]
    left[5], right[5] = 4, order[2]
    left[6], right[6] = 5, order[3]
    for v in (4, 5, 6):
        parent[left[v]] = v
        parent[right[v]] = v
    return Tree(parent=parent, left=left, right=right, blen=blen,
                n_tips=n, rooted=False)


def test_burned_asdsf_window():
    """Burn-in drops early disagreeing samples: ASDSF with burn-in must be
    smaller than without when runs only disagree early on."""
    sc = SplitCounter(2)
    t_a = _chain_tree([0, 1, 2, 3])   # split {2,3} (complement of 0-side)
    t_b = _chain_tree([0, 2, 1, 3])   # split {1,3}
    # first half: run0 sees A, run1 sees B (disagreement)
    for _ in range(10):
        sc.add(0, t_a)
        sc.add(1, t_b)
    # second half: both see A (agreement)
    for _ in range(10):
        sc.add(0, t_a)
        sc.add(1, t_a)
    full = sc.asdsf(min_freq=0.1)
    burned = sc.asdsf(min_freq=0.1, burn_frac=0.5)
    assert burned == 0.0
    assert full > 0.05


def test_nswaps_and_swapfreq(primates, tmp_path):
    """nswaps multiplies swap attempts; swapfreq gates the swap phase."""
    from mrbayes_tpu.data import DataSet, make_divisions
    from mrbayes_tpu.mcmc.engine import Engine
    from mrbayes_tpu.mcmc.settings import DivisionSettings, McmcSettings

    divs = make_divisions(primates.matrix)
    ds = DataSet(taxa=list(primates.taxa), nchar=primates.matrix.nchar,
                 divisions=divs)

    def run(nswaps, swapfreq, gens=12):
        mc = McmcSettings(ngen=gens, nruns=1, nchains=2, nswaps=nswaps,
                          swapfreq=swapfreq, tune=False, seed=5)
        eng = Engine(ds, [DivisionSettings()], mcmc=mc)
        states, bk = eng.init_chains()
        states, bk = eng.run_block(states, bk, gens)
        return int(np.asarray(bk["swap_tries"]).sum())

    assert run(1, 1) == 12
    assert run(3, 1) == 36
    assert run(1, 4) == 3


def test_swap_info_and_mstat(tmp_path, monkeypatch):
    """End of run prints the swap matrix; sump on a model-jump run writes
    .mstat."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("MB_MAX_NGEN", "60")
    from mrbayes_tpu.cli import Interpreter
    logs = []
    interp = Interpreter(log=logs.append)
    interp.execute_file(example("primates.nex"))
    prefix = str(tmp_path / "pm")
    interp.run_line("lset nst=mixed rates=gamma")
    interp.run_line(f"mcmc ngen=60 nruns=1 nchains=3 samplefreq=20 "
                    f"printfreq=60 checkfreq=0 filename={prefix}")
    joined = "\n".join(logs)
    assert "Chain swap information" in joined
    interp.run_line(f"sump filename={prefix} burninfrac=0.2")
    assert os.path.exists(f"{prefix}.mstat")
    with open(f"{prefix}.mstat") as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("Indicator")
    assert any("gtrsubmodel" in ln for ln in lines[1:])


def test_debug_invariants_run(tmp_path, monkeypatch):
    """MB_DEBUG + MB_DEBUG_LNL: in-loop tree consistency and carried-vs-
    recomputed lnL/lnP cross-checks pass on a short run (role of the
    reference's --enable-debug generation checks, src/mcmc.c:16769)."""
    from mrbayes_tpu.cli import Interpreter
    monkeypatch.setenv("MB_DEBUG", "1")
    monkeypatch.setenv("MB_DEBUG_LNL", "1")
    prefix = str(tmp_path / "dbg")
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {example('primates.nex')}")
    it.run_line("lset nst=6 rates=invgamma")
    it.run_line(f"mcmc ngen=150 nruns=1 nchains=2 samplefreq=50 "
                f"printfreq=150 diagnfreq=150 file={prefix}")
    assert (tmp_path / "dbg.run1.p").exists()


def test_rooted_sumt_clade_semantics(tmp_path):
    """Clock-tree sumt uses rooted CLADE semantics: a clade and its
    complement are distinct groups (the unrooted reader would merge
    them), and the consensus is rendered rooted."""
    from mrbayes_tpu.summarize.sumt import sumt
    t_text = """#NEXUS
begin trees;
   translate
       1 a,
       2 b,
       3 c,
       4 d;
   tree gen.0 = [&R] (((1:0.1,2:0.1):0.2,3:0.3):0.1,4:0.4);
   tree gen.1 = [&R] (((1:0.1,2:0.1):0.2,3:0.3):0.1,4:0.4);
   tree gen.2 = [&R] ((1:0.2,2:0.2):0.2,(3:0.2,4:0.2):0.2);
end;
"""
    (tmp_path / "r.run1.t").write_text(t_text)
    res = sumt(str(tmp_path / "r"), burninfrac=0.0, log=lambda m: None)
    fr = res["split_freqs"]
    # clade {a,b} in all three trees; clade {a,b,c} in two; clade {c,d}
    # in one — under unrooted semantics {c,d} and {a,b} would merge
    assert abs(fr[frozenset({0, 1})] - 1.0) < 1e-9
    assert abs(fr[frozenset({0, 1, 2})] - 2 / 3) < 1e-9
    assert abs(fr[frozenset({2, 3})] - 1 / 3) < 1e-9
    con = (tmp_path / "r.con.tre").read_text()
    assert "[&R]" in con


def test_swap_stats_block_aggregation():
    """Swap-rate matrices are accumulated from compact per-generation
    records once per block (engine._accumulate_swap_stats): totals must
    equal runs x generations/swapfreq attempts exactly."""
    import numpy as np

    from conftest import example
    from mrbayes_tpu.cli import Interpreter
    from mrbayes_tpu.mcmc.settings import McmcSettings
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {example('primates.nex')}")
    it.run_line("lset nst=1 rates=equal")
    it.env.mcmc = McmcSettings(nruns=2, nchains=4, seed=5)
    eng = it.build_engine()
    states, bk = eng.init_chains()
    states, bk = eng.run_block(states, bk, 150)
    st = np.asarray(bk["swap_tries"])
    assert st.sum() == 2 * 150          # R=2, one attempt per generation
    assert np.asarray(bk["swap_accepts"]).sum() > 0
    assert np.tril(st.sum(0)).sum() == 0   # (lo, hi) upper-triangular

    it.env.mcmc = McmcSettings(nruns=1, nchains=4, seed=5, swapfreq=5)
    eng2 = it.build_engine()
    s2, b2 = eng2.init_chains()
    s2, b2 = eng2.run_block(s2, b2, 150)
    assert np.asarray(b2["swap_tries"]).sum() == 150 // 5
