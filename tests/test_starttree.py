"""mcmc starttree=/nperts=/startparams= and the compareref command
(reference src/command.c:14520-14521,14695 and DoCompRefTree
src/sumpt.c:4609)."""
import numpy as np
import pytest

from conftest import example
from mrbayes_tpu.cli import CommandError, Interpreter


def test_perturb_nni_valid_and_moves():
    from mrbayes_tpu.mcmc.diagnostics import splits_of_tree
    from mrbayes_tpu.trees import perturb_nni, random_unrooted
    rng = np.random.default_rng(3)
    t = random_unrooted(10, rng)
    t2 = perturb_nni(t, 5, rng)
    t2.check()
    assert t2.n_tips == 10
    # 5 NNIs on 10 taxa should change the topology
    assert splits_of_tree(t) != splits_of_tree(t2)


def test_neighbor_joining_recovers_additive_tree():
    from mrbayes_tpu.mcmc.diagnostics import splits_of_tree
    from mrbayes_tpu.trees import neighbor_joining
    # caterpillar ((0,1),(2,3),(4)): additive distances
    #   0-1: 0.2, 0-2: 0.6 ...
    import numpy as np
    # build distances on a known tree: ((0:1,1:1):1,(2:1,3:1):1,4:2)
    D = np.zeros((5, 5))
    pos = {0: "A", 1: "A", 2: "B", 3: "B"}
    for i in range(5):
        for j in range(5):
            if i == j:
                continue
            if i < 4 and j < 4 and pos[i] == pos[j]:
                D[i, j] = 2.0
            elif i == 4 or j == 4:
                D[i, j] = 4.0
            else:
                D[i, j] = 3.0
    t = neighbor_joining(D)
    t.check()
    sp = splits_of_tree(t)
    assert frozenset({2, 3}) in sp


def test_parsimony_stepwise_recovers_signal():
    from mrbayes_tpu.mcmc.diagnostics import splits_of_tree
    from mrbayes_tpu.trees import parsimony_stepwise
    rng = np.random.default_rng(11)
    # 6 taxa, two clear clades {0,1,2} vs {3,4,5} (binary states)
    ntax, npat = 6, 40
    masks = np.zeros((ntax, npat), np.uint32)
    for p in range(npat):
        for i in range(ntax):
            masks[i, p] = 1 if (i < 3) == (p % 2 == 0) else 2
    w = np.ones(npat)
    t = parsimony_stepwise(masks, w, rng)
    t.check()
    sp = splits_of_tree(t)
    assert frozenset({3, 4, 5}) in sp


def test_mcmc_starttree_surface():
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {example('primates.nex')}")
    it.run_line("mcmcp starttree=random nperts=2 startparams=reset")
    assert it.env.mcmc.starttree == "random"
    assert it.env.mcmc.nperts == 2
    assert it.env.mcmc.startparams == "reset"
    with pytest.raises(CommandError):
        it.run_line("mcmcp starttree=bogus")
    with pytest.raises(CommandError):
        it.run_line("mcmcp startparams=bogus")
    # diagnostics-only toggles are accepted with a visible note
    logs = []
    it2 = Interpreter(log=logs.append)
    it2.run_line(f"execute {example('primates.nex')}")
    it2.run_line("mcmcp reweight=(0,0) allchains=yes savetrees=no")
    assert any("no effect" in l for l in logs)


@pytest.mark.parametrize("mode", ["random", "parsimony", "nj"])
def test_starttree_modes_build_valid_chains(mode):
    from mrbayes_tpu.mcmc.settings import McmcSettings
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {example('primates.nex')}")
    it.env.mcmc = McmcSettings(nruns=1, nchains=2, seed=5,
                               starttree=mode, nperts=2)
    eng = it.build_engine()
    states, _ = eng.init_chains()
    assert np.isfinite(np.asarray(states["lnL"])).all()
    if mode in ("parsimony", "nj"):
        # data-derived starting trees should fit the data much better
        # than random ones (primates: random trees start around -9000)
        assert float(np.max(np.asarray(states["lnL"]))) > -7500.0


def test_compareref_runs_and_writes_sdsf(tmp_path):
    import os
    logs = []
    it = Interpreter(log=logs.append)
    it.run_line(f"execute {example('primates.nex')}")
    it.run_line("lset nst=1 rates=equal")
    pfx = str(tmp_path / "cr")
    it.run_line(f"mcmc ngen=300 nruns=2 nchains=1 samplefreq=50 "
                f"printfreq=1000 diagnfreq=1000 seed=4 swapseed=5 "
                f"file={pfx}")
    it.run_line(f"compareref filename1={pfx}.run1.t filename2={pfx} "
                f"nruns=2 outputname={pfx}.cref")
    out = pfx + ".cref.sdsf"
    assert os.path.exists(out)
    rows = open(out).read().strip().split("\n")
    assert rows[0] == "Gen\tASDSF"
    assert len(rows) > 2
    final = float(rows[-1].split("\t")[1])
    assert 0.0 <= final < 0.8
