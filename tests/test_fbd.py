"""Fossilized birth-death, tip dating, calibrations, and constraints.

Golden checks are against independent numpy transcriptions of the
reference formulas (reference_impl.py; src/mcmc.c:8693-9240), plus
behavioral checks: constrained runs keep the clade monophyletic,
calibrated tips stay inside their bounds.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrbayes_tpu.data import DataSet, make_divisions
from mrbayes_tpu.mcmc import clock as C
from mrbayes_tpu.mcmc.engine import Engine
from mrbayes_tpu.mcmc.settings import (DivisionSettings, McmcSettings,
                                       Prior, TreeSettings)
from mrbayes_tpu.trees import random_clock_tree

from reference_impl import (fbd_prior_fossiltip, fbd_prior_random,
                            uniform_dated_prior)


def _dated_tree(n=8, seed=0, n_fossils=3):
    rng = np.random.default_rng(seed)
    tip_ages = np.zeros(n)
    tip_ages[:n_fossils] = rng.uniform(0.2, 1.0, n_fossils)
    t, ages = random_clock_tree(n, rng, mean_age=1.5, tip_ages=tip_ages)
    return t, ages, tip_ages > 0


@pytest.mark.parametrize("strategy,oracle", [
    ("random", fbd_prior_random), ("fossiltip", fbd_prior_fossiltip)])
def test_fbd_prior_matches_reference_formula(strategy, oracle):
    n = 8
    t, ages, fossil = _dated_tree(n)
    net_div, turnover, fossil_frac, rho = 0.4, 0.55, 0.3, 0.8
    lam, mu, psi = [np.asarray(x) for x in C.fbd_rates(
        jnp.float32(net_div), jnp.float32(turnover),
        jnp.float32(fossil_frac), strategy)]
    want = oracle(ages, n, float(lam), float(mu), float(psi), rho, fossil)
    got = C.ln_fbd(jnp.asarray(ages, jnp.float32), n,
                   jnp.float32(net_div), jnp.float32(turnover),
                   jnp.float32(fossil_frac), rho, jnp.asarray(fossil),
                   lambda t1: jnp.float32(0.0), strategy=strategy)
    assert np.isfinite(want)
    assert abs(float(got) - want) < 5e-3 * max(1.0, abs(want))


def test_fbd_sampled_ancestor_prior_golden():
    """An ancestral fossil's parent contributes psi instead of lambda*q,
    the tip term drops, and the labeled-tree factor loses one fossil
    (reference src/mcmc.c:9073-9085)."""
    n = 8
    t, ages, fossil = _dated_tree(n)
    # make fossil tip 0 ancestral: pin its parent's age to the fossil age
    sa = np.zeros(n, np.int32)
    sa[0] = 1
    q = int(t.parent[0])
    ages2 = ages.copy()
    ages2[q] = ages2[0]
    # keep ordering valid: q's parent must be older (true by construction
    # since q was older than the fossil before pinning); sibling of 0 must
    # be younger — enforce by clamping
    sib = t.left[q] if t.right[q] == 0 else t.right[q]
    if ages2[sib] >= ages2[0]:
        ages2[sib] = 0.0
    net_div, turnover, fossil_frac, rho = 0.4, 0.55, 0.3, 0.8
    lam, mu, psi = [float(np.asarray(x)) for x in C.fbd_rates(
        jnp.float32(net_div), jnp.float32(turnover),
        jnp.float32(fossil_frac), "random")]
    want = fbd_prior_random(ages2, n, lam, mu, psi, rho, fossil,
                            sa=sa > 0, parent=t.parent)
    got = C.ln_fbd(jnp.asarray(ages2, jnp.float32), n,
                   jnp.float32(net_div), jnp.float32(turnover),
                   jnp.float32(fossil_frac), rho, jnp.asarray(fossil),
                   lambda t1: jnp.float32(0.0), strategy="random",
                   sa=jnp.asarray(sa), parent=jnp.asarray(t.parent))
    assert np.isfinite(want)
    assert abs(float(got) - want) < 5e-3 * max(1.0, abs(want))
    # and the configuration differs from the no-SA one
    got0 = C.ln_fbd(jnp.asarray(ages2, jnp.float32), n,
                    jnp.float32(net_div), jnp.float32(turnover),
                    jnp.float32(fossil_frac), rho, jnp.asarray(fossil),
                    lambda t1: jnp.float32(0.0), strategy="random",
                    sa=jnp.zeros(n, jnp.int32),
                    parent=jnp.asarray(t.parent))
    assert abs(float(got) - float(got0)) > 1e-3


def test_fbd_sampled_ancestor_run_smoke():
    """rjMCMC over ancestral fossils: a short FBD run proposes add/del
    branch moves and keeps the posterior finite; pinned ages hold."""
    ds = _mini_dataset()
    ts = TreeSettings(
        clock=True, clockpr="fossilization", samplestrat="random",
        sampleprob=0.7, clockratepr=Prior("exponential", (10.0,)),
        treeagepr=Prior("gamma", (2.0, 2.0)),
        tip_calibrations={0: Prior("fixed", (0.5,)),
                          1: Prior("fixed", (0.3,))})
    eng = Engine(ds, [DivisionSettings(nst="1")], tree_settings=ts,
                 mcmc=McmcSettings(nruns=1, nchains=2, seed=11, tune=False))
    names = [m.name for m in eng.moves]
    assert "add_branch" in names and "del_branch" in names
    states, bk = eng.init_chains()
    states, bk = eng.run_block(states, bk, 400)
    assert np.all(np.isfinite(np.asarray(states["lnL"])))
    assert np.all(np.isfinite(np.asarray(states["lnP"])))
    sa = np.asarray(states["sa"])
    assert sa.shape == (2, 8)
    # del_branch was tried (bookkeeping proves the move is wired)
    tried = np.asarray(bk["tries_total"]).sum(0)
    assert tried[names.index("del_branch")] > 0


def test_fbd_diversity_finite_and_orders():
    n = 8
    t, ages, fossil = _dated_tree(n)
    got = C.ln_fbd(jnp.asarray(ages, jnp.float32), n,
                   jnp.float32(0.4), jnp.float32(0.5), jnp.float32(0.2),
                   0.25, jnp.asarray(fossil), lambda t1: jnp.float32(0.0),
                   strategy="diversity")
    assert np.isfinite(float(got))


def test_uniform_dated_reduces_to_undated():
    """With all tips extant the dated formula must equal the plain one."""
    n = 7
    rng = np.random.default_rng(3)
    t, ages = random_clock_tree(n, rng, mean_age=1.0)
    lp0 = C.ln_uniform_clock(jnp.asarray(ages, jnp.float32), n,
                             lambda t1: jnp.float32(0.0))
    lp1 = C.ln_uniform_clock_dated(
        jnp.asarray(ages, jnp.float32), n,
        jnp.zeros(n, bool), lambda t1: jnp.float32(0.0), root_dated=False)
    assert abs(float(lp0) - float(lp1)) < 1e-3


def test_uniform_dated_matches_reference_formula():
    n = 9
    t, ages, fossil = _dated_tree(n, seed=4, n_fossils=4)
    want = uniform_dated_prior(ages, n)
    got = C.ln_uniform_clock_dated(
        jnp.asarray(ages, jnp.float32), n, fossil,
        lambda t1: jnp.float32(0.0), root_dated=False)
    assert abs(float(got) - want) < 5e-3 * max(1.0, abs(want))


def _mini_dataset(ntax=8, nchar=60, seed=5):
    rng = np.random.default_rng(seed)
    from mrbayes_tpu.nexus.datatypes import DataType
    from mrbayes_tpu.nexus.parser import CharacterMatrix
    from mrbayes_tpu.nexus.datatypes import FormatInfo
    codes = (1 << rng.integers(0, 4, size=(ntax, nchar))).astype(np.uint32)
    m = CharacterMatrix(taxa=[f"t{i}" for i in range(ntax)], nchar=nchar,
                        fmt=FormatInfo(datatype=DataType.DNA),
                        codes=codes,
                        col_datatype=[DataType.DNA] * nchar)
    return DataSet(taxa=m.taxa, nchar=nchar, divisions=make_divisions(m))


def test_fbd_run_smoke():
    ds = _mini_dataset()
    ts = TreeSettings(
        clock=True, clockpr="fossilization", samplestrat="random",
        sampleprob=0.7, clockratepr=Prior("exponential", (10.0,)),
        treeagepr=Prior("gamma", (2.0, 2.0)),
        tip_calibrations={0: Prior("fixed", (0.5,)),
                          1: Prior("uniform", (0.2, 0.8))})
    eng = Engine(ds, [DivisionSettings(nst="1")], tree_settings=ts,
                 mcmc=McmcSettings(nruns=1, nchains=1, seed=7, tune=True,
                                   tunefreq=50))
    states, bk = eng.init_chains()
    assert np.isfinite(float(states["lnL"][0]))
    assert np.isfinite(float(states["lnP"][0]))
    states, bk = eng.run_block(states, bk, 300)
    assert np.isfinite(float(states["lnL"][0]))
    # fixed tip pinned, sampled tip inside its calibration window
    age = np.asarray(states["age"][0])
    assert abs(age[0] - 0.5) < 1e-6
    assert 0.2 - 1e-5 <= age[1] <= 0.8 + 1e-5
    # fossilization parameter moved off its initial value or is valid
    f = float(states["fossilization"][0, 0])
    assert 0.0 < f < 1.0


def test_constraints_enforced_nonclock():
    ds = _mini_dataset(ntax=7, nchar=40, seed=11)
    mask = np.zeros(7, bool)
    mask[[2, 3, 4]] = True
    ts = TreeSettings(constraints=[("cl1", mask, None)])
    eng = Engine(ds, [DivisionSettings(nst="1")], tree_settings=ts,
                 mcmc=McmcSettings(nruns=1, nchains=1, seed=3))
    states, bk = eng.init_chains()
    ok_start = np.isfinite(float(states["lnP"][0]))
    # run; every visited state must satisfy the constraint
    for _ in range(5):
        states, bk = eng.run_block(states, bk, 100)
        lp = float(states["lnP"][0])
        if ok_start:
            assert np.isfinite(lp)
    if ok_start:
        # verify monophyly on the final tree: some node's subtree == set
        from mrbayes_tpu.ops.traversal import ancestor_matrix
        A = np.asarray(ancestor_matrix(states["parent"][0]))
        tipA = A[:7]
        counts = mask.astype(float) @ tipA
        sizes = tipA.sum(0)
        is_clade = (counts == 3) & (sizes == 3)
        comp = (counts == 0) & (sizes == 4)
        assert (is_clade | comp).any()


def _tree_state(newick, taxa):
    from mrbayes_tpu.trees import parse_newick
    t = parse_newick(newick, taxa)
    return {"left": jnp.asarray(t.left), "right": jnp.asarray(t.right),
            "parent": jnp.asarray(t.parent),
            "blen": jnp.asarray(t.blen, jnp.float32)}


def test_negative_constraint_terms():
    """A negative constraint must reject exactly the trees containing the
    banned split (reference DoesTreeSatisfyConstraints NEGATIVE,
    src/model.c:12709)."""
    taxa = ["a", "b", "c", "d", "e", "f"]
    ds = _mini_dataset(ntax=6, nchar=30, seed=4)
    mask = np.zeros(6, bool)
    mask[[2, 3]] = True     # ban clade {c,d}
    ts = TreeSettings(constraints=[("no_cd", "negative", mask, None,
                                    None)])
    eng = Engine(ds, [DivisionSettings(nst="1")], tree_settings=ts,
                 mcmc=McmcSettings(nruns=1, nchains=1, seed=3))
    bad = _tree_state("(a,(b,((c,d),(e,f))));", taxa)
    good = _tree_state("(a,(b,((c,e),(d,f))));", taxa)
    assert float(eng._constraint_terms(bad)) < -1e20
    assert float(eng._constraint_terms(good)) == 0.0
    # complement side counts as the same split on unrooted trees
    bad2 = _tree_state("(a,((b,(e,f)),(c,d)));", taxa)
    assert float(eng._constraint_terms(bad2)) < -1e20


def test_partial_constraint_terms():
    """Partial (backbone) constraint set1:set2 — some branch must place
    all of set1 on one side and all of set2 on the other (reference
    src/model.c:12660)."""
    taxa = ["a", "b", "c", "d", "e", "f"]
    ds = _mini_dataset(ntax=6, nchar=30, seed=4)
    m1 = np.zeros(6, bool)
    m1[[1, 2]] = True       # b,c together ...
    m2 = np.zeros(6, bool)
    m2[[4, 5]] = True       # ... away from e,f
    ts = TreeSettings(constraints=[("bb", "partial", m1, m2, None)])
    eng = Engine(ds, [DivisionSettings(nst="1")], tree_settings=ts,
                 mcmc=McmcSettings(nruns=1, nchains=1, seed=3))
    # {b,c,d} vs rest separates {b,c} from {e,f}: satisfied (d may roam)
    good = _tree_state("(a,((b,(c,d)),(e,f)));", taxa)
    assert float(eng._constraint_terms(good)) == 0.0
    # e inside every branch grouping b with c: violated
    bad = _tree_state("(a,(d,((b,(c,e)),f)));", taxa)
    assert float(eng._constraint_terms(bad)) < -1e20


def test_cli_negative_partial_constraint_parsing(tmp_path):
    nex = tmp_path / "c.nex"
    nex.write_text("""
#NEXUS
begin data;
  dimensions ntax=5 nchar=8;
  format datatype=dna;
  matrix
    a ACGTACGT
    b ACGTACGA
    c ACGAACGT
    d ACGTACAT
    e AAGTACGT
  ;
end;
begin mrbayes;
  constraint noAB negative = a b;
  constraint back partial = b c : d e;
  prset topologypr=constraints(noAB, back);
end;
""")
    from mrbayes_tpu.cli import Interpreter
    it = Interpreter(log=lambda m: None)
    it.execute_file(str(nex))
    eng = it.build_engine()
    assert eng.negative_masks is not None
    assert eng.negative_masks.sum() == 2
    assert eng.partial_masks is not None
    m1, m2 = eng.partial_masks
    assert m1[0].tolist() == [False, True, True, False, False]
    assert m2[0].tolist() == [False, False, False, True, True]


def test_calibrated_node_density():
    """A calibrated constraint shifts the prior by the MRCA-age lpdf."""
    ds = _mini_dataset(ntax=6, nchar=30, seed=2)
    mask = np.zeros(6, bool)
    mask[[0, 1]] = True
    base = dict(clock=True, clockpr="uniform",
                treeagepr=Prior("gamma", (2.0, 2.0)))
    ts0 = TreeSettings(**base, constraints=[("c", mask, None)])
    ts1 = TreeSettings(**base, constraints=[
        ("c", mask, Prior("offsetexp", (0.0, 1.0)))])
    e0 = Engine(ds, [DivisionSettings()], tree_settings=ts0,
                mcmc=McmcSettings(nruns=1, nchains=1, seed=9))
    e1 = Engine(ds, [DivisionSettings()], tree_settings=ts1,
                mcmc=McmcSettings(nruns=1, nchains=1, seed=9))
    s0, _ = e0.init_chains()
    s1, _ = e1.init_chains()
    lp0, lp1 = float(s0["lnP"][0]), float(s1["lnP"][0])
    if np.isfinite(lp0) and np.isfinite(lp1):
        # same state, extra offsetexp(0,1) density on the MRCA age
        from mrbayes_tpu.ops.traversal import ancestor_matrix
        A = np.asarray(ancestor_matrix(s0["parent"][0]))
        counts = mask.astype(float) @ A[:6]
        sizes = A[:6].sum(0)
        mrca = int(np.argmax((counts == 2) & (sizes == 2)))
        age = float(s0["age"][0, mrca])
        want = np.log(1.0) - 1.0 * age
        assert abs((lp1 - lp0) - want) < 1e-3


def test_cli_constraint_calibrate_parsing(tmp_path):
    nex = tmp_path / "fbd.nex"
    nex.write_text("""
#NEXUS
begin data;
  dimensions ntax=6 nchar=12;
  format datatype=dna;
  matrix
    A ACGTACGTACGT
    B ACGTACGTACGA
    C ACGAACGTACGT
    FossilX ACGTACGAACGT
    E ACGTACGTAAGT
    F ACGTACGTACTT
  ;
end;
begin mrbayes;
  constraint crown = 1-3;
  calibrate FossilX=fixed(0.5) root=offsetexp(1.0,2.0);
  prset brlenspr=clock:fossilization;
  prset fossilizationpr=beta(1,1);
  prset sampleprob=0.5;
  prset samplestrat=random;
  prset nodeagepr=calibrated;
  prset topologypr=constraints(crown);
  prset clockratepr=exp(10);
end;
""")
    from mrbayes_tpu.cli import Interpreter
    it = Interpreter(log=lambda m: None)
    it.execute_file(str(nex))
    eng = it.build_engine()
    ts = eng.tree_settings
    assert ts.clock and ts.clockpr == "fossilization"
    assert eng.has_dated_tips
    assert eng.tip_dates[3] == 0.5
    assert eng._root_calib is not None
    assert eng.constraint_masks is not None
    assert eng.constraint_masks.shape == (1, 6)
    assert list(eng.constraint_masks[0][:3]) == [True, True, True]
    states, bk = eng.init_chains()
    assert np.isfinite(float(states["lnP"][0]))
