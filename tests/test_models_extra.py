"""kmixture site rates, the Tuffley-Steel parsimony model, sampled
coalescent growth, and birth-death diversity/cluster sampling — the
round-2 model-surface completions (reference: P_MIXTURE_RATES
src/model.c:19813, Likelihood_Pars src/likelihood.c:7593, Move_Growth
src/proposal.c:5650, LnBirthDeathPriorPr src/mcmc.c:8357)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mrbayes_tpu.data import DataSet, make_divisions
from mrbayes_tpu.mcmc import clock as C
from mrbayes_tpu.mcmc.engine import Engine
from mrbayes_tpu.mcmc.settings import (DivisionSettings, McmcSettings,
                                       Prior, TreeSettings)


def _dna_dataset(ntax=7, nchar=60, seed=3):
    rng = np.random.default_rng(seed)
    from mrbayes_tpu.nexus.datatypes import DataType, FormatInfo
    from mrbayes_tpu.nexus.parser import CharacterMatrix
    codes = (1 << rng.integers(0, 4, size=(ntax, nchar))).astype(np.uint32)
    m = CharacterMatrix(taxa=[f"t{i}" for i in range(ntax)], nchar=nchar,
                        fmt=FormatInfo(datatype=DataType.DNA),
                        codes=codes,
                        col_datatype=[DataType.DNA] * nchar)
    return DataSet(taxa=m.taxa, nchar=nchar, divisions=make_divisions(m))


def test_kmixture_uniform_equals_equal_rates():
    """With all mixture rates equal the kmixture likelihood must equal
    the rates=equal likelihood (every category rate is 1)."""
    ds = _dna_dataset()
    ek = Engine(ds, [DivisionSettings(nst="1", rates="kmixture",
                                     nmixtcat=4)],
                mcmc=McmcSettings(nruns=1, nchains=1, seed=5))
    ee = Engine(ds, [DivisionSettings(nst="1", rates="equal")],
                mcmc=McmcSettings(nruns=1, nchains=1, seed=5))
    sk, _ = ek.init_chains()
    se, _ = ee.init_chains()
    assert "mixtrates" in sk
    assert abs(float(sk["lnL"][0]) - float(se["lnL"][0])) < 1e-2


def test_kmixture_runs_and_moves():
    ds = _dna_dataset()
    eng = Engine(ds, [DivisionSettings(nst="1", rates="kmixture",
                                      nmixtcat=3)],
                 mcmc=McmcSettings(nruns=1, nchains=2, seed=5))
    states, bk = eng.init_chains()
    states, bk = eng.run_block(states, bk, 300)
    assert np.isfinite(np.asarray(states["lnL"])).all()
    r = np.asarray(states["mixtrates"][0, 0])
    assert abs(r.sum() - 1.0) < 1e-5
    assert r.std() > 1e-6          # the rates moved off uniform


def _fitch_length(t, masks, weights):
    """Independent host Fitch: weighted changes incl. the tip-0 edge."""
    n_tips = t.n_tips
    F = np.zeros((t.n_nodes, masks.shape[1]), np.uint32)
    F[:n_tips] = masks
    T = 0.0
    # t.postorder() includes the root node, whose (basal, tip-0) step is
    # the extra comparison of the reference's basal special case
    for v in t.postorder():
        a, b = F[t.left[v]], F[t.right[v]]
        inter = a & b
        T += weights[inter == 0].sum()
        F[v] = np.where(inter > 0, inter, a | b)
    return T


def test_parsmodel_tuffley_steel():
    ds = _dna_dataset(ntax=6, nchar=40, seed=9)
    eng = Engine(ds, [DivisionSettings(parsmodel=True)],
                 mcmc=McmcSettings(nruns=1, nchains=1, seed=2))
    states, bk = eng.init_chains()
    lnl = float(states["lnL"][0])
    t = eng.extract_tree(states, 0)
    div = ds.divisions[0]
    T = _fitch_length(t, div.patterns.astype(np.uint32), div.weights)
    want = -(T + div.weights.sum()) * np.log(4.0)
    assert abs(lnl - want) < 1e-3
    states, bk = eng.run_block(states, bk, 200)
    assert np.isfinite(np.asarray(states["lnL"])).all()


def test_coalescent_growth_sampled():
    ds = _dna_dataset(ntax=6, nchar=40, seed=1)
    ts = TreeSettings(clock=True, clockpr="coalescence",
                      popsizepr=Prior("gamma", (1.0, 10.0)),
                      growthpr=Prior("normal", (0.0, 10.0)),
                      clockratepr=Prior("exponential", (1.0,)))
    eng = Engine(ds, [DivisionSettings()], tree_settings=ts,
                 mcmc=McmcSettings(nruns=1, nchains=1, seed=4))
    assert any(m.name == "growth_slider" for m in eng.moves)
    states, bk = eng.init_chains()
    assert "growth" in states
    assert np.isfinite(float(states["lnP"][0]))
    states, bk = eng.run_block(states, bk, 400)
    assert np.isfinite(np.asarray(states["lnL"])).all()
    assert abs(float(states["growth"][0, 0])) > 1e-8   # moved


def _ln_p0(t, b, d):
    return np.log(d) + np.log1p(-np.exp((d - b) * t)) - np.log(
        b - d * np.exp((d - b) * t))


def _ln_p1(t, b, d):
    return np.log(b - d) * 2 - (b - d) * t \
        - 2.0 * np.log(b - d * np.exp((d - b) * t))


@pytest.mark.parametrize("strategy", ["diversity", "cluster"])
def test_birthdeath_sampling_strategies(strategy):
    """ln_birthdeath_strat vs an independent numpy transcription of
    Eq.A1/A2 (Hohna et al. 2011; reference src/mcmc.c:8484/8556)."""
    from mrbayes_tpu.trees import random_clock_tree
    rng = np.random.default_rng(0)
    n = 8
    t, ages = random_clock_tree(n, rng, mean_age=1.0)
    sR, eR, sF = 0.5, 0.4, 0.5
    lam = sR / (1.0 - eR)
    mu = eR * lam
    m = round(n / sF)
    t1 = ages[t.root]
    nts = ages[n:t.root.__index__()] if hasattr(t.root, "__index__") \
        else ages[n:2 * n - 2]
    ln_p0_t1 = _ln_p0(t1, lam, mu)
    lp = (m - 2.0) * (ln_p0_t1 + np.log(lam)) + (n - m) * np.log(mu)
    lp += 2.0 * (_ln_p1(t1, lam, mu) - np.log(1 - np.exp(ln_p0_t1)))
    if strategy == "diversity":
        lp += (m - n) * (_ln_p0(nts.min(), lam, mu) - ln_p0_t1)
    else:
        lp += (m - n) * np.log(
            1.0 - np.exp(_ln_p0(nts.max(), lam, mu))
            / np.exp(ln_p0_t1))
    lp += sum(_ln_p1(x, lam, mu) - ln_p0_t1 for x in nts)
    got = float(C.ln_birthdeath_strat(
        jnp.asarray(ages, jnp.float32), n, jnp.float32(sR),
        jnp.float32(eR), sF, lambda x: 0.0, strategy=strategy))
    assert abs(got - lp) < 1e-2, (got, lp)


def test_cli_parsmodel_kmixture_parse(tmp_path):
    nex = tmp_path / "p.nex"
    nex.write_text("""
#NEXUS
begin data;
  dimensions ntax=4 nchar=8;
  format datatype=dna;
  matrix
    a ACGTACGT
    b ACGTACGA
    c ACGAACGT
    d ACGTACAT
  ;
end;
begin mrbayes;
  lset rates=kmixture nmixtcat=3;
  lset parsmodel=yes;
end;
""")
    from mrbayes_tpu.cli import Interpreter
    it = Interpreter(log=lambda m: None)
    it.execute_file(str(nex))
    s = it.env.div_settings[0]
    assert s.rates == "kmixture" and s.nmixtcat == 3
    assert s.parsmodel
