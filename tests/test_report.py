"""Posterior-reporting tests: ancestral states, site rates, positive
selection (mcmc/report.py vs the reference's report machinery).

Golden provenance (tests/golden_ancstates.json): reference 3.2.7a built
SCALAR-ONLY (--disable-sse --disable-avx --disable-fma) on primates.nex
GTR+I+G with a hard constraint, `report ancstates=yes siterates=yes`.
Two reference bugs found while recording, documented here because they
shape the assertions:

1. In a SIMD-enabled reference build, turning on any report option
   switches to the scalar kernels (src/mcmc.c:18012-18023) but leaves
   the SIMD-padded data layout, corrupting the likelihood entirely
   (primates gen-0 lnL -1559 vs the correct -8261).  Golden values
   therefore come from a scalar-only build.
2. The scalar build's PrintSiteRates_Gen output (src/mcmc.c:12212)
   disagrees with an independent float64 computation (constant
   alignment columns get r=1.0 — the uninformative-site value — while
   other constant columns get 0.19).  Site rates here are asserted
   against the float64 oracle (tests/reference_impl.py) instead; the
   ancestral-state probabilities match the reference to ~1e-3 (f32).
"""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mrbayes_tpu.data import DataSet, make_divisions
from mrbayes_tpu.mcmc.engine import Engine
from mrbayes_tpu.mcmc.report import Reporter
from mrbayes_tpu.mcmc.settings import (DivisionSettings, McmcSettings,
                                       TreeSettings)
from mrbayes_tpu.trees import parse_newick
from conftest import example

HERE = os.path.dirname(__file__)
GOLD = json.load(open(os.path.join(HERE, "golden_ancstates.json")))


@pytest.fixture(scope="module")
def anc_setup(primates):
    ds = DataSet(taxa=primates.taxa, nchar=primates.matrix.nchar,
                 divisions=make_divisions(primates.matrix))
    ts = TreeSettings()
    mask = np.zeros(12, bool)
    mask[[t - 1 for t in GOLD["constraint_taxa_1based"]]] = True
    ts.constraints = [("apes", mask, None)]
    eng = Engine(ds, [DivisionSettings(nst="6", rates="invgamma")], ts,
                 mcmc=McmcSettings(nruns=1, nchains=1))
    rep = Reporter(eng, {"ancstates": ("yes", (0,)),
                         "siterates": ("yes", (0,))}, log=lambda m: None)
    return ds, eng, rep


def _state(rec, taxa):
    t = parse_newick(rec["newick"], taxa)
    return t, {
        "left": jnp.asarray(t.left), "right": jnp.asarray(t.right),
        "parent": jnp.asarray(t.parent),
        "blen": jnp.asarray(t.blen, jnp.float32),
        "pi": jnp.asarray([rec["pi"]]),
        "revmat": jnp.asarray([rec["revmat"]]),
        "shape": jnp.asarray([rec["alpha"]]),
        "pinvar": jnp.asarray([rec["pinvar"]])}


@pytest.mark.parametrize("gi", range(len(GOLD["rows"])))
def test_ancstates_golden(anc_setup, primates, gi):
    ds, eng, rep = anc_setup
    rec = GOLD["rows"][gi]
    _, st = _state(rec, primates.taxa)
    vals = dict(zip(rep.headers,
                    rep.values({k: v[None] for k, v in st.items()}, 0)))
    errs = []
    for c, probs in zip(rec["anc_chars"], rec["anc"]):
        for b, p_ref in zip("ACGT", probs):
            errs.append(abs(vals[f"p({b}){{{c}@apes}}"] - p_ref))
        s = sum(vals[f"p({b}){{{c}@apes}}"] for b in "ACGT")
        assert abs(s - 1.0) < 1e-4
    errs = np.array(errs)
    # with the correctly-oriented up-pass contraction the agreement is
    # ~2e-6; 1e-3 leaves float32 headroom while still catching a
    # transposed contraction (which errs up to 0.036 here)
    assert errs.max() < 1e-3, errs.max()
    assert errs.mean() < 2e-4, errs.mean()


def test_siterates_vs_float64(anc_setup, primates):
    """Posterior-mean site rates vs an independent float64 oracle (the
    reference's own printed values are wrong; see module docstring)."""
    from scipy.linalg import expm

    from reference_impl import discrete_gamma_rates, gtr_q
    ds, eng, rep = anc_setup
    rec = GOLD["rows"][0]
    t, st = _state(rec, primates.taxa)
    vals = dict(zip(rep.headers,
                    rep.values({k: v[None] for k, v in st.items()}, 0)))
    div = ds.divisions[0]
    Q = gtr_q(np.array(rec["revmat"]), np.array(rec["pi"]))
    rates = discrete_gamma_rates(rec["alpha"], 4)
    tp = div.tip_partials(np.float64)
    P = np.array([[expm(Q * t.blen[v] * r) for r in rates]
                  for v in range(t.n_nodes)])
    cl = np.zeros((t.n_nodes, tp.shape[1], 4, 4))
    cl[:t.n_tips] = tp[:, :, None, :]
    for v in t.postorder():
        l, r = t.left[v], t.right[v]
        cl[v] = np.einsum("ksj,pkj->pks", P[l], cl[l]) \
            * np.einsum("ksj,pkj->pks", P[r], cl[r])
    Lk = np.einsum("pks,s->pk", cl[t.root], np.array(rec["pi"]))
    rbar = (Lk * rates).sum(-1) / Lk.sum(-1)
    for c in (1, 2, 4, 10, 100, 500):
        p = div.pattern_of_char[c - 1]
        assert abs(vals[f"r({c})"] - rbar[p]) < 0.02, (c, vals[f"r({c})"],
                                                       rbar[p])


def test_possel_siteomega_ny98():
    """possel/siteomega columns for an NY98 codon model: class posterior
    of the omega>1 class and the posterior-mean omega per codon site
    (reference PosSelProbs/SiteOmegas, src/mcmc.c:12297ff), checked for
    internal consistency: probabilities in [0,1], omega a convex
    combination of the class omegas, and columns keyed to codon-site
    nucleotide triplets."""
    from mrbayes_tpu.nexus.parser import read_nexus_file
    nf = read_nexus_file(example("replicase.nex"))
    ds = DataSet(taxa=nf.taxa, nchar=nf.matrix.nchar,
                 divisions=make_divisions(nf.matrix))
    eng = Engine(ds, [DivisionSettings(nucmodel="codon", omegavar="ny98")],
                 mcmc=McmcSettings(nruns=1, nchains=1, seed=5))
    rep = Reporter(eng, {"possel": ("yes", (0,)),
                         "siteomega": ("yes", (0,))}, log=lambda m: None)
    n_sites = nf.matrix.nchar // 3
    assert len(rep.headers) == 2 * n_sites
    assert rep.headers[0] == "pr+(1,2,3)"
    assert f"omega({nf.matrix.nchar - 2},{nf.matrix.nchar - 1}," \
        f"{nf.matrix.nchar})" in rep.headers
    states, bk = eng.init_chains()
    vals = dict(zip(rep.headers, rep.values(states, 0)))
    o1 = float(states["omega1"][0, 0])
    o3 = float(states["omega3"][0, 0])
    for s in range(1, n_sites + 1, 37):
        trip = f"({3 * s - 2},{3 * s - 1},{3 * s})"
        pp = vals["pr+" + trip]
        om = vals["omega" + trip]
        assert 0.0 <= pp <= 1.0
        assert min(o1, 1.0, o3) - 1e-4 <= om <= max(o1, 1.0, o3) + 1e-4


def test_report_runner_columns(tmp_path):
    """End-to-end: report ancstates through the CLI writes p(state)
    columns whose per-character probabilities sum to 1."""
    from mrbayes_tpu.cli import Interpreter
    prefix = str(tmp_path / "rep")
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {example('primates.nex')}")
    it.run_line("lset nst=2 rates=gamma")
    it.run_line("constraint apes = 3-7")
    it.run_line("prset topologypr = constraints(apes)")
    it.run_line("report ancstates=yes")
    it.run_line(f"mcmc ngen=60 nruns=1 nchains=1 samplefreq=30 "
                f"printfreq=60 diagnfreq=60 file={prefix}")
    lines = open(prefix + ".run1.p").readlines()
    hdr = lines[1].rstrip("\n").split("\t")
    row = dict(zip(hdr, lines[-1].rstrip("\n").split("\t")))
    assert "p(A){1@apes}" in hdr
    for c in (1, 500, 898):
        s = sum(float(row[f"p({b}){{{c}@apes}}"]) for b in "ACGT")
        assert abs(s - 1.0) < 1e-4
