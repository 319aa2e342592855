"""Directional/mixed state-frequency model (restriction data): rooted
non-clock sampling machinery (reference statefrmod lset,
src/model.c:3950; DIRPI paramIds :11756; root-weighted Likelihood_Res,
src/likelihood.c:7155-7165).  Exact lnL parity is pinned by
tests/test_golden_extra.py (restriction_directional/_mixedfreq)."""
import numpy as np
import pytest

from mrbayes_tpu.cli import CommandError, Interpreter
from conftest import example

REST = "/root/repo/tests/data/restriction.nex"


def _run(tmp_path, model, ngen=600):
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {REST}")
    it.run_line("lset coding=noabsencesites")
    it.run_line(f"lset statefrmod={model}")
    it.run_line("prset statefreqpr=dirichlet(1,1)")
    pfx = str(tmp_path / model)
    it.run_line(f"mcmc ngen={ngen} nruns=1 nchains=1 samplefreq=50 "
                f"printfreq=10000 seed=61 swapseed=62 file={pfx}")
    hdr = open(pfx + ".run1.p").readlines()[1].rstrip("\n").split("\t")
    rows = np.array([[float(x) for x in ln.split("\t")]
                     for ln in open(pfx + ".run1.p").readlines()[2:]])
    return it, hdr, rows, pfx


def test_directional_sampling(tmp_path):
    it, hdr, rows, pfx = _run(tmp_path, "directional")
    assert "rootpi(0)" in hdr and "rootpi(1)" in hdr
    r0 = rows[:, hdr.index("rootpi(0)")]
    assert np.all(np.isfinite(rows[:, hdr.index("lnLike")]))
    assert np.std(r0) > 0.0          # root frequencies actually move
    # trees are rooted
    assert "[&R]" in open(pfx + ".run1.t").read()
    eng = it._last_runner.eng
    names = {m.name for m in eng.moves}
    assert {"rooted_nni", "rooted_spr", "rootpi_dir",
            "rootpi_slider"} <= names


def test_mixed_rj_switch(tmp_path):
    it, hdr, rows, pfx = _run(tmp_path, "mixed", ngen=1500)
    ind = rows[:, hdr.index("statefrmod")]
    # the RJ indicator takes both values over a short run
    assert set(np.unique(ind)) <= {0.0, 1.0}
    assert len(set(np.unique(ind))) >= 1
    # sentinel: stationary samples print -9999 for rootpi
    r0 = rows[:, hdr.index("rootpi(0)")]
    off = ind == 0.0
    if off.any():
        assert np.all(r0[off] == -9999.0)
    if (~off).any():
        assert np.all(r0[~off] > -1.0)


def test_directional_requires_restriction():
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {example('primates.nex')}")
    it.run_line("lset statefrmod=directional")
    with pytest.raises(Exception):
        it.build_engine()
