"""Every reference example's mrbayes block must run verbatim.

The reference ships 9 curated datasets (examples/*.nex); their embedded
mrbayes command blocks are the de-facto acceptance test of the command
surface (NEXUS parsing, lset/prset/partition/constraint/speciespartition/
ctype/calibrate wiring).  Each file is executed UNCHANGED — the only
concession is the MB_MAX_NGEN generation cap (the files request up to 1e8
generations).  Files without an mcmc command get a short appended run so
the configured model is actually built and sampled.
"""
import os

import numpy as np
import pytest

from mrbayes_tpu.cli import Interpreter

from conftest import REF_EXAMPLES as EXAMPLES

# (file, run appended mcmc if the block doesn't run one, extra setup lines)
CASES = [
    ("primates.nex", True, ["lset nst=6 rates=invgamma"]),
    ("hym.nex", True, []),
    ("replicase.nex", True, []),
    ("kim.nex", True, []),
    ("cynmix.nex", True, ["set partition=favored",
                          "lset applyto=(1) rates=gamma",
                          "lset applyto=(2,3,4,5) rates=invgamma nst=6",
                          "unlink revmat=(all) pinvar=(all) shape=(all) "
                          "statefreq=(all)",
                          "prset applyto=(all) ratepr=variable"]),
    ("avian_ovomucoids.nex", True, []),
    ("codon.nex", True, []),
    ("finch.nex", True, []),
    # hymfossil's whole mrbayes block is commented out with a top-level
    # [ ... ] (the reference reads only the data); the documented model is
    # driven explicitly in test_hymfossil_total_evidence below
    ("hymfossil.nex", True, []),
]


@pytest.mark.parametrize("fname,append_mcmc,extra",
                         [(c[0], c[1], c[2]) for c in CASES],
                         ids=[c[0] for c in CASES])
def test_example_runs_verbatim(fname, append_mcmc, extra, tmp_path,
                               monkeypatch):
    monkeypatch.setenv("MB_MAX_NGEN", "40")
    monkeypatch.chdir(tmp_path)
    logs = []
    interp = Interpreter(log=logs.append)
    interp.execute_file(os.path.join(EXAMPLES, fname))
    for line in extra:
        interp.run_line(line, base_dir=EXAMPLES)
    if append_mcmc:
        prefix = str(tmp_path / fname)
        interp.run_line(
            f"mcmcp ngen=40 nruns=1 nchains=2 samplefreq=20 printfreq=20 "
            f"diagnfreq=40 checkfreq=0 filename={prefix}")
        interp.run_line("mcmc")
    else:
        prefix = interp.env.mcmc.filename
    joined = "\n".join(logs)
    assert "Analysis completed" in joined
    # sane outputs: .p file exists with finite lnL samples
    pfile = f"{prefix}.run1.p"
    assert os.path.exists(pfile), f"missing {pfile}"
    with open(pfile) as f:
        lines = f.readlines()
    assert len(lines) >= 3
    header = lines[1].split("\t")
    assert header[0] == "Gen" and header[1] == "lnLike"
    last = lines[-1].split("\t")
    lnl = float(last[1])
    assert np.isfinite(lnl) and lnl < 0.0


def test_finch_best_wiring(tmp_path, monkeypatch):
    """finch.nex enables BEST end-to-end from NEXUS: species partition,
    speciestree topology prior, variable theta — and the run samples a
    species tree plus per-gene trees."""
    monkeypatch.setenv("MB_MAX_NGEN", "40")
    monkeypatch.chdir(tmp_path)
    logs = []
    interp = Interpreter(log=logs.append)
    interp.execute_file(os.path.join(EXAMPLES, "finch.nex"))
    ts = interp.env.tree_settings
    assert ts.speciestree
    assert interp.env.current_speciespartition == "test"
    prefix = str(tmp_path / "finch")
    interp.run_line(
        f"mcmcp ngen=40 nruns=1 nchains=2 samplefreq=20 printfreq=40 "
        f"checkfreq=0 filename={prefix}")
    interp.run_line("mcmc")
    eng = interp._last_runner.eng
    assert eng.best and eng.n_species == 4 and eng.n_div == 30
    # species-tree samples (4 species) and per-gene tree files
    with open(f"{prefix}.run1.t") as f:
        txt = f.read()
    assert txt.count("tree gen.") >= 2
    assert os.path.exists(f"{prefix}.run1.gene1.t")
    assert os.path.exists(f"{prefix}.run1.gene30.t")
    with open(f"{prefix}.run1.gene1.t") as f:
        gtxt = f.read()
    assert gtxt.count("tree gen.") >= 2


HYMFOSSIL_SETUP = [
    # the (commented-out) partitioned model of the hymfossil mrbayes block
    "charset MV = 1-236", "charset MS = 237-353",
    "charset 12S = 354-556", "charset 16S = 557-778",
    "charset 18S = 779-1669", "charset 28S = 1670-2221",
    "charset CO1 = 2222-3265",
    "charset CO1_12 = 2222-3265\\3 2223-3265\\3",
    "charset CO1_3 = 2224-3265\\3",
    "charset Ef1aF2 = 3266-4357",
    "charset Ef1aF2_12 = 3266-4357\\3 3267-4357\\3",
    "charset Ef1aF2_3 = 3268-4357\\3",
    "charset Ef1aF1 = 4358-5449",
    "charset Ef1aF1_12 = 4358-5449\\3 4359-5449\\3",
    "charset Ef1aF1_3 = 4360-5449\\3",
    "charset morph_ordered = 20 23 27 30 35 36 41 42 44 46 48 59 65 75 78 "
    "79 89 99 112 117 134 146 157 159 171 185 191 192 193 196 218 228 229 "
    "230 237 263 266 288 296 299 304 343 347 349",
    "charset morph_excluded = 96 136 212 216 217 218 219 220",
    "charset morph_constant = 277 331",
    "ctype ordered: morph_ordered",
    "exclude morph_excluded morph_constant",
    "partition without_CO1_3 = 7: MV MS, 12S 16S, 18S, 28S, "
    "CO1_12 CO1_3, Ef1aF1_12 Ef1aF2_12, Ef1aF1_3 Ef1aF2_3",
    "exclude CO1_3",
    "set partition = without_CO1_3",
    "lset applyto=(1) coding=variable rates=gamma",
    "lset applyto=(2,3,5,6,7) nucmodel=4by4 nst=6 rates=gamma covarion=no",
    "lset applyto=(4) nucmodel=4by4 nst=6 rates=gamma covarion=no",
    "prset applyto=(4) statefreqpr=fixed(equal)",
    "unlink statefreq=(all) revmat=(all) shape=(all)",
    "prset applyto=(all) ratepr=variable",
    "outgroup Orthoptera",
]


def test_hymfossil_total_evidence(tmp_path, monkeypatch):
    """The documented hymfossil partitioned model (morphology with ordered
    characters + 6 DNA subsets) builds and the ordered characters land in
    ordered-Mk divisions."""
    from mrbayes_tpu.mcmc.run import McmcRunner
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(McmcRunner, "run", lambda self: None)
    logs = []
    interp = Interpreter(log=logs.append)
    interp.execute_file(os.path.join(EXAMPLES, "hymfossil.nex"))
    for line in HYMFOSSIL_SETUP:
        interp.run_line(line)
    interp.run_line("mcmc ngen=10 nruns=1 nchains=1")
    eng = interp._last_runner.eng
    ordered = [d for d in eng.data.divisions if d.ctype == "ordered"]
    assert ordered, "no ordered divisions built from ctype ordered"
    assert all(d.n_states > 2 for d in ordered)
    assert eng.ratemult_on
