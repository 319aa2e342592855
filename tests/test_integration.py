"""End-to-end integration test mirroring the reference CI harness
(testing/runtests.sh.in): run a short partitioned analysis through the CLI
and check the output files and convergence statistics.  Short-chain
envelopes are looser than the reference's 20k-generation ones."""
import os

import numpy as np
import pytest

from mrbayes_tpu.cli import Interpreter
from conftest import example

SCRIPT = """#NEXUS
begin mrbayes;
    set autoclose=yes nowarnings=yes seed=42 swapseed=24;
    execute "{primates}";
    partition test = 2: 1-400, 401-.;
    set partition=test;
    lset nst=6 rates=invgamma;
    unlink statefr=(all) revmat=(all) pinvar=(all) shape=(all);
    prset ratepr=variable;
    mcmc ngen=1500 nruns=2 nchains=2 samplefreq=50 printfreq=500
         diagnfreq=500 file={prefix};
    sump;
    sumt;
end;
"""


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mcmcrun")
    script = d / "run.nex"
    script.write_text(SCRIPT.format(
        primates=example("primates.nex"),
        prefix=str(d / "out")))
    lines = []
    interp = Interpreter(log=lines.append)
    cwd = os.getcwd()
    os.chdir(d)
    try:
        interp.execute_file(str(script))
    finally:
        os.chdir(cwd)
    return d, lines


def test_outputs_exist(run_dir):
    d, _ = run_dir
    for r in (1, 2):
        assert (d / f"out.run{r}.p").exists()
        assert (d / f"out.run{r}.t").exists()
    for ext in ("mcmc", "ckp", "pstat", "con.tre", "parts", "tstat",
                "vstat", "trprobs", "lstat"):
        assert (d / f"out.{ext}").exists(), ext


def test_analysis_completed_once(run_dir):
    _, lines = run_dir
    completed = [ln for ln in lines if "Analysis completed" in ln]
    assert len(completed) == 1


def test_lnl_moves_toward_envelope(run_dir):
    _, lines = run_dir
    best = [float(ln.rsplit("was", 1)[1]) for ln in lines
            if "Likelihood of best state" in ln]
    assert len(best) == 2
    # 1500 gens from a random tree: must be well on the way to
    # [-5715,-5700] (start is ~-9000; the strict posterior check is the
    # 20k-generation envelope run, tests/envelope_check.py)
    assert all(b > -5950 for b in best), best


def test_sample_files_parse(run_dir):
    d, _ = run_dir
    from mrbayes_tpu.summarize.sump import read_p_file
    hdr, rows = read_p_file(str(d / "out.run1.p"))
    assert hdr[0] == "Gen" and "lnLike" in hdr
    assert rows.shape[0] >= 30
    # per-division columns present (unlinked model)
    assert any("{1}" in h for h in hdr) and any("{2}" in h for h in hdr)
    assert any(h.startswith("m{") for h in hdr)


def test_asdsf_and_psrf_reported(run_dir):
    _, lines = run_dir
    asdsf = [ln for ln in lines
             if "Average standard deviation of split frequencies" in ln]
    assert asdsf
    psrf = [ln for ln in lines if "Average PSRF" in ln]
    assert len(psrf) == 1


def test_consensus_tree_readable(run_dir):
    d, _ = run_dir
    from mrbayes_tpu.nexus.parser import read_nexus_file
    nf = read_nexus_file(str(d / "out.con.tre"))
    assert len(nf.trees) == 1
    assert len(nf.translate) == 12


def test_checkpoint_resume(run_dir):
    d, lines = run_dir
    # resume for 200 more generations via append
    lines2 = []
    from mrbayes_tpu.mcmc.run import McmcRunner
    interp2 = Interpreter(log=lines2.append)
    interp2.execute_file(example("primates.nex"))
    interp2.env.mcmc.filename = str(d / "out")
    interp2.env.mcmc.append = True
    interp2.env.mcmc.ngen = 1700
    interp2.env.mcmc.nruns = 2
    interp2.env.mcmc.nchains = 2
    interp2.env.mcmc.samplefreq = 50
    # rebuild same model: partitioned like the original run
    interp2.env.partitions["test"] = [list(range(0, 400)),
                                      list(range(400, 898))]
    interp2.env.current_partition = "test"
    interp2.env.ensure_div_settings()
    for s in interp2.env.div_settings:
        s.nst = "6"
        s.rates = "invgamma"
        s.ratepr = "variable"
    interp2.env.links = {p: [1, 2] for p in ("pi", "revmat", "pinvar",
                                             "shape")}
    eng = interp2.build_engine()
    runner = McmcRunner(eng, log=lines2.append)
    states, bk = runner.run()
    assert int(bk["gen"]) == 1700
    resumed = [ln for ln in lines2 if "Resuming from checkpoint" in ln]
    assert resumed
