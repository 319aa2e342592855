"""Steppingstone checkpoint/resume: kill a run mid-ladder, resume from
the .ckp, and the final lnZ must match an uninterrupted run (reference
stores SS accumulators in the checkpoint and resumes mid-ladder,
src/mcmc.c:11253-11282 + append logic :2449-2490)."""
import numpy as np
import pytest

from mrbayes_tpu.cli import Interpreter
from mrbayes_tpu.mcmc.steppingstone import SsRunner
from conftest import example


class _Killed(Exception):
    pass


def _engine(append=False):
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {example('primates.nex')}")
    it.run_line("lset nst=1 rates=equal")
    it.run_line(f"mcmcp ngen=160 nruns=1 nchains=1 samplefreq=10 "
                f"printfreq=1000 checkfreq=10 "
                f"append={'yes' if append else 'no'} seed=99 swapseed=98")
    return it.build_engine()


def test_ss_resume_matches_uninterrupted(tmp_path):
    # uninterrupted reference run
    a = SsRunner(_engine(), nsteps=4, burninss=-1, log=lambda m: None,
                 file_prefix=str(tmp_path / "full"))
    lnZ_full = a.run_ss()

    # interrupted run: die after the 6th sample boundary (mid-step)
    b = SsRunner(_engine(), nsteps=4, burninss=-1, log=lambda m: None,
                 file_prefix=str(tmp_path / "part"))
    orig = b._write_sample
    n = {"c": 0}

    def dying(gen, states, bk):
        orig(gen, states, bk)
        n["c"] += 1
        if n["c"] >= 6:
            raise _Killed()

    b._write_sample = dying
    with pytest.raises(_Killed):
        b.run_ss()

    # resume and finish
    logs = []
    c = SsRunner(_engine(append=True), nsteps=4, burninss=-1,
                 log=logs.append, file_prefix=str(tmp_path / "part"))
    lnZ_res = c.run_ss()
    assert any("Resuming steppingstone" in ln for ln in logs)
    np.testing.assert_allclose(lnZ_res, lnZ_full, atol=2e-3)
    # the .ss ladder is complete and identical row count
    rows_full = [ln for ln in open(tmp_path / "full.ss")
                 if ln[0].isdigit()]
    rows_res = [ln for ln in open(tmp_path / "part.ss")
                if ln[0].isdigit()]
    assert len(rows_full) == len(rows_res) == 4
