"""Default-on posterior regression guard: a fixed-seed 2k-generation
test1-style run (primates, GTR+I+G, 2 runs x 2 chains) on the CPU mesh
with wide statistical bands — cheap insurance between the 40-generation
smoke tests and the manual 20k-generation TPU envelope
(tests/envelope_check.py; reference band testing/runtests.sh.in:82-141
is [-5715, -5700] at 20k generations)."""
import numpy as np

from mrbayes_tpu.cli import Interpreter
from conftest import example


def test_short_chain_envelope(tmp_path):
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {example('primates.nex')}")
    it.run_line("lset nst=6 rates=invgamma")
    pfx = str(tmp_path / "guard")
    it.run_line(f"mcmc ngen=2000 nruns=2 nchains=2 samplefreq=100 "
                f"printfreq=10000 diagnfreq=1000 seed=17 swapseed=18 "
                f"file={pfx}")
    best = []
    for r in (1, 2):
        rows = [ln.split("\t") for ln in open(f"{pfx}.run{r}.p")
                if ln[:1].isdigit() or ln[:1] == "-"]
        lnl = np.array([float(x[1]) for x in rows])
        best.append(lnl.max())
    # wide band: catches likelihood-scale bugs (units, weights,
    # corrections) and dead mixing, tolerates MCMC noise at 2k gens
    for b in best:
        assert -5900.0 < b < -5640.0, best
    # the two runs must land in the same region
    assert abs(best[0] - best[1]) < 120.0, best
