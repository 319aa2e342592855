"""Carried prior-component invariant: the engine carries the prior as
two components (lnP_tree / lnP_par) and recomputes per generation only
the component the selected move's prior_scope can touch (engine.py
`_chain_step`; role of the reference's per-move lnPriorRatio scoping,
src/proposal.c).  A move misclassified by the structural tree/params
split would leave a stale carried component — each test runs a block
and cross-checks BOTH carried components against exact recomputes.
The short Interpreter run additionally executes with MB_DEBUG_LNL=1,
which re-verifies the components at every sample boundary inside the
run loop.  The plain non-clock path is covered by
test_observability.test_debug_invariants_run; here the clock
(coalescent + IGR relaxed clock) and BEST (multispecies coalescent)
prior decompositions get the same treatment."""
import jax
import numpy as np

from mrbayes_tpu.cli import Interpreter
from conftest import example


def _engine_via_cli(tmp_path, lines, nchains=2):
    it = Interpreter(log=lambda m: None)
    for ln in lines:
        it.run_line(ln)
    pfx = str(tmp_path / "out")
    it.run_line(f"mcmc ngen=60 nruns=1 nchains={nchains} "
                f"samplefreq=30 printfreq=10000 diagnfreq=10000 "
                f"seed=31 swapseed=32 file={pfx}")
    return it._last_runner.eng


def _check_components(eng, n_gens=120):
    states, bk = eng.init_chains()
    states, bk = eng.run_block(states, bk, n_gens)
    view = {k: v for k, v in states.items()
            if k not in ("lnL", "lnP", "lnP_tree", "lnP_par")}
    lnpt = np.asarray(jax.vmap(eng.log_prior_tree)(view))
    lnpp = np.asarray(jax.vmap(eng.log_prior_params)(view))
    assert np.all(np.isfinite(lnpt)) and np.all(np.isfinite(lnpp))
    np.testing.assert_allclose(np.asarray(states["lnP_tree"]), lnpt,
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(states["lnP_par"]), lnpp,
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(states["lnP"]), lnpt + lnpp,
                               rtol=0, atol=1e-3)


def test_clock_prior_components(tmp_path, monkeypatch):
    """Relaxed-clock run: age/brate/popsize moves are tree-scoped,
    shape/pi/revmat moves params-scoped; stale carried components on
    either side would diverge from the recompute."""
    monkeypatch.setenv("MB_DEBUG_LNL", "1")
    eng = _engine_via_cli(tmp_path, [
        f"execute {example('primates.nex')}",
        "lset nst=6 rates=gamma",
        "prset brlenspr=clock:coalescence clockvarpr=igr",
    ])
    _check_components(eng)


def test_best_prior_components(tmp_path, monkeypatch):
    """BEST run: gene/species-tree and popsize moves are tree-scoped
    (popsize feeds the MSC density, not group_priors); generatepr adds
    a params-scoped gene-rate simplex on top."""
    monkeypatch.setenv("MB_DEBUG_LNL", "1")
    eng = _engine_via_cli(tmp_path, [
        f"execute {example('finch.nex')}",
        "prset generatepr=variable",
    ], nchains=1)
    _check_components(eng)
