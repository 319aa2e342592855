"""CPP relaxed clock + clockvarpr=mixed (reference Move_AddDeleteCPPEvent
src/proposal.c:174, UpdateCppEvolLength src/model.c:25923,
Move_RelaxedClockModel src/proposal.c:6189)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import example
from mrbayes_tpu.mcmc.clock import (clock_blens, cpp_branch_multipliers,
                                    ln_branch_rates_prior, ln_cpp_prior)


def _manual_effective(parent, events, n_nodes):
    """Reference recursion re-implemented in plain python: events[v] =
    [(pos, mult), ...] (pos measured from the tipward end)."""
    logs = {v: sum(np.log(m) for _, m in evs) for v, evs in events.items()}

    def base(v):
        out = 0.0
        p = parent[v]
        while p >= 0:
            out += logs.get(p, 0.0)
            p = parent[p]
        return np.exp(out)

    r = np.ones(n_nodes)
    for v in range(n_nodes):
        evs = sorted(events.get(v, []))
        if evs:
            L = evs[0][0] * evs[0][1]
            for i in range(1, len(evs)):
                L += evs[i][0] - evs[i - 1][0]
                L *= evs[i][1]
            L += 1.0 - evs[-1][0]
        else:
            L = 1.0
        r[v] = base(v) * L
    return r


def _chain_state(n_tips=4, K=4):
    """Simple 4-tip clock tree as arrays."""
    n_nodes = 2 * n_tips - 1
    parent = np.array([4, 4, 5, 6, 5, 6, -1])
    left = np.array([-1, -1, -1, -1, 0, 4, 5])
    right = np.array([-1, -1, -1, -1, 1, 2, 3])
    age = np.array([0.0, 0.0, 0.0, 0.0, 1.0, 2.0, 3.0])
    st = {"parent": jnp.asarray(parent), "left": jnp.asarray(left),
          "right": jnp.asarray(right), "age": jnp.asarray(age, jnp.float32),
          "cpp_n": jnp.zeros(n_nodes, jnp.int32),
          "cpp_pos": jnp.full((n_nodes, K), 0.5, jnp.float32),
          "cpp_mult": jnp.ones((n_nodes, K), jnp.float32)}
    return st, parent, n_nodes


def test_cpp_effective_lengths_match_reference_recursion():
    st, parent, n_nodes = _chain_state()
    # events: two on branch 4 (unsorted slots), one on branch 2
    events = {4: [(0.7, 2.0), (0.3, 0.5)], 2: [(0.4, 3.0)]}
    st["cpp_n"] = st["cpp_n"].at[4].set(2).at[2].set(1)
    st["cpp_pos"] = st["cpp_pos"].at[4, 0].set(0.7).at[4, 1].set(0.3) \
                                 .at[2, 0].set(0.4)
    st["cpp_mult"] = st["cpp_mult"].at[4, 0].set(2.0).at[4, 1].set(0.5) \
                                   .at[2, 0].set(3.0)
    r = np.asarray(cpp_branch_multipliers(
        st["parent"], st["cpp_pos"], st["cpp_mult"], st["cpp_n"]))
    want = _manual_effective(parent, events, n_nodes)
    np.testing.assert_allclose(r, want, rtol=1e-5)
    # no events anywhere -> strict clock
    st0, _, _ = _chain_state()
    r0 = np.asarray(cpp_branch_multipliers(
        st0["parent"], st0["cpp_pos"], st0["cpp_mult"], st0["cpp_n"]))
    np.testing.assert_allclose(r0, 1.0, rtol=1e-6)
    # derived branch lengths honor the multipliers
    blen = np.asarray(clock_blens(st, 4, "cpp"))
    dt = np.array([1.0, 1.0, 2.0, 3.0, 1.0, 1.0, 0.0])
    np.testing.assert_allclose(blen, dt * want * [1, 1, 1, 1, 1, 1, 0],
                               rtol=1e-5)


def test_cpp_prior_density_golden():
    """exp(-lam L) lam^k prod LN(m; 0, sigma) summed over branches — the
    density whose add/delete ratio is lam * f(m)
    (src/proposal.c:286-293)."""
    from scipy.stats import lognorm
    st, parent, n_nodes = _chain_state()
    st["cpp_n"] = st["cpp_n"].at[4].set(2).at[2].set(1)
    st["cpp_mult"] = st["cpp_mult"].at[4, 0].set(2.0).at[4, 1].set(0.5) \
                                   .at[2, 0].set(3.0)
    lam, sigma = 1.7, 0.4
    got = float(ln_cpp_prior(st, 4, lam, sigma))
    L = np.array([1.0, 1.0, 2.0, 3.0, 1.0, 1.0])   # non-root strict blens
    want = -lam * L.sum() + 3 * np.log(lam)
    for m in (2.0, 0.5, 3.0):
        want += lognorm.logpdf(m, s=sigma, scale=1.0)
    assert got == pytest.approx(want, rel=1e-5)


def test_mixed_prior_switches_between_igr_and_iln():
    from scipy.stats import gamma as sgamma
    st, parent, n_nodes = _chain_state()
    rng = np.random.default_rng(0)
    rates = rng.uniform(0.5, 2.0, n_nodes)
    st["brate"] = jnp.asarray(rates, jnp.float32)
    var = 0.3
    st["rcl_model"] = jnp.zeros((1,), jnp.int32)
    got_igr = float(ln_branch_rates_prior(st, 4, "mixed", var))
    st["rcl_model"] = jnp.ones((1,), jnp.int32)
    got_iln = float(ln_branch_rates_prior(st, 4, "mixed", var))
    # IGR: Gamma(1/var, rate 1/var); ILN: lognormal natural mean 1 var v
    a = 1.0 / var
    want_igr = sum(sgamma.logpdf(r, a, scale=1.0 / a) for r in rates[:-1])
    s2 = np.log1p(var)
    mu = -0.5 * s2
    want_iln = sum(-np.log(r) - 0.5 * np.log(2 * np.pi * s2)
                   - (np.log(r) - mu) ** 2 / (2 * s2) for r in rates[:-1])
    assert got_igr == pytest.approx(want_igr, rel=1e-4)
    assert got_iln == pytest.approx(want_iln, rel=1e-4)
    assert got_igr != pytest.approx(got_iln, rel=1e-3)


@pytest.mark.parametrize("clockvar", ["cpp", "mixed"])
def test_cpp_and_mixed_smoke_run(clockvar, tmp_path, monkeypatch):
    """Short primates clock run with the CPP / mixed relaxed clock from
    the NEXUS surface; events/indicator columns appear and move."""
    monkeypatch.chdir(tmp_path)
    from mrbayes_tpu.cli import Interpreter
    logs = []
    interp = Interpreter(log=logs.append)
    interp.execute_file(example("primates.nex"))
    prefix = str(tmp_path / f"pm_{clockvar}")
    interp.run_line("prset brlenspr=clock:uniform")
    interp.run_line(f"prset clockvarpr={clockvar}")
    interp.run_line(f"mcmc ngen=300 nruns=1 nchains=2 samplefreq=50 "
                    f"printfreq=300 checkfreq=0 filename={prefix}")
    with open(f"{prefix}.run1.p") as f:
        lines = f.read().splitlines()
    header = lines[1].split("\t")
    col = "nEvents" if clockvar == "cpp" else "rclModel"
    assert col in header
    j = header.index(col)
    vals = [float(ln.split("\t")[j]) for ln in lines[2:]]
    lnls = [float(ln.split("\t")[1]) for ln in lines[2:]]
    assert all(np.isfinite(v) for v in lnls)
    if clockvar == "cpp":
        assert max(vals) >= 0.0     # counts well-defined
    assert "Analysis completed" in "\n".join(logs)
