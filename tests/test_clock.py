"""Clock-model tests: golden prior/likelihood vs the reference, move
validity, and short-run smoke for each tree prior x branch-rate model."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrbayes_tpu.data import DataSet, make_divisions
from mrbayes_tpu.mcmc.engine import Engine
from mrbayes_tpu.mcmc.settings import (DivisionSettings, McmcSettings,
                                       TreeSettings)
from mrbayes_tpu.trees import parse_newick, random_clock_tree

HERE = os.path.dirname(__file__)
GOLD = [r for r in json.load(open(os.path.join(HERE,
                                               "golden_primates.json")))
        if r["model"] == "clock_uniform_gtr_g"]


@pytest.fixture(scope="module")
def dataset(primates):
    return DataSet(taxa=primates.taxa, nchar=primates.matrix.nchar,
                   divisions=make_divisions(primates.matrix))


def _ages_from_tree(t):
    ages = np.zeros(t.n_nodes)
    for v in t.postorder():
        ages[v] = max(ages[t.left[v]] + t.blen[t.left[v]],
                      ages[t.right[v]] + t.blen[t.right[v]])
    return ages


@pytest.mark.parametrize("i", range(len(GOLD)))
def test_clock_golden(dataset, primates, i):
    rec = GOLD[i]
    ts = TreeSettings(clock=True, clockpr="uniform")
    eng = Engine(dataset, [DivisionSettings(nst="6", rates="gamma")],
                 tree_settings=ts, mcmc=McmcSettings(nruns=1, nchains=1))
    t = parse_newick(rec["newick"], primates.taxa, rooted=True)
    st = {"left": jnp.asarray(t.left), "right": jnp.asarray(t.right),
          "parent": jnp.asarray(t.parent),
          "age": jnp.asarray(_ages_from_tree(t), jnp.float32),
          "pi": jnp.asarray([rec["pi"]]),
          "revmat": jnp.asarray([rec["revmat"]]),
          "shape": jnp.asarray([rec["alpha"]])}
    lnL = float(eng.log_likelihood(st))
    lnP = float(eng.log_prior(st))
    assert abs(lnL - rec["lnL"]) < 0.2, (lnL, rec["lnL"])
    assert abs(lnP - rec["lnPrior"]) < 0.01, (lnP, rec["lnPrior"])


@pytest.mark.parametrize("clockpr,clockvar", [
    ("uniform", "strict"), ("uniform", "igr"), ("uniform", "iln"),
    ("uniform", "tk02"), ("uniform", "wn"), ("birthdeath", "strict"),
    ("coalescence", "strict"),
])
def test_clock_short_run(dataset, clockpr, clockvar):
    ts = TreeSettings(clock=True, clockpr=clockpr, clockvarpr=clockvar)
    eng = Engine(dataset, [DivisionSettings(nst="2", rates="equal")],
                 tree_settings=ts,
                 mcmc=McmcSettings(nruns=1, nchains=2, seed=13))
    states, bk = eng.init_chains()
    l0 = np.asarray(states["lnL"]).copy()
    states, bk = eng.run_block(states, bk, 150)
    l1 = np.asarray(states["lnL"])
    assert np.all(np.isfinite(l1))
    assert np.all(l1 > l0 - 50.0)       # burning in, not diverging
    # ultrametric consistency: parent older than children everywhere
    for s in range(2):
        age = np.asarray(states["age"][s])
        par = np.asarray(states["parent"][s])
        for v in range(len(par)):
            if par[v] >= 0:
                assert age[par[v]] >= age[v] - 1e-5


def test_clock_moves_preserve_structure(dataset):
    ts = TreeSettings(clock=True)
    eng = Engine(dataset, [DivisionSettings()], tree_settings=ts,
                 mcmc=McmcSettings(nruns=1, nchains=1, seed=3))
    states, bk = eng.init_chains()
    states, bk = eng.run_block(states, bk, 300)
    t = eng.extract_tree(states, 0)
    t.check()
    # effective blens nonnegative, root zero
    b = eng.effective_blens(states, 0)
    assert b[t.root] == 0.0
    assert np.all(b >= 0)


def test_random_clock_tree(rng):
    t, ages = random_clock_tree(10, rng)
    t.check()
    assert ages[t.root] == ages.max()
    for v in range(t.n_nodes - 1):
        assert ages[t.parent[v]] > ages[v] - 1e-12


def test_subtree_swap_clock_invariants(rng):
    """ExtSSClock analog: swaps keep a valid clock tree (parent ages
    above child ages), and the valid-pair-count Hastings is finite."""
    import jax
    import jax.numpy as jnp

    from mrbayes_tpu.mcmc.clock import move_subtree_swap_clock
    n = 8
    t, ages = random_clock_tree(n, rng)
    state = {"left": jnp.asarray(t.left), "right": jnp.asarray(t.right),
             "parent": jnp.asarray(t.parent),
             "age": jnp.asarray(ages, jnp.float32)}
    jfn = jax.jit(lambda k, s: move_subtree_swap_clock(
        k, s, jnp.float32(0.0), n_tips=n))
    changed = 0
    for i in range(50):
        new, lnh = jfn(jax.random.PRNGKey(i), state)
        if float(lnh) <= -1e29:
            continue
        assert np.isfinite(float(lnh))
        P = np.asarray(new["parent"])
        L = np.asarray(new["left"])
        R = np.asarray(new["right"])
        A = np.asarray(new["age"])
        # structural validity
        for v in range(2 * n - 2):
            assert L[P[v]] == v or R[P[v]] == v
            assert A[P[v]] > A[v] - 1e-7
        if not np.array_equal(P, np.asarray(state["parent"])):
            changed += 1
        state = new
    assert changed > 10


def test_local_clock_invariants(rng):
    """LOCAL for clock trees: joint 3-subtree reshuffle + age redraw
    keeps a valid clock tree; Hastings finite."""
    import jax
    import jax.numpy as jnp

    from mrbayes_tpu.mcmc.clock import move_local_clock
    n = 8
    t, ages = random_clock_tree(n, rng)
    state = {"left": jnp.asarray(t.left), "right": jnp.asarray(t.right),
             "parent": jnp.asarray(t.parent),
             "age": jnp.asarray(ages, jnp.float32)}
    jfn = jax.jit(lambda k, s: move_local_clock(
        k, s, jnp.float32(0.0), n_tips=n))
    changed = 0
    for i in range(60):
        new, lnh = jfn(jax.random.PRNGKey(100 + i), state)
        assert np.isfinite(float(lnh))
        P = np.asarray(new["parent"])
        L = np.asarray(new["left"])
        R = np.asarray(new["right"])
        A = np.asarray(new["age"])
        for v in range(2 * n - 2):
            assert L[P[v]] == v or R[P[v]] == v, (v, P[v], L[P[v]], R[P[v]])
            assert A[P[v]] > A[v] - 1e-7
        if not np.array_equal(P, np.asarray(state["parent"])):
            changed += 1
        state = new
    assert changed > 20


def test_pars_spr_clock_invariants(dataset, rng):
    """ParsSPRClock: Fitch-scored clock SPR keeps ages valid and mixes
    (reference Move_ParsSPRClock, src/proposal.c:11896)."""
    import jax
    import jax.numpy as jnp

    from mrbayes_tpu.mcmc.clock import make_pars_spr_clock_move
    ts = TreeSettings(clock=True)
    eng = Engine(dataset, [DivisionSettings(nst="1")], tree_settings=ts,
                 mcmc=McmcSettings(nruns=1, nchains=1, seed=3))
    fn = make_pars_spr_clock_move(eng._pars_masks, eng._pars_factors)
    n = eng.n_tips
    t, ages = random_clock_tree(n, rng)
    state = {"left": jnp.asarray(t.left), "right": jnp.asarray(t.right),
             "parent": jnp.asarray(t.parent),
             "age": jnp.asarray(ages, jnp.float32)}
    jfn = jax.jit(lambda k, s: fn(k, s, jnp.float32(0.2), n_tips=n))
    changed = 0
    for i in range(50):
        new, lnh = jfn(jax.random.PRNGKey(i), state)
        if float(lnh) <= -1e29:
            continue
        P = np.asarray(new["parent"])
        L = np.asarray(new["left"])
        R = np.asarray(new["right"])
        A = np.asarray(new["age"])
        for v in range(2 * n - 2):
            assert L[P[v]] == v or R[P[v]] == v
            assert A[P[v]] > A[v] - 1e-7
        if not np.array_equal(P, np.asarray(state["parent"])):
            changed += 1
        state = new
    assert changed > 25
