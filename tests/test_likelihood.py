import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrbayes_tpu.data import make_divisions
from mrbayes_tpu.models.rates import discrete_gamma
from mrbayes_tpu.models.substitution import nuc_q_gtr, nuc_q_nst1, nuc_q_nst2
from mrbayes_tpu.ops.pruning import constant_state_mask, division_loglik
from mrbayes_tpu.ops.tiprobs import eigh_reversible, expm_pade, transition_probs
from mrbayes_tpu.ops.traversal import node_depths, postorder_internal, subtree_mask
from mrbayes_tpu.trees import parse_newick, random_unrooted, to_newick

import reference_impl as ref


def test_q_properties():
    pi = jnp.array([0.3, 0.2, 0.25, 0.25])
    ex = jnp.array([1.0, 4.0, 1.0, 1.0, 4.0, 1.0])
    Q = nuc_q_gtr(ex, pi)
    assert np.allclose(np.asarray(Q).sum(1), 0, atol=1e-6)
    # normalization: -sum pi_i Q_ii == 1
    assert np.isclose(-(np.asarray(pi) * np.diag(Q)).sum(), 1.0, atol=1e-6)
    # detailed balance
    Qn = np.asarray(Q)
    pin = np.asarray(pi)
    assert np.allclose(pin[:, None] * Qn, (pin[:, None] * Qn).T, atol=1e-6)
    # matches oracle
    assert np.allclose(Qn, ref.gtr_q(np.asarray(ex), pin), atol=1e-6)


def test_tiprobs_identities():
    pi = jnp.array([0.1, 0.2, 0.3, 0.4])
    ex = jnp.array([1.0, 2.0, 0.5, 1.2, 3.0, 1.0])
    Q = nuc_q_gtr(ex, pi)
    lam, U, Uinv = eigh_reversible(Q, pi)
    P0 = transition_probs(lam, U, Uinv, jnp.array(0.0))
    assert np.allclose(P0, np.eye(4), atol=1e-5)
    P = transition_probs(lam, U, Uinv, jnp.array(0.37))
    assert np.allclose(np.asarray(P).sum(-1), 1.0, atol=1e-5)
    # vs expm
    from scipy.linalg import expm as sexpm
    assert np.allclose(np.asarray(P), sexpm(np.asarray(Q) * 0.37), atol=1e-5)
    # our pade
    Pp = expm_pade(Q * 0.37)
    assert np.allclose(np.asarray(Pp), sexpm(np.asarray(Q) * 0.37), atol=1e-4)
    # detailed balance of P
    Pn = np.asarray(P)
    pin = np.asarray(pi)
    assert np.allclose(pin[:, None] * Pn, (pin[:, None] * Pn).T, atol=1e-5)


def test_discrete_gamma_vs_scipy():
    for alpha in [0.1, 0.5, 1.0, 2.7, 10.0]:
        r = np.asarray(discrete_gamma(jnp.float32(alpha), 4))
        r_ref = ref.discrete_gamma_rates(alpha, 4)
        assert np.allclose(r, r_ref, rtol=2e-3), (alpha, r, r_ref)
        assert np.isclose(r.mean(), 1.0, atol=1e-3)


def test_traversal(rng):
    t = random_unrooted(16, rng)
    order = np.asarray(postorder_internal(jnp.array(t.parent), 16))
    seen = set(range(16))
    for v in order:
        assert t.left[v] in seen and t.right[v] in seen
        seen.add(int(v))
    assert order[-1] == t.root
    d = np.asarray(node_depths(jnp.array(t.parent)))
    assert d[t.root] == 0
    for v in range(t.n_nodes):
        if t.parent[v] >= 0:
            assert d[v] == d[t.parent[v]] + 1
    # subtree mask
    v = t.left[t.left[t.root]]
    mask = np.asarray(subtree_mask(jnp.array(t.parent), v))
    for w in range(t.n_nodes):
        expect = False
        x = w
        while x >= 0:
            if x == v:
                expect = True
                break
            x = t.parent[x]
        assert mask[w] == expect


def test_newick_roundtrip(rng):
    taxa = [f"t{i}" for i in range(9)]
    t = random_unrooted(9, rng)
    s = to_newick(t, taxa)
    t2 = parse_newick(s, taxa)
    # same unrooted splits: compare sorted pairs of (sorted tip sets)
    def splits(tr):
        out = set()
        for v in range(tr.n_tips, tr.n_nodes - 1):
            tips = frozenset(
                i for i in range(tr.n_tips)
                if _has_anc(tr, i, v))
            if 1 < len(tips) < tr.n_tips - 1:
                out.add(tips)
        return out

    def _has_anc(tr, i, v):
        x = i
        while x >= 0:
            if x == v:
                return True
            x = tr.parent[x]
        return False

    assert splits(t) == splits(t2)
    # branch lengths preserved: total tree length
    from mrbayes_tpu.trees import tree_length
    assert np.isclose(tree_length(t), tree_length(t2), rtol=1e-6)


@pytest.mark.parametrize("n_tips,K,pinv", [(5, 1, 0.0), (12, 4, 0.0),
                                           (8, 4, 0.3)])
def test_loglik_vs_oracle(rng, n_tips, K, pinv):
    # random data + tree; compare traced engine vs float64 numpy oracle
    npat = 40
    patterns = rng.integers(1, 15, size=(n_tips, npat)).astype(np.uint32)
    weights = rng.integers(1, 5, size=npat).astype(np.float64)
    bits = (patterns[..., None] >> np.arange(4)) & 1
    tp = bits.astype(np.float32)
    t = random_unrooted(n_tips, rng)
    pi = np.array([0.35, 0.15, 0.2, 0.3])
    ex = np.array([1.0, 3.5, 0.8, 1.1, 4.2, 1.0])
    alpha = 0.7
    rates = (ref.discrete_gamma_rates(alpha, K) if K > 1 else np.ones(1))
    Q = ref.gtr_q(ex, pi)
    cmask = constant_state_mask(patterns, 4)
    want = ref.loglik(t, tp.astype(np.float64), weights, Q, pi, rates,
                      pinv=pinv, const_mask=cmask.astype(np.float64))

    lam, U, Uinv = eigh_reversible(jnp.array(Q, jnp.float32),
                                   jnp.array(pi, jnp.float32))
    got = division_loglik(
        jnp.array(t.left), jnp.array(t.right), jnp.array(t.parent),
        jnp.array(t.blen, jnp.float32), jnp.array(tp),
        jnp.array(weights, jnp.float32), lam, U, Uinv,
        jnp.array(pi, jnp.float32),
        jnp.array(rates, jnp.float32), pinv,
        jnp.array(cmask) if pinv > 0 else None, n_tips)
    assert np.isclose(float(got), want, rtol=0, atol=0.02 + 2e-5 * abs(want))


def test_loglik_jit_and_vmap(rng, primates):
    d = make_divisions(primates.matrix)[0]
    tp = jnp.array(d.tip_partials())
    w = jnp.array(d.weights, jnp.float32)
    pi = jnp.full((4,), 0.25)
    Q = nuc_q_nst1(pi)
    lam, U, Uinv = eigh_reversible(Q, pi)
    rates = jnp.ones((1,))

    def ll(blen):
        t = random_unrooted(12, np.random.default_rng(0))
        return division_loglik(
            jnp.array(t.left), jnp.array(t.right), jnp.array(t.parent),
            blen, tp, w, lam, U, Uinv, pi, rates, 0.0, None, 12)

    t0 = random_unrooted(12, np.random.default_rng(0))
    f = jax.jit(ll)
    v1 = f(jnp.array(t0.blen, jnp.float32))
    # vmap over a batch of branch-length vectors (chains analog)
    batch = jnp.stack([jnp.array(t0.blen, jnp.float32) * s
                       for s in (0.5, 1.0, 2.0)])
    v3 = jax.vmap(ll)(batch)
    assert v3.shape == (3,)
    assert np.isclose(float(v3[1]), float(v1), rtol=1e-5)
    assert float(v1) < 0


def test_covarion_vs_oracle(rng):
    """Tuffley-Steel covarion (8-state) engine likelihood vs a float64
    numpy oracle built directly from the reference's Q construction
    (src/likelihood.c:8269-8420): per-category substitution block scaled
    by the gamma rate, switch rates unscaled."""
    from scipy.linalg import expm

    from mrbayes_tpu.models.substitution import covarion_q

    n_tips, npat, K = 7, 30, 4
    patterns = rng.integers(1, 15, size=(n_tips, npat)).astype(np.uint32)
    weights = rng.integers(1, 5, size=npat).astype(np.float64)
    bits = (patterns[..., None] >> np.arange(4)) & 1
    tp4 = bits.astype(np.float64)
    t = random_unrooted(n_tips, rng)
    pi = np.array([0.35, 0.15, 0.2, 0.3])
    ex = np.array([1.0, 3.5, 0.8, 1.1, 4.2, 1.0])
    alpha, s01, s10 = 0.7, 1.8, 0.6
    rates = ref.discrete_gamma_rates(alpha, K)
    Q4 = ref.gtr_q(ex, pi)

    # oracle: per-category 8x8 expm pruning in float64
    prob_on = s01 / (s01 + s10)
    pic = np.r_[pi * prob_on, pi * (1 - prob_on)]
    tp8 = np.concatenate([tp4, tp4], axis=-1)
    P = np.zeros((t.n_nodes, K, 8, 8))
    for c in range(K):
        off = (rates[c] / prob_on) * Q4 * (1 - np.eye(4))
        top = np.hstack([off - np.diag(off.sum(1) + s10), np.eye(4) * s10])
        bot = np.hstack([np.eye(4) * s01, -np.eye(4) * s01])
        Qc = np.vstack([top, bot])
        for v in range(t.n_nodes):
            P[v, c] = expm(Qc * t.blen[v])
    cl = np.zeros((t.n_nodes, npat, K, 8))
    cl[:n_tips] = tp8[:, :, None, :]
    for v in t.postorder():
        l, r = t.left[v], t.right[v]
        cl[v] = (np.einsum("ksj,pkj->pks", P[l], cl[l])
                 * np.einsum("ksj,pkj->pks", P[r], cl[r]))
    site = np.einsum("pks,s->p", cl[t.root], pic) / K
    want = float((weights * np.log(site)).sum())

    # traced path: covarion_q + batched eigh + division_loglik
    Qc_j, pic_j = jax.vmap(
        lambda r: covarion_q(jnp.asarray(Q4, jnp.float32),
                             jnp.asarray(pi, jnp.float32),
                             jnp.float32(s01), jnp.float32(s10), r))(
        jnp.asarray(rates, jnp.float32))
    lam, U, Uinv = eigh_reversible(Qc_j, pic_j[0])
    got = division_loglik(
        jnp.array(t.left), jnp.array(t.right), jnp.array(t.parent),
        jnp.array(t.blen, jnp.float32), jnp.array(tp8, jnp.float32),
        jnp.array(weights, jnp.float32), lam, U, Uinv, pic_j[0],
        jnp.ones((K,)), 0.0, None, n_tips)
    assert np.isclose(float(got), want, rtol=0, atol=0.02 + 2e-5 * abs(want))


def test_covarion_engine_end_to_end(primates):
    """Engine wiring: covarion division builds, samples switch rates, and
    returns finite lnL/lnP for the initial chains."""
    from mrbayes_tpu.data import DataSet
    from mrbayes_tpu.mcmc.engine import Engine
    from mrbayes_tpu.mcmc.settings import DivisionSettings, McmcSettings

    ds = DataSet(taxa=primates.taxa, nchar=primates.matrix.nchar,
                 divisions=make_divisions(primates.matrix))
    eng = Engine(ds, [DivisionSettings(nst="2", rates="gamma", ngammacat=4,
                                       covarion=True)],
                 mcmc=McmcSettings(nruns=1, nchains=2, ngen=100, seed=5))
    states, bk = eng.init_chains()
    assert "covswitch" in states
    assert np.all(np.isfinite(np.asarray(states["lnL"])))
    states, bk = eng.run_block(states, bk, 20)
    assert np.all(np.isfinite(np.asarray(states["lnL"])))


def test_doublet_vs_oracle(rng):
    """16-state doublet generator and engine likelihood vs float64 expm
    pruning (reference: src/likelihood.c 16x16 branch; pairs command
    src/command.c:5599)."""
    from scipy.linalg import expm

    from mrbayes_tpu.models.substitution import (_doublet_class_table,
                                                 doublet_q)

    # Q properties
    r6 = np.array([1.0, 3.0, 0.7, 1.2, 3.5, 1.0])
    pi16 = rng.dirichlet(np.ones(16) * 5)
    Qj = doublet_q(jnp.asarray(r6, jnp.float32), jnp.asarray(pi16,
                                                             jnp.float32))
    Q = np.asarray(Qj, np.float64)
    assert np.allclose(Q.sum(1), 0, atol=1e-5)
    assert np.isclose(-(pi16 * np.diag(Q)).sum(), 1.0, atol=1e-5)
    assert np.allclose(pi16[:, None] * Q, (pi16[:, None] * Q).T, atol=1e-6)
    cls = _doublet_class_table()
    # both-change pairs have rate 0; single-change rate r[k]*pi_j
    i, j = 0, 5          # AA -> CC: both change
    assert Q[i, j] == 0.0
    i, j = 0, 4          # AA -> CA: first position A->C = class 0
    assert cls[i, j] == 0

    # pruning vs oracle on random doublet data
    n_tips, npat = 6, 25
    tp = (rng.random((n_tips, npat, 16)) < 0.3).astype(np.float64)
    tp[..., 0] = 1.0     # ensure nonzero
    w = rng.integers(1, 4, size=npat).astype(np.float64)
    t = random_unrooted(n_tips, rng)
    P = {v: expm(Q * t.blen[v]) for v in range(t.n_nodes)}
    cl = {v: tp[v][:, None, :] for v in range(n_tips)}
    for v in t.postorder():
        l, r = t.left[v], t.right[v]
        cl[v] = (np.einsum("sj,pkj->pks", P[l], cl[l])
                 * np.einsum("sj,pkj->pks", P[r], cl[r]))
    site = np.einsum("pks,s->p", cl[t.root], pi16)
    want = float((w * np.log(site)).sum())
    lam, U, Uinv = eigh_reversible(Qj, jnp.asarray(pi16, jnp.float32))
    got = division_loglik(
        jnp.array(t.left), jnp.array(t.right), jnp.array(t.parent),
        jnp.array(t.blen, jnp.float32), jnp.array(tp, jnp.float32),
        jnp.array(w, jnp.float32), lam, U, Uinv,
        jnp.array(pi16, jnp.float32), jnp.ones((1,)), 0.0, None, n_tips)
    assert np.isclose(float(got), want, rtol=0, atol=0.05 + 2e-5 * abs(want))


def test_doublet_engine_end_to_end(primates):
    """nucmodel=doublet end to end: pairs wiring, pi16 sampling, finite
    likelihoods."""
    from mrbayes_tpu.data import DataSet
    from mrbayes_tpu.mcmc.engine import Engine
    from mrbayes_tpu.mcmc.settings import DivisionSettings, McmcSettings

    nchar = primates.matrix.nchar
    n_use = 60   # 30 pairs, small and fast
    pairs = tuple((i, i + n_use // 2) for i in range(n_use // 2))
    part = [list(range(n_use))]
    ds = DataSet(taxa=primates.taxa, nchar=nchar,
                 divisions=make_divisions(primates.matrix, part))
    eng = Engine(ds, [DivisionSettings(nst="6", rates="gamma", ngammacat=4,
                                       nucmodel="doublet", pairs=pairs)],
                 mcmc=McmcSettings(nruns=1, nchains=2, ngen=100, seed=5))
    states, bk = eng.init_chains()
    assert "pi16" in states
    assert np.all(np.isfinite(np.asarray(states["lnL"])))
    states, bk = eng.run_block(states, bk, 20)
    assert np.all(np.isfinite(np.asarray(states["lnL"])))


def test_adgamma_vs_oracle(rng):
    """rates=adgamma: associative-scan HMM forward vs a float64 sequential
    forward algorithm (reference CalcLikeAdgamma src/mcmc.c:1575)."""
    from scipy.linalg import expm

    from mrbayes_tpu.data import DataSet, Division
    from mrbayes_tpu.mcmc.engine import Engine
    from mrbayes_tpu.mcmc.settings import DivisionSettings, McmcSettings
    from mrbayes_tpu.models.rates import adgamma_transition
    from mrbayes_tpu.nexus.datatypes import DataType

    n_tips, nchar, K = 6, 40, 4
    codes = rng.integers(0, 4, size=(n_tips, nchar))
    masks = (1 << codes).astype(np.uint32)
    from mrbayes_tpu.data import compress_columns
    pats, w, inv = compress_columns(masks)
    div = Division(index=0, dtype=DataType.DNA, n_states=4, patterns=pats,
                   weights=w, char_ids=np.arange(nchar),
                   pattern_of_char=inv)
    ds = DataSet(taxa=[f"t{i}" for i in range(n_tips)], nchar=nchar,
                 divisions=[div])
    eng = Engine(ds, [DivisionSettings(nst="6", rates="adgamma",
                                       ngammacat=K)],
                 mcmc=McmcSettings(nruns=1, nchains=1, seed=3))
    st = eng.init_state(np.random.default_rng(0))
    st["ratecorr"] = jnp.asarray([0.6])
    got = float(eng.log_likelihood(st))

    # float64 oracle: sequential forward algorithm
    from mrbayes_tpu.trees import Tree
    t = Tree(parent=np.asarray(st["parent"]), left=np.asarray(st["left"]),
             right=np.asarray(st["right"]),
             blen=np.asarray(st["blen"], np.float64), n_tips=n_tips)
    pi = rv = None
    pi = np.asarray(st["pi"][0], np.float64)
    ex6 = np.asarray(st["revmat"][0], np.float64)
    Q = ref.gtr_q(ex6, pi)
    alpha = float(st["shape"][0])
    # use the engine's own (table-interpolated) category rates
    rates = np.asarray(eng._gamma_tables[K](st["shape"][0]), np.float64)
    P = np.zeros((t.n_nodes, K, 4, 4))
    for v in range(t.n_nodes):
        for c in range(K):
            P[v, c] = expm(Q * t.blen[v] * rates[c])
    cl = np.zeros((t.n_nodes, pats.shape[1], K, 4))
    bits = (pats[..., None] >> np.arange(4)) & 1
    cl[:n_tips] = bits[:, :, None, :].astype(np.float64)
    for v in t.postorder():
        l, r = t.left[v], t.right[v]
        cl[v] = (np.einsum("ksj,pkj->pks", P[l], cl[l])
                 * np.einsum("ksj,pkj->pks", P[r], cl[r]))
    rP = np.einsum("pks,s->pk", cl[t.root], pi)          # [P, K]
    M = np.asarray(adgamma_transition(jnp.float32(0.6), K), np.float64)
    F = rP[inv[0]].copy()
    logs = 0.0
    for c in range(1, nchar):
        F = rP[inv[c]] * (M @ F)
        m = F.max()
        F /= m
        logs += np.log(m)
    want = float(logs + np.log(F.mean()))
    assert np.isclose(got, want, rtol=0, atol=0.05 + 2e-5 * abs(want))


def test_adgamma_mcmc_runs(rng):
    """adgamma engine samples rho and stays finite through generations."""
    from mrbayes_tpu.data import DataSet, Division, compress_columns
    from mrbayes_tpu.mcmc.engine import Engine
    from mrbayes_tpu.mcmc.settings import DivisionSettings, McmcSettings
    from mrbayes_tpu.nexus.datatypes import DataType

    n_tips, nchar = 6, 30
    masks = (1 << rng.integers(0, 4, size=(n_tips, nchar))).astype(np.uint32)
    pats, w, inv = compress_columns(masks)
    div = Division(index=0, dtype=DataType.DNA, n_states=4, patterns=pats,
                   weights=w, char_ids=np.arange(nchar),
                   pattern_of_char=inv)
    ds = DataSet(taxa=[f"t{i}" for i in range(n_tips)], nchar=nchar,
                 divisions=[div])
    eng = Engine(ds, [DivisionSettings(nst="2", rates="adgamma",
                                       ngammacat=4)],
                 mcmc=McmcSettings(nruns=1, nchains=2, seed=4))
    states, bk = eng.init_chains()
    assert "ratecorr" in states
    states, bk = eng.run_block(states, bk, 25)
    assert np.all(np.isfinite(np.asarray(states["lnL"])))
