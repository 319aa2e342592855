"""Clock (rooted, dated) tree machinery: priors, branch-rate models, moves.

State layout for clock models: internal-node ages in time units
(``age[n_nodes]``, tips at 0), an optional sampled clock rate, and optional
per-branch rates for relaxed clocks.  Substitution branch lengths are
derived: ``blen[v] = (age[parent v] - age[v]) * clockrate * r_v`` with
``r_v`` = 1 (strict), the branch's rate (IGR/ILN/WN), or the endpoint mean
(TK02).

Priors reproduce the reference formulas exactly:
- uniform clock: src/mcmc.c:9460 LnUniformPriorPr (uncalibrated branch)
- birth-death (random rho-sampling): src/mcmc.c:8417 LnBirthDeathPriorPr
  Random with LnP0/LnP1/LnP1Subsample helpers
- coalescence (+growth): src/mcmc.c:9273 LnCoalescencePriorPr_Contemp
- relaxed-clock branch-rate priors: src/mcmc.c:8226-8321 (TK02 lognormal
  with log-variance nu*brlen; WN gamma(len/var, len/var); ILN lognormal
  mean 1 var nu; IGR gamma(1/var, 1/var))
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .moves import NEG_INF, _masked_choice, _replace_child, _subtree_mask

# ---------------------------------------------------------------------------
# derived branch lengths


def clock_blens(state: dict, n_tips: int, clockvar: str) -> jnp.ndarray:
    """Substitution-unit branch lengths [n_nodes] from ages/rates."""
    age = state["age"]
    parent = state["parent"]
    root = 2 * n_tips - 2
    par_age = jnp.where(parent >= 0, age[jnp.maximum(parent, 0)], age[root])
    dt = jnp.maximum(par_age - age, 0.0)
    cr = state["clockrate"][0] if "clockrate" in state else 1.0
    if clockvar == "strict":
        r = 1.0
    elif clockvar == "tk02":
        r = 0.5 * (state["brate"]
                   + jnp.where(parent >= 0,
                               state["brate"][jnp.maximum(parent, 0)],
                               state["brate"][root]))
    elif clockvar == "cpp":
        r = cpp_branch_multipliers(parent, state["cpp_pos"],
                                   state["cpp_mult"], state["cpp_n"])
    else:                       # igr / iln / wn / mixed (IGR<->ILN jump)
        r = state["brate"]
    blen = dt * cr * r
    return blen.at[root].set(0.0)


# ---------------------------------------------------------------------------
# CPP (compound Poisson process) relaxed clock
#
# Rate-multiplier events on branches: fixed-capacity padded slots
# (cpp_pos/cpp_mult [n_nodes, K], counts cpp_n [n_nodes]) replace the
# reference's realloc'd per-branch arrays (src/bayes.h:711-714).  Effective
# branch length follows UpdateCppEvolLength (src/model.c:25923): positions
# measured from the recent (tipward) end; the rate at a point is the
# incoming (rootward) rate times the multipliers of all events closer to
# the tipward end; children inherit rate x prod(multipliers).


def cpp_branch_multipliers(parent, cpp_pos, cpp_mult, cpp_n) -> jnp.ndarray:
    """Per-branch effective rate multiplier r_v such that the effective
    substitution length is ``dt * clockrate * r_v`` (the product of the
    inherited path rate and the within-branch integral of the piecewise
    rate; reference UpdateCppEvolLengths src/model.c:25996)."""
    from ..ops.traversal import ancestor_matrix
    K = cpp_pos.shape[-1]
    n = cpp_pos.shape[0]
    active = jnp.arange(K)[None, :] < cpp_n[:, None]
    logm = jnp.where(active, jnp.log(jnp.maximum(cpp_mult, 1e-30)), 0.0)
    s = jnp.sum(logm, axis=-1)                       # [n_nodes]
    A = ancestor_matrix(parent)                       # A[u,v]: v anc-or-self
    base = jnp.exp(A @ s - s)                         # strict ancestors only
    # within-branch relative length: sort active positions ascending
    # (inactive slots pad at pos=1, mult=1 and drop out of the recursion)
    pos = jnp.where(active, cpp_pos, 1.0)
    order = jnp.argsort(pos, axis=-1)
    pos_s = jnp.take_along_axis(pos, order, axis=-1)
    m_s = jnp.take_along_axis(jnp.where(active, cpp_mult, 1.0), order,
                              axis=-1)
    rel = pos_s[:, 0] * m_s[:, 0]
    for i in range(1, K):
        rel = (rel + pos_s[:, i] - pos_s[:, i - 1]) * m_s[:, i]
    rel = rel + 1.0 - pos_s[:, K - 1]
    return base * rel


def ln_cpp_prior(state, n_tips: int, lam, sigma) -> jnp.ndarray:
    """CPP event prior: per branch of strict length L, events are a
    Poisson process of rate ``lam`` per expected substitution with
    LogNormal(0, sigma) multipliers; positions integrate out against the
    Poisson density, leaving exp(-lam L) lam^k prod f(m) (matches the
    add/delete prior ratio of Move_AddDeleteCPPEvent,
    src/proposal.c:286-293)."""
    root = 2 * n_tips - 2
    idx = jnp.arange(2 * n_tips - 1)
    mask = idx != root
    L = clock_blens(state, n_tips, "strict")
    k_b = state["cpp_n"].astype(L.dtype)
    lp = jnp.sum(jnp.where(mask, -lam * L + k_b * jnp.log(lam), 0.0))
    K = state["cpp_pos"].shape[-1]
    active = jnp.arange(K)[None, :] < state["cpp_n"][:, None]
    m = jnp.maximum(state["cpp_mult"], 1e-30)
    lnln = (-jnp.log(m) - jnp.log(sigma) - 0.5 * jnp.log(2.0 * jnp.pi)
            - jnp.log(m) ** 2 / (2.0 * sigma ** 2))
    lp = lp + jnp.sum(jnp.where(active & mask[:, None], lnln, 0.0))
    return lp


def make_cpp_adddelete(sigma: float):
    """rjMCMC add/delete of one CPP event (reference
    Move_AddDeleteCPPEvent, src/proposal.c:174).  The engine recomputes
    the full prior, so only the proposal ratio is returned."""
    def move(key, state, tuning, n_tips):
        root = 2 * n_tips - 2
        kv, kc, kj, km, kp = jax.random.split(key, 5)
        idx = jnp.arange(2 * n_tips - 1)
        mask = idx != root
        v = _masked_choice(kv, mask)
        npos, nmult, nn = state["cpp_pos"], state["cpp_mult"], state["cpp_n"]
        K = npos.shape[-1]
        k = nn[v]
        forced_add = k == 0
        add = forced_add | jax.random.bernoulli(kc)
        # strict-substitution branch length (the CPP unit; reference uses
        # p->length of the clock tree)
        age = state["age"]
        cr = state["clockrate"][0] if "clockrate" in state else 1.0
        L_v = jnp.maximum((age[state["parent"][v]] - age[v]) * cr, 1e-30)
        # --- add branch (slot k; rejected if at capacity)
        m_new = jnp.exp(sigma * jax.random.normal(km))
        p_new = jax.random.uniform(kp)
        slot_a = jnp.minimum(k, K - 1)
        pos_a = npos.at[v, slot_a].set(p_new)
        mult_a = nmult.at[v, slot_a].set(m_new)

        def ln_f(m):
            return (-jnp.log(m) - jnp.log(sigma)
                    - 0.5 * jnp.log(2.0 * jnp.pi)
                    - jnp.log(m) ** 2 / (2.0 * sigma ** 2))

        lnH_a = (jnp.log(L_v) - jnp.log(k.astype(jnp.float32) + 1.0)
                 - ln_f(m_new))
        lnH_a = lnH_a + jnp.where(k == 0, jnp.log(0.5), 0.0)
        lnH_a = jnp.where(k >= K, NEG_INF, lnH_a)   # capacity guard
        # --- delete branch (move last active slot into the hole)
        kk = jnp.maximum(k, 1)
        j = jax.random.randint(kj, (), 0, kk)
        last = kk - 1
        m_del = nmult[v, j]
        pos_d = npos.at[v, j].set(npos[v, last])
        mult_d = nmult.at[v, j].set(nmult[v, last])
        lnH_d = (jnp.log(kk.astype(jnp.float32)) - jnp.log(L_v)
                 + ln_f(jnp.maximum(m_del, 1e-30)))
        lnH_d = lnH_d + jnp.where(k == 1, jnp.log(2.0), 0.0)
        # --- select
        pos2 = jnp.where(add, pos_a, pos_d)
        mult2 = jnp.where(add, mult_a, mult_d)
        n2 = nn.at[v].add(jnp.where(add, 1, -1).astype(nn.dtype))
        n2 = jnp.clip(n2, 0, K)
        lnH = jnp.where(add, lnH_a, lnH_d)
        return ({**state, "cpp_pos": pos2, "cpp_mult": mult2,
                 "cpp_n": n2}, lnH)
    move.__name__ = "move_cpp_adddelete"
    return move


def move_cpp_position(key, state, tuning, n_tips):
    """Resample one event's position uniformly on its branch (role of
    reference Move_CPPEventPosition, src/proposal.c:932); symmetric."""
    root = 2 * n_tips - 2
    kv, kj, kp = jax.random.split(key, 3)
    idx = jnp.arange(2 * n_tips - 1)
    v = _masked_choice(kv, idx != root)
    k = state["cpp_n"][v]
    j = jax.random.randint(kj, (), 0, jnp.maximum(k, 1))
    new = jax.random.uniform(kp)
    pos2 = state["cpp_pos"].at[v, j].set(new)
    return ({**state, "cpp_pos": pos2},
            jnp.where(k > 0, 0.0, NEG_INF))


def move_cpp_multiplier(key, state, tuning, n_tips):
    """Multiplier move on one event's rate multiplier (reference
    Move_CPPRateMultiplierMult, src/proposal.c:1159)."""
    root = 2 * n_tips - 2
    kv, kj, km = jax.random.split(key, 3)
    idx = jnp.arange(2 * n_tips - 1)
    v = _masked_choice(kv, idx != root)
    k = state["cpp_n"][v]
    j = jax.random.randint(kj, (), 0, jnp.maximum(k, 1))
    f = jnp.exp(tuning * (jax.random.uniform(km) - 0.5))
    new = state["cpp_mult"][v, j] * f
    ok = (k > 0) & (new > 1e-4) & (new < 1e4)
    mult2 = state["cpp_mult"].at[v, j].set(new)
    return ({**state, "cpp_mult": mult2},
            jnp.where(ok, jnp.log(f), NEG_INF))


def move_rcl_jump(key, state, tuning, n_tips):
    """IGR<->ILN model jump for clockvarpr=mixed (reference
    Move_RelaxedClockModel, src/proposal.c:6189 with var ratio 1: matched
    parameters, same dimension, Jacobian 1; the engine's full prior
    recompute supplies the density ratio)."""
    return ({**state, "rcl_model": 1 - state["rcl_model"]},
            jnp.float32(0.0))


# ---------------------------------------------------------------------------
# tree priors on node ages


def ln_uniform_clock(age, n_tips: int, treeage_lpdf) -> jnp.ndarray:
    """Uniform node-age prior conditioned on tree age (reference
    src/mcmc.c:9494: (n-1)log2 - log n! - log(n-1) - (n-2)log t1)."""
    root = 2 * n_tips - 2
    t1 = jnp.maximum(age[root], 1e-20)
    n = float(n_tips)
    lp = ((n - 1.0) * jnp.log(2.0) - gammaln(n + 1.0)
          - jnp.log(n - 1.0) - (n - 2.0) * jnp.log(t1))
    return lp + treeage_lpdf(t1)


def _ln_p0(t, b, d):
    return jnp.log(d * (1.0 - jnp.exp((d - b) * t))
                   / (b - d * jnp.exp((d - b) * t)))


def _ln_p1(t, b, d):
    return (2.0 * jnp.log(b - d) - (b - d) * t
            - 2.0 * jnp.log(b - d * jnp.exp((d - b) * t)))


def _ln_p1_sub(t, b, d, f):
    p1 = (b - d) / (f * b + (b * (1.0 - f) - d) * jnp.exp((d - b) * t))
    return 2.0 * jnp.log(p1) + jnp.log(f) - (b - d) * t


def ln_birthdeath(age, n_tips: int, net_div, turnover, samp_frac: float,
                  treeage_lpdf) -> jnp.ndarray:
    """Conditioned birth-death with rho-sampling, sampling strategy
    'random' (reference src/mcmc.c:8417 LnBirthDeathPriorPrRandom,
    Eq.3*Eq.A0 of Hohna et al. 2011)."""
    root = 2 * n_tips - 2
    eps = 1e-6
    eR = jnp.clip(turnover, eps, 1.0 - eps)
    lam = net_div / (1.0 - eR)
    mu = eR * lam
    n = float(n_tips)
    m = float(round(n_tips / samp_frac))
    t1 = jnp.maximum(age[root], 1e-20)
    internal_ages = age[n_tips:root]          # all internal except root
    lp = jnp.log(m - 1.0) - jnp.log(n - 1.0)
    lp = lp + (m - 2.0) * (_ln_p0(t1, lam, mu) + jnp.log(lam) - jnp.log(mu))
    lp = lp + 2.0 * (_ln_p1(t1, lam, mu)
                     - jnp.log(1.0 - jnp.exp(_ln_p0(t1, lam, mu))))
    sF = samp_frac
    lp = lp + (n - 2.0) * (
        jnp.log(lam * sF + (lam - lam * sF - mu) * jnp.exp((mu - lam) * t1))
        - jnp.log(sF * (1.0 - jnp.exp((mu - lam) * t1))))
    lp = lp + jnp.sum(jax.vmap(lambda t: _ln_p1_sub(t, lam, mu, sF))(
        internal_ages))
    return lp + treeage_lpdf(t1)


def ln_birthdeath_strat(age, n_tips: int, net_div, turnover,
                        samp_frac: float, treeage_lpdf,
                        strategy: str = "random") -> jnp.ndarray:
    """Birth-death prior with the reference's three sampling strategies
    (LnBirthDeathPriorPr dispatch, src/mcmc.c:8357): 'random' rho-
    sampling (Eq.3*A0 of Hohna et al. 2011), 'diversity' (Eq.A1,
    src/mcmc.c:8484) keeps the n most divergent of m species, 'cluster'
    (Eq.A2, src/mcmc.c:8556) one densely sampled subclade."""
    if strategy == "random":
        return ln_birthdeath(age, n_tips, net_div, turnover, samp_frac,
                             treeage_lpdf)
    root = 2 * n_tips - 2
    eps = 1e-6
    eR = jnp.clip(turnover, eps, 1.0 - eps)
    lam = net_div / (1.0 - eR)
    mu = eR * lam
    n = float(n_tips)
    m = float(round(n_tips / samp_frac))
    t1 = jnp.maximum(age[root], 1e-20)
    internal_ages = age[n_tips:root]
    ln_p0_t1 = _ln_p0(t1, lam, mu)
    lp = (m - 2.0) * (ln_p0_t1 + jnp.log(lam)) + (n - m) * jnp.log(mu)
    lp = lp + 2.0 * (_ln_p1(t1, lam, mu)
                     - jnp.log(1.0 - jnp.exp(ln_p0_t1)))
    if strategy == "diversity":
        nt_min = jnp.min(internal_ages)
        lp = lp + (m - n) * (_ln_p0(nt_min, lam, mu) - ln_p0_t1)
    elif strategy == "cluster":
        nt_2 = jnp.max(internal_ages)
        lp = lp + (m - n) * jnp.log(
            1.0 - jnp.exp(_ln_p0(nt_2, lam, mu)) / jnp.exp(ln_p0_t1))
    else:
        raise ValueError(f"unknown BD sampling strategy {strategy}")
    lp = lp + jnp.sum(jax.vmap(
        lambda t: _ln_p1(t, lam, mu) - ln_p0_t1)(internal_ages))
    return lp + treeage_lpdf(t1)


def ln_coalescence(age, n_tips: int, theta, growth=0.0,
                   clockrate=1.0) -> jnp.ndarray:
    """Kingman coalescent (+ exponential growth) on coalescence times in
    substitution units (reference src/mcmc.c:9273; theta absorbs the
    mutation rate so depths are not divided by clockRate)."""
    root = 2 * n_tips - 2
    ct = jnp.sort(age[n_tips:root + 1] * clockrate)   # ascending
    n = n_tips
    ks = jnp.arange(n, 1, -1, dtype=age.dtype)        # n, n-1, ..., 2
    prev = jnp.concatenate([jnp.zeros((1,), age.dtype), ct[:-1]])
    growth = jnp.asarray(growth, age.dtype)
    no_growth = jnp.sum(-(ks * (ks - 1.0) * (ct - prev)) / theta)
    g = jnp.where(jnp.abs(growth) < 1e-6, 1e-6, growth)
    with_growth = jnp.sum(growth * ct + (ks * (ks - 1.0) / (theta * g))
                          * (jnp.exp(g * prev) - jnp.exp(g * ct)))
    lp = jnp.where(jnp.abs(growth) < 1e-6, no_growth, with_growth)
    return (n - 1.0) * jnp.log(2.0 / theta) + lp


# ---------------------------------------------------------------------------
# sampled ancestors (ancestral fossils)
#
# A sampled ancestor is a fossil that lies ON a lineage: the reference
# represents it as a fossil tip with branch length 0 (its parent is the
# degree-2 sampling vertex; src/proposal.c:1266 Move_AddBranch diagram).
# Here an explicit flag array state["sa"][n_tips] marks ancestral fossils
# and ``pin_sa_ages`` forces the parent's age to the fossil age wherever
# ages are consumed; the raw parent age becomes an inert auxiliary
# coordinate (moves on it leave the posterior unchanged).


def pin_sa_ages(state: dict, n_tips: int) -> dict:
    """Return state with age[parent[v]] pinned to age[v] for every
    ancestral-fossil tip v (scatter-min is duplicate-safe)."""
    if "sa" not in state:
        return state
    age = state["age"]
    par = state["parent"][:n_tips]
    vals = jnp.where(state["sa"] > 0, age[:n_tips], jnp.inf)
    return {**state, "age": age.at[par].min(vals)}


def make_add_del_branch(fossil_mask, add: bool):
    """rjMCMC between ancestral fossil (branch length 0) and fossil tip
    (branch length > 0): reference Move_AddBranch src/proposal.c:1266 and
    Move_DelBranch :1537.  Hastings: add = log k - log(m+1) + log(window);
    delete = log m - log(k+1) - log(window); window = (grandparent age -
    fossil age) in time units (the engine recomputes the prior)."""
    fossil = jnp.asarray(fossil_mask)

    def move(key, state, tuning, n_tips):
        kv, ku = jax.random.split(key)
        sa = state["sa"] > 0
        age = state["age"]
        parent = state["parent"]
        k_anc = jnp.sum(sa & fossil)
        m_tip = jnp.sum(fossil & ~sa)
        if add:
            pick_mask = sa & fossil
        else:
            pick_mask = fossil & ~sa
        v = _masked_choice(kv, pick_mask)
        q = parent[v]
        g = parent[q]
        left, right = state["left"], state["right"]
        r = jnp.where(left[q] == v, right[q], left[q])
        root = 2 * n_tips - 2
        hi = jnp.where(q == root, jnp.float32(1e6),
                       age[jnp.maximum(g, 0)])
        lo = age[v]
        win = jnp.maximum(hi - lo, 1e-30)
        if add:
            new_q = lo + jax.random.uniform(ku) * win
            sa2 = state["sa"].at[v].set(0)
            age2 = age.at[q].set(new_q)
            ok = (k_anc > 0) & (hi > lo)
            lnH = (jnp.log(jnp.maximum(k_anc, 1).astype(jnp.float32))
                   - jnp.log(m_tip.astype(jnp.float32) + 1.0)
                   + jnp.log(win))
        else:
            sa2 = state["sa"].at[v].set(1)
            age2 = age.at[q].set(lo)
            # sibling must be younger than the fossil (reference aborts,
            # src/proposal.c:1638)
            ok = (m_tip > 0) & (age[r] < lo) & (hi > lo) & (q != root)
            lnH = (jnp.log(jnp.maximum(m_tip, 1).astype(jnp.float32))
                   - jnp.log(k_anc.astype(jnp.float32) + 1.0)
                   - jnp.log(win))
        st = {**state, "sa": sa2, "age": age2}
        return st, jnp.where(ok, lnH, NEG_INF)

    move.__name__ = "move_add_branch" if add else "move_del_branch"
    return move


# ---------------------------------------------------------------------------
# fossilized birth-death (FBD) priors
#
# Math follows the reference exactly (no rate shifts — single slice):
# c1/c2/q/p0 closed forms src/mcmc.c:8693-8762, Random strategy
# src/mcmc.c:9013 LnFossilizedBDPriorRandom, FossilTip variant
# src/mcmc.c:8886 LnFossilizedBDPriorFossilTip, Diversity correction
# src/mcmc.c:9155 LnFossilizedBDPriorDiversity.  Parameter map
# (src/mcmc.c:8820-8827): lambda = sR/(1-eR), mu = lambda*eR,
# psi = mu*fR/(1-fR), rho = sampleprob.


def _fbd_c1c2(lam, mu, psi, rho):
    c1 = jnp.sqrt((lam - mu - psi) ** 2 + 4.0 * lam * psi)
    c2 = ((2.0 * rho - 1.0) * lam + mu + psi) / c1
    return c1, c2


def _fbd_ln_q(t, c1, c2):
    """ln q(t): density of an edge from t to the present boundary
    (reference LnQi_fossil with t_sl=0, src/mcmc.c:8738)."""
    return (jnp.log(4.0) - c1 * t
            - 2.0 * jnp.log(1.0 + c2 + (1.0 - c2) * jnp.exp(-c1 * t)))


def _fbd_ln_p0(t, lam, mu, psi, c1, c2):
    """ln p0(t): no sampled descendants (reference LnPi_fossil /
    LnP0_fossil, src/mcmc.c:8693,8752)."""
    e = jnp.exp(-c1 * t)
    frac = (1.0 + c2 - (1.0 - c2) * e) / (1.0 + c2 + (1.0 - c2) * e)
    other = lam + mu + psi - c1 * frac
    return jnp.log(jnp.maximum(other, 1e-300)) - jnp.log(2.0 * lam)


def _fbd_ln_p1(t, rho, c1, c2):
    """ln p1(t): exactly one sampled extant, no sampled extinct descendant
    (reference LnP1_fossil, src/mcmc.c:8707)."""
    e = jnp.exp(-c1 * t)
    other = (2.0 * (1.0 - c2 * c2) * e + (1.0 - c2) ** 2 * e * e
             + (1.0 + c2) ** 2)
    return jnp.log(4.0) + jnp.log(rho) - c1 * t - jnp.log(other)


def fbd_rates(net_div, turnover, fossil_frac, strategy: str):
    """(lambda, mu, psi) from the sampled (d, r, s) parameterization."""
    eps = 1e-6
    eR = jnp.clip(turnover, eps, 1.0 - eps)
    fR = jnp.clip(fossil_frac, eps, 1.0 - eps)
    lam = net_div / (1.0 - eR)
    if strategy == "fossiltip":
        # reference FossilTip: sR=lam-mu-psi, eR=(mu+psi)/lam, fR=psi/(mu+psi)
        mu = lam * eR * (1.0 - fR)
        psi = lam * eR * fR
    else:
        mu = lam * eR
        psi = mu * fR / (1.0 - fR)
    return lam, mu, psi


def ln_fbd(age, n_tips: int, net_div, turnover, fossil_frac, rho,
           fossil_tip_mask, treeage_lpdf, strategy: str = "random",
           root_dated: bool = False, sa=None, parent=None) -> jnp.ndarray:
    """Fossilized birth-death tree prior, no rate shifts, with sampled
    ancestors (ancestral fossils).

    fossil_tip_mask: static HOST bool[n_tips] (numpy), True where the tip
    is a dated fossil.  rho: extant sampling probability
    (samplestrat=random) or diversity fraction (samplestrat=diversity).
    sa/parent: traced ancestral-fossil flags + parent array — an SA
    fossil's parent is a degree-2 sampling vertex contributing psi
    instead of lambda*q, the SA tip contributes nothing itself, and SA
    fossils drop out of the oriented->labeled 2^(M+E-1) factor
    (reference LnFossilizedBDPriorRandom, src/mcmc.c:9060-9130).
    """
    import numpy as np
    host_mask = np.asarray(fossil_tip_mask)
    fossil_tip_mask = jnp.asarray(host_mask)
    root = 2 * n_tips - 2
    tmrca = jnp.maximum(age[root], 1e-20)
    lam, mu, psi = fbd_rates(net_div, turnover, fossil_frac, strategy)
    m_fossil = int(host_mask.sum())
    n_extant = n_tips - m_fossil
    int_ages = age[n_tips:root]                     # internals except root
    tip_ages = age[:n_tips]
    if sa is not None:
        sa_t = (sa > 0) & fossil_tip_mask
        sa_par = jnp.zeros(2 * n_tips - 1, jnp.int32).at[
            parent[:n_tips]].max(sa_t.astype(jnp.int32)) > 0
        n_sa = jnp.sum(sa_t).astype(age.dtype)
    else:
        sa_t = jnp.zeros(n_tips, bool)
        sa_par = jnp.zeros(2 * n_tips - 1, bool)
        n_sa = jnp.asarray(0.0, age.dtype)

    if strategy == "fossiltip":
        c1, c2 = _fbd_c1c2(lam, mu, psi, rho)
        lp = jnp.sum(jnp.log(lam) + _fbd_ln_p1(int_ages, rho, c1, c2))
        lp = lp + jnp.sum(jnp.where(
            fossil_tip_mask,
            jnp.log(psi) - _fbd_ln_p1(tip_ages, rho, c1, c2), 0.0))
        lp = lp + 2.0 * _fbd_ln_p1(tmrca, rho, c1, c2)
        lp = lp - 2.0 * jnp.log1p(
            -jnp.exp(_fbd_ln_p0(tmrca, lam, mu, psi, c1, c2)))
        if not root_dated:
            lp = lp + treeage_lpdf(tmrca)
        # fossiltip sampling assumes every fossil terminates its lineage
        return jnp.where(n_sa > 0, NEG_INF, lp)

    if strategy == "diversity":
        # Zhang et al. 2016: complete sampling below the cutoff x_cut
        # (youngest internal/fossil age); psi shifts to 0 there and the
        # M_x unsampled extant taxa correction is applied below.  We use
        # the two-slice variant of the reference (src/mcmc.c:9155).
        x_cut = 0.95 * jnp.minimum(
            jnp.min(int_ages),
            jnp.min(jnp.where(fossil_tip_mask, tip_ages, jnp.inf)))
        return _ln_fbd_diversity(age, n_tips, lam, mu, psi, rho,
                                 fossil_tip_mask, treeage_lpdf, x_cut,
                                 root_dated, sa_t, sa_par, n_sa)

    # strategy == "random"
    c1, c2 = _fbd_c1c2(lam, mu, psi, rho)
    p_t = jnp.exp(_fbd_ln_p0(tmrca, lam, mu, psi, c1, c2))
    lp = jnp.sum(jnp.where(sa_par[n_tips:root], jnp.log(psi),
                           jnp.log(lam) + _fbd_ln_q(int_ages, c1, c2)))
    lp = lp + jnp.where(sa_par[root], jnp.log(psi), 0.0)
    lp = lp + jnp.sum(jnp.where(
        fossil_tip_mask & ~sa_t,
        _fbd_ln_p0(tip_ages, lam, mu, psi, c1, c2)
        - _fbd_ln_q(tip_ages, c1, c2) + jnp.log(psi), 0.0))
    lp = lp + n_extant * jnp.log(rho)
    lp = lp + 2.0 * (_fbd_ln_q(tmrca, c1, c2) - jnp.log1p(-p_t))
    lp = lp + (n_extant + (m_fossil - n_sa) - 1.0) * jnp.log(2.0)
    if not root_dated:
        lp = lp + treeage_lpdf(tmrca)
    return lp


def _ln_fbd_diversity(age, n_tips, lam, mu, psi, rho, fossil_tip_mask,
                      treeage_lpdf, x_cut, root_dated,
                      sa_t=None, sa_par=None, n_sa=0.0):
    """Two-slice FBD: slice boundary at x_cut with (psi->0, rho_cut=0,
    complete sampling rho=1 at present), then the diversified-sampling
    correction for the M_x unsampled extant taxa."""
    root = 2 * n_tips - 2
    tmrca = jnp.maximum(age[root], 1e-20)
    # slice 0: (x_cut, tmrca], fossil sampling active, rho_0 = 0 at x_cut
    c1_0, c2b = _fbd_c1c2(lam, mu, psi, 0.0)
    # slice 1: [0, x_cut), psi = 0, complete extant sampling rho_1 = 1
    c1_1, c2_1 = _fbd_c1c2(lam, mu, 0.0, 1.0)
    # p across the boundary: c2 of slice 0 uses p_{1}(t_1) (reference
    # c2[i] = ((1-2(1-rho_i) p_{i+1}(t_i)) lam + mu + psi)/c1)
    p1_at_cut = jnp.exp(_fbd_ln_p0(x_cut, lam, mu, 0.0, c1_1, c2_1))
    c2_0 = ((1.0 - 2.0 * (1.0 - 0.0) * p1_at_cut) * lam + mu + psi) / c1_0

    def ln_q(t):
        """piecewise q: slice 1 within [0, x_cut), slice 0 above."""
        below = (jnp.log(4.0) - c1_1 * t
                 - 2.0 * jnp.log(1.0 + c2_1
                                 + (1.0 - c2_1) * jnp.exp(-c1_1 * t)))
        dt = t - x_cut
        above = (jnp.log(4.0) - c1_0 * dt
                 - 2.0 * jnp.log(1.0 + c2_0
                                 + (1.0 - c2_0) * jnp.exp(-c1_0 * dt)))
        return jnp.where(t < x_cut, below, above)

    def ln_p0(t):
        e = jnp.exp(-c1_0 * (t - x_cut))
        frac = ((1.0 + c2_0 - (1.0 - c2_0) * e)
                / (1.0 + c2_0 + (1.0 - c2_0) * e))
        other = lam + mu + psi - c1_0 * frac
        return (jnp.log(jnp.maximum(other, 1e-300))
                - jnp.log(2.0 * lam))

    import numpy as np
    host_mask = np.asarray(fossil_tip_mask)
    fossil_tip_mask = jnp.asarray(host_mask)
    if sa_t is None:
        sa_t = jnp.zeros(n_tips, bool)
        sa_par = jnp.zeros(2 * n_tips - 1, bool)
    int_ages = age[n_tips:root]
    tip_ages = age[:n_tips]
    p_t = jnp.exp(ln_p0(tmrca))
    lp = jnp.sum(jnp.where(sa_par[n_tips:root], jnp.log(psi),
                           jnp.log(lam) + ln_q(int_ages)))
    lp = lp + jnp.where(sa_par[root], jnp.log(psi), 0.0)
    # fossil tips are all above x_cut by construction
    lp = lp + jnp.sum(jnp.where(
        fossil_tip_mask & ~sa_t,
        ln_p0(tip_ages) - ln_q(tip_ages) + jnp.log(psi), 0.0))
    # extant tips: rho_1 = 1 contributes 0; degree-2 vertices at the
    # boundary: every extant lineage crosses x_cut once: q_1 contribution
    # with rho_cut = 0 -> + ln q at boundary from below ... the reference
    # accounts for branches crossing the slice: LnQi(t_sl) + log(1-rho_cut)
    n_extant = n_tips - int(host_mask.sum())
    # lineages crossing the cut: those whose node age < x_cut and parent
    # age > x_cut; by construction of x_cut (0.95*youngest internal) all
    # extant tips cross and nothing else does
    lp = lp + n_extant * (jnp.log(4.0) - 2.0 * jnp.log(
        1.0 + c2_1 + (1.0 - c2_1) * jnp.exp(-c1_1 * x_cut))
        - c1_1 * x_cut)
    lp = lp + 2.0 * (ln_q(tmrca) - jnp.log1p(-p_t))
    lp = lp + (n_tips - n_sa - 1.0) * jnp.log(2.0)
    # diversified-sampling correction for unsampled extant taxa
    m_x = jnp.round(n_extant / rho) - n_extant
    d = lam - mu
    corr = jnp.where(
        jnp.abs(d) * x_cut > 1e-6,
        jnp.log(lam * (1.0 - jnp.exp(-d * x_cut)))
        - jnp.log(jnp.maximum(lam - mu * jnp.exp(-d * x_cut), 1e-300)),
        jnp.log(lam / (mu + 1.0 / jnp.maximum(x_cut, 1e-20))))
    lp = lp + m_x * corr
    if not root_dated:
        lp = lp + treeage_lpdf(tmrca)
    return lp


# ---------------------------------------------------------------------------
# dated-tip uniform clock prior


def ln_uniform_clock_dated(age, n_tips: int, fossil_tip_mask,
                           treeage_lpdf, root_dated: bool) -> jnp.ndarray:
    """Uniform node-age prior with dated tips (reference LnUniformPriorPr,
    src/mcmc.c:9460, single-subtree case: dated tips, no dated interior
    nodes — interior calibrations contribute their densities separately).

    Sorted dated depths y_1 <= ... <= y_m (tips, static count m) plus the
    root depth; each interior node depth is uniform in (y_j, t_root) for
    its interval, with combinatorial sorting corrections.
    """
    from jax.scipy.special import gammaln as lgam
    import numpy as np
    root = 2 * n_tips - 2
    t0 = jnp.maximum(age[root], 1e-20)
    m = int(np.asarray(fossil_tip_mask).sum())   # dated tips (static)
    lp = jnp.where(jnp.asarray(root_dated), 0.0, treeage_lpdf(t0))
    if m == 0:
        n = float(n_tips)
        return lp + ((n - 1.0) * jnp.log(2.0) - gammaln(n + 1.0)
                     - jnp.log(n - 1.0) - (n - 2.0) * jnp.log(t0))
    # dated node depths: the m fossil tip ages, ascending, plus root last.
    # Undated (extant) tips at depth 0 are "dated" at 0 in the reference
    # (age 0 is known); the reference's GetDatedNodeDepths collects tips
    # with isDated — extant tips count as dated at 0.  All tips are dated.
    tip_ages = age[:n_tips]
    depths = jnp.sort(tip_ages)                       # y_0..y_{nt-1}
    nt = n_tips
    bounds = jnp.concatenate([depths, t0[None]])      # y_1..y_m, t_root
    int_ages = age[n_tips:root]                       # undated interiors
    # nLineages[k] = (k+1) - #interior nodes with depth < bounds[k+1]
    below = (int_ages[None, :] < bounds[1:, None]).sum(-1)   # [nt]
    n_lin = jnp.arange(1, nt + 1) - below
    # probability of uniform node depths: skip first and last dated tip
    # (reference loops j=1..nDatedTips-2 over ALL sorted dated depths,
    # extant zeros included, src/mcmc.c:9536-9538)
    j = jnp.arange(1, nt - 1)
    lp = lp - jnp.sum(jnp.log(jnp.maximum(t0 - depths[j], 1e-30)))
    # sorting corrections
    n_in = n_lin[j - 1] + 1
    n_out = jnp.where(j == nt - 2, 2, n_lin[j])
    use = (n_in > 1) & (n_in - n_out >= 1)
    lp = lp + jnp.sum(jnp.where(use, lgam(n_in.astype(age.dtype))
                                - lgam(n_out.astype(age.dtype)), 0.0))
    # coalescent-history counts
    j2 = jnp.arange(1, nt)
    n_in2 = (n_lin[j2 - 1] + 1).astype(age.dtype)
    n_out2 = n_lin[j2].astype(age.dtype)
    diff = n_in2 != n_out2
    lp = lp + jnp.sum(jnp.where(
        diff,
        jnp.log(2.0) * (n_in2 - n_out2)
        + lgam(n_out2 + 1.0) + lgam(jnp.maximum(n_out2, 1.0))
        - lgam(n_in2 + 1.0) - lgam(jnp.maximum(n_in2, 1.0)),
        0.0))
    return lp


# ---------------------------------------------------------------------------
# relaxed-clock branch-rate priors


def ln_branch_rates_prior(state, n_tips: int, clockvar: str,
                          var) -> jnp.ndarray:
    """Sum of per-branch rate log-priors. ``var`` is the model's variance
    parameter.  Branch set: every node except the root (edge above)."""
    root = 2 * n_tips - 2
    rates = state["brate"]
    parent = state["parent"]
    age = state["age"]
    blen = clock_blens({**state, "brate": jnp.ones_like(rates)},
                       n_tips, "strict")  # time*clockrate lengths
    idx = jnp.arange(2 * n_tips - 1)
    mask = idx != root
    r = jnp.maximum(rates, 1e-30)
    if clockvar == "mixed":
        # IGR<->ILN rjMCMC: indicator selects the density (reference
        # LogPrior mixed branch, src/mcmc.c:8287-8321; RCL_IGR=0 RCL_ILN=1)
        a = 1.0 / var
        lp_igr = (a * jnp.log(a) - gammaln(a) + (a - 1.0) * jnp.log(r)
                  - a * r)
        s2 = jnp.log1p(var)
        mu = -0.5 * s2
        lp_iln = (-jnp.log(r) - 0.5 * jnp.log(2 * jnp.pi * s2)
                  - (jnp.log(r) - mu) ** 2 / (2.0 * s2))
        lp = jnp.where(state["rcl_model"][0] == 0, lp_igr, lp_iln)
    elif clockvar == "igr":
        a = 1.0 / var
        lp = a * jnp.log(a) - gammaln(a) + (a - 1.0) * jnp.log(r) - a * r
    elif clockvar == "iln":
        # lognormal with mean 1, variance var (both natural scale):
        # sigma2 = log(1+var); mu = -sigma2/2
        s2 = jnp.log1p(var)
        mu = -0.5 * s2
        lp = (-jnp.log(r) - 0.5 * jnp.log(2 * jnp.pi * s2)
              - (jnp.log(r) - mu) ** 2 / (2.0 * s2))
    elif clockvar == "wn":
        a = jnp.maximum(blen, 1e-10) / var
        lp = a * jnp.log(a) - gammaln(a) + (a - 1.0) * jnp.log(r) - a * r
    elif clockvar == "tk02":
        # rate at node ~ LogNormal(mean=parent rate (natural),
        # logvar = nu * brlen)
        pr = jnp.maximum(
            jnp.where(parent >= 0, rates[jnp.maximum(parent, 0)], 1.0),
            1e-30)
        s2 = jnp.maximum(var * jnp.maximum(blen, 1e-10), 1e-12)
        mu = jnp.log(pr) - 0.5 * s2
        lp = (-jnp.log(r) - 0.5 * jnp.log(2 * jnp.pi * s2)
              - (jnp.log(r) - mu) ** 2 / (2.0 * s2))
    else:
        return jnp.asarray(0.0, rates.dtype)
    return jnp.sum(jnp.where(mask, lp, 0.0))


# ---------------------------------------------------------------------------
# clock moves


def move_age_slider(key, state, tuning, n_tips):
    """Uniform slide of one internal (non-root) node age within
    (max child age, parent age).  Hastings 0."""
    root = 2 * n_tips - 2
    k1, k2 = jax.random.split(key)
    idx = jnp.arange(2 * n_tips - 1)
    mask = (idx >= n_tips) & (idx != root)
    v = _masked_choice(k1, mask)
    age = state["age"]
    lo = jnp.maximum(age[state["left"][v]], age[state["right"][v]])
    hi = age[state["parent"][v]]
    new = lo + (hi - lo) * jax.random.uniform(k2)
    return {**state, "age": age.at[v].set(new)}, jnp.float32(0.0)


def move_local_clock(key, state, tuning, n_tips):
    """LOCAL for clock trees (role of Move_LocalClock,
    src/proposal.c:6630, Larget & Simon 1999): pick an internal node u
    with parent v; among the three subtrees {u's two children, u's
    sibling} choose uniformly which one becomes v's direct child, hang
    the other two under u, and redraw u's age uniformly in
    (max child age, age[v]).  Joint topology+age update on the local
    neighborhood; Hastings = log(W_fwd / W_bwd) for the two uniform
    age windows (the reference's h-distance bookkeeping expressed in
    node ages)."""
    root = 2 * n_tips - 2
    parent, left, right = state["parent"], state["left"], state["right"]
    age = state["age"]
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jnp.arange(2 * n_tips - 1)
    mask = (idx >= n_tips) & (idx != root)
    u = _masked_choice(k1, mask)
    v = parent[u]
    a = left[u]
    b = right[u]
    c = jnp.where(left[v] == u, right[v], left[v])
    # which of {a, b, c} goes outside (under v)?
    pick = jax.random.randint(k2, (), 0, 3)
    out_n = jnp.where(pick == 0, a, jnp.where(pick == 1, b, c))
    in1 = jnp.where(pick == 0, b, a)
    in2 = jnp.where(pick == 2, b, c)
    lo_old = jnp.maximum(age[a], age[b])
    lo_new = jnp.maximum(age[in1], age[in2])
    W_f = jnp.maximum(age[v] - lo_new, 1e-12)
    W_b = jnp.maximum(age[v] - lo_old, 1e-12)
    new_age = lo_new + W_f * jax.random.uniform(k3)
    st = dict(state)
    st["left"] = left.at[u].set(in1).at[v].set(u)
    st["right"] = right.at[u].set(in2).at[v].set(out_n)
    st["parent"] = parent.at[in1].set(u).at[in2].set(u).at[out_n].set(v)
    st["age"] = age.at[u].set(new_age)
    return st, jnp.log(W_f) - jnp.log(W_b)


def move_node_slider_clock(key, state, tuning, n_tips):
    """Windowed node-age slide with reflection (reference
    Move_NodeSliderClock, src/proposal.c:8570: newDepth = oldDepth +
    window*(u-1/2), reflected into (minDepth, maxDepth)).  The window is
    the autotuned parameter; reflection keeps the proposal symmetric
    (Hastings 0).  Complements the uniform-in-bounds age_slider: a tuned
    window mixes better when the feasible interval is wide."""
    root = 2 * n_tips - 2
    k1, k2 = jax.random.split(key)
    idx = jnp.arange(2 * n_tips - 1)
    mask = (idx >= n_tips) & (idx != root)
    v = _masked_choice(k1, mask)
    age = state["age"]
    lo = jnp.maximum(age[state["left"][v]], age[state["right"][v]])
    hi = age[state["parent"][v]]
    width = jnp.maximum(hi - lo, 1e-12)
    new = age[v] + tuning * (jax.random.uniform(k2) - 0.5)
    # fold into (lo, hi) by repeated reflection (period 2*width)
    x = jnp.mod(new - lo, 2.0 * width)
    new = lo + jnp.where(x > width, 2.0 * width - x, x)
    return {**state, "age": age.at[v].set(new)}, jnp.float32(0.0)


def move_tree_stretch(key, state, tuning, n_tips):
    """Multiply all internal ages by exp(lambda(u-1/2)); Hastings =
    n_internal * log m (reference Move_TreeStretch src/proposal.c:17250)."""
    m = jnp.exp(tuning * (jax.random.uniform(key) - 0.5))
    idx = jnp.arange(2 * n_tips - 1)
    mask = idx >= n_tips
    age = jnp.where(mask, state["age"] * m, state["age"])
    return {**state, "age": age}, jnp.sum(mask) * jnp.log(m)


def move_root_age(key, state, tuning, n_tips):
    """Multiplier on the root age only, children ages fixed."""
    root = 2 * n_tips - 2
    m = jnp.exp(tuning * (jax.random.uniform(key) - 0.5))
    age = state["age"]
    new = age[root] * m
    lo = jnp.maximum(age[state["left"][root]], age[state["right"][root]])
    ok = new > lo
    return ({**state, "age": age.at[root].set(new)},
            jnp.where(ok, jnp.log(m), NEG_INF))


def move_subtree_swap_clock(key, state, tuning, n_tips):
    """Clock subtree swap (role of the reference's extending subtree
    swap for clock trees, Move_ExtSSClock src/proposal.c:4621): exchange
    the subtrees hanging from two nodes a, b that are not
    ancestor-related and whose receiving parents are older than the
    arriving subtree roots.  Pair chosen uniformly among valid pairs;
    the valid-pair count changes with the topology, so
    lnH = log(n_valid_before) - log(n_valid_after)."""
    from ..ops.traversal import ancestor_matrix
    root = 2 * n_tips - 2
    n_nodes = 2 * n_tips - 1
    parent, age = state["parent"], state["age"]
    k1 = key

    def valid_pairs(parent, age):
        A = ancestor_matrix(parent) > 0          # [u, v]: v anc-or-self u
        rel = A | A.T                            # includes a == b
        pa = age[jnp.maximum(parent, 0)]
        notroot = jnp.arange(n_nodes) != root
        ok = (~rel) & notroot[:, None] & notroot[None, :] \
            & (pa[:, None] > age[None, :] + 1e-12) \
            & (pa[None, :] > age[:, None] + 1e-12)
        return jnp.triu(ok, 1)

    ok_f = valid_pairs(parent, age)
    n_f = jnp.sum(ok_f)
    flat = jnp.where(ok_f.reshape(-1), 0.0, NEG_INF)
    pick = jax.random.categorical(k1, flat)
    a = pick // n_nodes
    b = pick % n_nodes
    pa_, pb_ = parent[a], parent[b]
    st = _replace_child(state, pa_, a, b)
    st = _replace_child(st, pb_, b, a)
    ok_b = valid_pairs(st["parent"], age)
    n_b = jnp.sum(ok_b)
    valid = n_f > 0
    lnH = jnp.log(jnp.maximum(n_f, 1)) - jnp.log(jnp.maximum(n_b, 1))
    return st, jnp.where(valid, lnH, NEG_INF)


def move_nni_clock(key, state, tuning, n_tips):
    """Rooted NNI: swap a child of v with v's sibling; valid only if the
    sibling is younger than v (reference Move_NNIClock
    src/proposal.c:8127)."""
    root = 2 * n_tips - 2
    parent, left, right = state["parent"], state["left"], state["right"]
    age = state["age"]
    k1, k2 = jax.random.split(key)
    idx = jnp.arange(2 * n_tips - 1)
    mask = (idx >= n_tips) & (idx != root)
    v = _masked_choice(k1, mask)
    u = parent[v]
    s = jnp.where(left[u] == v, right[u], left[u])
    c = jnp.where(jax.random.bernoulli(k2), left[v], right[v])
    ok = age[v] > age[s]
    st = _replace_child(state, v, c, s)
    st = _replace_child(st, u, s, c)
    return st, jnp.where(ok, 0.0, NEG_INF)


def move_spr_clock(key, state, tuning, n_tips):
    """Subtree prune-and-regraft preserving node ages: the pruned parent
    node p reattaches on a target edge at a uniform age within the valid
    window; Hastings accounts for target counts and window lengths
    (role of reference Move_ExtSPRClock src/proposal.c:3014)."""
    root = 2 * n_tips - 2
    parent, left, right = state["parent"], state["left"], state["right"]
    age = state["age"]
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jnp.arange(2 * n_tips - 1)
    # prune candidates: parent is not root, node is not root
    vmask = (idx != root) & (parent != root) & (parent >= 0)
    v = _masked_choice(k1, vmask)
    p = parent[v]
    g = parent[p]
    s = jnp.where(left[p] == v, right[p], left[p])
    sub = _subtree_mask(parent, v)
    # regraft targets: any node w (not root, not in subtree, not p, not s)
    # whose parent's age exceeds max(age[w], age[v])
    par_age = jnp.where(parent >= 0, age[jnp.maximum(parent, 0)], -1.0)
    win_lo = jnp.maximum(age, age[v])
    wmask = ((~sub) & (idx != root) & (idx != p) & (idx != s)
             & (parent >= 0) & (par_age > win_lo))
    n_fwd = jnp.sum(wmask)
    w = _masked_choice(k2, wmask)
    gw = parent[w]
    lo = jnp.maximum(age[w], age[v])
    hi = age[gw]
    new_age_p = lo + (hi - lo) * jax.random.uniform(k3)
    # surgery
    st = _replace_child(state, g, p, s)
    st = _replace_child(st, gw, w, p)
    st = _replace_child(st, p, s, w)
    st = {**st, "age": st["age"].at[p].set(new_age_p)}
    # reverse-move bookkeeping: from st, regrafting v's parent back onto
    # edge (s, g): window = age[g] - max(age[s], age[v])
    w_fwd = hi - lo
    w_bwd = age[g] - jnp.maximum(age[s], age[v])
    parent2 = st["parent"]
    par_age2 = jnp.where(parent2 >= 0, st["age"][jnp.maximum(parent2, 0)],
                         -1.0)
    wmask2 = ((~_subtree_mask(parent2, v)) & (idx != root) & (idx != p)
              & (idx != w) & (parent2 >= 0)
              & (par_age2 > jnp.maximum(st["age"], st["age"][v])))
    n_bwd = jnp.sum(wmask2)
    ok = (n_fwd > 0) & (w_fwd > 0) & (w_bwd > 0)
    lnH = (jnp.log(jnp.maximum(n_fwd, 1)) - jnp.log(jnp.maximum(n_bwd, 1))
           + jnp.log(jnp.maximum(w_fwd, 1e-30))
           - jnp.log(jnp.maximum(w_bwd, 1e-30)))
    return st, jnp.where(ok, lnH, NEG_INF)


def make_pars_spr_clock_move(pars_masks, pars_factors):
    """Parsimony-biased SPR for clock trees (reference Move_ParsSPRClock,
    src/proposal.c:11896, default weight 10): same age-window surgery as
    move_spr_clock, but the regraft edge is drawn from a softmax over
    Fitch parsimony scores of the detached tree (the Move_ParsSPR scoring
    re-used under the clock validity mask).  The detached main tree is
    identical in the forward and reverse directions, so one Fitch pass
    scores both softmaxes."""
    from ..ops.traversal import postorder_internal

    def move(key, state, tuning, n_tips):
        root = 2 * n_tips - 2
        n_nodes = 2 * n_tips - 1
        parent, left, right = (state["parent"], state["left"],
                               state["right"])
        age = state["age"]
        k1, k2, k3 = jax.random.split(key, 3)
        idx = jnp.arange(n_nodes)
        vmask = (idx != root) & (parent != root) & (parent >= 0)
        v = _masked_choice(k1, vmask)
        p = parent[v]
        g = parent[p]
        s = jnp.where(left[p] == v, right[p], left[p])
        sub = _subtree_mask(parent, v)
        par_age = jnp.where(parent >= 0, age[jnp.maximum(parent, 0)], -1.0)
        win_lo = jnp.maximum(age, age[v])
        wmask = ((~sub) & (idx != root) & (idx != p) & (idx != s)
                 & (parent >= 0) & (par_age > win_lo))
        n_fwd = jnp.sum(wmask)

        # Fitch pass on the detached tree for the parsimony scores
        st = _replace_child(state, g, p, s)
        P2, L2, R2 = st["parent"], st["left"], st["right"]
        F = jnp.zeros((n_nodes, pars_masks.shape[1]), jnp.uint32)
        F = F.at[:n_tips].set(pars_masks)
        order = postorder_internal(P2, n_tips)

        def fstep(F, u):
            a, b = F[L2[u]], F[R2[u]]
            inter = a & b
            return F.at[u].set(jnp.where(inter > 0, inter, a | b)), None

        F, _ = jax.lax.scan(fstep, F, order)
        par_eff = jnp.where(P2 == root, 0, jnp.maximum(P2, 0))
        y = (F | F[par_eff]) & F[v][None, :]
        d = tuning * jnp.sum(
            jnp.where(y == 0, pars_factors[None, :], 0.0), axis=-1)

        fwd_logits = jnp.where(wmask, -d, NEG_INF)
        valid = n_fwd > 0
        w = jnp.where(valid, jax.random.categorical(k2, fwd_logits), s)
        lnq_fwd = fwd_logits[w] - jax.scipy.special.logsumexp(fwd_logits)
        gw = parent[w]
        lo = jnp.maximum(age[w], age[v])
        hi = age[gw]
        new_age_p = lo + (hi - lo) * jax.random.uniform(k3)
        st = _replace_child(st, gw, w, p)
        st = _replace_child(st, p, s, w)
        st = {**st, "age": st["age"].at[p].set(new_age_p)}
        w_fwd = hi - lo
        w_bwd = age[g] - jnp.maximum(age[s], age[v])
        parent2 = st["parent"]
        par_age2 = jnp.where(parent2 >= 0,
                             st["age"][jnp.maximum(parent2, 0)], -1.0)
        wmask2 = ((~_subtree_mask(parent2, v)) & (idx != root) & (idx != p)
                  & (idx != w) & (parent2 >= 0)
                  & (par_age2 > jnp.maximum(st["age"], st["age"][v])))
        rev_logits = jnp.where(wmask2, -d, NEG_INF)
        lnq_rev = rev_logits[s] - jax.scipy.special.logsumexp(rev_logits)
        ok = valid & (w_fwd > 0) & (w_bwd > 0)
        lnH = (lnq_rev - lnq_fwd
               + jnp.log(jnp.maximum(w_fwd, 1e-30))
               - jnp.log(jnp.maximum(w_bwd, 1e-30)))
        return st, jnp.where(ok, lnH, NEG_INF)

    move.__name__ = "move_pars_spr_clock"
    return move


def make_tip_date_move(tips: "np.ndarray", los: "np.ndarray",
                       his: "np.ndarray"):
    """Uniform slide of one calibrated tip's age within its calibration
    bounds intersected with (0, parent age) (role of reference
    Move_NodeSliderClock on dated tips, src/proposal.c:8570).  The window
    depends only on unchanged quantities, so the proposal is symmetric."""
    import numpy as np
    tips_j = jnp.asarray(tips)
    los_j = jnp.asarray(los, jnp.float32)
    his_j = jnp.asarray(np.minimum(his, 1e30), jnp.float32)

    def move(key, state, tuning, n_tips):
        k1, k2 = jax.random.split(key)
        i = jax.random.randint(k1, (), 0, tips_j.shape[0])
        v = tips_j[i]
        age = state["age"]
        hi = jnp.minimum(his_j[i], age[state["parent"][v]])
        lo = los_j[i]
        new = lo + (hi - lo) * jax.random.uniform(k2)
        ok = hi > lo
        return ({**state, "age": age.at[v].set(new)},
                jnp.where(ok, 0.0, NEG_INF))
    return move


def make_brate_multiplier(n_tips: int):
    """Multiplier on one branch rate (non-root nodes)."""
    root = 2 * n_tips - 2

    def move(key, state, tuning, n_tips=n_tips):
        k1, k2 = jax.random.split(key)
        idx = jnp.arange(2 * n_tips - 1)
        mask = idx != root
        v = _masked_choice(k1, mask)
        m = jnp.exp(tuning * (jax.random.uniform(k2) - 0.5))
        new = state["brate"][v] * m
        ok = (new > 1e-6) & (new < 1e4)
        return ({**state, "brate": state["brate"].at[v].set(new)},
                jnp.where(ok, jnp.log(m), NEG_INF))
    return move
