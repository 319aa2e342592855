"""Independent float64 numpy implementation of the phylogenetic likelihood,
used only as a golden oracle in tests. Deliberately simple and slow."""
import numpy as np
from scipy.linalg import expm
from scipy.stats import gamma as gamma_dist


def gtr_q(ex, pi):
    n = len(pi)
    Q = np.zeros((n, n))
    k = 0
    for i in range(n):
        for j in range(i + 1, n):
            Q[i, j] = ex[k] * pi[j]
            Q[j, i] = ex[k] * pi[i]
            k += 1
    np.fill_diagonal(Q, -Q.sum(1))
    mu = -(pi * np.diag(Q)).sum()
    return Q / mu


def discrete_gamma_rates(alpha, k):
    cuts = gamma_dist.ppf(np.arange(1, k) / k, alpha, scale=1.0 / alpha)
    cdf_ap1 = gamma_dist.cdf(np.r_[0, cuts * alpha, np.inf], alpha + 1)
    return k * np.diff(cdf_ap1)


def loglik(tree, tip_partials, weights, Q, pi, cat_rates, pinv=0.0,
           const_mask=None, rate_mult=1.0):
    """tree: mrbayes_tpu.trees.Tree; tip_partials [n, P, S]."""
    n = tree.n_tips
    npat, s = tip_partials.shape[1:]
    K = len(cat_rates)
    # MrBayes semantics: with +I the variable-class rate is 1/(1-pinv)
    base = rate_mult / (1.0 - pinv) if pinv > 0 else rate_mult
    P = np.zeros((tree.n_nodes, K, s, s))
    for v in range(tree.n_nodes):
        for c in range(K):
            P[v, c] = expm(Q * tree.blen[v] * cat_rates[c] * base)
    cl = np.zeros((tree.n_nodes, npat, K, s))
    cl[:n] = tip_partials[:, :, None, :]
    for v in tree.postorder():
        l, r = tree.left[v], tree.right[v]
        wl = np.einsum("ksj,pkj->pks", P[l], cl[l])
        wr = np.einsum("ksj,pkj->pks", P[r], cl[r])
        cl[v] = wl * wr
    root = tree.root
    site = np.einsum("pks,s->p", cl[root], pi) / K
    if pinv > 0:
        const = const_mask @ pi
        site = (1 - pinv) * site + pinv * const
    return float((weights * np.log(site)).sum())


def fbd_prior_random(ages, n_tips, lam, mu, psi, rho, fossil_mask,
                     treeage_lp=0.0, sa=None, parent=None):
    """Direct transcription of LnFossilizedBDPriorRandom (no rate shifts),
    reference src/mcmc.c:9013 with helpers :8693-8762.  ``sa``/``parent``
    mark ancestral fossils (zero-length fossil tips): their parent is a
    degree-2 sampling vertex contributing psi (src/mcmc.c:9073-9085)."""
    root = 2 * n_tips - 2
    tmrca = ages[root]
    c1 = np.sqrt((lam - mu - psi) ** 2 + 4 * lam * psi)
    c2 = ((1 - 2 * (1 - rho)) * lam + mu + psi) / c1

    def ln_q(t):
        return (np.log(4.0) + c1 * (0.0 - t)
                - 2.0 * np.log(1 + c2 + (1 - c2) * np.exp(c1 * (0.0 - t))))

    def ln_p(t):
        other = lam + mu + psi - c1 * (
            (1 + c2 - (1 - c2) * np.exp(c1 * (0.0 - t)))
            / (1 + c2 + (1 - c2) * np.exp(c1 * (0.0 - t))))
        return np.log(other) - np.log(2 * lam)

    p_t = np.exp(ln_p(tmrca))
    prob = 0.0
    M = E = 0
    sa = sa if sa is not None else np.zeros(n_tips, bool)
    sa_parents = set()
    if parent is not None:
        sa_parents = {int(parent[v]) for v in range(n_tips) if sa[v]}
    for v in range(2 * n_tips - 1):
        x = ages[v]
        if v >= n_tips:            # internal
            if v in sa_parents:    # degree-2 sampling vertex (anc fossil)
                prob += np.log(psi)
            elif v != root:
                prob += np.log(lam) + ln_q(x)
        elif fossil_mask[v]:       # fossil tip
            if not sa[v]:
                prob += ln_p(x) - ln_q(x) + np.log(psi)
                M += 1
        else:                      # extant tip
            prob += np.log(rho)
            E += 1
    prob += 2.0 * (ln_q(tmrca) - np.log(1 - p_t))
    prob += (M + E - 1) * np.log(2.0)
    return prob + treeage_lp


def fbd_prior_fossiltip(ages, n_tips, lam, mu, psi, rho, fossil_mask,
                        treeage_lp=0.0):
    """Transcription of LnFossilizedBDPriorFossilTip, src/mcmc.c:8886."""
    root = 2 * n_tips - 2
    tmrca = ages[root]
    sR = lam - mu - psi
    c1 = np.sqrt(sR * sR + 4 * lam * psi)
    c2 = (2 * lam * rho - sR) / c1

    def ln_p1(t):
        other = (2 * (1 - c2 * c2) * np.exp(-c1 * t)
                 + (1 - c2) ** 2 * np.exp(-2 * c1 * t) + (1 + c2) ** 2)
        return np.log(4.0) + np.log(rho) - c1 * t - np.log(other)

    def ln_p0(t):
        other = ((np.exp(-c1 * t) * (1 - c2) - (1 + c2))
                 / (np.exp(-c1 * t) * (1 - c2) + (1 + c2)))
        return np.log(lam + mu + psi + c1 * other) - np.log(2 * lam)

    prob = 0.0
    for v in range(2 * n_tips - 1):
        x = ages[v]
        if v >= n_tips:
            if v != root:
                prob += np.log(lam) + ln_p1(x)
        elif fossil_mask[v]:
            prob += np.log(psi) - ln_p1(x)
    prob += 2.0 * ln_p1(tmrca)
    prob -= 2.0 * np.log(1 - np.exp(ln_p0(tmrca)))
    return prob + treeage_lp


def uniform_dated_prior(ages, n_tips, treeage_lp=0.0):
    """Transcription of LnUniformPriorPr for the single-subtree case
    (dated tips only, no dated interiors), reference src/mcmc.c:9460.
    All tips count as dated (DatedNodeDepths records every terminal,
    src/utils.c:3541-3553)."""
    from scipy.special import gammaln
    root = 2 * n_tips - 2
    t0 = ages[root]
    lnp = treeage_lp
    depths = np.sort(ages[:n_tips])
    bounds = np.r_[depths, t0]
    int_ages = ages[n_tips:root]
    m = n_tips   # nDatedTips
    n_lin = np.arange(1, m + 1)
    for k in range(m):
        n_lin[k] -= int((int_ages < bounds[k + 1]).sum())
    for j in range(1, m - 1):
        lnp -= np.log(t0 - depths[j])
    for j in range(1, m - 1):
        n_in = n_lin[j - 1] + 1
        n_out = 2 if j == m - 2 else n_lin[j]
        if n_in > 1 and n_in - n_out >= 1:
            lnp += gammaln(n_in) - gammaln(n_out)
    for j in range(1, m):
        n_in = n_lin[j - 1] + 1
        n_out = n_lin[j]
        if n_in != n_out:
            lnp += np.log(2.0) * (n_in - n_out)
            lnp += gammaln(n_out + 1) + gammaln(max(n_out, 1))
            lnp -= gammaln(n_in + 1) + gammaln(max(n_in, 1))
    return lnp
