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
