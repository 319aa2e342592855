"""nst=mixed: rjMCMC over the 203 GTR substitution submodels.

A submodel is a partition of the 6 exchangeability slots into rate classes,
encoded as a canonical restricted-growth assignment vector ``z[6]``
(z[0]=0, z[i] <= max(z[:i])+1) — the reference's "growth function"
(src/model.c FromIndexToGrowthFxn).  The state keeps the full 6-vector of
exchangeabilities with equal values within a class, so the likelihood path
(nuc_q_gtr) is unchanged.

Prior (reference src/mcmc.c:7662 REVMAT_MIX): uniform 1/203 over submodels
x Dirichlet on the collapsed class proportions with concentration
``symdir * class_size``.

Split/merge proposal reproduces reference Move_Revmat_SplitMerge1
(src/proposal.c:15329): merge two random classes, or split a composite
class by a uniformly chosen non-empty proper subset with a
Beta(alpha*n_i, alpha*n_j) reallocation of the class proportion; the
Hastings ratio includes the subset count, pair count, Beta density, and
the Jacobian log R.  Everything is fixed-size (6 slots) masked arithmetic,
so it traces.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .moves import NEG_INF

SIX = 6


def class_stats(z: jnp.ndarray, values: jnp.ndarray):
    """Per-class (counts[6], sums[6], k). Classes indexed 0..k-1."""
    onehot = jax.nn.one_hot(z, SIX, dtype=values.dtype)       # [6 slots, 6]
    counts = jnp.sum(onehot, axis=0)
    sums = jnp.einsum("sc,s->c", onehot, values)
    k = jnp.max(z) + 1
    return counts, sums, k


def ln_prior_mixed(z: jnp.ndarray, values: jnp.ndarray,
                   symdir: float = 1.0) -> jnp.ndarray:
    counts, sums, k = class_stats(z, values)
    used = jnp.arange(SIX) < k
    lp = gammaln(6.0 * symdir)
    lp = lp - jnp.sum(jnp.where(used, gammaln(
        jnp.maximum(counts, 1.0) * symdir), 0.0))
    lp = lp + jnp.sum(jnp.where(
        used, (counts * symdir - 1.0)
        * jnp.log(jnp.maximum(sums, 1e-30)), 0.0))
    return lp - jnp.log(203.0)


def _uniform_int(key, n):
    """Uniform integer in [0, n) for traced n."""
    return jnp.minimum((jax.random.uniform(key) * n).astype(jnp.int32),
                       n - 1)


def splitmerge(key, z, values, alpha):
    """One split-or-merge proposal. Returns (z', values', lnH).
    alpha: tuning concentration of the Beta reallocation."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    counts, sums, k = class_stats(z, values)
    do_merge = jnp.where(k == 1, False,
                         jnp.where(k == SIX, True,
                                   jax.random.uniform(k1) < 0.5))

    # ---------------- merge branch ----------------
    def merge_branch():
        i0 = _uniform_int(k2, k)
        j0 = _uniform_int(k3, k - 1)
        j0 = jnp.where(j0 == i0, k - 1, j0)
        ci = jnp.minimum(i0, j0)
        cj = jnp.maximum(i0, j0)
        n_i = counts[ci]
        n_j = counts[cj]
        R_i = sums[ci]
        R_j = sums[cj]
        R = R_i + R_j
        z2 = jnp.where(z == cj, ci, jnp.where(z > cj, z - 1, z))
        vals2 = jnp.where(z2 == ci, R / (n_i + n_j), values)
        # composite count after merge
        c2, _, k2_ = class_stats(z2, vals2)
        ncomp = jnp.sum(jnp.where(jnp.arange(SIX) < k2_, c2 > 1.5, False))
        prob_split = jnp.where(k - 1 == 1, 1.0, 0.5)
        prob_merge = jnp.where(k == SIX, 1.0, 0.5)
        nm = n_i + n_j
        lnH = jnp.log(prob_split / prob_merge) \
            + jnp.log(k * (k - 1.0) / (2.0 * ncomp)) \
            - jnp.log(2.0 ** (nm - 1.0) - 1.0)
        a_i = alpha * n_i
        a_j = alpha * n_j
        lnH = lnH + (gammaln(a_i + a_j) - gammaln(a_i) - gammaln(a_j)
                     + (a_i - 1.0) * jnp.log(jnp.maximum(R_i / R, 1e-30))
                     + (a_j - 1.0) * jnp.log(jnp.maximum(R_j / R, 1e-30)))
        lnH = lnH - jnp.log(jnp.maximum(R, 1e-30))
        return z2, vals2, lnH

    # ---------------- split branch ----------------
    def split_branch():
        used = jnp.arange(SIX) < k
        comp = used & (counts > 1.5)
        ncomp = jnp.sum(comp)
        # choose composite class uniformly
        r = _uniform_int(k2, jnp.maximum(ncomp, 1))
        cum = jnp.cumsum(comp.astype(jnp.int32)) - 1
        ci = jnp.argmax((cum == r) & comp)
        m = counts[ci].astype(jnp.int32)          # group size (2..6)
        # uniform non-empty proper subset of the m-1 non-first members:
        # integer in [1, 2^(m-1) - 1]
        nsub = 2.0 ** (m - 1.0) - 1.0
        rint = 1 + _uniform_int(k3, jnp.maximum(nsub, 1.0).astype(jnp.int32))
        # member order within class: rank among slots with z==ci
        in_class = z == ci
        rank = jnp.cumsum(in_class.astype(jnp.int32)) - 1   # 0-based in class
        move_bit = (rint >> jnp.clip(rank - 1, 0, 5)) & 1   # for rank>=1
        moves = in_class & (rank >= 1) & (move_bit == 1)
        # index_j: (max class index over slots before the first moved slot)+1
        first_moved = jnp.argmax(moves)                     # first moved slot
        before = jnp.arange(SIX) < first_moved
        maxz_before = jnp.max(jnp.where(before, z, 0))
        cj = maxz_before + 1
        z2 = jnp.where(moves, cj,
                       jnp.where((~moves) & (z >= cj), z + 1, z))
        # sizes after split
        n_j = jnp.sum(moves).astype(values.dtype)
        n_i = counts[ci] - n_j
        R = sums[ci]
        a_i = alpha * n_i
        a_j = alpha * n_j
        g1 = jax.random.gamma(k4, jnp.maximum(a_i, 1e-4))
        g2 = jax.random.gamma(k5, jnp.maximum(a_j, 1e-4))
        p_i = jnp.clip(g1 / (g1 + g2), 1e-6, 1.0 - 1e-6)
        R_i = p_i * R
        R_j = (1.0 - p_i) * R
        vals2 = jnp.where(z2 == ci, R_i / jnp.maximum(n_i, 1.0),
                          jnp.where(z2 == cj,
                                    R_j / jnp.maximum(n_j, 1.0), values))
        prob_merge = jnp.where(k + 1 == SIX, 1.0, 0.5)
        prob_split = jnp.where(k == 1, 1.0, 0.5)
        nm = n_i + n_j
        lnH = jnp.log(prob_merge / prob_split) \
            + jnp.log(2.0 * ncomp / ((k + 1.0) * k)) \
            + jnp.log(2.0 ** (nm - 1.0) - 1.0)
        lnH = lnH - (gammaln(a_i + a_j) - gammaln(a_i) - gammaln(a_j)
                     + (a_i - 1.0) * jnp.log(p_i)
                     + (a_j - 1.0) * jnp.log(1.0 - p_i))
        lnH = lnH + jnp.log(jnp.maximum(R, 1e-30))
        return z2, vals2, lnH

    zm, vm, hm = merge_branch()
    zs, vs, hs = split_branch()
    z2 = jnp.where(do_merge, zm, zs)
    v2 = jnp.where(do_merge, vm, vs)
    lnH = jnp.where(do_merge, hm, hs)
    ok = jnp.all(v2 > 1e-7) & jnp.all(v2 < 1.0)
    return z2, v2, jnp.where(ok, lnH, NEG_INF)


def dirichlet_mixed(key, z, values, conc):
    """Value move respecting the class constraint: Dirichlet proposal on
    the collapsed class proportions, redistributed equally within classes
    (role of reference Move_Revmat_DirMix)."""
    from .priors import dirichlet_lpdf
    counts, sums, k = class_stats(z, values)
    used = jnp.arange(SIX) < k
    props = jnp.where(used, sums, 1.0)         # dummy 1.0 on unused slots
    alpha_f = jnp.where(used, jnp.maximum(conc * props, 1e-4), 1.0)
    g = jnp.where(used, jax.random.gamma(key, alpha_f) + 1e-10, 0.0)
    newp = g / jnp.sum(g)
    alpha_b = jnp.where(used, jnp.maximum(conc * newp, 1e-4), 1.0)
    # densities on the k-simplex (unused slots contribute 0 via masks)
    def masked_dir_lpdf(x, a):
        lx = jnp.log(jnp.maximum(x, 1e-30))
        return (gammaln(jnp.sum(jnp.where(used, a, 0.0)))
                - jnp.sum(jnp.where(used, gammaln(a), 0.0))
                + jnp.sum(jnp.where(used, (a - 1.0) * lx, 0.0)))
    lnH = masked_dir_lpdf(props, alpha_b) - masked_dir_lpdf(newp, alpha_f)
    vals2 = jnp.take(newp / jnp.maximum(counts, 1.0), z)
    ok = jnp.all(jnp.where(used, newp > 1e-7, True))
    return vals2, jnp.where(ok, lnH, NEG_INF)


def growth_string(z) -> str:
    """'112123'-style submodel label (reference modelElementNames)."""
    import numpy as np
    return "".join(str(int(x) + 1) for x in np.asarray(z))
