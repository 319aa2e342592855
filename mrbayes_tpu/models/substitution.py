"""Substitution-model Q matrices (traced JAX).

Reversible Q construction for nucleotide (nst=1/2/6), protein (empirical
exchangeabilities or GTR), binary/restriction, and k-state standard (Mk)
models.  All Q matrices are normalized to one expected substitution per unit
branch length: ``-sum_i pi_i Q_ii = 1`` (reference: src/likelihood.c:8166
SetNucQMatrix behavior, redesigned as pure tensor ops).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _pair_index_table(n: int) -> np.ndarray:
    """Upper-triangle (i<j) pair order used for exchangeability vectors:
    for DNA, order is AC, AG, AT, CG, CT, GT (reference revmat order)."""
    idx = np.zeros((n, n), dtype=np.int64)
    k = 0
    for i in range(n):
        for j in range(i + 1, n):
            idx[i, j] = idx[j, i] = k
            k += 1
    return idx


def reversible_q(exchange: jnp.ndarray, pi: jnp.ndarray) -> jnp.ndarray:
    """Build normalized reversible Q from exchangeabilities r_ij (length
    n(n-1)/2, upper-triangle order) and stationary frequencies pi (length n).
    Q_ij = r_ij * pi_j (i != j); rows sum to 0; normalized to mean rate 1.
    Supports leading batch dims on both args."""
    n = pi.shape[-1]
    table = _pair_index_table(n)
    R = exchange[..., table] * (1.0 - jnp.eye(n))  # symmetric rate factors
    Q = R * pi[..., None, :]
    diag = -jnp.sum(Q, axis=-1)
    Q = Q + jnp.eye(n) * diag[..., None]
    mu = -jnp.sum(pi * diag, axis=-1)
    return Q / mu[..., None, None]


def nuc_q_nst1(pi: jnp.ndarray) -> jnp.ndarray:
    """JC-style (F81): all exchangeabilities equal."""
    ones = jnp.ones(pi.shape[:-1] + (6,), pi.dtype)
    return reversible_q(ones, pi)


def nuc_q_nst2(kappa: jnp.ndarray, pi: jnp.ndarray) -> jnp.ndarray:
    """HKY85: transitions (AG, CT) get rate kappa (tratio)."""
    kappa = jnp.asarray(kappa)
    b = jnp.ones(kappa.shape + (6,), pi.dtype)
    # order AC, AG, AT, CG, CT, GT; transitions at 1 (AG) and 4 (CT)
    ex = b.at[..., 1].set(kappa).at[..., 4].set(kappa)
    return reversible_q(ex, pi)


def nuc_q_gtr(revmat: jnp.ndarray, pi: jnp.ndarray) -> jnp.ndarray:
    """GTR: 6 exchangeabilities (Dirichlet-simplex parameterized in the
    sampler; scale is irrelevant after normalization)."""
    return reversible_q(revmat, pi)


def binary_q(pi: jnp.ndarray) -> jnp.ndarray:
    """2-state (restriction/binary) model."""
    ones = jnp.ones(pi.shape[:-1] + (1,), pi.dtype)
    return reversible_q(ones, pi)


def mk_q(n_states: int, pi: jnp.ndarray | None = None,
         dtype=jnp.float32) -> jnp.ndarray:
    """Lewis Mk model for standard (morphology) data: equal rates; pi may be
    non-uniform under the symmetric-Dirichlet variant."""
    if pi is None:
        pi = jnp.full((n_states,), 1.0 / n_states, dtype)
    ones = jnp.ones(pi.shape[:-1] + (n_states * (n_states - 1) // 2,), dtype)
    return reversible_q(ones, pi)


def ordered_mk_q(n_states: int, pi: jnp.ndarray | None = None,
                 dtype=jnp.float32) -> jnp.ndarray:
    """Ordered Mk model (``ctype ordered``): only adjacent states exchange,
    q_ij = pi_j for |i-j| = 1, rescaled to mean rate 1 (reference
    SetStdQMatrix ordered branch, src/likelihood.c:9257-9272)."""
    if pi is None:
        pi = jnp.full((n_states,), 1.0 / n_states, dtype)
    i = jnp.arange(n_states)
    adj = (jnp.abs(i[:, None] - i[None, :]) == 1).astype(dtype)
    q = adj * pi[None, :]
    q = q - jnp.diag(jnp.sum(q, axis=-1))
    scale = -jnp.sum(pi * jnp.diagonal(q))
    return q / scale


def protein_q(exchange: jnp.ndarray, pi: jnp.ndarray) -> jnp.ndarray:
    """Protein model from a 190-vector of exchangeabilities (empirical model
    or sampled aa-GTR) and 20 frequencies."""
    return reversible_q(exchange, pi)


def codon_q(omega: jnp.ndarray, kappa: jnp.ndarray, pi: jnp.ndarray,
            single: jnp.ndarray, transition: jnp.ndarray,
            nonsyn: jnp.ndarray,
            cat_weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Goldman–Yang / NY98 codon generator.

    q_ij = kappa^[transition] * omega^[nonsynonymous] * pi_j for codon
    pairs differing at one position, else 0 (reference
    src/likelihood.c SetNucQMatrix 61-state branch).

    Normalization: with ``cat_weights`` (NY98/M3 positive-selection
    mixtures) every class is rescaled by the SAME factor so the
    class-frequency-weighted mean rate is 1 — classes keep their
    relative speeds (reference: per-class dN+dS accumulated in
    SetNucQMatrix, joint posScaler applied in UpDateCijk,
    src/likelihood.c:10688-10714).  Without weights (M0), the single
    class is normalized to mean rate 1.

    single/transition/nonsyn: [S, S] boolean masks from
    CodonCode.pair_classes().  omega/kappa may carry leading batch dims.
    """
    omega = jnp.asarray(omega)
    kappa = jnp.asarray(kappa)
    factor = (jnp.where(transition, kappa[..., None, None], 1.0)
              * jnp.where(nonsyn, omega[..., None, None], 1.0)
              * single)
    Q = factor * pi[..., None, :]
    diag = -jnp.sum(Q, axis=-1)
    s = pi.shape[-1]
    Q = Q + jnp.eye(s) * diag[..., None]
    mu = -jnp.sum(pi * diag, axis=-1)          # per-class mean rate
    if cat_weights is not None:
        mu = jnp.sum(cat_weights * mu, axis=-1, keepdims=True)
    return Q / mu[..., None, None]


def covarion_q(qnorm: jnp.ndarray, pi: jnp.ndarray, s01: jnp.ndarray,
               s10: jnp.ndarray, rate=1.0):
    """Tuffley–Steel covarion generator over a doubled state space
    [on-states, off-states] (reference: src/likelihood.c:8269-8420 for
    the 8x8 nucleotide case, :8941 for the 40x40 covariotide/protein
    case).

    ``qnorm`` is the base reversible generator normalized to mean rate 1
    at its own stationary distribution ``pi``.  The reference scales the
    substitution block so the mean rate *of the covarion process* is 1:
    its scaler is probOn * sum_i pi_i q_ij, so the block becomes
    qnorm/probOn; a rate-category multiplier scales the substitution
    block only (switch rates are category-independent — the reason the
    reference needs per-category eigensystems, TiProbs_GenCov
    src/likelihood.c:9568).

    Returns (Q_cov [2S,2S], pi_cov [2S]); the process is reversible
    w.r.t. pi_cov, so eigh_reversible applies.
    """
    s = qnorm.shape[-1]
    prob_on = s01 / (s01 + s10)
    off = jnp.where(jnp.eye(s, dtype=bool), 0.0,
                    qnorm * (jnp.asarray(rate) / prob_on))
    eye = jnp.eye(s)
    top_left = off - eye * (jnp.sum(off, -1) + s10)[..., None]
    top = jnp.concatenate([top_left, eye * s10], axis=-1)
    bot = jnp.concatenate([eye * s01, -eye * s01], axis=-1)
    Q = jnp.concatenate([top, bot], axis=-2)
    pi_cov = jnp.concatenate([pi * prob_on, pi * (1.0 - prob_on)])
    return Q, pi_cov


def _doublet_class_table() -> np.ndarray:
    """[16,16] class of each doublet pair: 0-5 = GTR rate index of the one
    changing position (AC,AG,AT,CG,CT,GT), 6 = both positions change (rate
    0).  State order AA,AC,AG,AT,CA,...,TT — first position major
    (reference doublet[] table, src/bayes.c:651-666)."""
    pair_idx = {frozenset((0, 1)): 0, frozenset((0, 2)): 1,
                frozenset((0, 3)): 2, frozenset((1, 2)): 3,
                frozenset((1, 3)): 4, frozenset((2, 3)): 5}
    cls = np.full((16, 16), 6, np.int64)
    for i in range(16):
        f1, s1 = divmod(i, 4)
        for j in range(16):
            if i == j:
                continue
            f2, s2 = divmod(j, 4)
            if f1 != f2 and s1 != s2:
                continue
            cls[i, j] = pair_idx[frozenset((f1, f2))] if f1 != f2 \
                else pair_idx[frozenset((s1, s2))]
    return cls


_DOUBLET_CLS = _doublet_class_table()


def doublet_q(rates6: jnp.ndarray, pi16: jnp.ndarray) -> jnp.ndarray:
    """16-state doublet (RNA stem) generator: q_ij = r[class(i,j)] * pi_j
    for doublets differing at one position, 0 when both change; normalized
    to mean rate 1 (reference src/likelihood.c 16x16 branch).  rates6 is
    the GTR 6-vector; pass (1,k,1,1,k,1) for nst=2 and ones for nst=1."""
    r = jnp.concatenate([jnp.asarray(rates6),
                         jnp.zeros((1,), jnp.asarray(rates6).dtype)])
    mult = r[jnp.asarray(_DOUBLET_CLS)]
    Q = mult * pi16[None, :]
    Q = Q - jnp.eye(16) * jnp.sum(Q, -1, keepdims=True)
    mu = -jnp.sum(pi16 * jnp.diagonal(Q))
    return Q / mu
