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


def protein_q(exchange: jnp.ndarray, pi: jnp.ndarray) -> jnp.ndarray:
    """Protein model from a 190-vector of exchangeabilities (empirical model
    or sampled aa-GTR) and 20 frequencies."""
    return reversible_q(exchange, pi)


def codon_q(omega: jnp.ndarray, kappa: jnp.ndarray, pi: jnp.ndarray,
            single: jnp.ndarray, transition: jnp.ndarray,
            nonsyn: jnp.ndarray) -> jnp.ndarray:
    """Goldman–Yang / NY98 codon generator.

    q_ij = kappa^[transition] * omega^[nonsynonymous] * pi_j for codon
    pairs differing at one position, else 0; normalized to mean rate 1
    (reference src/likelihood.c SetNucQMatrix 61-state branch).
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
    mu = -jnp.sum(pi * diag, axis=-1)
    return Q / mu[..., None, None]
