"""Transition-probability matrices P(t) = exp(Qt).

Reversible Q is similar to a symmetric matrix: with D = diag(pi),
B = D^{1/2} Q D^{-1/2} is symmetric, so ``eigh`` gives a real spectrum and
P(t) = D^{-1/2} V exp(Λt) Vᵀ D^{1/2}.  This replaces the reference's
EISPACK general-eigenproblem path (src/utils.c:11201 GetEigens,
src/utils.c:14064 TiProbsUsingEigens) with a batched symmetric
decomposition that XLA maps well to TPU.  A scaling-and-squaring expm is
provided for non-reversible generators (covarion etc.).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def eigh_reversible(Q: jnp.ndarray, pi: jnp.ndarray):
    """Decompose a (batched) reversible generator.

    Returns (lam, U, Uinv) with Q = U diag(lam) Uinv, all real.
    Small state spaces (<=8: nucleotide, binary, standard) use a
    fixed-sweep Jacobi solver — a straight-line graph that compiles and
    runs far faster inside the MCMC step than QDWH ``eigh``; larger ones
    (protein 20, codon 61) use ``jnp.linalg.eigh``.
    """
    from .jacobi import jacobi_eigh
    sq = jnp.sqrt(jnp.maximum(pi, 1e-30))
    B = Q * (sq[..., :, None] / sq[..., None, :])
    B = 0.5 * (B + jnp.swapaxes(B, -1, -2))  # symmetrize numerical noise
    if B.shape[-1] <= 8:
        lam, V = jacobi_eigh(B)
    else:
        lam, V = jnp.linalg.eigh(B)
    U = V / sq[..., :, None]
    Uinv = jnp.swapaxes(V, -1, -2) * sq[..., None, :]
    return lam, U, Uinv


def transition_probs(lam: jnp.ndarray, U: jnp.ndarray, Uinv: jnp.ndarray,
                     t: jnp.ndarray) -> jnp.ndarray:
    """P(t) for a (batch of) effective branch lengths.

    lam/U/Uinv: [..., s] / [..., s, s];  t: [...] broadcastable to the batch.
    Returns [..., s, s], clipped to [0, 1].
    """
    elt = jnp.exp(lam * t[..., None])               # [..., s]
    # HIGHEST precision: on TPU the default matmul runs bf16 passes; the
    # eigenvector products need full f32 or P(t) picks up ~1e-3 error
    # (the per-branch cost is negligible next to the pruning contractions)
    P = jnp.einsum("...ik,...k,...kj->...ij", U, elt, Uinv,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.clip(P, 0.0, 1.0)


def expm_pade(A: jnp.ndarray, squarings: int = 8) -> jnp.ndarray:
    """Scaling-and-squaring matrix exponential with a 6th-order Taylor/
    Padé-style core; adequate for normalized generators times reasonable
    branch lengths (reference fallback: src/utils.c:10332
    ComputeMatrixExponential)."""
    scale = 2.0 ** squarings
    X = A / scale
    s = A.shape[-1]
    eye = jnp.eye(s, dtype=A.dtype)
    term = eye
    out = eye
    for k in range(1, 7):
        term = term @ X / k
        out = out + term

    def body(M, _):
        return M @ M, None

    out, _ = jax.lax.scan(body, out, None, length=squarings)
    return out
