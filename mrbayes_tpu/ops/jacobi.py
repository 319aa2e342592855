"""Batched fixed-iteration Jacobi eigensolver for small symmetric matrices.

The MCMC hot loop eigendecomposes one s×s (s=2..8) symmetrized generator
per chain per generation.  ``jnp.linalg.eigh`` lowers to QDWH — a large
iterative graph with while_loops that dominates both compile time and step
latency at these sizes.  Cyclic Jacobi with a fixed sweep count is a tiny
straight-line graph: per sweep, one Givens rotation per off-diagonal pair,
applied as batched 4x4 (or s×s) matmuls.  5-6 sweeps reach float32
round-off for s<=8 (quadratic convergence).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def jacobi_eigh(A: jnp.ndarray, sweeps: int | None = None):
    """Eigendecomposition of a batch of small symmetric matrices.

    A: [..., s, s] symmetric.  Returns (eigvals [..., s], V [..., s, s])
    with A = V diag(w) V^T (columns of V are eigenvectors).
    """
    s = A.shape[-1]
    if sweeps is None:
        # 4 sweeps hit float32 round-off for 4x4 (measured 6e-6 max
        # reconstruction error over random GTR generators)
        sweeps = 4 if s <= 4 else (6 if s <= 6 else 8)
    V = jnp.broadcast_to(jnp.eye(s, dtype=A.dtype), A.shape)
    pairs = [(p, q) for p in range(s) for q in range(p + 1, s)]
    eye = jnp.eye(s, dtype=A.dtype)

    for _ in range(sweeps):
        for (p, q) in pairs:
            app = A[..., p, p]
            aqq = A[..., q, q]
            apq = A[..., p, q]
            # rotation angle: theta = 0.5 atan2(2 apq, aqq - app)
            theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            c = jnp.cos(theta)
            sn = jnp.sin(theta)
            # G = I with [[c, sn], [-sn, c]] in (p,q) block
            G = (eye
                 + (c - 1.0)[..., None, None] * (jnp.outer(eye[p], eye[p])
                                                 + jnp.outer(eye[q], eye[q]))
                 + sn[..., None, None] * (jnp.outer(eye[p], eye[q])
                                          - jnp.outer(eye[q], eye[p])))
            # HIGHEST precision: TPU matmuls default to bf16 passes, which
            # compounds to ~1e-2 error in P(t) over 8 sweeps x 28 rotations;
            # these tiny s x s products are off the hot path.
            import jax.lax as lax
            A = jnp.matmul(jnp.matmul(jnp.swapaxes(G, -1, -2), A,
                                      precision=lax.Precision.HIGHEST), G,
                           precision=lax.Precision.HIGHEST)
            V = jnp.matmul(V, G, precision=lax.Precision.HIGHEST)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    return w, V


def _test_vs_numpy():  # pragma: no cover - helper for manual check
    rng = np.random.default_rng(0)
    M = rng.normal(size=(3, 4, 4)).astype(np.float32)
    M = M + np.swapaxes(M, -1, -2)
    w, V = jacobi_eigh(jnp.asarray(M))
    wn = np.linalg.eigvalsh(M)
    return np.sort(np.asarray(w), -1), wn
