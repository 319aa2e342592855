"""Traced topology utilities.

The pruning pass needs internal nodes in child-before-parent order.  Under
jit the topology is data, so the order must be derived with traced ops: node
depths via pointer doubling on the parent array (O(log n) gathers), then a
stable argsort by decreasing depth.  Any order with children before parents
is valid for pruning; depth-descending is one.  (The reference re-derives a
pointer-based downpass after every topology move — src/utils.c:3909
GetDownPass; this is the dense-array equivalent.)
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def node_depths(parent: jnp.ndarray) -> jnp.ndarray:
    """Depth of every node below the root (root depth 0). ``parent`` has -1
    at the root. Pointer doubling: after k rounds, ``anc`` holds the 2^k-th
    ancestor and ``depth`` the distance walked."""
    n = parent.shape[-1]
    idx = jnp.arange(n)
    anc = jnp.where(parent < 0, idx, parent)
    depth = jnp.where(parent < 0, 0, 1)
    for _ in range(max(1, math.ceil(math.log2(n)))):
        depth = depth + jnp.take(depth, anc, axis=-1)
        anc = jnp.take(anc, anc, axis=-1)
    return depth


def postorder_internal(parent: jnp.ndarray, n_tips: int) -> jnp.ndarray:
    """Internal-node ids (n_tips..2n-2) ordered children-before-parents
    (root last). Traced; works on a traced topology."""
    depth = node_depths(parent)
    internal = jnp.arange(n_tips, 2 * n_tips - 1)
    d = jnp.take(depth, internal)
    order = jnp.argsort(-d, stable=True)
    return internal[order]


def ancestor_matrix(parent: jnp.ndarray) -> jnp.ndarray:
    """A[u, v] = 1.0 iff v is an ancestor-or-self of u.  Boolean matrix
    squaring (log2 n float matmuls — MXU-friendly), used for constraint
    (monophyly) checks and MRCA lookup under jit."""
    n = parent.shape[-1]
    eye = jnp.eye(n, dtype=jnp.float32)
    P = jnp.where(parent[:, None] == jnp.arange(n)[None, :], 1.0, 0.0)
    A = jnp.minimum(eye + P, 1.0)
    for _ in range(max(1, math.ceil(math.log2(n)))):
        A = jnp.minimum(A @ A, 1.0)
    return A


def subtree_mask(parent: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of nodes in the subtree rooted at node v (v included).
    Pointer doubling over ancestor chains."""
    n = parent.shape[-1]
    idx = jnp.arange(n)
    anc = jnp.where(parent < 0, idx, parent)
    hit = idx == v
    for _ in range(max(1, math.ceil(math.log2(n)))):
        hit = hit | jnp.take(hit, anc, axis=-1)
        anc = jnp.take(anc, anc, axis=-1)
    return hit
