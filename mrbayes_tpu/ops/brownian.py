"""Brownian-motion (continuous-trait) likelihood via phylogenetic
independent contrasts.

Felsenstein's REML/PIC formulation: a postorder pass produces n-1
independent contrasts x_l - x_r with variance sigma^2 (v_l' + v_r'),
where v' is the branch length plus the pruning-accumulated extra
variance v_l'v_r'/(v_l'+v_r') of the reduced node.  The REML likelihood
is the product of the contrast densities — invariant to the root state,
which is never estimated.

The reference declares this capability (datatype=continuous,
brownscalepr/browncorrpr, src/command.c:14605) but its Likelihood_Cont
is an empty stub returning lnL = 0 ("//chi TODO",
src/likelihood.c:7554-7566).  This implementation is therefore validated
against a dense multivariate-normal oracle (tests/test_continuous.py)
rather than the reference binary.

TPU shape: one lax.scan over the postorder; each step updates all C
characters at once ([n_nodes, C] value tensor — the VPU sees wide
elementwise rows).  Characters are independent given the tree
(browncorrpr currently fixed at 0, the reference default,
src/bayes.c:792-793).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .traversal import postorder_internal

_EPS = 1e-12


def pic_logpdf(left, right, parent, blen, values, sigma2, n_tips: int):
    """REML log-density of ``values`` [n_tips, C] under Brownian motion
    with per-character variance rate ``sigma2`` (scalar or [C]).

    blen [n_nodes]: edge length above each node (our rooted-at-tip-0
    layout; the root's zero-length edge contributes no variance, so the
    contrast at the root spans the basal split — exactly n_tips - 1
    contrasts in total)."""
    n_nodes = 2 * n_tips - 1
    C = values.shape[1]
    x = jnp.zeros((n_nodes, C), values.dtype).at[:n_tips].set(values)
    extra = jnp.zeros((n_nodes,), values.dtype)
    order = postorder_internal(parent, n_tips)

    def step(carry, v):
        x, extra, ll = carry
        l, r = left[v], right[v]
        vl = blen[l] + extra[l]
        vr = blen[r] + extra[r]
        V = jnp.maximum(vl + vr, _EPS)
        contrast = x[l] - x[r]
        ll = ll + jnp.sum(-0.5 * (jnp.log(2.0 * jnp.pi * sigma2 * V)
                                  + contrast ** 2 / (sigma2 * V)))
        x = x.at[v].set((vr * x[l] + vl * x[r]) / V)
        extra = extra.at[v].set(vl * vr / V)
        return (x, extra, ll), None

    (_, _, ll), _ = jax.lax.scan(
        step, (x, extra, jnp.asarray(0.0, values.dtype)), order)
    return ll
