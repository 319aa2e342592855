"""Prior log-densities (traced).

The engine recomputes the full log-prior every generation (cheap tensor
ops), so moves never need analytic prior ratios — the acceptance ratio uses
lnPrior differences directly.  This replaces the reference's 24 paired
LnPriorProb*/LnProbRatio* functions (src/utils.c:12701-13204) with plain
densities.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

_NEG_INF = -1e30


def _support(cond, val):
    return jnp.where(cond, val, _NEG_INF)


def exponential_lpdf(x, rate):
    return _support(x > 0, jnp.log(rate) - rate * x)


def uniform_lpdf(x, lo, hi):
    return _support((x >= lo) & (x <= hi), -jnp.log(hi - lo))


def gamma_lpdf(x, shape, rate):
    return _support(
        x > 0,
        shape * jnp.log(rate) - gammaln(shape)
        + (shape - 1.0) * jnp.log(jnp.maximum(x, 1e-35)) - rate * x)


def lognormal_lpdf(x, mu, sigma):
    lx = jnp.log(jnp.maximum(x, 1e-35))
    return _support(
        x > 0,
        -lx - jnp.log(sigma) - 0.5 * jnp.log(2 * jnp.pi)
        - 0.5 * ((lx - mu) / sigma) ** 2)


def normal_lpdf(x, mu, sigma):
    return (-jnp.log(sigma) - 0.5 * jnp.log(2 * jnp.pi)
            - 0.5 * ((x - mu) / sigma) ** 2)


def beta_lpdf(x, a, b):
    return _support(
        (x > 0) & (x < 1),
        gammaln(a + b) - gammaln(a) - gammaln(b)
        + (a - 1) * jnp.log(jnp.maximum(x, 1e-35))
        + (b - 1) * jnp.log(jnp.maximum(1 - x, 1e-35)))


def dirichlet_lpdf(x, alpha):
    """x, alpha: [..., K]; density on the simplex."""
    lx = jnp.log(jnp.maximum(x, 1e-35))
    return (gammaln(jnp.sum(alpha, -1)) - jnp.sum(gammaln(alpha), -1)
            + jnp.sum((alpha - 1.0) * lx, -1))


def brlens_gammadir_lpdf(blens, mask, a_t, b_t, a_frac, c_int,
                         interior_mask=None):
    """Compound Dirichlet branch-length prior (Rannala, Zhu & Yang 2012),
    the reference default ``unconstrained:gammadir(1,0.1,1,1)``
    (src/bayes.c:806-820, src/utils.c LnPriorProbGammaDir).

    blens [..., n_nodes]; mask [n_nodes] selects the free branches.
    p(b) = Gamma(T; a_t, b_t) * Dirichlet(b/T; alpha) / T^(n-1)
    with alpha = a_frac for external, a_frac*c_int for internal branches.
    """
    b = jnp.where(mask, blens, 0.0)
    n = jnp.sum(mask)
    T = jnp.sum(b, -1)
    lT = jnp.log(jnp.maximum(T, 1e-35))
    lp_T = gamma_lpdf(T, a_t, b_t)
    if interior_mask is None:
        alpha = jnp.where(mask, a_frac, 0.0)
    else:
        alpha = jnp.where(mask,
                          jnp.where(interior_mask, a_frac * c_int, a_frac),
                          0.0)
    lfrac = jnp.where(mask, jnp.log(jnp.maximum(b, 1e-35)) - lT[..., None],
                      0.0)
    lp_dir = (gammaln(jnp.sum(alpha)) - jnp.sum(jnp.where(mask, gammaln(
        jnp.maximum(alpha, 1e-35)), 0.0))
        + jnp.sum((alpha - 1.0) * lfrac * mask, -1))
    ok = jnp.all(jnp.where(mask, blens > 0, True), -1)
    return _support(ok, lp_T + lp_dir - (n - 1.0) * lT)


def brlens_exponential_lpdf(blens, mask, rate):
    b = jnp.where(mask, blens, 1.0)
    ok = jnp.all(jnp.where(mask, blens > 0, True), -1)
    n = jnp.sum(mask)
    return _support(ok, n * jnp.log(rate)
                    - rate * jnp.sum(jnp.where(mask, blens, 0.0), -1))


def brlens_uniform_lpdf(blens, mask, lo, hi):
    ok = jnp.all(jnp.where(mask, (blens >= lo) & (blens <= hi), True), -1)
    n = jnp.sum(mask)
    return _support(ok, -n * jnp.log(hi - lo))
