"""Among-site rate variation: discrete gamma, invariable sites, lognormal.

Category rates are computed with traced JAX ops so the shape parameter can be
sampled inside jit.  The gamma quantile uses a Wilson–Hilferty initial guess
refined by Newton iterations on the regularized incomplete gamma function —
same mathematical object the reference computes via the AS91/AS241
approximations (src/utils.c:10500 DiscreteGamma, :9651), implemented here
from the standard formulas.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import ndtri

from .special import gamma_quantile, gammainc_lower


def discrete_gamma(alpha: jnp.ndarray, k: int,
                   use_median: bool = False) -> jnp.ndarray:
    """K equal-probability category rates for Gamma(alpha, alpha) (mean 1).
    Mean-of-category rates by default (reference default)."""
    alpha = jnp.asarray(alpha)
    if use_median:
        p = (2.0 * jnp.arange(1, k + 1) - 1.0) / (2.0 * k)
        r = gamma_quantile(p, alpha[..., None]) / alpha[..., None]
        return r * (k / jnp.sum(r, axis=-1, keepdims=True))
    p = jnp.arange(1, k) / k
    cuts = gamma_quantile(p, alpha[..., None])  # Gamma(alpha,1) quantiles
    # mean in category via incomplete gamma with shape alpha+1
    upper = gammainc_lower(alpha[..., None] + 1.0, cuts)
    upper = jnp.concatenate(
        [jnp.zeros_like(upper[..., :1]), upper,
         jnp.ones_like(upper[..., :1])], axis=-1)
    rates = k * (upper[..., 1:] - upper[..., :-1])
    # guard: renormalize to mean one (float32 tail-category noise)
    return rates * (k / jnp.sum(rates, axis=-1, keepdims=True))


def discrete_lognormal(sigma: jnp.ndarray, k: int) -> jnp.ndarray:
    """K equal-probability mean-one lognormal category rates (reference:
    src/utils.c:10549 DiscreteLogNormal). Rates are category medians of
    LN(-sigma^2/2, sigma), renormalized to mean one."""
    p = (2.0 * jnp.arange(1, k + 1) - 1.0) / (2.0 * k)
    z = ndtri(p)
    r = jnp.exp(sigma[..., None] * z - 0.5 * sigma[..., None] ** 2)
    return r * (k / jnp.sum(r, axis=-1, keepdims=True))
