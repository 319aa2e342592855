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
import numpy as np
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


class GammaRateTable:
    """Precomputed mean-of-category gamma rates, log-interpolated in alpha.

    The MCMC hot loop needs category rates for a *sampled* shape parameter
    every generation; iterative quantile refinement there bloats the traced
    graph.  Rates vary smoothly in log(alpha), so a 1024-point table with
    linear interpolation reproduces them to ~1e-5 — far below MCMC noise —
    with a single gather in the step graph.
    """

    def __init__(self, k: int, n: int = 1024, lo: float = 5e-4,
                 hi: float = 300.0):
        from scipy.stats import gamma as gdist
        self.k, self.lo, self.hi = k, lo, hi
        alphas = np.logspace(np.log10(lo), np.log10(hi), n)
        table = np.zeros((n, k))
        for i, a in enumerate(alphas):
            cuts = gdist.ppf(np.arange(1, k) / k, a, scale=1.0 / a)
            cdf = gdist.cdf(np.r_[0, cuts * a, np.inf], a + 1)
            r = k * np.diff(cdf)
            table[i] = r * (k / r.sum())
        self.log_lo = float(np.log(lo))
        self.step = float((np.log(hi) - np.log(lo)) / (n - 1))
        self.table = jnp.asarray(table, jnp.float32)
        self.n = n

    def __call__(self, alpha):
        x = (jnp.log(jnp.clip(alpha, self.lo, self.hi)) - self.log_lo) \
            / self.step
        i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, self.n - 2)
        f = (x - i0)[..., None]
        return self.table[i0] * (1.0 - f) + self.table[i0 + 1] * f


def discrete_lognormal(sigma: jnp.ndarray, k: int) -> jnp.ndarray:
    """K equal-probability mean-one lognormal category rates (reference:
    src/utils.c:10549 DiscreteLogNormal). Rates are category medians of
    LN(-sigma^2/2, sigma), renormalized to mean one."""
    p = (2.0 * jnp.arange(1, k + 1) - 1.0) / (2.0 * k)
    z = ndtri(p)
    r = jnp.exp(sigma[..., None] * z - 0.5 * sigma[..., None] ** 2)
    return r * (k / jnp.sum(r, axis=-1, keepdims=True))


def adgamma_transition(rho: jnp.ndarray, k: int,
                       n_quad: int = 32) -> jnp.ndarray:
    """HMM transition matrix between adjacent sites' gamma rate categories
    for the autocorrelated (adgamma) model: a bivariate standard normal
    copula over the K equal-probability buckets (reference AutodGamma,
    src/utils.c:8989 — binormal CDF differenced at normal quantiles,
    scaled by K and row-normalized).

    The binormal CDF is evaluated through its derivative identity
    dPhi2/drho = phi2(x,y;rho) with fixed Gauss-Legendre quadrature over
    [0, rho] — a straight-line traced graph.
    """
    from numpy.polynomial.legendre import leggauss
    import scipy.stats as st
    z = np.r_[st.norm.ppf(np.arange(1, k) / k), 20.0]   # bucket upper cuts
    zz = np.array(np.meshgrid(z, z, indexing="ij"))      # [2, K, K]
    x, y = jnp.asarray(zz[0]), jnp.asarray(zz[1])
    nodes, wts = leggauss(n_quad)
    nodes = jnp.asarray(nodes, jnp.float32)
    wts = jnp.asarray(wts, jnp.float32)
    rho = jnp.clip(jnp.asarray(rho), -0.999, 0.999)
    r = 0.5 * rho * (nodes + 1.0)                        # [Q]
    w = 0.5 * rho * wts
    om = 1.0 - r * r
    dens = jnp.exp(-(x[..., None] ** 2 - 2.0 * r * x[..., None]
                     * y[..., None] + y[..., None] ** 2) / (2.0 * om)) \
        / (2.0 * jnp.pi * jnp.sqrt(om))                  # [K, K, Q]
    phi = jnp.asarray(st.norm.cdf(np.asarray(zz)), jnp.float32)
    C = phi[0] * phi[1] + jnp.sum(dens * w, axis=-1)     # Phi2 grid [K, K]
    Cp = jnp.pad(C, ((1, 0), (1, 0)))
    cell = Cp[1:, 1:] - Cp[:-1, 1:] - Cp[1:, :-1] + Cp[:-1, :-1]
    M = jnp.maximum(cell * k, 0.0)
    return M / jnp.sum(M, axis=-1, keepdims=True)


def beta_quantile_breaks(a, b, K: int):
    """Median-of-class quantiles of Beta(a, b): the quantile at the
    midpoint of each of K equal-probability classes (reference
    BetaBreaks, src/utils.c — quantile at r = (i+1/2)/K).  Traced
    bisection on the regularized incomplete beta function."""
    import jax
    import jax.numpy as jnp
    from jax.scipy.special import betainc
    r = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
    lo = jnp.zeros((K,), jnp.float32)
    hi = jnp.ones((K,), jnp.float32)

    def step(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        below = betainc(a, b, mid) < r
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 40, step, (lo, hi))
    return 0.5 * (lo + hi)
