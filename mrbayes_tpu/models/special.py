"""Special functions in float32-robust, fully traced form.

``jax.scipy.special.gammainc`` underflows for small x in float32, which
breaks discrete-gamma category rates at small shape values.  These
implementations keep the x^a e^{-x} prefactor in log space (textbook
series / continued-fraction evaluation, cf. Numerical Recipes gammp/gammq)
so they stay accurate across the shape range the sampler visits
(alpha in [1e-3, 200], reference MIN/MAX_SHAPE_PARAM src/bayes.h).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


def log_gammainc_lower(a: jnp.ndarray, x: jnp.ndarray,
                       iters: int = 64) -> jnp.ndarray:
    """log P(a, x) — log of the regularized lower incomplete gamma."""
    a, x = jnp.broadcast_arrays(jnp.asarray(a, jnp.float32),
                                jnp.asarray(x, jnp.float32))
    x = jnp.maximum(x, 1e-35)

    # series: P = x^a e^-x / Gamma(a+1) * sum_n x^n / prod_{k<=n}(a+k)
    def series_body(c, n):
        term, s = c
        term = term * x / (a + n)
        return (term, s + term), None

    ns = jnp.arange(1, iters + 1, dtype=jnp.float32)
    (_, s), _ = jax.lax.scan(series_body,
                             (jnp.ones_like(x), jnp.ones_like(x)), ns)
    log_p_series = a * jnp.log(x) - x - gammaln(a + 1.0) + jnp.log(s)

    # continued fraction (modified Lentz) for Q(a, x)
    tiny = 1e-30
    b0 = x + 1.0 - a
    C = jnp.full_like(x, 1.0 / tiny)
    D = 1.0 / jnp.where(jnp.abs(b0) < tiny, tiny, b0)
    H = D

    def cf_body(c, i):
        C, D, H, b = c
        an = -i * (i - a)
        b = b + 2.0
        D = an * D + b
        D = jnp.where(jnp.abs(D) < tiny, tiny, D)
        C = b + an / C
        C = jnp.where(jnp.abs(C) < tiny, tiny, C)
        D = 1.0 / D
        H = H * D * C
        return (C, D, H, b), None

    (_, _, H, _), _ = jax.lax.scan(cf_body, (C, D, H, b0),
                                   jnp.arange(1, iters + 1, dtype=jnp.float32))
    log_q_cf = a * jnp.log(x) - x - gammaln(a) + jnp.log(jnp.abs(H))
    log_p_cf = jnp.log1p(-jnp.clip(jnp.exp(log_q_cf), 0.0, 1.0 - 1e-7))

    return jnp.where(x < a + 1.0, log_p_series, log_p_cf)


def gammainc_lower(a, x, iters: int = 64):
    return jnp.exp(log_gammainc_lower(a, x, iters))


def gamma_quantile(p: jnp.ndarray, a: jnp.ndarray,
                   newton_iters: int = 25) -> jnp.ndarray:
    """Quantile of Gamma(shape=a, rate=1), robust in float32.

    Newton iteration on y = log(x): f(y) = P(a, e^y) - p;
    f'(y) = pdf(e^y) * e^y, evaluated in log space.
    """
    from jax.scipy.special import ndtri
    p, a = jnp.broadcast_arrays(jnp.asarray(p, jnp.float32),
                                jnp.asarray(a, jnp.float32))
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    # Wilson–Hilferty initial guess (good for a >~ 1)
    z = ndtri(p)
    wh = a * (1.0 - 1.0 / (9.0 * a) + z / (3.0 * jnp.sqrt(a))) ** 3
    # small-a / small-p guess from leading series term: P ~ x^a/Gamma(a+1)
    small = (jnp.log(p) + gammaln(a + 1.0)) / a
    y = jnp.where((a < 0.7) | (wh <= 0.0), small,
                  jnp.log(jnp.maximum(wh, 1e-30)))

    def newton(y, _):
        x = jnp.exp(y)
        logP = log_gammainc_lower(a, x)
        # d/dy P(a, e^y) = pdf(x) * x ; log pdf + log x:
        logdf = a * y - x - gammaln(a)
        # damped step in log space: (P - p) / (pdf * x)
        step = (jnp.exp(logP) - p) * jnp.exp(-logdf)
        step = jnp.clip(step, -2.0, 2.0)
        return y - step, None

    y, _ = jax.lax.scan(newton, y, None, length=newton_iters)
    return jnp.exp(y)


def beta_quantile(p: jnp.ndarray, a: jnp.ndarray,
                 newton_iters: int = 40) -> jnp.ndarray:
    """Quantile of the symmetric Beta(a, a) distribution (reference
    BetaQuantile, src/utils.c:9651; used by BetaBreaks :9579 to
    discretize symdirihyperpr state-frequency categories).

    Newton on the logit: x = sigmoid(y); F(x) = betainc(a, a, x).
    """
    from jax.scipy.special import betainc, betaln
    p, a = jnp.broadcast_arrays(jnp.asarray(p, jnp.float32),
                                jnp.asarray(a, jnp.float32))
    p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    # normal-approximation start: Beta(a,a) has mean 1/2, var 1/(4(2a+1))
    from jax.scipy.special import ndtri
    x0 = jnp.clip(0.5 + ndtri(p) * jnp.sqrt(1.0 / (4.0 * (2.0 * a + 1.0))),
                  1e-4, 1.0 - 1e-4)
    y = jnp.log(x0) - jnp.log1p(-x0)

    def newton(y, _):
        x = jax.nn.sigmoid(y)
        # d/dy F(sigmoid(y)) = pdf(x) * x * (1 - x)
        logdf = (a * jnp.log(x) + a * jnp.log1p(-x) - betaln(a, a))
        step = (betainc(a, a, x) - p) * jnp.exp(-logdf)
        return y - jnp.clip(step, -4.0, 4.0), None

    y, _ = jax.lax.scan(newton, y, None, length=newton_iters)
    return jax.nn.sigmoid(y)


def beta_category_freqs(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """[k] symmetric-Beta(a, a) category values at quantile midpoints
    (reference BetaBreaks, src/utils.c:9579): the k state-frequency
    categories of a symdirihyperpr binary character."""
    mid = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
    return beta_quantile(mid, a)
