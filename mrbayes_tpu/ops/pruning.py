"""Felsenstein pruning on dense tensors (traced, jit/vmap-able).

One division's log-likelihood given a traced topology.  The conditional-
likelihood tensor is ``[n_nodes, patterns, rate_cats, states]``; the pass is
a ``lax.scan`` over internal nodes in traced postorder, each step two
batched (pattern×cat, state)×(state, state) contractions — the MXU path.
Per-node max-rescaling keeps float32 partials in range (role of the
reference's CondLikeScaler_* and BEAGLE's dynamic rescaling protocol,
src/likelihood.c:4939-5612, src/mbbeagle.c:400-538 — here rescaling is
unconditional, which is branch-free and cheap on TPU).

Root reduction: lnL = Σ_p w_p log( (1-pinv) Σ_k f_k Σ_s π_s CL[p,k,s]
+ pinv Σ_s π_s 1[pattern p constant at s] ), reference
src/likelihood.c:6238-6368 (Likelihood_NUC4 family).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .tiprobs import transition_probs
from .traversal import postorder_internal

_TINY = 1e-30


def make_pruner(tip_partials, n_cats: int, coding: str = "all"):
    """Build the per-division Pallas pruning wiring (or None when the
    working set would not fit VMEM).  ``tip_partials`` [n, P, S] must be
    the exact constant later passed to division_loglik; ``coding`` != all
    accounts for the appended dummy constant patterns."""
    import numpy as np

    from .pruning_pallas import (PruningPallas, PruningPallasWavefront,
                                 pick_pattern_block, wavefront_vmem_bytes,
                                 VMEM_CAP)
    tp = np.asarray(tip_partials)
    n_tips, P, S = tp.shape
    if coding != "all":
        dummy = np.broadcast_to(np.eye(S, dtype=tp.dtype), (n_tips, S, S))
        tp = np.concatenate([tp, dummy], axis=1)
    ks = n_cats * S
    ksp = ((ks + 7) // 8) * 8
    ppad = ((tp.shape[1] + 127) // 128) * 128
    if pick_pattern_block(n_tips, ksp, ppad) is None:
        return None
    import os
    W = 8
    if os.environ.get("MB_TPU_WAVEFRONT", "0") == "1" \
            and n_tips >= 24 and ksp <= 32 \
            and wavefront_vmem_bytes(n_tips, ksp, 128, W) <= VMEM_CAP:
        # Level-batched kernel: cuts the in-kernel dependent chain from
        # n_int to ~tree height.  OPT-IN (measured SLOWER on v5e for
        # hymfossil: ~9 us/row vs ~1 us/serial-step — the block-diagonal
        # assembly pays lane-unaligned VMEM writes and a value relayout
        # that outweigh the depth win; kept for future Mosaic versions
        # and as the reference implementation of the schedule).
        return PruningPallasWavefront(tp, n_cats, W=W)
    return PruningPallas(tp, n_cats)


def root_partials(left, right, parent, blen, tip_partials, lam, U, Uinv,
                  cat_rates, pinv, n_tips: int, rate_mult=1.0):
    """Run the pruning pass; return (partials [n_nodes,P,K,S] with the root
    row populated, logscale [P]).  Per-node max-rescaling keeps float32
    partials in range; ``pinv > 0`` rescales the variable-class rate by
    1/(1-pinv) (reference src/likelihood.c:9309-9310)."""
    n_nodes = 2 * n_tips - 1
    npat, s = tip_partials.shape[1], tip_partials.shape[2]
    k = cat_rates.shape[0]
    dtype = tip_partials.dtype

    pinv0 = jnp.asarray(pinv, dtype)
    base = jnp.asarray(rate_mult, dtype) / jnp.maximum(1.0 - pinv0, 1e-6)
    tau = blen.astype(dtype) * base
    eff = tau[:, None] * cat_rates[None, :].astype(dtype)
    P = transition_probs(lam.astype(dtype), U.astype(dtype),
                         Uinv.astype(dtype), eff)

    partials = jnp.zeros((n_nodes, npat, k, s), dtype)
    partials = partials.at[:n_tips].set(
        jnp.broadcast_to(tip_partials[:, :, None, :], (n_tips, npat, k, s)))

    order = postorder_internal(parent, n_tips)

    def step(carry, v):
        partials, logscale = carry
        l = left[v]
        r = right[v]
        cl_l = partials[l]                       # [P, K, S]
        cl_r = partials[r]
        wl = jnp.einsum("ksj,pkj->pks", P[l], cl_l)
        wr = jnp.einsum("ksj,pkj->pks", P[r], cl_r)
        cl = wl * wr
        m = jnp.maximum(jnp.max(cl, axis=(1, 2)), _TINY)   # [P]
        cl = cl / m[:, None, None]
        logscale = logscale + jnp.log(m)
        partials = partials.at[v].set(cl)
        return (partials, logscale), None

    # tiny trees (BEST gene trees, small alignments) are dispatch-bound:
    # fully unroll the short postorder so XLA can fuse across steps
    unroll = n_tips - 1 if n_tips <= 16 else 1
    (partials, logscale), _ = jax.lax.scan(
        step, (partials, jnp.zeros((npat,), dtype)), order,
        unroll=unroll)
    return partials, logscale


def final_partials(left, right, parent, blen, tip_partials, lam, U, Uinv,
                   cat_rates, pinv, n_tips: int, rate_mult=1.0):
    """Down-pass + up-pass ("final" conditional likelihoods at every
    node) for posterior reporting — the role of the reference's
    CondLikeUp_* family (src/likelihood.c:4574-4938: final likes F_p are
    built from the parent's finals via F_p[i] = D_p[i] ·
    Σ_j (F_a[j]/Σ_i P_p[j,i]D_p[i]) P_p[j,i], the division removing p's
    own message from the parent's final).

    Returns (D [n_nodes,P,K,S], F [n_nodes,P,K,S], flog [n_nodes,P],
    logscale [P]).  True values: D_root = D[root]·exp(logscale);
    F_v = F[v]·exp(logscale + flog[v]) — every node's final partial
    carries the same full-tree scale plus its own up-pass rescale, so
    per-pattern posteriors need only logscale + flog for absolute terms
    (the pinvar mixture); pure normalizations cancel them entirely."""
    n_nodes = 2 * n_tips - 1
    root = n_nodes - 1
    npat = tip_partials.shape[1]
    dtype = tip_partials.dtype

    D, logscale = root_partials(
        left, right, parent, blen, tip_partials, lam, U, Uinv,
        cat_rates, pinv, n_tips, rate_mult)

    # rebuild the same per-branch transition tensors as the down-pass
    pinv0 = jnp.asarray(pinv, dtype)
    base = jnp.asarray(rate_mult, dtype) / jnp.maximum(1.0 - pinv0, 1e-6)
    tau = blen.astype(dtype) * base
    eff = tau[:, None] * cat_rates[None, :].astype(dtype)
    P = transition_probs(lam.astype(dtype), U.astype(dtype),
                         Uinv.astype(dtype), eff)

    F = jnp.zeros_like(D).at[root].set(D[root])
    flog = jnp.zeros((n_nodes, npat), dtype)
    order = postorder_internal(parent, n_tips)
    rev = order[::-1]                       # root first, then top-down

    def up_child(F_v, flog_v, c, F, flog):
        D_c = D[c]
        s_c = jnp.einsum("ksj,pkj->pks", P[c], D_c)   # message c -> parent
        up = F_v / jnp.maximum(s_c, _TINY)
        # NB orientation: the down-pass contracts P[c] on its LAST axis
        # (s_c above), so the up-pass must contract on the FIRST state
        # axis — this is the active CondLikeUp_NUC4 contraction
        # (tiP[node_state, anc_state], src/likelihood.c:4574); using the
        # same axis as the down-pass is the variant the reference keeps
        # commented out and gives posteriors off by up to 0.12 for
        # unequal stationary frequencies (verified by brute-force
        # enumeration on a 4-tip GTR tree).
        F_c = jnp.einsum("pks,kjs->pkj", up, P[c]) * D_c
        m = jnp.maximum(jnp.max(F_c, axis=(1, 2)), _TINY)
        F_c = F_c / m[:, None, None]
        return F.at[c].set(F_c), flog.at[c].set(flog_v + jnp.log(m))

    def step(carry, v):
        F, flog = carry
        F_v, flog_v = F[v], flog[v]
        F, flog = up_child(F_v, flog_v, left[v], F, flog)
        F, flog = up_child(F_v, flog_v, right[v], F, flog)
        return (F, flog), None

    (F, flog), _ = jax.lax.scan(step, (F, flog), rev)
    return D, F, flog, logscale


def root_clv(left, right, parent, blen, tip_partials, lam, U, Uinv,
             cat_rates, pinv, n_tips: int, rate_mult=1.0, pruner=None):
    """Root conditional likelihoods ([P, K, S]) and per-pattern log
    rescale sums ([P]).  Dispatches to the fused Pallas kernel when a
    per-division ``PruningPallas`` wiring is supplied and the backend is
    TPU (ops/pruning_pallas.py); otherwise the lax.scan pass."""
    if pruner is not None and _pallas_enabled():
        dtype = tip_partials.dtype
        pinv0 = jnp.asarray(pinv, dtype)
        base = jnp.asarray(rate_mult, dtype) / jnp.maximum(1.0 - pinv0, 1e-6)
        tau = blen.astype(dtype) * base
        eff = tau[:, None] * cat_rates[None, :].astype(dtype)
        P = transition_probs(lam.astype(dtype), U.astype(dtype),
                             Uinv.astype(dtype), eff)
        order = postorder_internal(parent, n_tips)
        return pruner(order, left, right, P, parent=parent)
    partials, logscale = root_partials(
        left, right, parent, blen, tip_partials, lam, U, Uinv,
        cat_rates, pinv, n_tips, rate_mult)
    return partials[2 * n_tips - 2], logscale


def _pallas_enabled() -> bool:
    import os
    if os.environ.get("MB_TPU_NO_PALLAS"):
        return False
    if os.environ.get("MB_TPU_FORCE_PALLAS"):
        return True
    import jax
    return jax.default_backend() == "tpu"


def division_site_loglik(left: jnp.ndarray, right: jnp.ndarray,
                         parent: jnp.ndarray, blen: jnp.ndarray,
                         tip_partials: jnp.ndarray,
                         lam: jnp.ndarray, U: jnp.ndarray, Uinv: jnp.ndarray,
                         pi: jnp.ndarray, cat_rates: jnp.ndarray,
                         pinv: jnp.ndarray | float,
                         const_mask: jnp.ndarray | None,
                         n_tips: int,
                         rate_mult: jnp.ndarray | float = 1.0,
                         cat_weights: jnp.ndarray | None = None,
                         pruner=None) -> jnp.ndarray:
    """Per-pattern log-likelihoods [P] for one division.

    Shapes: left/right/parent/blen [2n-1]; tip_partials [n, P, S];
    lam [S] (or [K, S] for per-category generators, e.g. omega classes);
    U/Uinv [S, S] or [K, S, S]; pi [S] (or [K, S] for per-category
    stationary frequencies, e.g. symdirihyperpr beta categories);
    cat_rates [K]; cat_weights [K] (None = equal 1/K); const_mask [P, S]
    (None when pinv is fixed at 0).
    """
    root_cl, logscale = root_clv(
        left, right, parent, blen, tip_partials, lam, U, Uinv,
        cat_rates, pinv if const_mask is not None else 0.0, n_tips,
        rate_mult, pruner=pruner)
    dtype = tip_partials.dtype
    k = cat_rates.shape[0]

    if cat_weights is None:
        cat_weights = jnp.full((k,), 1.0 / k, dtype)
    if pi.ndim == 2:
        site_l = jnp.einsum("pks,k,ks->p", root_cl,
                            cat_weights.astype(dtype), pi.astype(dtype))
    else:
        site_l = jnp.einsum("pks,k,s->p", root_cl,
                            cat_weights.astype(dtype), pi.astype(dtype))
    site_l = jnp.maximum(site_l, _TINY)
    ln_var = jnp.log(site_l) + logscale

    pinv = jnp.asarray(pinv, dtype)
    if const_mask is None:
        ln_site = ln_var
    else:
        if pi.ndim == 2:
            const_l = jnp.einsum("ps,k,ks->p", const_mask.astype(dtype),
                                 cat_weights.astype(dtype),
                                 pi.astype(dtype))
        else:
            const_l = jnp.einsum("ps,s->p", const_mask.astype(dtype),
                                 pi.astype(dtype))
        ln_inv = jnp.log(jnp.maximum(pinv, _TINY)) + \
            jnp.log(jnp.maximum(const_l, _TINY))
        ln_site = jnp.where(
            pinv > 0.0,
            jnp.logaddexp(jnp.log1p(-jnp.minimum(pinv, 1 - 1e-7)) + ln_var,
                          ln_inv),
            ln_var)
    return ln_site


def division_loglik(left, right, parent, blen, tip_partials, weights,
                    lam, U, Uinv, pi, cat_rates, pinv, const_mask,
                    n_tips: int, rate_mult=1.0,
                    coding: str = "all",
                    cat_weights: jnp.ndarray | None = None,
                    pruner=None,
                    split_correction: bool = False) -> jnp.ndarray:
    """Weighted log-likelihood of one division, with optional
    ascertainment-bias correction for datasets that by construction lack
    certain patterns (reference: AddDummyChars src/model.c:176; coding
    types src/bayes.h:524-534).

    coding: "all" (none) | "variable" (no constant patterns; Mkv) |
    "noabsence" | "nopresence" (restriction-site variants).

    split_correction: compute the dummy-pattern correction in a separate
    tiny (replicated) pruning pass instead of appending dummy columns to
    the pattern axis — required when ``tip_partials`` is sharded on the
    pattern dimension (site-sharded meshes), where position-based
    slicing of appended columns would fight GSPMD.
    """
    s = tip_partials.shape[-1]
    if coding != "all" and split_correction:
        # real patterns go through the (possibly site-sharded Pallas)
        # pruner; only the tiny replicated dummy pass below stays scan
        ln_real = division_site_loglik(
            left, right, parent, blen, tip_partials, lam, U, Uinv, pi,
            cat_rates, pinv, const_mask, n_tips, rate_mult, cat_weights,
            pruner=pruner)
        dummy = jnp.broadcast_to(jnp.eye(s, dtype=tip_partials.dtype),
                                 (tip_partials.shape[0], s, s))
        dmask = (jnp.eye(s, dtype=const_mask.dtype)
                 if const_mask is not None else None)
        ln_dummy = division_site_loglik(
            left, right, parent, blen, dummy, lam, U, Uinv, pi,
            cat_rates, pinv, dmask, n_tips, rate_mult, cat_weights,
            pruner=None)
        return _coding_total(ln_real, ln_dummy, weights, coding, s)
    if coding != "all":
        # append s dummy constant patterns (one-hot columns for each state)
        dummy = jnp.broadcast_to(jnp.eye(s, dtype=tip_partials.dtype),
                                 (tip_partials.shape[0], s, s))
        tip_partials = jnp.concatenate([tip_partials, dummy], axis=1)
        if const_mask is not None:
            const_mask = jnp.concatenate(
                [const_mask, jnp.eye(s, dtype=const_mask.dtype)], axis=0)
    ln_site = division_site_loglik(
        left, right, parent, blen, tip_partials, lam, U, Uinv, pi,
        cat_rates, pinv, const_mask, n_tips, rate_mult, cat_weights,
        pruner=pruner)
    dtype = ln_site.dtype
    if coding == "all":
        return jnp.sum(weights.astype(dtype) * ln_site)
    ln_dummy = ln_site[-s:]
    ln_real = ln_site[:-s]
    return _coding_total(ln_real, ln_dummy, weights, coding, s)


def _coding_total(ln_real, ln_dummy, weights, coding: str, s: int):
    if coding == "variable":
        p_unobs = jnp.sum(jnp.exp(ln_dummy))
    elif coding == "noabsence":
        p_unobs = jnp.exp(ln_dummy[0])
    elif coding == "nopresence":
        p_unobs = jnp.exp(ln_dummy[-1])
    else:
        raise ValueError(f"unknown coding {coding!r}")
    w = weights.astype(ln_real.dtype)
    correction = jnp.sum(w) * jnp.log1p(-jnp.minimum(p_unobs, 1.0 - 1e-7))
    return jnp.sum(w * ln_real) - correction


def constant_state_mask(patterns, n_states: int):
    """Host-side helper: [P, S] 1.0 where a pattern is compatible with all
    taxa having constant state s (bit s set in every taxon's mask)."""
    import numpy as np
    bits = (patterns[..., None] >> np.arange(n_states)) & 1  # [n,P,S]
    return np.all(bits, axis=0).astype(np.float32)


def adgamma_loglik_from_cats(rP, ln_scale, M_pows, jump_idx):
    """Autocorrelated-gamma HMM likelihood given per-site per-category
    likelihoods (reference CalcLikeAdgamma, src/mcmc.c:1575: the forward
    algorithm with uniform category frequencies).

    rP [C, K]: rescaled per-site category likelihoods in original site
    order; ln_scale [C] their log scalers; M_pows [U, K, K] powers of the
    category transition matrix; jump_idx [C] static index into M_pows for
    the jump from site c-1 to c (entry 0 unused).

    Re-expressed TPU-first: the sequential forward recursion
    F_c = diag(rP_c) M^{j_c} F_{c-1} becomes an associative scan over
    normalized K x K site operators — O(log C) depth of batched small
    matmuls instead of a C-step serial loop.
    """
    C, K = rP.shape
    A = rP[:, :, None] * M_pows[jump_idx]            # diag(rP_c) @ M^j
    A = A.at[0].set(jnp.diag(rP[0]))
    m = jnp.maximum(jnp.max(A, axis=(1, 2)), _TINY)
    A = A / m[:, None, None]

    def comb(a, b):
        Ma, la = a
        Mb, lb = b
        Mo = jnp.matmul(Mb, Ma, precision=jax.lax.Precision.HIGHEST)
        mo = jnp.maximum(jnp.max(Mo, axis=(-2, -1)), _TINY)
        return Mo / mo[..., None, None], la + lb + jnp.log(mo)

    T, logs = jax.lax.associative_scan(comb, (A, jnp.log(m)))
    return logs[-1] + jnp.sum(ln_scale) + jnp.log(jnp.sum(T[-1]) / K)
