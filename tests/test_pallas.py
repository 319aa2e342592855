"""The fused Pallas pruning kernel must agree exactly with the lax.scan
reference pass (ops/pruning.py).  On CPU the kernel runs in interpreter
mode via pltpu.force_tpu_interpret_mode — same program, same math."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mrbayes_tpu.models.substitution import nuc_q_gtr, reversible_q
from mrbayes_tpu.ops.pruning import root_clv, root_partials
from mrbayes_tpu.ops.pruning_pallas import PruningPallas
from mrbayes_tpu.ops.tiprobs import eigh_reversible
from mrbayes_tpu.trees import random_unrooted
from conftest import example


def _case(n_tips, P, S, K, seed):
    rng = np.random.default_rng(seed)
    t = random_unrooted(n_tips, rng, mean_blen=0.1)
    tips = (rng.random((n_tips, P, S)) < 0.4).astype(np.float32)
    tips[..., 0] = 1.0
    pi = rng.random(S) + 0.2
    pi = jnp.asarray(pi / pi.sum(), jnp.float32)
    if S == 4:
        r6 = jnp.asarray(rng.random(6), jnp.float32)
        Q = nuc_q_gtr(r6 / r6.sum(), pi)
    else:
        ex = jnp.asarray(rng.random(S * (S - 1) // 2), jnp.float32)
        Q = reversible_q(ex, pi)
    lam, U, Uinv = eigh_reversible(Q, pi)
    cat = jnp.linspace(0.3, 2.2, K)
    return t, jnp.asarray(tips), lam, U, Uinv, pi, cat


@pytest.mark.parametrize("n_tips,P,S,K", [(8, 137, 4, 4), (12, 434, 4, 1),
                                          (6, 40, 20, 2)])
def test_pallas_matches_scan(n_tips, P, S, K):
    t, tips, lam, U, Uinv, pi, cat = _case(n_tips, P, S, K, seed=n_tips)
    left, right, parent = (jnp.asarray(t.left), jnp.asarray(t.right),
                           jnp.asarray(t.parent))
    blen = jnp.asarray(t.blen, jnp.float32)
    parts, ls_ref = root_partials(left, right, parent, blen, tips,
                                  lam, U, Uinv, cat, 0.0, n_tips)
    root_ref = parts[2 * n_tips - 2]

    pruner = PruningPallas(np.asarray(tips), K)
    os.environ["MB_TPU_FORCE_PALLAS"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            root_p, ls_p = jax.jit(
                lambda b: root_clv(left, right, parent, b, tips, lam, U,
                                   Uinv, cat, 0.0, n_tips, pruner=pruner)
            )(blen)
            root_p, ls_p = jax.block_until_ready((root_p, ls_p))
    finally:
        del os.environ["MB_TPU_FORCE_PALLAS"]
    w = jnp.full((K,), 1.0 / K)
    ln_ref = jnp.log(jnp.einsum("pks,k,s->p", root_ref, w, pi)) + ls_ref
    ln_p = jnp.log(jnp.einsum("pks,k,s->p", root_p, w, pi)) + ls_p
    np.testing.assert_allclose(np.asarray(ln_p), np.asarray(ln_ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_vmap_batches_chains():
    n_tips, P, S, K = 8, 130, 4, 4
    t, tips, lam, U, Uinv, pi, cat = _case(n_tips, P, S, K, seed=7)
    left, right, parent = (jnp.asarray(t.left), jnp.asarray(t.right),
                           jnp.asarray(t.parent))
    blen = jnp.asarray(t.blen, jnp.float32)
    blens = jnp.stack([blen * (1 + 0.05 * i) for i in range(3)])
    pruner = PruningPallas(np.asarray(tips), K)
    os.environ["MB_TPU_FORCE_PALLAS"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            roots, lss = jax.jit(jax.vmap(
                lambda b: root_clv(left, right, parent, b, tips, lam, U,
                                   Uinv, cat, 0.0, n_tips, pruner=pruner)
            ))(blens)
            roots, lss = jax.block_until_ready((roots, lss))
    finally:
        del os.environ["MB_TPU_FORCE_PALLAS"]
    for i in range(3):
        parts, ls_ref = root_partials(left, right, parent, blens[i], tips,
                                      lam, U, Uinv, cat, 0.0, n_tips)
        w = jnp.full((K,), 1.0 / K)
        ln_ref = jnp.log(jnp.einsum(
            "pks,k,s->p", parts[2 * n_tips - 2], w, pi)) + ls_ref
        ln_p = jnp.log(jnp.einsum("pks,k,s->p", roots[i], w, pi)) + lss[i]
        np.testing.assert_allclose(np.asarray(ln_p), np.asarray(ln_ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("C", [4, 8])
def test_interleaved_walks_match_scan(C):
    """vmap over C chains triggers the G-walk interleaved kernel
    (pick_group: G=C for C in {4, 8}) — must equal the scan pass."""
    from mrbayes_tpu.ops.pruning_pallas import pick_group
    n_tips, P, S, K = 9, 140, 4, 4
    t, tips, lam, U, Uinv, pi, cat = _case(n_tips, P, S, K, seed=C)
    left, right, parent = (jnp.asarray(t.left), jnp.asarray(t.right),
                           jnp.asarray(t.parent))
    blen = jnp.asarray(t.blen, jnp.float32)
    assert pick_group(C, n_tips, K * S) == C
    blens = jnp.stack([blen * (1 + 0.03 * i) for i in range(C)])
    pruner = PruningPallas(np.asarray(tips), K)
    os.environ["MB_TPU_FORCE_PALLAS"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            roots, lss = jax.jit(jax.vmap(
                lambda b: root_clv(left, right, parent, b, tips, lam, U,
                                   Uinv, cat, 0.0, n_tips, pruner=pruner)
            ))(blens)
            roots, lss = jax.block_until_ready((roots, lss))
    finally:
        del os.environ["MB_TPU_FORCE_PALLAS"]
    w = jnp.full((K,), 1.0 / K)
    for i in range(C):
        parts, ls_ref = root_partials(left, right, parent, blens[i], tips,
                                      lam, U, Uinv, cat, 0.0, n_tips)
        ln_ref = jnp.log(jnp.einsum(
            "pks,k,s->p", parts[2 * n_tips - 2], w, pi)) + ls_ref
        ln_p = jnp.log(jnp.einsum("pks,k,s->p", roots[i], w, pi)) + lss[i]
        np.testing.assert_allclose(np.asarray(ln_p), np.asarray(ln_ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n_tips,P,S,K,W", [(24, 137, 4, 4, 8),
                                            (40, 300, 4, 1, 8),
                                            (24, 64, 2, 4, 4)])
def test_wavefront_matches_scan(n_tips, P, S, K, W):
    """Level-batched kernel == lax.scan pass (interpret mode)."""
    from mrbayes_tpu.ops.pruning_pallas import PruningPallasWavefront
    t, tips, lam, U, Uinv, pi, cat = _case(n_tips, P, S, K, seed=n_tips)
    cat = cat[:K]
    left, right, parent = (jnp.asarray(t.left), jnp.asarray(t.right),
                           jnp.asarray(t.parent))
    blen = jnp.asarray(t.blen, jnp.float32)
    parts, ls_ref = root_partials(left, right, parent, blen, tips,
                                  lam, U, Uinv, cat, 0.0, n_tips)
    root_ref = parts[2 * n_tips - 2]
    pruner = PruningPallasWavefront(np.asarray(tips), K, W=W)
    os.environ["MB_TPU_FORCE_PALLAS"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            root_p, ls_p = jax.jit(
                lambda b: root_clv(left, right, parent, b, tips, lam, U,
                                   Uinv, cat, 0.0, n_tips, pruner=pruner)
            )(blen)
            root_p, ls_p = jax.block_until_ready((root_p, ls_p))
    finally:
        del os.environ["MB_TPU_FORCE_PALLAS"]
    w = jnp.full((K,), 1.0 / K)
    ln_ref = jnp.log(jnp.einsum("pks,k,s->p", root_ref, w, pi)) + ls_ref
    ln_p = jnp.log(jnp.einsum("pks,k,s->p", root_p, w, pi)) + ls_p
    np.testing.assert_allclose(np.asarray(ln_p), np.asarray(ln_ref),
                               rtol=2e-5, atol=2e-5)


def test_multiwalk_divisions_match_loop():
    """The multiwalk fused launch (one interleaved walk per
    (division, chain) pair — the default partitioned path) == the
    per-division scan fallback, on a real partitioned mixed-datatype
    engine with heterogeneous state counts, rate counts and coding."""
    from mrbayes_tpu.cli import Interpreter
    os.environ["MB_TPU_MULTIWALK"] = "1"      # opt-in path (see engine)
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {example('kim.nex')}")
    it.run_line("lset applyto=(1,2) nst=2 rates=gamma")
    try:
        eng = it.build_engine()
    finally:
        del os.environ["MB_TPU_MULTIWALK"]
    assert eng._multiwalk_pruners, "expected a multiwalk group"
    n_grouped = sum(len(g) for g, _ in eng._multiwalk_pruners)
    assert n_grouped >= 2
    states, _ = eng.init_chains(seed=9)
    st0 = {k: v[0] for k, v in states.items()}
    os.environ["MB_TPU_FORCE_PALLAS"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            a = float(eng.log_likelihood(st0))
    finally:
        del os.environ["MB_TPU_FORCE_PALLAS"]
    eng._multiwalk_pruners = []
    b = float(eng.log_likelihood(st0))    # scan fallback per division
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=0.05)


def test_multiwalk_batched_chains_match_loop():
    """vmap over chains lifts the multiwalk launch to (division, chain)
    walks; every chain's grouped lnL must equal its scan-fallback lnL."""
    from mrbayes_tpu.cli import Interpreter
    os.environ["MB_TPU_MULTIWALK"] = "1"      # opt-in path (see engine)
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {example('kim.nex')}")
    it.run_line("lset applyto=(1,2) nst=2 rates=gamma")
    try:
        eng = it.build_engine()
    finally:
        del os.environ["MB_TPU_MULTIWALK"]
    assert eng._multiwalk_pruners
    states, _ = eng.init_chains(seed=11)
    C = states["left"].shape[0]
    assert C >= 4
    os.environ["MB_TPU_FORCE_PALLAS"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            a = np.asarray(jax.vmap(eng.log_likelihood)(states))
    finally:
        del os.environ["MB_TPU_FORCE_PALLAS"]
    eng._multiwalk_pruners = []
    b = np.asarray(jax.vmap(eng.log_likelihood)(states))
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=0.05)


def test_stacked_divisions_match_loop():
    """The division-stacked fused launch == per-division launches, on a
    real partitioned mixed-datatype engine (kim: rna+dna+protein+
    standard buckets with coding corrections)."""
    from mrbayes_tpu.cli import Interpreter
    os.environ["MB_TPU_STACKED"] = "1"     # opt-in path (see engine)
    try:
        it = Interpreter(log=lambda m: None)
        it.run_line(f"execute {example('kim.nex')}")
        it.run_line("lset applyto=(1,2) nst=2 rates=gamma")
        eng = it.build_engine()
    finally:
        del os.environ["MB_TPU_STACKED"]
    assert eng._stacked_pruners, "expected a stacked group"
    n_stacked = sum(len(g) for g, _ in eng._stacked_pruners)
    assert n_stacked >= 2
    states, _ = eng.init_chains(seed=9)
    st0 = {k: v[0] for k, v in states.items()}
    os.environ["MB_TPU_FORCE_PALLAS"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            a = float(eng.log_likelihood(st0))
    finally:
        del os.environ["MB_TPU_FORCE_PALLAS"]
    eng._stacked_pruners = []
    b = float(eng.log_likelihood(st0))    # scan fallback per division
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=0.05)
