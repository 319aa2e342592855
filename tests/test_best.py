"""BEST / multispecies coalescent: the sort-free MSC density
(mrbayes_tpu/mcmc/best.py) against a hand-computed case mirroring
reference LnPriorProbGeneTree (src/best.c:826), plus an engine smoke run.
"""
import jax.numpy as jnp
import numpy as np

from mrbayes_tpu.mcmc.best import msc_gene_log_prior, ploidy_factor


def test_msc_density_hand_case():
    # species tree: (A, B) root at age 1.0
    #   nodes: 0=A tip, 1=B tip, 2=root
    s_parent = jnp.asarray([2, 2, -1])
    s_age = jnp.asarray([0.0, 0.0, 1.0])
    # gene tree: 3 tips a1,a2 (species A), b1 (species B)
    #   nodes: 0=a1, 1=a2, 2=b1, 3=(a1,a2)@0.5, 4=root@2.0
    g_parent = jnp.asarray([3, 3, 4, 4, -1])
    g_age = jnp.asarray([0.0, 0.0, 0.0, 0.5, 2.0])
    tip_species = jnp.asarray([0, 0, 1])
    theta = jnp.full((3,), 0.7)

    lp = msc_gene_log_prior(g_parent, g_age, tip_species, s_parent, s_age,
                            theta, n_tips=3, n_species=2)
    # pop A: one coalescence, k=2 over [0, 0.5]  -> ln(2/θ) - 1.0/θ
    # root pop: one coalescence, k=2 over [1, 2] -> ln(2/θ) - 2.0/θ
    expect = 2 * np.log(2.0 / 0.7) - 3.0 / 0.7
    np.testing.assert_allclose(float(lp), expect, rtol=1e-5)


def test_msc_rejects_inconsistent_gene_tree():
    # same setup, but the cross-species coalescence happens at 0.5 —
    # below the species divergence at 1.0: invalid under the MSC
    s_parent = jnp.asarray([2, 2, -1])
    s_age = jnp.asarray([0.0, 0.0, 1.0])
    g_parent = jnp.asarray([3, 4, 3, 4, -1])   # (a1,b1) coalesce first
    g_age = jnp.asarray([0.0, 0.0, 0.0, 0.5, 2.0])
    tip_species = jnp.asarray([0, 0, 1])
    theta = jnp.full((3,), 0.7)
    lp = msc_gene_log_prior(g_parent, g_age, tip_species, s_parent, s_age,
                            theta, n_tips=3, n_species=2)
    assert float(lp) < -1e29


def test_ploidy_factors():
    assert ploidy_factor("diploid") == 4.0
    assert ploidy_factor("Haploid".lower()) == 2.0
    assert ploidy_factor("zlinked") == 3.0


def test_best_engine_smoke(primates):
    """2-gene BEST analysis on primates: chains initialize consistent
    (finite prior), run a short block, stay finite, and the species tree
    is extractable with species tip labels."""
    from mrbayes_tpu.data import DataSet, make_divisions, parse_char_range
    from mrbayes_tpu.mcmc.engine import Engine
    from mrbayes_tpu.mcmc.settings import (DivisionSettings, McmcSettings,
                                           TreeSettings)
    part = [parse_char_range(["1-400"], 898), parse_char_range(["401-."], 898)]
    ds = DataSet(taxa=primates.taxa, nchar=primates.matrix.nchar,
                 divisions=make_divisions(primates.matrix, part))
    # 12 taxa -> 6 species of 2 taxa each
    spp = [(f"sp{k}", [2 * k, 2 * k + 1]) for k in range(6)]
    ts = TreeSettings(speciestree=True, species_partition=spp,
                      ploidy="diploid")
    eng = Engine(ds, [DivisionSettings(nst="2", rates="equal")] * 2,
                 tree_settings=ts,
                 mcmc=McmcSettings(nruns=1, nchains=2, seed=11, ngen=100))
    states, bk = eng.init_chains()
    lnP0 = np.asarray(states["lnP"])
    assert np.all(lnP0 > -1e29), lnP0
    states, bk = eng.run_block(states, bk, 60)
    assert np.all(np.isfinite(np.asarray(states["lnL"])))
    assert np.all(np.asarray(states["lnP"]) > -1e29)
    t = eng.extract_tree(states, 0)
    assert t.n_tips == 6 and t.rooted
    assert eng.tree_taxa_labels == [f"sp{k}" for k in range(6)]
    # gene trees extractable too
    gt = eng.extract_gene_tree(states, 0, 1)
    assert gt.n_tips == 12
    assert np.all(gt.blen[:-1] >= -1e-6)
