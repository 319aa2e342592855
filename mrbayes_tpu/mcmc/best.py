"""BEST / multispecies-coalescent (MSC): species trees containing gene
trees (reference src/best.c).

The reference computes the joint gene-tree/species-tree prior by mapping
each gene tree onto the species tree, sorting coalescent events per
population, and accumulating interval terms (LnPriorProbGeneTree,
src/best.c:826).  Sorting is hostile to traced TPU code, so the density is
re-derived in a sort-free form: with k_b(t) lineages in population b at
time t, the coalescent exponent is

    ∫ k_b(t)(k_b(t)-1) dt  =  Σ_{i≠j} |overlap of lineages i and j in b|

— a pairwise interval-intersection reduction, computed as one dense
[edges, edges, populations] min/max tensor expression (VPU-friendly,
no data-dependent control flow).  The per-population event counts and the
validity constraint (a coalescence may not predate the species-tree MRCA
of its descendants) come from the same ancestor-matrix machinery used for
constraint checking.

Populations are species-tree branches; theta_b = ploidy-factor × N_b
(src/best.c:841-851), with popvarpr=equal sharing one N.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.traversal import ancestor_matrix

NEG_INF = -1e30
_BIG = 1e30


def species_clades(s_parent: jnp.ndarray, n_species: int) -> jnp.ndarray:
    """[2S-1, S] float: clade[m, s] = 1 iff species tip s is below-or-at
    species node m."""
    A = ancestor_matrix(s_parent)               # [M, M] u below v
    return jnp.transpose(A[:n_species, :])      # [M, S] -> node m row


def gene_species_sets(g_parent: jnp.ndarray, tip_species: jnp.ndarray,
                      n_tips: int, n_species: int) -> jnp.ndarray:
    """[2N-1, S]: D[v, s] = 1 iff gene node v has a descendant tip of
    species s."""
    Ag = ancestor_matrix(g_parent)               # [V, V]
    onehot = jax.nn.one_hot(tip_species, n_species, dtype=jnp.float32)
    return jnp.minimum(jnp.einsum("ts,tv->vs", onehot, Ag[:n_tips, :]), 1.0)


def msc_gene_log_prior(g_parent, g_age, tip_species, s_parent, s_age,
                       theta, n_tips: int, n_species: int) -> jnp.ndarray:
    """Log density of one gene tree under the MSC given the species tree
    (reference LnPriorProbGeneTree, src/best.c:826). ``theta`` is
    [2S-1] per-population (ploidy factor already applied).

    Scaling note: the pairwise overlap tensor below is [V, V, M] per gene
    (V = gene-tree nodes, M = species-tree nodes) and is vmapped over
    runs x chains, so memory/compute grow as O(chains * genes * V^2 * M).
    Fine through tens of taxa; for very large taxon counts a segmented
    per-population accumulation would be needed instead."""
    V = 2 * n_tips - 1
    M = 2 * n_species - 1
    g_root = V - 1
    s_root = M - 1

    clade = species_clades(s_parent, n_species)        # [M, S]
    D = gene_species_sets(g_parent, tip_species, n_tips, n_species)  # [V,S]
    A_s = ancestor_matrix(s_parent)                    # [M, M]

    # species-MRCA of every gene node: shallowest species node whose clade
    # contains the gene node's species set
    contains = jnp.all(D[:, None, :] <= clade[None, :, :] + 1e-6, axis=-1)
    m_age = jnp.where(contains, s_age[None, :], _BIG)  # [V, M]
    sp_map = jnp.argmin(m_age, axis=-1)                # [V]

    # population top ages (root population extends to infinity)
    top = jnp.where(s_parent >= 0, s_age[jnp.maximum(s_parent, 0)], _BIG)

    # --- event terms: each gene internal node is a coalescence in the
    # population whose age interval contains it along sp_map's ancestry
    onpath_ev = A_s[sp_map, :]                          # [V, M]
    t = g_age[:, None]
    in_pop = (onpath_ev > 0) & (t >= s_age[None, :] - 1e-12) \
        & (t < top[None, :])
    internal = jnp.arange(V) >= n_tips
    in_pop = in_pop & internal[:, None]
    n_events = jnp.sum(in_pop, axis=0).astype(jnp.float32)   # [M]

    # --- lineage-pair overlap integral per population
    # edges: every node except the gene root (lineage from node to parent)
    edge_mask = jnp.arange(V) != g_root
    lo_e = g_age
    hi_e = jnp.where(g_parent >= 0, g_age[jnp.maximum(g_parent, 0)], g_age)
    onpath = A_s[sp_map, :] > 0                          # [V, M]
    lo = jnp.maximum(lo_e[:, None], s_age[None, :])      # [V, M]
    hi = jnp.minimum(hi_e[:, None], top[None, :])
    live = onpath & edge_mask[:, None]
    lo = jnp.where(live, lo, _BIG)
    hi = jnp.where(live, hi, _BIG)                       # empty interval
    ov = jnp.maximum(
        jnp.minimum(hi[:, None, :], hi[None, :, :])
        - jnp.maximum(lo[:, None, :], lo[None, :, :]), 0.0)   # [V, V, M]
    diag = jnp.maximum(hi - lo, 0.0)
    pairsum = jnp.sum(ov, axis=(0, 1)) - jnp.sum(diag, axis=0)  # Σ_{i≠j}

    lp = jnp.sum(n_events * jnp.log(2.0 / theta) - pairsum / theta)

    # --- validity: every coalescence at or above its species MRCA, and
    # every event assigned to exactly one population
    valid_depth = jnp.all(jnp.where(internal,
                                    g_age >= s_age[sp_map] - 1e-9, True))
    assigned = jnp.sum(in_pop, axis=1)
    valid_assign = jnp.all(jnp.where(internal, assigned == 1, True))
    return jnp.where(valid_depth & valid_assign, lp, NEG_INF)


def ploidy_factor(ploidy: str) -> float:
    """src/best.c:838-844: diploid 4, haploid 2, z-linked 3."""
    return {"diploid": 4.0, "haploid": 2.0, "zlinked": 3.0}[ploidy.lower()]


def init_compatible_trees(n_tips: int, n_species: int, tip_species,
                          rng: np.random.Generator, n_genes: int):
    """Starting state: a random species clock tree with small depths and
    gene trees whose coalescences all predate the species root (i.e. every
    gene coalescence deeper than the species-tree age), which is always
    MSC-consistent (the reference seeds gene trees first and builds the
    species tree from minimum depths, src/best.c:138; seeding the other
    way around is simpler and equally valid as a starting point)."""
    from ..trees import random_clock_tree
    st, s_ages = random_clock_tree(n_species, rng, mean_age=0.05)
    genes = []
    for _ in range(n_genes):
        gt, g_ages = random_clock_tree(n_tips, rng, mean_age=0.3)
        # push all coalescences above the species root age
        root_age = s_ages.max()
        g_ages = np.where(np.arange(2 * n_tips - 1) >= n_tips,
                          g_ages + root_age * 1.05, g_ages)
        genes.append((gt, g_ages))
    return (st, s_ages), genes
