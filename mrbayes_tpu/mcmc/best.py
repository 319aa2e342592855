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


# ---------------------------------------------------------------------
# dedicated species-tree proposal from gene-tree minimum depths
# (reference Move_SpeciesTree, src/best.c:1715: GetMinDepthMatrix :1026,
# ModifyDepthMatrix :1202, GetSpeciesTreeFromMinDepths :476,
# GetMeanDist :299, LnProposalProbSpeciesTree :1137)

def min_depth_matrix(state, tip_species, G: int, n_tips: int,
                     S: int) -> jnp.ndarray:
    """[S, S] symmetric: minimum over genes of the age of the shallowest
    gene-tree node containing tips of both species (diag = _BIG)."""
    depth = jnp.full((S, S), _BIG)
    for g in range(G):
        D = gene_species_sets(state["parent"][g], tip_species, n_tips, S)
        has = (D[:, :, None] > 0) & (D[:, None, :] > 0)      # [V, S, S]
        node_min = jnp.min(
            jnp.where(has, state["age"][g][:, None, None], _BIG), axis=0)
        depth = jnp.minimum(depth, node_min)
    return depth.at[jnp.arange(S), jnp.arange(S)].set(_BIG)


def _cross_masks(s_left, s_right, s_parent, S: int):
    """[S-1, S, S] bool: pairs (i left-of-m, j right-of-m) per internal
    species node m = S..2S-2."""
    clade = species_clades(s_parent, S)                      # [M, S]
    L = clade[s_left[S:]] > 0
    R = clade[s_right[S:]] > 0
    return (L[:, :, None] & R[:, None, :]) \
        | (R[:, :, None] & L[:, None, :])


def _mean_min_dist(s_left, s_right, s_parent, s_age, depth, S: int):
    cross = _cross_masks(s_left, s_right, s_parent, S)
    d = jnp.where(cross, depth[None], _BIG)
    mind = jnp.min(d, axis=(1, 2)) - s_age[S:]
    return jnp.mean(mind)


def _ln_proposal_prob(s_left, s_right, s_parent, s_age, depth, lam,
                      S: int):
    """Density of a species tree under the truncated-exponential
    depth-matrix proposal (reference LnProposalProbSpeciesTree,
    src/best.c:1137).  The x==1 special case of the reference is the
    exact limit of the general formula, recovered here by clamping."""
    cross = _cross_masks(s_left, s_right, s_parent, S)       # [S-1,S,S]
    # halve double counting: keep upper triangle only
    iu = jnp.triu(jnp.ones((S, S), bool), 1)
    cross = cross & iu[None]
    dist = jnp.maximum(depth[None] - s_age[S:, None, None], 0.0)
    norm = jnp.maximum(1.0 - jnp.exp(-lam * depth[None]), 1e-30)
    e = jnp.exp(-lam * dist)
    dens = lam * e / norm
    prob = jnp.maximum((1.0 - e) / norm, 1e-30)
    sumdr = jnp.sum(jnp.where(cross, dens / prob, 0.0), axis=(1, 2))
    logprod = jnp.sum(jnp.where(cross, jnp.log(prob), 0.0), axis=(1, 2))
    node_ln = jnp.log(jnp.maximum(sumdr, 1e-30)) + logprod
    total = jnp.sum(node_ln)
    return jnp.where(jnp.isnan(total), 0.0, total)


def make_species_tree_move(G: int, S: int, tip_species, n_tips: int):
    """Traced Move_SpeciesTree: propose a whole new species tree by
    perturbing the gene-tree minimum-depth matrix with truncated
    exponentials and single-linkage-clustering the result back into a
    clock tree (the reference's sorted-pair polytomy resolution,
    src/best.c:476, expressed as a fori_loop of masked merges).  The
    joint MSC prior ratio is left to the engine's generic MH step; the
    returned Hastings ratio is backward - forward proposal density.
    ``tuning`` is the reference's lambda divider (lambdadiv, default
    1.2, autotuned as a multiplier)."""
    ii, jj = np.triu_indices(S, 1)
    ii_j, jj_j = jnp.asarray(ii), jnp.asarray(jj)
    P = len(ii)
    M = 2 * S - 1

    def mv(key, state, tuning):
        depth = min_depth_matrix(state, tip_species, G, n_tips, S)
        dvec = depth[ii_j, jj_j]                             # [P]
        lam_f = 1.0 / jnp.maximum(
            _mean_min_dist(state["s_left"], state["s_right"],
                           state["s_parent"], state["s_age"], depth, S)
            * tuning, 1e-12)
        # truncated-exponential perturbation (ModifyDepthMatrix)
        u = jax.random.uniform(key, (P,))
        delta = jnp.log1p(-u * (1.0 - jnp.exp(-lam_f * dvec))) / (-lam_f)
        dmod = dvec - delta
        # single-linkage clustering of the modified depths
        order = jnp.argsort(dmod)
        root_of = jnp.arange(S, dtype=jnp.int32)
        sl = jnp.zeros((M,), jnp.int32)
        sr = jnp.zeros((M,), jnp.int32)
        sp = jnp.full((M,), -1, jnp.int32)
        sa = jnp.zeros((M,), jnp.float32)

        def body(t, carry):
            root_of, sl, sr, sp, sa, cnt = carry
            p = order[t]
            ci = root_of[ii_j[p]]
            cj = root_of[jj_j[p]]
            merge = ci != cj
            k = S + cnt
            sl2 = sl.at[k].set(ci)
            sr2 = sr.at[k].set(cj)
            sp2 = sp.at[ci].set(k).at[cj].set(k)
            sa2 = sa.at[k].set(dmod[p].astype(jnp.float32))
            member = (root_of == ci) | (root_of == cj)
            root2 = jnp.where(member, k, root_of)
            pick = lambda a, b: jnp.where(merge, a, b)   # noqa: E731
            return (pick(root2, root_of), pick(sl2, sl), pick(sr2, sr),
                    pick(sp2, sp), pick(sa2, sa),
                    cnt + merge.astype(jnp.int32))

        root_of, sl, sr, sp, sa, cnt = jax.lax.fori_loop(
            0, P, body, (root_of, sl, sr, sp, sa, jnp.int32(0)))
        lam_b = 1.0 / jnp.maximum(
            _mean_min_dist(sl, sr, sp, sa, depth, S) * tuning, 1e-12)
        ln_fwd = _ln_proposal_prob(sl, sr, sp, sa, depth, lam_f, S)
        ln_bwd = _ln_proposal_prob(state["s_left"], state["s_right"],
                                   state["s_parent"], state["s_age"],
                                   depth, lam_b, S)
        out = {**state, "s_left": sl.astype(state["s_left"].dtype),
               "s_right": sr.astype(state["s_right"].dtype),
               "s_parent": sp.astype(state["s_parent"].dtype),
               "s_age": sa.astype(state["s_age"].dtype)}
        return out, ln_bwd - ln_fwd

    return mv


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
