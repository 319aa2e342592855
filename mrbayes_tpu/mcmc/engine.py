"""The MC3 engine: state assembly, likelihood/prior composition, and the
jitted generation loop with Metropolis-coupled chain swaps.

TPU-first redesign of the reference RunChain loop (src/mcmc.c:15988,
hot loop :16704): every chain of every run is one row of a vmapped state
pytree; a generation is one traced step (propose → full lnL/lnPrior
recompute → Metropolis accept); heated-chain swaps permute a temperature-id
vector using a PRNG stream shared by construction (the reference shares
``swapSeed`` across MPI ranks for the same purpose, src/mcmc.c:5217-5226);
``lax.scan`` runs ``samplefreq`` generations per device dispatch.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataSet, Division
from ..models.rates import GammaRateTable, discrete_lognormal
from ..models.substitution import (mk_q, nuc_q_gtr, nuc_q_nst1, nuc_q_nst2,
                                   reversible_q)
from ..nexus.datatypes import DataType
from ..ops.pruning import constant_state_mask, division_loglik
from ..ops.tiprobs import eigh_reversible
from ..trees import Tree, random_unrooted
from . import moves as M
from .priors import (beta_lpdf, brlens_exponential_lpdf, brlens_gammadir_lpdf,
                     brlens_uniform_lpdf, dirichlet_lpdf, exponential_lpdf,
                     gamma_lpdf, lognormal_lpdf, normal_lpdf, uniform_lpdf)
from .settings import DivisionSettings, McmcSettings, Prior, TreeSettings

NEG_INF = -1e30


@dataclass
class MoveSpec:
    name: str
    fn: object
    weight: float
    tuning0: float
    target: float = 0.25
    direction: int = 1        # +1: larger tuning bolder; -1: larger = timid
    tmin: float = 1e-3
    tmax: float = 1e3
    tunable: bool = True
    updates_q: bool = False   # move changes a Q matrix -> re-eigendecompose
                              # (role of the reference's upDateCijk flag,
                              # src/likelihood.c:7864-7872)
    prior_scope: str = "both"  # which carried prior component the move can
                               # change: "tree" (topology/blens/ages/clock/
                               # tree-process params), "params"
                               # (substitution-model groups), or "both".
                               # Role of the reference's per-move
                               # lnPriorRatio scoping (src/proposal.c) —
                               # here the untouched component is carried
                               # instead of recomputed each generation.


@dataclass
class DivCfg:
    """Static per-division wiring resolved at build time."""
    div: Division
    settings: DivisionSettings
    pi_group: int = -1          # -1: fixed (not sampled)
    pi_field: str = "pi"        # state field holding the freqs ("pi"/"pi20")
    revmat_group: int = -1
    tratio_group: int = -1
    shape_group: int = -1
    pinvar_group: int = -1
    n_cats: int = 1
    fixed_pi: np.ndarray | None = None
    codon: object = None          # CodonCode when nucmodel=codon
    omega_group: int = -1         # omegavar=equal (M0)
    ny98_group: int = -1          # omegavar=ny98
    m3_group: int = -1            # omegavar=m3 (three ordered omegas)
    m10_group: int = -1           # omegavar=m10 (beta + 1+gamma mixture)
    aamodel_group: int = -1       # aamodelpr=mixed (rjMCMC over aa models)
    aarevmat_group: int = -1      # aamodel=gtr sampled 190 exchangeabilities
    fixed_aarevmat: np.ndarray | None = None  # aarevmatpr=fixed(...)
    rootpi_group: int = -1        # statefreqmodel=directional|mixed
    fixed_rootpi: np.ndarray | None = None    # rootfreqpr=fixed(...)
    dirpi_mix: bool = False       # statefreqmodel=mixed (RJ indicator)
    covswitch_group: int = -1     # covarion=yes, sampled switch rates
    fixed_covswitch: np.ndarray | None = None  # covswitchpr=fixed(s01,s10)
    doublet: bool = False         # nucmodel=doublet (16-state stem pairs)
    ratecorr_group: int = -1      # rates=adgamma autocorrelation rho
    mixt_group: int = -1          # rates=kmixture sampled category rates
    parsimony: bool = False       # lset parsmodel=yes (Tuffley-Steel)
    codon_site_pattern: object = None   # [sites] -> pattern (reporting)
    brownscale_group: int = -1    # continuous data: sampled sigma^2
    symbeta_group: int = -1       # symdirihyperpr sampled beta (hyper)
    fixed_symbeta: float = -1.0   # fixed finite beta; -1 = infinity/off
    sympi_group: int = -1         # sampled multistate standard pi
    sympi_field: str = ""         # state field name ("sympi<k>")
    n_rate_cats: int = 1          # gamma cats (n_cats may fold beta cats)


def _AA_MODEL_NAMES():
    from ..models.aa_models import AA_MODELS
    return set(AA_MODELS)


def _scalar_prior_lpdf(prior: Prior, x):
    k = prior.kind
    p = prior.params
    if k == "exponential":
        return exponential_lpdf(x, p[0])
    if k == "uniform":
        return uniform_lpdf(x, p[0], p[1])
    if k == "gamma":
        return gamma_lpdf(x, p[0], p[1])
    if k == "lognormal":
        return lognormal_lpdf(x, p[0], p[1])
    if k == "normal":
        return normal_lpdf(x, p[0], p[1])
    if k == "beta":
        return beta_lpdf(x, p[0], p[1])
    if k == "offsetexp":
        # params (offset, mean) — reference parameterization
        # src/utils.c:12787 LnPriorProbOffsetExponential_Param_Offset_Mean
        off, mean = p[0], p[1]
        rate = 1.0 / (mean - off)
        return jnp.where(x >= off,
                         jnp.log(rate) - rate * (x - off),
                         NEG_INF)
    if k == "truncatednormal":
        # params (min, mean, sd); unnormalized in the reference too for
        # ratios (normalization constant drops out of MH ratios)
        lo, mu, sd = p[0], p[1], p[2]
        return jnp.where(x >= lo, normal_lpdf(x, mu, sd), NEG_INF)
    if k == "fixed":
        return jnp.zeros_like(x)
    raise ValueError(f"unsupported scalar prior {k}")


class Engine:
    """Builds and runs one analysis (the analog of SetUpAnalysis +
    DoMcmc, reference src/model.c:21386 / src/mcmc.c:2270)."""

    def __init__(self, dataset: DataSet,
                 div_settings: list[DivisionSettings],
                 tree_settings: TreeSettings | None = None,
                 mcmc: McmcSettings | None = None,
                 links: dict[str, list[int]] | None = None,
                 move_overrides: dict | None = None,
                 start_tree: Tree | None = None):
        self.data = dataset
        self.tree_settings = tree_settings or TreeSettings()
        self.mcmc = mcmc or McmcSettings()
        self.n_tips = dataset.ntax
        self.n_nodes = 2 * self.n_tips - 1
        self.start_tree = start_tree
        self.cpp_cap = 8   # CPP relaxed clock: event slots per branch
                           # (fixed-capacity stand-in for the reference's
                           # variable-length event arrays, bayes.h:711-714)
        assert len(div_settings) == len(dataset.divisions)
        for dv, s in zip(dataset.divisions, div_settings):
            if not s.coding:
                # datatype-dependent coding default (reference
                # SetModelDefaults, src/model.c:18562-18576)
                s.coding = ("variable" if dv.dtype is DataType.STANDARD
                            else "noabsencesites"
                            if dv.dtype is DataType.RESTRICTION
                            else "all")
        ts = self.tree_settings
        self.best = bool(ts.speciestree)
        if self.best:
            if not ts.species_partition:
                raise ValueError("topologypr=speciestree requires a "
                                 "speciespartition")
            self.n_species = len(ts.species_partition)
            self.species_names = [nm for nm, _ in ts.species_partition]
            tip_sp = np.full(self.n_tips, -1, np.int32)
            for si, (_, idxs) in enumerate(ts.species_partition):
                tip_sp[list(idxs)] = si
            if (tip_sp < 0).any():
                raise ValueError("speciespartition must cover every taxon")
            self.tip_species = jnp.asarray(tip_sp)
        self._build_dating()
        self._build_groups(div_settings, links)
        self._build_tree_groups(links)
        self._build_data_tensors()
        self._build_moves()
        self._apply_move_overrides(move_overrides or {})

    def _apply_move_overrides(self, overrides: dict):
        """propset-style per-move control: name -> {prob|tuning|target|
        tunable: value} (reference propset command, e.g.
        ``propset ExtSPR$prob=0``, src/model.c DoPropset:4282)."""
        if not overrides:
            return
        known = {m.name: m for m in self.moves}
        # the reference's zero-default-weight move types (it ships them
        # disabled, SetUpMoveTypes relProposalProb=0): intentionally
        # uncarried here — reject with the documented rationale rather
        # than a generic unknown-name error
        uncarried = {"extss", "extssclock", "lspr", "parseraser1",
                     "parsspr1", "parsspr2", "parstbr1_leaf",
                     "parstbr2", "extspr1", "extspr2", "extspr3",
                     "exttbr1", "exttbr2", "exttbr3", "exttbr4"}
        for name, kv in overrides.items():
            if name.lower() in uncarried:
                raise ValueError(
                    f"propset: move {name!r} is a reference move type "
                    f"shipped with default weight 0 (disabled; "
                    f"src/model.c SetUpMoveTypes) and is intentionally "
                    f"not carried — every default-active reference move "
                    f"has a counterpart (COVERAGE.md)")
            if name not in known:
                raise ValueError(
                    f"propset: unknown move {name!r}; active moves: "
                    f"{sorted(known)}")
            m = known[name]
            for k, v in kv.items():
                if k == "prob":
                    m.weight = float(v)
                elif k in ("tuning", "tuningparam"):
                    m.tuning0 = float(v)
                elif k in ("target", "targetrate"):
                    m.target = float(v)
                elif k == "tunable":
                    m.tunable = bool(v)
                else:
                    raise ValueError(f"propset: unknown setting {k!r}")
        self.moves = [m for m in self.moves if m.weight > 0.0]
        if not self.moves:
            raise ValueError("propset removed every move")
        w = np.array([m.weight for m in self.moves])
        self.move_logits = jnp.log(jnp.asarray(w / w.sum()))

    def _build_dating(self):
        """Static dating/constraint wiring: tip calibration ages, the
        fossil-tip mask, and constraint taxon masks (reference: calibrate
        src/command.c:1161, constraint src/command.c:2419)."""
        ts = self.tree_settings
        n = self.n_tips
        self.tip_dates = np.zeros(n)
        self.sampled_tip_ages: list[tuple[int, Prior]] = []
        for ti, pr in (ts.tip_calibrations or {}).items():
            if pr.kind == "fixed":
                self.tip_dates[ti] = pr.params[0]
            elif pr.kind == "uniform":
                self.tip_dates[ti] = 0.5 * (pr.params[0] + pr.params[1])
                self.sampled_tip_ages.append((ti, pr))
            elif pr.kind == "offsetexp":
                self.tip_dates[ti] = pr.params[1]   # mean
                self.sampled_tip_ages.append((ti, pr))
            else:
                raise ValueError(f"tip calibration {pr.kind} unsupported")
        self.fossil_tips = self.tip_dates > 0.0
        self.has_dated_tips = bool(self.fossil_tips.any())
        # constraints: [C, n_tips] bool + optional age priors on MRCAs.
        # A constraint covering every taxon is a root calibration: its
        # prior replaces treeagepr (reference: dated root skips treeAgePr,
        # src/mcmc.c:9476-9484).
        self._root_calib: Prior | None = None
        cons, negs, partials = [], [], []
        for entry in (ts.constraints or []):
            # legacy 3-tuple = hard; 5-tuple carries the constraint type
            # (hard|negative|partial) and the partial second taxon set
            # (reference ConstraintType, src/bayes.h:517-521)
            if len(entry) == 3:
                nm, m, p = entry
                ctype, m2 = "hard", None
            else:
                nm, ctype, m, m2, p = entry
            if ctype == "negative":
                negs.append(m)
                continue
            if ctype == "partial":
                partials.append((m, m2))
                continue
            if m.all():
                if p is not None:
                    self._root_calib = p
                continue
            cons.append((nm, m, p))
        self.constraint_masks = (np.stack([m for (_, m, _) in cons])
                                 if cons else None)
        self.constraint_priors = [p for (_, _, p) in cons]
        self.constraint_names = [nm for (nm, _, _) in cons]
        self.negative_masks = np.stack(negs) if negs else None
        self.partial_masks = (
            (np.stack([a for a, _ in partials]),
             np.stack([b for _, b in partials])) if partials else None)

    def _constraint_terms(self, state):
        """NEG_INF when a hard constraint is violated, plus calibration
        densities on constrained-clade MRCA ages (reference: constraint
        satisfaction check src/mcmc.c:16777 DoesTreeSatisfyConstraints;
        calibration priors added in LogPrior)."""
        from ..ops.traversal import ancestor_matrix
        if (self.constraint_masks is None and self.negative_masks is None
                and self.partial_masks is None):
            return jnp.float32(0.0)
        rooted = self.tree_settings.clock
        A = ancestor_matrix(state["parent"])      # [n_nodes, n_nodes]
        tipA = A[:self.n_tips]                    # [n_tips, n_nodes]
        sizes = jnp.sum(tipA, axis=0)             # [n_nodes]
        lp = jnp.float32(0.0)

        def clade_counts(masks_np):
            m = jnp.asarray(masks_np, jnp.float32)
            return m @ tipA, jnp.sum(m, axis=1)   # [C, n_nodes], [C]

        if self.constraint_masks is not None:
            counts, totals = clade_counts(self.constraint_masks)
            is_clade = ((counts == totals[:, None])
                        & (sizes[None, :] == totals[:, None]))
            if rooted:
                mono = is_clade.any(-1)
            else:
                # unrooted: the complement side also satisfies the split
                comp = ((counts == 0.0)
                        & (sizes[None, :]
                           == self.n_tips - totals[:, None]))
                mono = (is_clade | comp).any(-1)
            lp = lp + jnp.where(jnp.all(mono), 0.0, NEG_INF)
            if rooted:
                for c, pr in enumerate(self.constraint_priors):
                    if pr is None or pr.kind == "fixed":
                        continue
                    mrca = jnp.argmax(is_clade[c])
                    lp = lp + _scalar_prior_lpdf(pr, state["age"][mrca])
        if self.negative_masks is not None:
            # banned clade: reject when any node's partition equals the
            # set (reference DoesTreeSatisfyConstraints NEGATIVE branch,
            # src/model.c:12709-12737)
            counts, totals = clade_counts(self.negative_masks)
            is_clade = ((counts == totals[:, None])
                        & (sizes[None, :] == totals[:, None]))
            if not rooted:
                comp = ((counts == 0.0)
                        & (sizes[None, :]
                           == self.n_tips - totals[:, None]))
                is_clade = is_clade | comp
            lp = lp + jnp.where(jnp.any(is_clade), NEG_INF, 0.0)
        if self.partial_masks is not None:
            # partial (backbone) constraint set1:set2 — some node must
            # contain all of set1 and none of set2 (unrooted: or the
            # mirrored direction; reference src/model.c:12660-12707)
            c1, t1 = clade_counts(self.partial_masks[0])
            c2, t2 = clade_counts(self.partial_masks[1])
            ok = (c1 == t1[:, None]) & (c2 == 0.0)
            if not rooted:
                ok = ok | ((c2 == t2[:, None]) & (c1 == 0.0))
            lp = lp + jnp.where(jnp.all(ok.any(-1)), 0.0, NEG_INF)
        return lp

    # ------------------------------------------------------------------
    # static wiring

    def _build_tree_groups(self, links):
        """`unlink topology brlens` gives each link group its own tree
        parameter (reference SetModelParams creates one tree param per
        unlinked group, src/model.c:19026; DoLink/DoUnlink :2799).
        Topology and branch lengths are tied to one tree per group: the
        tree group is the refinement of the two link vectors.  With one
        group the state keeps the flat [n_nodes] layout (no [1, ...]
        axis), so the single-tree fast path is unchanged."""
        self.n_trees = 1
        self.div_tree = [0] * self.n_div
        if self.best or not links:
            return
        tlink = links.get("topology")
        blink = links.get("brlens")
        if tlink is None and blink is None:
            return
        store: dict = {}
        div_tree = []
        for d in range(self.n_div):
            key = (tlink[d] if tlink else 0, blink[d] if blink else 0)
            if key not in store:
                store[key] = len(store)
            div_tree.append(store[key])
        self.n_trees = len(store)
        self.div_tree = div_tree
        if self.n_trees > 1 and self.tree_settings.clock:
            raise NotImplementedError(
                "unlinked topologies are supported for non-clock trees "
                "(clock analyses share one dated tree; use BEST/"
                "speciestree for multi-gene clock models)")

    def _build_groups(self, div_settings, links):
        """Assign each sampled parameter of each division to a link group.
        Default: divisions with identical settings share a group (the
        reference links parameters when IsModelSame holds,
        src/model.c:13827); `links[param][d]` overrides."""
        n_div = len(div_settings)
        self.div_cfg: list[DivCfg] = []
        self._mixed_rev: set[int] = set()
        counters = {}

        def group_of(param, d, signature):
            if links and param in links:
                key = (param, links[param][d])
            else:
                # default linking requires compatible datatypes: the
                # reference links parameters only when IsModelSame holds
                # (src/model.c:13827), which implies same datatype class
                # and state count; DNA and RNA are interchangeable there
                dv = self.data.divisions[d]
                dclass = ("nuc" if dv.dtype in (DataType.DNA, DataType.RNA)
                          else dv.dtype.value)
                # state-space-sized params additionally need matching
                # state counts (standard-data buckets of one user
                # division share dimension-free params like shape)
                dim = (dv.n_states if param.startswith(("pi", "sympi"))
                       else 0)
                key = (param, dclass, dim, signature)
            store = counters.setdefault(param, {})
            if key not in store:
                store[key] = len(store)
            return store[key]

        for d, (div, s) in enumerate(zip(self.data.divisions, div_settings)):
            cfg = DivCfg(div=div, settings=s)
            if s.parsmodel:
                # Tuffley-Steel parsimony model: no substitution
                # parameters (reference lset parsmodel=yes,
                # Likelihood_Pars src/likelihood.c:7593)
                cfg.parsimony = True
                cfg.fixed_pi = np.full(div.n_states, 1.0 / div.n_states)
                self.div_cfg.append(cfg)
                continue
            if div.dtype is DataType.CONTINUOUS:
                # Brownian-motion characters: one sampled variance rate
                # sigma^2 per link group (reference brownscalepr,
                # src/command.c:14605; likelihood ops/brownian.py —
                # the reference's own Likelihood_Cont is a stub)
                cfg.brownscale_group = group_of("brownscale", d,
                                                repr(s.brownscalepr))
                bc = s.browncorrpr
                if bc.kind != "fixed" or (bc.params
                                          and float(bc.params[0]) != 0.0):
                    raise ValueError(
                        "browncorrpr: only fixed(0) (independent "
                        "characters) is supported")
                self.div_cfg.append(cfg)
                continue
            is_nuc = div.dtype in (DataType.DNA, DataType.RNA)
            is_prot = div.dtype is DataType.PROTEIN
            if is_nuc and s.nucmodel == "codon":
                from ..models.codes import CodonCode
                cfg.codon = CodonCode(s.code)
                cfg.pi_field = "pi61"
                if s.statefreqpr.kind == "dirichlet":
                    cfg.pi_group = group_of("pi61", d, repr(s.statefreqpr))
                else:
                    cfg.fixed_pi = np.full(cfg.codon.n_states,
                                           1.0 / cfg.codon.n_states)
                if s.omegavar == "ny98":
                    cfg.ny98_group = group_of("ny98", d, "ny98")
                elif s.omegavar == "m3":
                    cfg.m3_group = group_of("m3", d, "m3")
                elif s.omegavar == "m10":
                    # omega ~ p0 Beta(ab,bb) + p1 (1+Gamma(ag,bg)),
                    # discretized B+G classes (reference OMEGA_10* ids,
                    # src/model.c:19371; class values src/model.c:11637)
                    cfg.m10_group = group_of(
                        "m10", d, repr((s.nm10betacat, s.nm10gammacat)))
                else:
                    cfg.omega_group = group_of("omega", d, repr(s.omegapr))
                if s.nst == "2":
                    cfg.tratio_group = group_of("tratio", d,
                                                repr(s.tratiopr))
                self.div_cfg.append(cfg)
                continue
            if is_nuc and s.nucmodel == "doublet":
                cfg.doublet = True
                cfg.pi_field = "pi16"
                if s.statefreqpr.kind == "dirichlet":
                    cfg.pi_group = group_of("pi16", d, repr(s.statefreqpr))
                else:
                    cfg.fixed_pi = np.full(16, 1.0 / 16)
                if s.nst in ("6", "mixed"):
                    cfg.revmat_group = group_of("revmat", d,
                                                repr(s.revmatpr) + s.nst)
                elif s.nst == "2":
                    cfg.tratio_group = group_of("tratio", d,
                                                repr(s.tratiopr))
                if s.rates in ("gamma", "invgamma", "lnorm"):
                    cfg.shape_group = group_of("shape", d, repr(s.shapepr))
                    cfg.n_cats = s.ngammacat
                if s.rates in ("propinv", "invgamma"):
                    cfg.pinvar_group = group_of("pinvar", d,
                                                repr(s.pinvarpr))
                self.div_cfg.append(cfg)
                continue
            if is_prot:
                cfg.pi_field = "pi20"
            if s.statefreqmodel != "stationary" \
                    and div.dtype is not DataType.RESTRICTION:
                # exact reference parity: "non-stationary models only
                # implemented for data type RESTRICTION"
                # (src/model.c:3973-3977)
                raise ValueError(
                    "statefreqmodel=directional|mixed is only available "
                    "for restriction data (reference parity)")
            if div.dtype is DataType.RESTRICTION:
                cfg.pi_field = "pi2"
                if s.statefreqpr.kind == "dirichlet":
                    cfg.pi_group = group_of("pi2", d, repr(s.statefreqpr))
                else:
                    cfg.fixed_pi = np.full(2, 0.5)
                if s.statefreqmodel != "stationary":
                    # directional/mixed root frequencies (DIRPI paramIds,
                    # src/model.c:11756-11817; root-weighted likelihood
                    # src/likelihood.c:7155-7165)
                    if self.tree_settings.clock:
                        raise ValueError(
                            "statefreqmodel=directional is a rooted "
                            "NON-clock model; unset brlenspr=clock")
                    cfg.dirpi_mix = s.statefreqmodel == "mixed"
                    if s.rootfreqpr.kind == "fixed":
                        if cfg.dirpi_mix:
                            raise ValueError(
                                "statefreqmodel=mixed needs a sampled "
                                "rootfreqpr (dirichlet)")
                        cfg.fixed_rootpi = np.asarray(
                            s.rootfreqpr.params, np.float64)
                    else:
                        cfg.rootpi_group = group_of(
                            "rootpi2", d, repr(s.rootfreqpr))
            if is_prot and s.aamodelpr.kind == "mixed":
                # rjMCMC over the 10 empirical aa models + poisson
                # (reference Move_Aamodel src/proposal.c:66)
                cfg.aamodel_group = group_of("aamodel", d, "mixed")
            elif is_prot and s.aamodel not in ("poisson", "equalin",
                                               "gtr") \
                    and s.aamodel not in _AA_MODEL_NAMES():
                raise ValueError(
                    f"unsupported amino-acid model {s.aamodel!r}; valid: "
                    f"{', '.join(sorted(_AA_MODEL_NAMES()))}, equalin, gtr")
            elif is_prot and s.aamodel not in ("poisson", "equalin", "gtr"):
                # empirical aa model: frequencies are part of the model and
                # never sampled (reference: no pi columns in .p for
                # aamodelpr=fixed(<empirical>))
                from ..models.aa_models import AA_MODELS
                cfg.fixed_pi = AA_MODELS[s.aamodel][1]
            elif is_nuc or is_prot:
                fixed_params = (s.statefreqpr.kind == "fixed"
                                and s.statefreqpr.params)
                if s.statefreqpr.kind == "dirichlet":
                    cfg.pi_group = group_of(cfg.pi_field, d,
                                            repr(s.statefreqpr))
                elif fixed_params and s.statefreqpr.params[0] == "empirical":
                    cfg.fixed_pi = self._empirical_freqs(div)
                elif fixed_params and not isinstance(
                        s.statefreqpr.params[0], str):
                    cfg.fixed_pi = np.asarray(s.statefreqpr.params)
                else:
                    cfg.fixed_pi = np.full(div.n_states,
                                           1.0 / div.n_states)
            if is_prot and s.aamodelpr.kind != "mixed" \
                    and s.aamodel == "gtr":
                # protein GTR: 190 sampled (or fixed) exchangeabilities
                # under aarevmatpr (reference REVMAT_DIR with nValues=190,
                # src/model.c:19240,19262; prior src/model.c:4992)
                if s.aarevmatpr.kind == "fixed":
                    p = np.asarray([float(x) for x in s.aarevmatpr.params],
                                   np.float64)
                    cfg.fixed_aarevmat = (np.full(190, p[0]) if p.size == 1
                                          else p)
                    if cfg.fixed_aarevmat.size != 190:
                        raise ValueError(
                            "aarevmatpr=fixed needs 1 or 190 values")
                else:
                    cfg.aarevmat_group = group_of("aarevmat", d,
                                                  repr(s.aarevmatpr))
            if is_nuc and s.nst in ("6", "mixed"):
                cfg.revmat_group = group_of("revmat", d, repr(s.revmatpr)
                                            + s.nst)
                if s.nst == "mixed":
                    self._mixed_rev.add(cfg.revmat_group)
            if is_nuc and s.nst == "2":
                cfg.tratio_group = group_of("tratio", d, repr(s.tratiopr))
            if s.rates in ("gamma", "invgamma", "lnorm", "adgamma"):
                cfg.shape_group = group_of("shape", d, repr(s.shapepr))
                cfg.n_cats = (s.nlnormcat if s.rates == "lnorm"
                              else s.ngammacat)
            if s.rates in ("propinv", "invgamma"):
                cfg.pinvar_group = group_of("pinvar", d, repr(s.pinvarpr))
            if s.rates == "adgamma":
                # autocorrelated gamma: HMM over categories along sites
                # (reference rates=adgamma; correlation param Ratecorrpr)
                if s.covarion:
                    raise ValueError("adgamma+covarion not supported")
                cfg.ratecorr_group = group_of("ratecorr", d,
                                              repr(s.adgammacorpr))
            if s.rates == "kmixture":
                # sampled k-component site-rate mixture (reference
                # P_MIXTURE_RATES, src/model.c:19813; the rates are kept
                # exchangeable — the mixture likelihood is symmetric, so
                # the unordered Dirichlet parameterization samples the
                # same posterior as the reference's order statistic)
                cfg.mixt_group = group_of(
                    "mixtrates", d, repr(("kmix", s.nmixtcat)))
                cfg.n_cats = s.nmixtcat
            cfg.n_rate_cats = cfg.n_cats
            if div.dtype is DataType.STANDARD:
                # symdirihyperpr: symmetric Dirichlet(beta) on standard
                # state frequencies (reference symPiPr, src/model.c:6911;
                # beta categories for binary chars via BetaBreaks
                # src/model.c:12290, sampled pi for multistate)
                sp = s.symdirihyperpr
                fixed_b = (float(sp.params[0]) if sp.kind == "fixed"
                           and sp.params else -1.0)
                active = (sp.kind != "fixed") or fixed_b > 0.0
                if active and div.ctype == "ordered":
                    active = False      # ordered Mk keeps uniform pi
                if active:
                    if sp.kind != "fixed":
                        cfg.symbeta_group = group_of("symbeta", d,
                                                     repr(sp))
                    else:
                        cfg.fixed_symbeta = fixed_b
                    if div.n_states == 2:
                        # beta-category mixture folds into the category
                        # axis alongside the gamma rate categories
                        cfg.n_cats = cfg.n_rate_cats * s.nbetacat
                    else:
                        k = div.n_states
                        cfg.sympi_field = f"sympi{k}"
                        cfg.sympi_group = group_of(
                            cfg.sympi_field, d, repr(sp) + str(k))
            if cfg.pi_group < 0 and cfg.fixed_pi is None:
                cfg.fixed_pi = np.full(div.n_states, 1.0 / div.n_states)
            if s.covarion and (is_prot or (is_nuc and s.nucmodel == "4by4")):
                # Tuffley-Steel covarion: doubled state space with sampled
                # (or fixed) switching rates (reference: lset covarion=yes,
                # prset covswitchpr, src/likelihood.c:8269)
                if s.rates in ("propinv", "invgamma"):
                    raise ValueError(
                        "covarion cannot combine with propinv/invgamma "
                        "(the reference forbids pinvar under covarion)")
                if s.covswitchpr.kind == "fixed":
                    cfg.fixed_covswitch = np.asarray(
                        s.covswitchpr.params or (1.0, 1.0), np.float64)
                else:
                    cfg.covswitch_group = group_of(
                        "covswitch", d, repr(s.covswitchpr))
            self.div_cfg.append(cfg)

        self.n_groups = {p: len(v) for p, v in counters.items()}
        # directional models force a rooted non-clock tree
        # (TOPOLOGY_RNCL_*, src/model.c:20126)
        self.rooted_nonclock = any(
            c.rootpi_group >= 0 or c.fixed_rootpi is not None
            or c.dirpi_mix for c in self.div_cfg)
        # BEST generatepr=variable: per-gene rate multipliers share the
        # ratemult machinery (each gene is one division here; the
        # reference's Move_GeneRate_Dir is the same site-count-weighted
        # Dirichlet move, src/proposal.c:5537) but print as g_m{i}
        self.generate_on = self.best and any(
            s.generatepr == "variable" for s in div_settings)
        self.ratemult_on = (any(s.ratepr == "variable"
                                for s in div_settings)
                            or self.generate_on)
        self.n_div = n_div
        # priors per group: use the first division that defined the group
        self.group_priors: dict[tuple, Prior] = {}
        for cfg in self.div_cfg:
            s = cfg.settings
            for param, gid, pr in [(cfg.pi_field, cfg.pi_group,
                                    s.statefreqpr),
                                   ("revmat", cfg.revmat_group, s.revmatpr),
                                   ("aarevmat", cfg.aarevmat_group,
                                    s.aarevmatpr),
                                   ("tratio", cfg.tratio_group, s.tratiopr),
                                   ("shape", cfg.shape_group, s.shapepr),
                                   ("pinvar", cfg.pinvar_group, s.pinvarpr),
                                   ("omega", cfg.omega_group, s.omegapr),
                                   ("covswitch", cfg.covswitch_group,
                                    s.covswitchpr),
                                   ("ratecorr", cfg.ratecorr_group,
                                    s.adgammacorpr),
                                   ("mixtrates", cfg.mixt_group,
                                    Prior("dirichlet", (1.0,))),
                                   ("symbeta", cfg.symbeta_group,
                                    s.symdirihyperpr),
                                   ("brownscale", cfg.brownscale_group,
                                    s.brownscalepr)]:
                if gid >= 0:
                    self.group_priors.setdefault((param, gid), pr)
            if cfg.ny98_group >= 0:
                self.group_priors.setdefault(("omega1", cfg.ny98_group),
                                             s.ny98omega1pr)
                self.group_priors.setdefault(("omega3", cfg.ny98_group),
                                             s.ny98omega3pr)
                self.group_priors.setdefault(("omegaprobs", cfg.ny98_group),
                                             s.codoncatfreqpr)
            if cfg.m10_group >= 0:
                self.group_priors.setdefault(("m10beta", cfg.m10_group),
                                             s.m10betapr)
                self.group_priors.setdefault(("m10gamma", cfg.m10_group),
                                             s.m10gammapr)
                self.group_priors.setdefault(
                    ("m10catprobs", cfg.m10_group),
                    Prior("dirichlet", (1.0, 1.0)))
            if cfg.m3_group >= 0:
                self.group_priors.setdefault(("m3omega", cfg.m3_group),
                                             Prior("m3orderstat", ()))
                self.group_priors.setdefault(("m3probs", cfg.m3_group),
                                             s.codoncatfreqpr)

    def _aa_stacks(self):
        """Stacked exchangeabilities [11,190] and frequencies [11,20] in
        the reference's model-index order (src/bayes.c modelElementNames:
        Poisson Jones Dayhoff Mtrev Mtmam Wag Rtrev Cprev Vt Blosum LG)."""
        if not hasattr(self, "_aa_stack_cache"):
            from ..models.aa_models import AA_MODELS
            order = ["poisson", "jones", "dayhoff", "mtrev", "mtmam",
                     "wag", "rtrev", "cprev", "vt", "blosum", "lg"]
            self._aa_model_order = order
            self._aa_stack_cache = (
                jnp.asarray(np.stack([AA_MODELS[m][0] for m in order]),
                            jnp.float32),
                jnp.asarray(np.stack([AA_MODELS[m][1] for m in order]),
                            jnp.float32))
        return self._aa_stack_cache

    def _empirical_freqs(self, div) -> np.ndarray:
        """Observed state frequencies (ambiguity split uniformly)."""
        bits = (div.patterns[..., None] >> np.arange(div.n_states)) & 1
        w = bits / np.maximum(bits.sum(-1, keepdims=True), 1)
        freq = (w * div.weights[None, :, None]).sum((0, 1))
        return freq / freq.sum()

    def _codon_tensors(self, cfg: DivCfg):
        """Recode a nucleotide division as codon-site patterns
        (reference: CompressData handles 3-chars-per-column codon
        compression, src/model.c:2466)."""
        d = cfg.div
        code = cfg.codon
        cols = d.patterns[:, d.pattern_of_char]      # [ntax, nchar] masks
        nchar = cols.shape[1]
        if nchar % 3:
            raise ValueError(
                f"codon model needs a multiple of 3 sites, got {nchar}")
        trip = cols.reshape(cols.shape[0], nchar // 3, 3)
        b = code.bases                               # [S, 3]
        compat = np.ones((cols.shape[0], nchar // 3, code.n_states), bool)
        for pos in range(3):
            compat &= ((trip[:, :, pos:pos + 1]
                        >> b[None, None, :, pos]) & 1).astype(bool)
        if np.any(~compat.any(-1)):
            raise ValueError("stop codon observed in data (check code= "
                             "and reading frame)")
        packed = np.packbits(compat, axis=-1)        # [ntax, sites, ceil/8]
        flat = packed.reshape(packed.shape[0], packed.shape[1], -1)
        key = np.ascontiguousarray(
            flat.transpose(1, 0, 2).reshape(flat.shape[1], -1))
        uniq, inverse, counts = np.unique(key, axis=0, return_inverse=True,
                                          return_counts=True)
        pat_idx = np.zeros(len(uniq), dtype=np.int64)
        seen = {}
        for s_i, inv in enumerate(inverse):
            if inv not in seen:
                seen[int(inv)] = s_i
        for u in range(len(uniq)):
            pat_idx[u] = seen[u]
        tp = compat[:, pat_idx, :].astype(np.float32)
        # codon-site -> pattern map, used by posterior reporting
        # (possel/siteomega/ancstates expand patterns back to the three
        # original nucleotide columns per codon site)
        cfg.codon_site_pattern = inverse.astype(np.int64)
        return tp, counts.astype(np.float32)

    def _doublet_tensors(self, cfg: DivCfg):
        """Recode a nucleotide division as 16-state doublet patterns from
        the user's pairs statement (reference: CompressData handles
        2-chars-per-column doublet compression, src/model.c:2466; pairs
        command src/command.c:5599)."""
        d = cfg.div
        pairs = cfg.settings.pairs
        if not pairs:
            raise ValueError("nucmodel=doublet requires a pairs statement")
        local = {int(c): k for k, c in enumerate(d.char_ids)}
        pl = [(local[a], local[b]) for (a, b) in pairs
              if a in local and b in local]
        covered = {x for ab in pl for x in ab}
        if len(covered) != len(d.char_ids):
            raise ValueError(
                "doublet model: every character of the division must "
                "belong to exactly one pair")
        cols = d.patterns[:, d.pattern_of_char]          # [ntax, nchar]
        first = cols[:, [a for a, _ in pl]]
        second = cols[:, [b for _, b in pl]]
        bf = ((first[..., None] >> np.arange(4)) & 1).astype(bool)
        bs_ = ((second[..., None] >> np.arange(4)) & 1).astype(bool)
        compat = (bf[..., :, None] & bs_[..., None, :]).reshape(
            bf.shape[0], bf.shape[1], 16)                # [ntax, sites, 16]
        key = np.ascontiguousarray(
            np.packbits(compat, axis=-1).transpose(1, 0, 2).reshape(
                compat.shape[1], -1))
        uniq, inverse, counts = np.unique(key, axis=0, return_inverse=True,
                                          return_counts=True)
        first_site = np.full(len(uniq), -1, np.int64)
        for s_i, inv in enumerate(inverse):
            if first_site[inv] < 0:
                first_site[inv] = s_i
        tp = compat[:, first_site, :].astype(np.float32)
        cmask = np.all(tp > 0, axis=0).astype(np.float32)  # [P, 16]
        return tp, counts.astype(np.float32), cmask

    def _build_data_tensors(self):
        self._gamma_tables = {}
        self._adg_maps = {}
        for i, cfg in enumerate(self.div_cfg):
            if cfg.settings.rates in ("gamma", "invgamma", "adgamma"):
                for key in {cfg.n_cats, cfg.n_rate_cats or cfg.n_cats}:
                    if key not in self._gamma_tables:
                        self._gamma_tables[key] = GammaRateTable(key)
            if cfg.m10_group >= 0:
                key = cfg.settings.nm10gammacat
                if key not in self._gamma_tables:
                    self._gamma_tables[key] = GammaRateTable(key)
            if cfg.settings.rates == "adgamma":
                # static site-order maps for the HMM: pattern index per
                # site and the distance (jump) between successive sites
                d = cfg.div
                order = np.argsort(d.char_ids)
                poc = d.pattern_of_char[order]
                jumps = np.diff(np.asarray(d.char_ids)[order])
                uniq = sorted(set(int(j) for j in jumps)) or [1]
                jump_idx = np.zeros(len(poc), np.int32)
                lut = {j: k for k, j in enumerate(uniq)}
                jump_idx[1:] = [lut[int(j)] for j in jumps]
                self._adg_maps[i] = (jnp.asarray(poc), jnp.asarray(jump_idx),
                                     tuple(uniq))
        self.tip_partials = []
        self.weights = []
        self.const_masks = []
        self._cont_values = {}
        for cfg in self.div_cfg:
            d = cfg.div
            if d.dtype is DataType.CONTINUOUS:
                self._cont_values[len(self.tip_partials)] = jnp.asarray(
                    d.cont, jnp.float32)
                self.tip_partials.append(jnp.zeros((d.ntax, 1, 1)))
                self.weights.append(jnp.ones((1,)))
                self.const_masks.append(None)
                continue
            if cfg.codon is not None:
                tp, w = self._codon_tensors(cfg)
                self.tip_partials.append(jnp.asarray(tp))
                self.weights.append(jnp.asarray(w))
                self.const_masks.append(None)
                continue
            if cfg.doublet:
                tp, w, cm = self._doublet_tensors(cfg)
                self.tip_partials.append(jnp.asarray(tp))
                self.weights.append(jnp.asarray(w))
                self.const_masks.append(jnp.asarray(cm))
                continue
            tp = d.tip_partials()
            if cfg.covswitch_group >= 0 or cfg.fixed_covswitch is not None:
                # covarion: an observed base is compatible with both the
                # on- and off-copy of its state
                tp = np.concatenate([tp, tp], axis=-1)
            wts = np.asarray(d.weights, np.float32).copy()
            cmask_np = constant_state_mask(d.patterns, d.n_states)
            if d.dtype in (DataType.RESTRICTION, DataType.STANDARD) \
                    and cfg.settings.coding not in ("", "all"):
                # the reference EXCLUDES characters incompatible with the
                # coding bias with a warning (CheckCharCodingType +
                # AddDummyChars filter, src/model.c:314-400): possibly-
                # constant patterns at a disallowed state.  Zeroing the
                # pattern weight reproduces exclusion exactly — the
                # ascertainment multiplier is the weight sum.
                cd = cfg.settings.coding
                if cd == "variable":
                    bad = cmask_np.any(axis=1)
                elif cd == "noabsencesites":
                    bad = cmask_np[:, 0] > 0
                elif cd == "nopresencesites":
                    bad = cmask_np[:, 1] > 0
                else:
                    bad = np.zeros(len(wts), bool)
                wts[bad] = 0.0
            self.tip_partials.append(jnp.asarray(tp))
            self.weights.append(jnp.asarray(wts))
            self.const_masks.append(jnp.asarray(cmask_np))
        w = np.array([float(c.div.weights.sum()) for c in self.div_cfg])
        self.div_char_frac = w / w.sum()   # ratemult weighting
        self._build_best_batched()
        self._build_pruners_and_pars()
        self._build_stacked_pruners()
        self._build_multiwalk_pruners()

    def _resolved_coding(self, cfg) -> str:
        if cfg.div.dtype not in (DataType.STANDARD, DataType.RESTRICTION):
            return "all"
        return {"all": "all", "variable": "variable",
                "noabsencesites": "noabsence",
                "nopresencesites": "nopresence"}.get(
            cfg.settings.coding, "all")

    def _build_stacked_pruners(self):
        """Group generic-path divisions sharing a tree into ONE fused
        Pallas launch (PruningPallasStacked) — partitioned models
        otherwise pay one kernel launch per division, each serially
        re-walking the same postorder (hymfossil: 15 launches = 72% of
        the generation)."""
        import numpy as np

        from ..ops.pruning_pallas import (PruningPallasStacked,
                                          kernel_vmem_bytes, VMEM_CAP)
        self._stacked_pruners: list = []
        import os
        if os.environ.get("MB_TPU_STACKED", "0") != "1":
            # OPT-IN: measured on v5e/hymfossil, stacking LOSES —
            # all-divisions stacking 7x slower (union state width
            # multiplies every pattern's MXU passes), and even the
            # small-pattern-only variant ~4x slower (the XLA-side
            # union-operand assembly copies the [nodes, KS, KS] block
            # tensor once per member division).  The per-division
            # launches' in-kernel step cost is already ~0.27 us and is
            # what a better design must beat.  Kept for A/B and future
            # Mosaic/XLA versions.
            return
        if self.best or getattr(self, "_site_sharded", False):
            return
        by_tree: dict = {}
        for i, cfg in enumerate(self.div_cfg):
            if not self._is_generic_div(cfg):
                continue
            if self._pruners[i] is None:
                continue
            # ONLY small-pattern divisions: each such division pays a
            # full postorder walk for one mostly-padding 128-lane block,
            # so merging them is nearly free (their padding lanes are
            # already being paid for).  Stacking LARGE divisions loses:
            # the union state width multiplies every pattern's flops by
            # the group size (measured 7x slower on hymfossil when all
            # 15 divisions were stacked).
            pd = self.tip_partials[i].shape[1]
            if self._resolved_coding(cfg) != "all":
                pd += cfg.div.n_states
            if pd > 256:
                continue
            t = self.div_tree[i] if self.n_trees > 1 else 0
            by_tree.setdefault(t, []).append(i)
        if self.n_trees > 1:
            return   # per-tree views change the pruner call shape; the
                     # per-division path stays (rare config)
        for t, idxs in by_tree.items():
            if len(idxs) < 2:
                continue
            # split the group greedily under the VMEM budget and a
            # union-state-width cap
            cur: list = []
            cur_ks = 0
            groups = []
            for i in idxs:
                cfg = self.div_cfg[i]
                ks = cfg.n_cats * cfg.div.n_states
                ksp = ((cur_ks + ks + 7) // 8) * 8
                if cur and (cur_ks + ks > 96
                            or kernel_vmem_bytes(self.n_tips, ksp,
                                                 256) > VMEM_CAP):
                    groups.append(cur)
                    cur, cur_ks = [], 0
                cur.append(i)
                cur_ks += ks
            if cur:
                groups.append(cur)
            for g in groups:
                if len(g) < 2:
                    continue
                specs = []
                for i in g:
                    tp = np.asarray(self.tip_partials[i])
                    S = tp.shape[-1]
                    if self._resolved_coding(self.div_cfg[i]) != "all":
                        dummy = np.broadcast_to(
                            np.eye(S, dtype=tp.dtype),
                            (tp.shape[0], S, S))
                        tp = np.concatenate([tp, dummy], axis=1)
                    specs.append((tp, self.div_cfg[i].n_cats))
                self._stacked_pruners.append(
                    (g, PruningPallasStacked(specs)))

    def _build_multiwalk_pruners(self):
        """Group generic-path divisions sharing the tree into ONE fused
        Pallas launch with an independent interleaved walk per
        (division, chain) pair (PruningPallasMultiwalk) — the default
        partitioned-model path.  Divisions bucket by padded pattern
        width (Ppad) so small-alignment members don't pay a large
        member's lane count; each bucket is one launch.  Unlike the
        opt-in block-diagonal stacking (MB_TPU_STACKED), every walk's
        matmuls stay at the bucket's max KSp rather than the sum over
        members, so there is no union-state-width MXU penalty.
        MB_TPU_MULTIWALK=1 enables (trace-time, like the other
        MB_TPU_* flags); measured slower than per-division launches on
        v5e, see below."""
        import os

        import numpy as np

        from ..ops.pruning_pallas import (PruningPallasMultiwalk,
                                          multiwalk_vmem_bytes, VMEM_CAP)
        self._multiwalk_pruners: list = []
        if os.environ.get("MB_TPU_MULTIWALK", "0") != "1":
            # OPT-IN: measured on v5e/hymfossil (15 generic divisions,
            # 4 chains), multiwalk LOSES to per-division launches with
            # the G-chain-interleaved kernel: 457.9 vs 522.3 gens/s
            # end-to-end.  Halving the serial (cell x step) count does
            # not pay because interleaved steps are no longer
            # latency-bound at G=4 — the 8-walk cells at the bucket's
            # max KSp (32) cost more per step than the per-division
            # cells at native KSp (8..16), and the XLA-side pad/stack/
            # transpose of the [D,C,n_int,2,KSp,KSp] operand adds HBM
            # traffic.  Third negative result on this bottleneck
            # (wavefront, stacking, multiwalk); full numbers in
            # BASELINE.md.  Kept for A/B and future Mosaic versions.
            return
        if self.best or getattr(self, "_site_sharded", False) \
                or self.n_trees > 1:
            return
        buckets: dict = {}
        for i, cfg in enumerate(self.div_cfg):
            if not self._is_generic_div(cfg) or self._pruners[i] is None:
                continue
            pd = self.tip_partials[i].shape[1]
            if self._resolved_coding(cfg) != "all":
                pd += cfg.div.n_states
            ppad = ((pd + 127) // 128) * 128
            ks = cfg.n_cats * cfg.div.n_states
            ksp = ((ks + 7) // 8) * 8
            # a member must fit a one-walk cell at the minimum block
            if multiwalk_vmem_bytes(self.n_tips, ksp, 128, 1, 1) \
                    > VMEM_CAP:
                continue
            buckets.setdefault(ppad, []).append(i)
        for ppad, idxs in sorted(buckets.items()):
            if len(idxs) < 2:
                continue
            specs = []
            for i in idxs:
                tp = np.asarray(self.tip_partials[i])
                S = tp.shape[-1]
                if self._resolved_coding(self.div_cfg[i]) != "all":
                    dummy = np.broadcast_to(
                        np.eye(S, dtype=tp.dtype), (tp.shape[0], S, S))
                    tp = np.concatenate([tp, dummy], axis=1)
                specs.append((tp, self.div_cfg[i].n_cats))
            self._multiwalk_pruners.append(
                (idxs, PruningPallasMultiwalk(specs)))

    def _build_best_batched(self):
        """BEST fast path: when every gene division runs the same plain
        nucleotide model shape, stack the per-gene tip tensors (padded on
        the pattern axis, pad weight 0) so all G gene likelihoods run as
        ONE vmapped dispatch chain instead of G separate ones — tiny
        gene trees are dispatch-bound (finch: 4 loci x 7 nodes)."""
        self._best_batched = None
        if not self.best or self.n_div < 2:
            return
        cfgs = self.div_cfg
        ok = all(
            c.div.dtype in (DataType.DNA, DataType.RNA)
            and c.codon is None and not c.doublet and not c.parsimony
            and c.covswitch_group < 0 and c.fixed_covswitch is None
            and c.ratecorr_group < 0 and c.mixt_group < 0
            and c.settings.coding in ("", "all")
            and c.div.n_states == cfgs[0].div.n_states
            and c.n_cats == cfgs[0].n_cats
            and c.settings.rates == cfgs[0].settings.rates
            and (c.pinvar_group >= 0) == (cfgs[0].pinvar_group >= 0)
            for c in cfgs)
        if not ok:
            return
        Pmax = max(tp.shape[1] for tp in self.tip_partials)
        tips, wts, cms = [], [], []
        for i in range(self.n_div):
            tp = np.asarray(self.tip_partials[i])
            w = np.asarray(self.weights[i])
            pad = Pmax - tp.shape[1]
            tips.append(np.pad(tp, ((0, 0), (0, pad), (0, 0)),
                               constant_values=1.0))
            wts.append(np.pad(w, (0, pad)))
            cm = np.asarray(self.const_masks[i])
            cms.append(np.pad(cm, ((0, pad), (0, 0))))
        self._best_batched = (jnp.asarray(np.stack(tips)),
                              jnp.asarray(np.stack(wts)),
                              jnp.asarray(np.stack(cms)))

    def _best_lnl_batched(self, state):
        """All G gene likelihoods in one vmapped pass (lax.scan pruner;
        gene trees are far too small for the Pallas grid to pay)."""
        from ..ops.pruning import division_loglik
        tips, wts, cmasks = self._best_batched
        has_pinv = self.div_cfg[0].pinvar_group >= 0
        par = state["parent"]
        age = state["age"]
        blen = jnp.where(par >= 0,
                         jnp.take_along_axis(
                             age, jnp.maximum(par, 0), axis=1) - age, 0.0)
        lams, Us, Vs, pis, rates, pinvs, mults = [], [], [], [], [], [], []
        for i, cfg in enumerate(self.div_cfg):
            lam, U, V = self._division_eig_cached(state, i)
            lams.append(lam)
            Us.append(U)
            Vs.append(V)
            pis.append(state[cfg.pi_field][cfg.pi_group]
                       if cfg.pi_group >= 0
                       else jnp.asarray(cfg.fixed_pi, jnp.float32))
            s = cfg.settings
            if s.rates in ("gamma", "invgamma"):
                rates.append(self._gamma_tables[cfg.n_cats](
                    state["shape"][cfg.shape_group]))
            elif s.rates == "lnorm":
                rates.append(discrete_lognormal(
                    state["shape"][cfg.shape_group], cfg.n_cats))
            else:
                rates.append(jnp.ones((1,)))
            pinvs.append(state["pinvar"][cfg.pinvar_group]
                         if cfg.pinvar_group >= 0 else jnp.float32(0.0))
            mults.append(state["ratemult"][i] / self.div_char_frac[i]
                         if self.ratemult_on else jnp.float32(1.0))

        def one(left, right, parent, bl, tp, w, lam, U, V, pi, r, pv, m,
                cm):
            return division_loglik(
                left, right, parent, bl, tp, w, lam, U, V, pi, r, pv,
                cm if has_pinv else None, self.n_tips,
                rate_mult=m, pruner=None)

        lnl = jax.vmap(one)(
            state["left"], state["right"], par, blen, tips, wts,
            jnp.stack(lams), jnp.stack(Us), jnp.stack(Vs),
            jnp.stack(pis), jnp.stack(rates), jnp.stack(pinvs),
            jnp.stack(mults), cmasks)
        return jnp.sum(lnl)

    def _build_pruners_and_pars(self):
        # fused Pallas pruning wiring per division (used on TPU backends;
        # None → lax.scan fallback). K must match the rate-category count
        # each likelihood path passes at call time.
        from ..ops.pruning import make_pruner
        self._pruners: list = []
        self._pruner_cats: list = []   # rate-cat count each pruner was
                                       # built with (shard rebuild reuses)
        for i, cfg in enumerate(self.div_cfg):
            s = cfg.settings
            if cfg.div.dtype is DataType.CONTINUOUS:
                self._pruners.append(None)
                self._pruner_cats.append(0)
                continue
            if cfg.codon is not None:
                if cfg.m10_group >= 0:
                    k = cfg.settings.nm10betacat + cfg.settings.nm10gammacat
                elif cfg.ny98_group >= 0 or cfg.m3_group >= 0:
                    k = 3
                else:
                    k = 1
                coding = "all"
            elif cfg.covswitch_group >= 0 or cfg.fixed_covswitch is not None:
                k = cfg.n_cats if cfg.shape_group >= 0 else 1
                coding = "all"
            elif cfg.ratecorr_group >= 0:
                k = cfg.n_cats
                coding = "all"
            else:
                # cfg.n_cats is 1 unless a category axis exists (gamma/
                # lnorm/kmixture rates, symdirihyperpr beta categories)
                k = cfg.n_cats
                coding = {"all": "all", "variable": "variable",
                          "noabsencesites": "noabsence",
                          "nopresencesites": "nopresence"}.get(s.coding,
                                                               "all")
                if cfg.div.dtype not in (DataType.STANDARD,
                                         DataType.RESTRICTION):
                    coding = "all"
            self._pruner_cats.append(k)
            self._pruners.append(
                make_pruner(self.tip_partials[i], k, coding))
        # bit-coded state sets for parsimony-guided proposals (reference
        # InitParsSets src/mcmc.c:6834); codon/doublet divisions use their
        # underlying per-nucleotide patterns — the bias need not match the
        # likelihood model, only be computed consistently
        masks, factors = [], []
        v_typ = 0.03    # reference default tuningParam[2] (model.c:22598)
        for cfg in self.div_cfg:
            dv = cfg.div
            if dv.dtype is DataType.CONTINUOUS:
                masks.append(dv.patterns.astype(np.uint32))
                factors.append(dv.weights * 0.0)
                continue
            S = max(2, min(dv.n_states, 32))
            divf = -np.log(max(1e-10, 1.0 / S
                               - np.exp(-S / (S - 1.0) * v_typ) / S))
            masks.append(dv.patterns.astype(np.uint32))
            factors.append(dv.weights * divf)
        self._pars_masks = jnp.asarray(np.concatenate(masks, axis=1))
        self._pars_factors = jnp.asarray(
            np.concatenate(factors), jnp.float32)
        self._pars_per_div = list(zip(masks, factors))

    def _build_moves(self):
        from . import clock as C
        mk = []
        n = self.n_tips
        ts = self.tree_settings
        if self.best:
            G = self.n_div
            S = self.n_species
            TREE_FIELDS = ("left", "right", "parent", "age")

            def gene_move(base):
                """Apply a clock tree move to one random gene's tree
                (reference gene-tree moves Move_GeneTree1-3 /
                Move_NodeSliderGeneTree, src/best.c:1113-1714; here the
                generic clock moves run on the gene slice and the MSC
                prior enforces consistency via reject)."""
                def mv(key, state, tuning, n_tips=n):
                    kg, km = jax.random.split(key)
                    g = jax.random.randint(kg, (), 0, G)
                    sub = {f: state[f][g] for f in TREE_FIELDS}
                    sub2, lnH = base(km, sub, tuning, n_tips)
                    out = dict(state)
                    for f in TREE_FIELDS:
                        out[f] = state[f].at[g].set(sub2[f])
                    return out, lnH
                return mv

            def species_move(base):
                """Apply a clock tree move to the species tree (role of
                reference Move_SpeciesTree, src/best.c:1715; topology and
                age moves filtered through the joint MSC prior)."""
                def mv(key, state, tuning, n_tips=S):
                    sub = {"left": state["s_left"],
                           "right": state["s_right"],
                           "parent": state["s_parent"],
                           "age": state["s_age"]}
                    sub2, lnH = base(key, sub, tuning, S)
                    out = {**state, "s_left": sub2["left"],
                           "s_right": sub2["right"],
                           "s_parent": sub2["parent"],
                           "s_age": sub2["age"]}
                    return out, lnH
                return mv

            mk.append(MoveSpec("gene_nni", gene_move(C.move_nni_clock),
                               5.0, 0.0, tunable=False))
            mk.append(MoveSpec("gene_spr", gene_move(C.move_spr_clock),
                               5.0, 0.0, tunable=False))
            mk.append(MoveSpec("gene_age_slider",
                               gene_move(C.move_age_slider),
                               15.0, 0.0, tunable=False))
            mk.append(MoveSpec("gene_root_age", gene_move(C.move_root_age),
                               3.0, 2.0 * np.log(1.2), 0.25, 1, 1e-4, 10.0))
            mk.append(MoveSpec("gene_tree_stretch",
                               gene_move(C.move_tree_stretch),
                               3.0, 2.0 * np.log(1.1), 0.25, 1, 1e-4, 5.0))
            from . import best as B
            mk.append(MoveSpec(
                "sp_distmatrix",
                B.make_species_tree_move(G, S, self.tip_species, n),
                10.0, 1.2, 0.25, 1, 1e-4, 20.0))
            mk.append(MoveSpec("sp_nni", species_move(C.move_nni_clock),
                               3.0, 0.0, tunable=False))
            mk.append(MoveSpec("sp_spr", species_move(C.move_spr_clock),
                               2.0, 0.0, tunable=False))
            mk.append(MoveSpec("sp_age_slider",
                               species_move(C.move_age_slider),
                               6.0, 0.0, tunable=False))
            mk.append(MoveSpec("sp_root_age", species_move(C.move_root_age),
                               2.0, 2.0 * np.log(1.2), 0.25, 1, 1e-4, 10.0))
            mk.append(MoveSpec(
                "popsize_mult",
                partial(M.make_multiplier_move("popsize", 1e-8, 1e8),
                        n_tips=n), 3.0, 2.0 * np.log(1.6), 0.25, 1,
                1e-3, 20.0))
            if ts.clockpr == "birthdeath":
                mk.append(MoveSpec(
                    "speciation_mult",
                    partial(M.make_multiplier_move("speciation", 1e-6, 1e4),
                            n_tips=n), 1.5, 2.0 * np.log(1.6), 0.25, 1,
                    1e-3, 20.0))
                mk.append(MoveSpec(
                    "extinction_slider",
                    partial(M.make_slider_move("extinction", 0.0, 1.0),
                            n_tips=n), 1.5, 0.2, 0.25, 1, 1e-3, 1.0))
            self._finish_moves(mk)
            return
        if ts.clock:
            mk.append(MoveSpec("nni_clock",
                               partial(C.move_nni_clock, n_tips=n),
                               5.0, 0.0, tunable=False))
            mk.append(MoveSpec("subtree_swap_clock",
                               partial(C.move_subtree_swap_clock,
                                       n_tips=n),
                               3.0, 0.0, tunable=False))
            mk.append(MoveSpec("node_slider_clock",
                               partial(C.move_node_slider_clock,
                                       n_tips=n),
                               5.0, 0.05, 0.25, 1, 1e-5, 10.0))
            mk.append(MoveSpec("local_clock",
                               partial(C.move_local_clock, n_tips=n),
                               3.0, 0.0, tunable=False))
            mk.append(MoveSpec(
                "pars_spr_clock",
                partial(C.make_pars_spr_clock_move(self._pars_masks,
                                                   self._pars_factors),
                        n_tips=n),
                5.0, 0.1, 0.25, -1, 0.01, 1.0))
            mk.append(MoveSpec("spr_clock",
                               partial(C.move_spr_clock, n_tips=n),
                               5.0, 0.0, tunable=False))
            mk.append(MoveSpec("age_slider",
                               partial(C.move_age_slider, n_tips=n),
                               15.0, 0.0, tunable=False))
            mk.append(MoveSpec("tree_stretch",
                               partial(C.move_tree_stretch, n_tips=n),
                               3.0, 2.0 * np.log(1.1), 0.25, 1, 1e-4, 5.0))
            mk.append(MoveSpec("root_age",
                               partial(C.move_root_age, n_tips=n),
                               3.0, 2.0 * np.log(1.2), 0.25, 1, 1e-4, 10.0))
            if ts.clockratepr.kind != "fixed":
                mk.append(MoveSpec(
                    "clockrate_mult",
                    partial(M.make_multiplier_move("clockrate", 1e-10, 1e6),
                            n_tips=n), 3.0, 2.0 * np.log(1.5), 0.25, 1,
                    1e-4, 10.0))
            if ts.clockvarpr == "cpp":
                sigma = float((ts.cppmultdevpr.params or (0.4,))[0])
                mk.append(MoveSpec("cpp_adddelete",
                                   partial(C.make_cpp_adddelete(sigma),
                                           n_tips=n),
                                   6.0, 0.0, tunable=False))
                mk.append(MoveSpec("cpp_position",
                                   partial(C.move_cpp_position, n_tips=n),
                                   2.0, 0.0, tunable=False))
                mk.append(MoveSpec("cpp_multiplier",
                                   partial(C.move_cpp_multiplier, n_tips=n),
                                   4.0, 2.0 * np.log(1.5), 0.25, 1,
                                   1e-3, 20.0))
                if ts.cppratepr.kind != "fixed":
                    mk.append(MoveSpec(
                        "cpprate_mult",
                        partial(M.make_multiplier_move("cpprate",
                                                       1e-6, 1e4),
                                n_tips=n), 2.0, 2.0 * np.log(1.6), 0.25, 1,
                        1e-3, 20.0))
            elif ts.clockvarpr != "strict":
                mk.append(MoveSpec("brate_mult",
                                   partial(C.make_brate_multiplier(n)),
                                   10.0, 2.0 * np.log(1.6), 0.25, 1,
                                   1e-3, 20.0))
                mk.append(MoveSpec(
                    "clockvar_mult",
                    partial(M.make_multiplier_move("clockvar", 1e-6, 1e4),
                            n_tips=n), 2.0, 2.0 * np.log(1.6), 0.25, 1,
                    1e-3, 20.0))
                if ts.clockvarpr == "mixed":
                    mk.append(MoveSpec("rcl_jump",
                                       partial(C.move_rcl_jump, n_tips=n),
                                       2.0, 0.0, tunable=False))
            if ts.clockpr == "birthdeath":
                mk.append(MoveSpec(
                    "speciation_mult",
                    partial(M.make_multiplier_move("speciation", 1e-6, 1e4),
                            n_tips=n), 1.5, 2.0 * np.log(1.6), 0.25, 1,
                    1e-3, 20.0))
                mk.append(MoveSpec(
                    "extinction_slider",
                    partial(M.make_slider_move("extinction", 0.0, 1.0),
                            n_tips=n), 1.5, 0.2, 0.25, 1, 1e-3, 1.0))
            if ts.clockpr == "coalescence":
                mk.append(MoveSpec(
                    "popsize_mult",
                    partial(M.make_multiplier_move("popsize", 1e-6, 1e8),
                            n_tips=n), 1.5, 2.0 * np.log(1.6), 0.25, 1,
                    1e-3, 20.0))
                if ts.growthpr.kind != "fixed":
                    # sampled exponential-growth rate (reference
                    # Move_Growth, src/proposal.c:5650)
                    mk.append(MoveSpec(
                        "growth_slider",
                        partial(M.make_slider_move("growth", -1e3, 1e3),
                                n_tips=n), 1.5, 1.0, 0.25, 1,
                        1e-3, 100.0))
            if ts.clockpr == "fossilization":
                # d/r/s parameterization moves (reference Move_Speciation
                # src/proposal.c:15961, Move_Extinction :1800,
                # Move_Fossilization :1923)
                mk.append(MoveSpec(
                    "speciation_mult",
                    partial(M.make_multiplier_move("speciation", 1e-6, 1e4),
                            n_tips=n), 1.5, 2.0 * np.log(1.6), 0.25, 1,
                    1e-3, 20.0))
                mk.append(MoveSpec(
                    "extinction_slider",
                    partial(M.make_slider_move("extinction", 0.0, 1.0),
                            n_tips=n), 1.5, 0.2, 0.25, 1, 1e-3, 1.0))
                mk.append(MoveSpec(
                    "fossilization_slider",
                    partial(M.make_slider_move("fossilization", 0.0, 1.0),
                            n_tips=n), 1.5, 0.2, 0.25, 1, 1e-3, 1.0))
                if self.has_dated_tips and ts.samplestrat != "fossiltip":
                    mk.append(MoveSpec(
                        "add_branch",
                        partial(C.make_add_del_branch(self.fossil_tips,
                                                      True), n_tips=n),
                        2.0, 0.0, tunable=False))
                    mk.append(MoveSpec(
                        "del_branch",
                        partial(C.make_add_del_branch(self.fossil_tips,
                                                      False), n_tips=n),
                        2.0, 0.0, tunable=False))
            if self.sampled_tip_ages:
                tips = np.array([t for t, _ in self.sampled_tip_ages])
                los = np.array([
                    p.params[0] if p.kind in ("uniform", "offsetexp")
                    else 0.0 for _, p in self.sampled_tip_ages])
                his = np.array([
                    p.params[1] if p.kind == "uniform" else np.inf
                    for _, p in self.sampled_tip_ages])
                mk.append(MoveSpec(
                    "tip_date_slider",
                    partial(C.make_tip_date_move(tips, los, his), n_tips=n),
                    3.0, 0.0, tunable=False))
        else:
            T = self.n_trees
            if T > 1:
                # unlinked topologies: each move touches one random tree
                # slice of the stacked [T, n_nodes] arrays (same wrapper
                # pattern as BEST gene trees)
                TREE_FIELDS = ("left", "right", "parent", "blen")

                def wrap(base):
                    def mv(key, state, tuning, n_tips=n):
                        kg, km = jax.random.split(key)
                        g = jax.random.randint(kg, (), 0, T)
                        sub = {f: state[f][g] for f in TREE_FIELDS}
                        sub2, lnH = base(km, sub, tuning, n_tips)
                        out = dict(state)
                        for f in TREE_FIELDS:
                            out[f] = state[f].at[g].set(sub2[f])
                        return out, lnH
                    return mv
            else:
                def wrap(base):
                    return partial(base, n_tips=n)
            if self.rooted_nonclock:
                # directional models: rooted non-clock trees; rooted NNI
                # + rooted SPR (root placement mixes via SPR onto the
                # root's child edges) + blen moves over ALL non-root
                # branches (reference applies its NNI/ExtSPR/ExtTBR to
                # TOPOLOGY_RNCL_*, src/model.c:21868,22023,22258)
                if T > 1:
                    raise ValueError("unlinked topologies with a "
                                     "directional model not supported")
                mk.append(MoveSpec("rooted_nni", wrap(M.move_rooted_nni),
                                   8.0, 0.0, tunable=False))
                mk.append(MoveSpec("rooted_spr", wrap(M.move_rooted_spr),
                                   10.0, 0.0, tunable=False))
                mk.append(MoveSpec(
                    "blen_mult",
                    partial(M.move_blen_multiplier, n_tips=n, rooted=True),
                    15.0, 2.0 * np.log(1.6), 0.25, 1, 1e-3, 20.0))
                mk.append(MoveSpec(
                    "node_slider",
                    partial(M.move_node_slider, n_tips=n, rooted=True),
                    5.0, 0.0, tunable=False))
                mk.append(MoveSpec(
                    "treelen_mult",
                    partial(M.move_treelen_multiplier, n_tips=n,
                            rooted=True),
                    2.0, 2.0 * np.log(1.6), 0.25, 1, 1e-3, 10.0))
                self._finish_moves(mk)
                return
            mk.append(MoveSpec("nni", wrap(M.move_nni), 5.0,
                               0.0, tunable=False))
            mk.append(MoveSpec("spr", wrap(M.move_spr), 5.0,
                               0.0, tunable=False))
            # the reference's workhorse topology moves: extending SPR
            # (Move_ExtSPR, default relprob 10-ish) and the subtree
            # swapper (Move_ExtSS)
            mk.append(MoveSpec("ext_spr", wrap(M.move_ext_spr),
                               10.0, 0.8, 0.25, 1, 0.05, 0.95))
            if n > 3:
                # bisection moves need a true internal edge
                mk.append(MoveSpec("ext_tbr", wrap(M.move_ext_tbr),
                                   5.0, 0.8, 0.25, 1, 0.05, 0.95))
                mk.append(MoveSpec("local", wrap(M.move_local),
                                   2.0, 2.0 * np.log(1.6), 0.25, 1,
                                   1e-3, 20.0))
            mk.append(MoveSpec("subtree_swap",
                               wrap(M.move_subtree_swap),
                               2.0, 0.0, tunable=False))
            if T > 1:
                for t in range(T):
                    dm = [self._pars_per_div[i] for i in range(self.n_div)
                          if self.div_tree[i] == t]
                    pm = jnp.asarray(np.concatenate(
                        [m for m, _ in dm], axis=1))
                    pfac = jnp.asarray(
                        np.concatenate([f for _, f in dm]), jnp.float32)

                    def mk_tree_pars(t=t, pm=pm, pfac=pfac):
                        base = M.make_pars_spr_move(pm, pfac)

                        def mv(key, state, tuning, n_tips=n):
                            sub = {f: state[f][t] for f in
                                   ("left", "right", "parent", "blen")}
                            sub2, lnH = base(key, sub, tuning, n_tips)
                            out = dict(state)
                            for f in ("left", "right", "parent", "blen"):
                                out[f] = state[f].at[t].set(sub2[f])
                            return out, lnH
                        return mv
                    mk.append(MoveSpec(f"pars_spr_t{t + 1}", mk_tree_pars(),
                                       5.0 / T, 0.1, 0.25, -1, 0.01, 1.0))
            else:
                mk.append(MoveSpec(
                    "pars_spr",
                    wrap(M.make_pars_spr_move(self._pars_masks,
                                              self._pars_factors)),
                    5.0, 0.1, 0.25, -1, 0.01, 1.0))
                mk.append(MoveSpec(
                    "pars_tbr",
                    wrap(M.make_pars_tbr_move(self._pars_masks,
                                              self._pars_factors)),
                    3.0, 0.1, 0.25, -1, 0.01, 1.0))
            mk.append(MoveSpec("blen_mult",
                               wrap(M.move_blen_multiplier),
                               15.0, 2.0 * np.log(1.6), 0.25, 1, 1e-3, 20.0))
            mk.append(MoveSpec("node_slider",
                               wrap(M.move_node_slider),
                               5.0, 0.0, tunable=False))
            mk.append(MoveSpec("treelen_mult",
                               wrap(M.move_treelen_multiplier),
                               2.0, 2.0 * np.log(1.6), 0.25, 1, 1e-3, 10.0))
        self._finish_moves(mk)

    def _finish_moves(self, mk):
        """Append substitution-parameter moves shared by every tree mode
        and finalize weights (tail of reference SetUpMoveTypes,
        src/model.c:21618)."""
        n = self.n_tips
        # every move registered before this point touches only
        # tree-component prior inputs (topology/blens/ages and the
        # tree-process scalars whose priors live in log_prior_tree);
        # every move appended below touches only group_priors fields
        # (the log_prior_params component).  The split drives the
        # carried-prior conds in _chain_step.
        n_tree_moves = len(mk)
        if self.n_groups.get("pi"):
            mk.append(MoveSpec("pi_dir",
                               partial(M.make_simplex_move("pi"), n_tips=n),
                               2.0, 100.0, 0.25, -1, 1.0, 1e5))
        if self.n_groups.get("pi20"):
            mk.append(MoveSpec("pi20_dir",
                               partial(M.make_simplex_move("pi20"),
                                       n_tips=n),
                               2.0, 500.0, 0.25, -1, 1.0, 1e6))
        if self.n_groups.get("pi2"):
            mk.append(MoveSpec("pi2_dir",
                               partial(M.make_simplex_move("pi2"), n_tips=n),
                               1.5, 100.0, 0.25, -1, 1.0, 1e5))
        if self.n_groups.get("rootpi2"):
            # root-frequency moves (reference Move_StatefreqsRoot /
            # Move_StatefreqsRoot_Slider, registered for DIRPI_* at 0.5
            # each, src/model.c:23111-23152) and the stationary <->
            # directional RJ jump for statefreqmodel=mixed
            # (Move_Statefreqs_SplitMerge, src/model.c:23153-23170,
            # src/proposal.c:16528)
            from .priors import dirichlet_lpdf as _dlp
            pairs = []
            seen = set()
            for cfg in self.div_cfg:
                if cfg.rootpi_group >= 0 and cfg.rootpi_group not in seen:
                    seen.add(cfg.rootpi_group)
                    pairs.append((cfg.pi_group, cfg.rootpi_group,
                                  cfg.dirpi_mix))
            mix_on = any(m for _, _, m in pairs)
            gids = jnp.asarray([g for _, g, _ in pairs])
            mixed_flags = jnp.asarray([1 if m else 0 for _, _, m in pairs])

            def mv_rootpi_dir(key, state, tuning, n_tips=n):
                k1, k2 = jax.random.split(key)
                i = jax.random.randint(k1, (), 0, len(pairs))
                g = gids[i]
                ok = jnp.where(mixed_flags[i] > 0,
                               state.get("dirpi_on",
                                         jnp.ones((1,), jnp.int32))[g] > 0,
                               True)
                new, lnH = M._dirichlet_proposal(
                    k2, state["rootpi2"][g], tuning)
                st = {**state,
                      "rootpi2": state["rootpi2"].at[g].set(new)}
                return st, jnp.where(ok, lnH, NEG_INF)

            def mv_rootpi_slider(key, state, tuning, n_tips=n):
                k1, k2 = jax.random.split(key)
                i = jax.random.randint(k1, (), 0, len(pairs))
                g = gids[i]
                ok = jnp.where(mixed_flags[i] > 0,
                               state.get("dirpi_on",
                                         jnp.ones((1,), jnp.int32))[g] > 0,
                               True)
                x = state["rootpi2"][g, 0]
                delta = (jax.random.uniform(k2) - 0.5) * tuning
                nx = x + delta            # reflect into (0, 1)
                nx = jnp.abs(nx)
                nx = jnp.where(nx > 1.0, 2.0 - nx, nx)
                new = jnp.stack([nx, 1.0 - nx])
                st = {**state,
                      "rootpi2": state["rootpi2"].at[g].set(new)}
                return st, jnp.where(ok, 0.0, NEG_INF)

            mk.append(MoveSpec("rootpi_dir", mv_rootpi_dir,
                               0.5, 200.0, 0.25, -1, 1.0, 1e5))
            mk.append(MoveSpec("rootpi_slider", mv_rootpi_slider,
                               0.5, 0.15, 0.25, 1, 1e-5, 1.0))
            if mix_on:
                pi_gids = jnp.asarray([p for p, _, _ in pairs])

                def _lndir(alpha, x):
                    return _dlp(x, jnp.maximum(alpha, 1e-4))

                def mv_dirpi_switch(key, state, tuning, n_tips=n):
                    k1, k2, k3 = jax.random.split(key, 3)
                    i = jax.random.randint(k1, (), 0, len(pairs))
                    gp, gr = pi_gids[i], gids[i]
                    on = state["dirpi_on"][gr] > 0
                    a = tuning
                    old_pi = state["pi2"][gp]
                    old_root = state["rootpi2"][gr]
                    # split (off -> on): draw new stationary + root from
                    # Dir(a*old_pi); merge (on -> off): new stationary
                    # from Dir(a*(old_pi+old_root)/2)
                    gsplit_pi = jax.random.gamma(k2, a * old_pi) + 1e-10
                    new_pi_s = gsplit_pi / jnp.sum(gsplit_pi)
                    gsplit_rt = jax.random.gamma(k3, a * old_pi) + 1e-10
                    new_root_s = gsplit_rt / jnp.sum(gsplit_rt)
                    mid = a * (old_pi + old_root) / 2.0
                    gmerge = jax.random.gamma(k2, mid) + 1e-10
                    new_pi_m = gmerge / jnp.sum(gmerge)
                    lnH_split = (_lndir(a * (new_pi_s + new_root_s) / 2.0,
                                        old_pi)
                                 - _lndir(a * old_pi, new_pi_s)
                                 - _lndir(a * old_pi, new_root_s))
                    lnH_merge = (_lndir(a * new_pi_m, old_pi)
                                 + _lndir(a * new_pi_m, old_root)
                                 - _lndir(mid, new_pi_m))
                    new_pi = jnp.where(on, new_pi_m, new_pi_s)
                    new_root = jnp.where(on, old_root, new_root_s)
                    lnH = jnp.where(on, lnH_merge, lnH_split)
                    st = {**state,
                          "pi2": state["pi2"].at[gp].set(new_pi),
                          "rootpi2":
                          state["rootpi2"].at[gr].set(new_root),
                          "dirpi_on": state["dirpi_on"].at[gr].set(
                              jnp.where(on, 0, 1))}
                    return st, lnH

                mk.append(MoveSpec("dirpi_switch", mv_dirpi_switch,
                                   0.5, 200.0, 0.25, -1, 1.0, 1e4))
        if self.n_groups.get("pi61"):
            mk.append(MoveSpec("pi61_dir",
                               partial(M.make_simplex_move("pi61"),
                                       n_tips=n),
                               2.0, 2000.0, 0.25, -1, 10.0, 1e7))
        if self.n_groups.get("pi16"):
            mk.append(MoveSpec("pi16_dir",
                               partial(M.make_simplex_move("pi16"),
                                       n_tips=n),
                               2.0, 500.0, 0.25, -1, 1.0, 1e6))
        if self.n_groups.get("omega"):
            mk.append(MoveSpec(
                "omega_mult",
                partial(M.make_multiplier_move("omega", 1e-4, 1e3),
                        n_tips=n), 2.0, 2.0 * np.log(1.5), 0.25, 1,
                1e-3, 20.0))
        if self.n_groups.get("ny98"):
            mk.append(MoveSpec(
                "omega1_slider",
                partial(M.make_slider_move("omega1", 0.0, 1.0), n_tips=n),
                1.5, 0.1, 0.25, 1, 1e-3, 1.0))
            mk.append(MoveSpec(
                "omega3_mult",
                partial(M.make_multiplier_move("omega3", 1.0, 1e3),
                        n_tips=n), 1.5, 2.0 * np.log(1.5), 0.25, 1,
                1e-3, 20.0))
            mk.append(MoveSpec(
                "omegaprobs_dir",
                partial(M.make_simplex_move("omegaprobs"), n_tips=n),
                1.5, 100.0, 0.25, -1, 1.0, 1e5))
        if self.n_groups.get("m3"):
            n_m3 = self.n_groups["m3"]

            def mv_m3omega(key, state, tuning, n_tips=n):
                """Reflected window slide of one of the three ordered
                omegas within its neighbor bounds (reference Move_OmegaM3,
                src/proposal.c:9446)."""
                k1, k2, k3 = jax.random.split(key, 3)
                gi = jax.random.randint(k1, (), 0, n_m3)
                which = jax.random.randint(k2, (), 0, 3)
                w = state["m3omega"][gi]
                lo = jnp.where(which == 0, 0.0, w[jnp.maximum(which - 1, 0)])
                hi = jnp.where(which == 2, jnp.float32(1e3),
                               w[jnp.minimum(which + 1, 2)])
                win = jnp.minimum(tuning, hi - lo)
                new = w[which] + win * (jax.random.uniform(k3) - 0.5)
                # reflect into (lo, hi)
                span = jnp.maximum(hi - lo, 1e-30)
                t = jnp.mod(new - lo, 2 * span)
                new = lo + jnp.where(t > span, 2 * span - t, t)
                arr = state["m3omega"].at[gi, which].set(new)
                return {**state, "m3omega": arr}, jnp.float32(0.0)

            mk.append(MoveSpec("m3omega_slider", mv_m3omega,
                               2.0, 0.5, 0.25, 1, 1e-3, 50.0))
            mk.append(MoveSpec(
                "m3probs_dir",
                partial(M.make_simplex_move("m3probs"), n_tips=n),
                1.5, 100.0, 0.25, -1, 1.0, 1e5))
        if self.n_groups.get("m10"):
            mk.append(MoveSpec(
                "m10beta_mult",
                partial(M.make_multiplier_move("m10beta", 1e-3, 20.0),
                        n_tips=n), 1.0, 2.0 * np.log(1.5), 0.25, 1,
                1e-3, 20.0))
            mk.append(MoveSpec(
                "m10gamma_mult",
                partial(M.make_multiplier_move("m10gamma", 1e-3, 20.0),
                        n_tips=n), 1.0, 2.0 * np.log(1.5), 0.25, 1,
                1e-3, 20.0))
            mk.append(MoveSpec(
                "m10probs_dir",
                partial(M.make_simplex_move("m10catprobs"), n_tips=n),
                1.0, 100.0, 0.25, -1, 1.0, 1e5))
        if self.n_groups.get("aamodel"):
            n_models = 11

            def mv_aajump(key, state, tuning, n_tips=n):
                k1, k2 = jax.random.split(key)
                arr = state["aamodel_idx"]
                gi = jax.random.randint(k1, (), 0, arr.shape[0])
                off = jax.random.randint(k2, (), 1, n_models)
                new = (arr[gi] + off) % n_models
                return ({**state, "aamodel_idx": arr.at[gi].set(new)},
                        jnp.float32(0.0))
            mk.append(MoveSpec("aamodel_jump", mv_aajump, 2.0, 0.0,
                               tunable=False))
        plain_rev = [g for g in range(self.n_groups.get("revmat", 0))
                     if g not in self._mixed_rev]
        if plain_rev:
            mk.append(MoveSpec(
                "revmat_dir",
                partial(M.make_simplex_move("revmat", groups=plain_rev),
                        n_tips=n),
                2.0, 200.0, 0.25, -1, 1.0, 1e5))
        if self.n_groups.get("aarevmat"):
            # protein GTR exchangeabilities: same Dirichlet proposal the
            # reference applies to REVMAT_DIR params of any size
            # (Move_Revmat_Dir, src/model.c:22913)
            # reference tuning is alphaPi=100 *per rate* (alphaPi*nRates
            # in Move_Revmat_Dir); our proposal concentration is total,
            # so start at 100*190
            mk.append(MoveSpec(
                "aarevmat_dir",
                partial(M.make_simplex_move("aarevmat"), n_tips=n),
                2.0, 19000.0, 0.25, -1, 1.0, 1e7))
        if self._mixed_rev:
            from . import mixed_gtr as MG
            gids = jnp.asarray(sorted(self._mixed_rev))

            def mv_splitmerge(key, state, tuning, n_tips=n):
                k1, k2 = jax.random.split(key)
                gi = gids[jax.random.randint(k1, (), 0, len(gids))]
                z2, v2, lnH = MG.splitmerge(k2, state["gtr_class"][gi],
                                            state["revmat"][gi], tuning)
                return ({**state,
                         "gtr_class": state["gtr_class"].at[gi].set(z2),
                         "revmat": state["revmat"].at[gi].set(v2)}, lnH)

            def mv_dirmix(key, state, tuning, n_tips=n):
                k1, k2 = jax.random.split(key)
                gi = gids[jax.random.randint(k1, (), 0, len(gids))]
                v2, lnH = MG.dirichlet_mixed(k2, state["gtr_class"][gi],
                                             state["revmat"][gi], tuning)
                return ({**state,
                         "revmat": state["revmat"].at[gi].set(v2)}, lnH)

            mk.append(MoveSpec("revmat_splitmerge", mv_splitmerge,
                               2.0, 10.0, 0.25, -1, 0.5, 1e4))
            mk.append(MoveSpec("revmat_dirmix", mv_dirmix,
                               2.0, 200.0, 0.25, -1, 1.0, 1e5))
        if self.n_groups.get("symbeta"):
            mk.append(MoveSpec(
                "symbeta_mult",
                partial(M.make_multiplier_move("symbeta", 1e-2, 1e4),
                        n_tips=n), 1.0, 2.0 * np.log(1.5), 0.25, 1,
                1e-3, 20.0))
        for field in sorted(self.n_groups):
            if field.startswith("sympi"):
                mk.append(MoveSpec(
                    f"{field}_dir",
                    partial(M.make_simplex_move(field), n_tips=n),
                    1.5, 100.0, 0.25, -1, 1.0, 1e5))
        if self.n_groups.get("mixtrates"):
            mk.append(MoveSpec(
                "mixtrates_dir",
                partial(M.make_simplex_move("mixtrates"), n_tips=n),
                1.5, 100.0, 0.25, -1, 1.0, 1e5))
        if self.n_groups.get("ratecorr"):
            mk.append(MoveSpec(
                "ratecorr_slider",
                partial(M.make_slider_move("ratecorr", -1.0, 1.0),
                        n_tips=n), 1.5, 0.3, 0.25, 1, 1e-3, 2.0))
        if self.n_groups.get("covswitch"):
            mk.append(MoveSpec(
                "covswitch_mult",
                partial(M.make_multiplier_move("covswitch", 1e-3, 1e3),
                        n_tips=n), 1.5, 2.0 * np.log(1.5), 0.25, 1,
                1e-3, 20.0))
        if self.n_groups.get("brownscale"):
            mk.append(MoveSpec(
                "brownscale_mult",
                partial(M.make_multiplier_move("brownscale", 1e-6, 1e6),
                        n_tips=n), 1.5, 2.0 * np.log(1.5), 0.25, 1,
                1e-3, 20.0))
        if self.n_groups.get("tratio"):
            mk.append(MoveSpec(
                "tratio_mult",
                partial(M.make_multiplier_move("tratio", 1e-4, 1e4),
                        n_tips=n), 1.0, 1.0, 0.25, 1, 1e-3, 20.0))
        if self.n_groups.get("shape"):
            mk.append(MoveSpec(
                "shape_mult",
                partial(M.make_multiplier_move("shape", 1e-4, 200.0),
                        n_tips=n), 1.5, 2.0 * np.log(1.6), 0.25, 1,
                1e-3, 20.0))
        if self.n_groups.get("pinvar"):
            mk.append(MoveSpec(
                "pinvar_slider",
                partial(M.make_slider_move("pinvar", 0.0, 1.0), n_tips=n),
                1.5, 0.2, 0.25, 1, 1e-3, 1.0))
        if self.ratemult_on:
            mk.append(MoveSpec(
                "ratemult_dir",
                partial(M.make_simplex_move("ratemult"), n_tips=n),
                1.5, 300.0, 0.25, -1, 1.0, 1e5))
        # omegaprobs/m3probs are in here because the NY98/M3 mixture is
        # normalized jointly across classes: changing the class
        # frequencies rescales every class Q (src/likelihood.c:10702)
        q_moves = {"pi_dir", "pi20_dir", "pi2_dir", "pi61_dir", "pi16_dir",
                   "dirpi_switch",
                   "omega_mult", "omega1_slider", "omega3_mult",
                   "m3omega_slider", "aamodel_jump", "revmat_dir",
                   "aarevmat_dir",
                   "revmat_splitmerge", "revmat_dirmix", "tratio_mult",
                   "omegaprobs_dir", "m3probs_dir",
                   "m10beta_mult", "m10gamma_mult", "m10probs_dir"}
        for i, m in enumerate(mk):
            m.updates_q = m.name in q_moves
            m.prior_scope = "tree" if i < n_tree_moves else "params"
        self.moves = mk
        self._prior_tflags = jnp.asarray(
            [0 if m.prior_scope == "params" else 1 for m in mk], jnp.int32)
        self._prior_pflags = jnp.asarray(
            [0 if m.prior_scope == "tree" else 1 for m in mk], jnp.int32)
        w = np.array([m.weight for m in mk])
        self.move_logits = jnp.log(jnp.asarray(w / w.sum()))

    # ------------------------------------------------------------------
    # state

    def _start_clade_masks(self) -> list:
        """Clades the starting tree must contain: hard constraint sets
        plus partial-constraint first sets (making set1 a clade excludes
        set2 from it, satisfying the backbone condition)."""
        masks = []
        if self.constraint_masks is not None:
            masks += [m for m in self.constraint_masks]
        if self.partial_masks is not None:
            masks += [m for m in self.partial_masks[0]]
        return masks

    def _retry_negative(self, build, tree_of, tries: int = 100):
        """Draw starting trees until none of the negative-constraint
        clades is present (rejection; random trees rarely contain a
        specific split)."""
        for _ in range(tries):
            out = build()
            if self.negative_masks is None:
                return out
            t = tree_of(out)
            tipsets = np.zeros((t.n_nodes, self.n_tips), bool)
            tipsets[np.arange(self.n_tips), np.arange(self.n_tips)] = True
            for v in t.postorder():
                tipsets[v] = tipsets[t.left[v]] | tipsets[t.right[v]]
            bad = False
            for m in self.negative_masks:
                eq = (tipsets == m[None, :]).all(1)
                if not t.rooted:
                    eq |= (tipsets == ~m[None, :]).all(1)
                if eq.any():
                    bad = True
                    break
            if not bad:
                return out
        raise ValueError("could not draw a starting tree satisfying the "
                         "negative constraints")

    def init_state(self, rng: np.random.Generator, tree: Tree | None = None):
        """One chain's state dict (host values)."""
        ts = self.tree_settings
        if self.best:
            from .best import init_compatible_trees
            (st_sp, s_ages), genes = init_compatible_trees(
                self.n_tips, self.n_species, np.asarray(self.tip_species),
                rng, self.n_div)
            st = {
                "left": jnp.stack([jnp.asarray(t.left) for t, _ in genes]),
                "right": jnp.stack([jnp.asarray(t.right) for t, _ in genes]),
                "parent": jnp.stack([jnp.asarray(t.parent)
                                     for t, _ in genes]),
                "age": jnp.stack([jnp.asarray(a, jnp.float32)
                                  for _, a in genes]),
                "s_left": jnp.asarray(st_sp.left),
                "s_right": jnp.asarray(st_sp.right),
                "s_parent": jnp.asarray(st_sp.parent),
                "s_age": jnp.asarray(s_ages, jnp.float32),
            }
            m = 2 * self.n_species - 1 if ts.popvarpr == "variable" else 1
            if ts.popsizepr.kind == "gamma":
                n0 = ts.popsizepr.params[0] / ts.popsizepr.params[1]
            elif ts.popsizepr.kind == "lognormal":
                n0 = float(np.exp(ts.popsizepr.params[0]))
            elif ts.popsizepr.kind == "uniform":
                n0 = 0.5 * (ts.popsizepr.params[0] + ts.popsizepr.params[1])
            elif ts.popsizepr.kind == "exponential":
                n0 = 1.0 / ts.popsizepr.params[0]   # prior mean, not rate
            else:
                n0 = ts.popsizepr.params[0] if ts.popsizepr.params else 1.0
            st["popsize"] = jnp.full((m,), n0, jnp.float32)
            if ts.clockpr == "birthdeath":
                st["speciation"] = jnp.asarray([0.1], jnp.float32)
                st["extinction"] = jnp.asarray([0.5], jnp.float32)
            self._init_substitution_state(st)
            return self.refresh_eigs(st)
        if ts.clock:
            from ..trees import random_clock_tree
            mean_age = 0.1
            if self.has_dated_tips:
                mean_age = max(0.1, 1.2 * float(self.tip_dates.max()))
            smasks = self._start_clade_masks()
            if smasks:
                from ..trees import random_clock_tree_constrained
                t, ages = self._retry_negative(
                    lambda: random_clock_tree_constrained(
                        self.n_tips, rng, smasks, mean_age=mean_age,
                        tip_ages=(self.tip_dates if self.has_dated_tips
                                  else None)),
                    lambda pair: pair[0])
            else:
                t, ages = random_clock_tree(
                    self.n_tips, rng, mean_age=mean_age,
                    tip_ages=self.tip_dates if self.has_dated_tips
                    else None)
            st = {
                "left": jnp.asarray(t.left), "right": jnp.asarray(t.right),
                "parent": jnp.asarray(t.parent),
                "age": jnp.asarray(ages, jnp.float32),
            }
            if ts.clockratepr.kind != "fixed":
                start = {"normal": lambda p: p[0],
                         "lognormal": lambda p: float(np.exp(p[0])),
                         "gamma": lambda p: p[0] / p[1],
                         "exponential": lambda p: 1.0 / p[0],
                         "uniform": lambda p: 0.5 * (p[0] + p[1])}[
                             ts.clockratepr.kind](ts.clockratepr.params)
                st["clockrate"] = jnp.asarray([start], jnp.float32)
            if ts.clockvarpr == "cpp":
                K = self.cpp_cap
                st["cpp_n"] = jnp.zeros((self.n_nodes,), jnp.int32)
                st["cpp_pos"] = jnp.full((self.n_nodes, K), 0.5,
                                         jnp.float32)
                st["cpp_mult"] = jnp.ones((self.n_nodes, K), jnp.float32)
                lam0 = (1.0 / ts.cppratepr.params[0]
                        if ts.cppratepr.kind == "exponential"
                        else (ts.cppratepr.params or (1.0,))[0])
                st["cpprate"] = jnp.asarray([lam0], jnp.float32)
            elif ts.clockvarpr != "strict":
                st["brate"] = jnp.ones((self.n_nodes,), jnp.float32)
                st["clockvar"] = jnp.asarray([0.1], jnp.float32)
                if ts.clockvarpr == "mixed":
                    st["rcl_model"] = jnp.zeros((1,), jnp.int32)
            if ts.clockpr == "birthdeath":
                st["speciation"] = jnp.asarray([0.1], jnp.float32)
                st["extinction"] = jnp.asarray([0.5], jnp.float32)
            if ts.clockpr == "coalescence":
                st["popsize"] = jnp.asarray([1.0], jnp.float32)
                if ts.growthpr.kind != "fixed":
                    st["growth"] = jnp.zeros((1,), jnp.float32)
            if ts.clockpr == "fossilization":
                st["speciation"] = jnp.asarray([0.1], jnp.float32)
                st["extinction"] = jnp.asarray([0.5], jnp.float32)
                st["fossilization"] = jnp.asarray([0.1], jnp.float32)
                if self.has_dated_tips and ts.samplestrat != "fossiltip":
                    # ancestral-fossil flags; all fossils start as tips
                    st["sa"] = jnp.zeros((self.n_tips,), jnp.int32)
        else:
            def draw():
                # mcmc starttree=/nperts= (reference chainParams
                # startTree/numStartPerts, src/command.c:14520-14521;
                # RandPerturb src/mcmc.c:2569).  Constrained runs keep
                # the constraint-respecting random builder — built or
                # perturbed trees could violate clade constraints.
                constrained = (self._start_clade_masks()
                               or self.negative_masks is not None)
                mode = getattr(self.mcmc, "starttree", "current")
                t = tree or self.start_tree
                if mode == "random":
                    t = tree   # ignore user starting tree
                elif mode in ("parsimony", "nj") and tree is None \
                        and not constrained:
                    t = self._built_start_tree(mode, rng)
                if t is None:
                    if constrained:
                        from ..trees import random_unrooted_constrained
                        smasks = self._start_clade_masks()
                        t = self._retry_negative(
                            lambda: random_unrooted_constrained(
                                self.n_tips, rng, smasks, mean_blen=0.1),
                            lambda x: x)
                    else:
                        t = random_unrooted(self.n_tips, rng,
                                            mean_blen=0.1)
                nperts = getattr(self.mcmc, "nperts", 0)
                if nperts > 0 and tree is None and not constrained:
                    from ..trees import perturb_nni
                    t = perturb_nni(t, nperts, rng)
                return t

            def arrays(t):
                blen = np.clip(t.blen, 0.0, M.BRLEN_MAX).astype(np.float32)
                if self.rooted_nonclock and blen[0] == 0.0:
                    # rooted non-clock start: the root begins on tip 0's
                    # pendant edge — split the basal branch so both root
                    # children carry real lengths
                    basal = int(t.left[2 * self.n_tips - 2])
                    blen[0] = blen[basal] / 2.0
                    blen[basal] = blen[basal] / 2.0
                return {
                    "left": jnp.asarray(t.left),
                    "right": jnp.asarray(t.right),
                    "parent": jnp.asarray(t.parent),
                    "blen": jnp.asarray(blen),
                }

            if self.n_trees > 1:
                per = [arrays(draw()) for _ in range(self.n_trees)]
                st = {k: jnp.stack([p[k] for p in per]) for k in per[0]}
            else:
                st = arrays(draw())
        self._init_substitution_state(st)
        return self.refresh_eigs(st)

    def _built_start_tree(self, mode: str, rng):
        """starttree=parsimony|nj: build a data-derived starting tree
        (reference BuildParsTrees stepwise addition / NJ).  Parsimony
        trees use a fresh random addition order per chain; the NJ tree
        is deterministic and cached (chains differ via nperts)."""
        import numpy as np

        from ..trees import (neighbor_joining, parsimony_stepwise,
                             pdistance_matrix)
        ms, ws = [], []
        for d in self.data.divisions:
            if d.cont is not None or d.patterns.size == 0:
                continue
            ms.append(d.patterns.astype(np.uint32))
            ws.append(np.asarray(d.weights, np.float64))
        if not ms:
            return None
        masks = np.concatenate(ms, axis=1)
        wts = np.concatenate(ws)
        if mode == "nj":
            if not hasattr(self, "_nj_tree"):
                self._nj_tree = neighbor_joining(
                    pdistance_matrix(masks, wts))
            return self._nj_tree
        return parsimony_stepwise(masks, wts, rng)

    def _init_substitution_state(self, st):
        """Fill starting values for all sampled substitution-model
        parameters (role of reference FillNormalParams,
        src/model.c:11444)."""
        if self.n_groups.get("pi"):
            st["pi"] = jnp.full((self.n_groups["pi"], 4), 0.25)
        if self.n_groups.get("pi20"):
            st["pi20"] = jnp.full((self.n_groups["pi20"], 20), 0.05)
        if self.n_groups.get("pi2"):
            st["pi2"] = jnp.full((self.n_groups["pi2"], 2), 0.5)
        if self.n_groups.get("rootpi2"):
            st["rootpi2"] = jnp.full((self.n_groups["rootpi2"], 2), 0.5)
            if any(c.dirpi_mix for c in self.div_cfg):
                # mixed starts in the directional state (reference .p
                # gen-0 prints statefrmod=1 with rootpi sampled)
                st["dirpi_on"] = jnp.ones(
                    (self.n_groups["rootpi2"],), jnp.int32)
        if self.n_groups.get("pi61"):
            n61 = next(c.codon.n_states for c in self.div_cfg
                       if c.codon is not None)
            st["pi61"] = jnp.full((self.n_groups["pi61"], n61), 1.0 / n61)
        if self.n_groups.get("pi16"):
            st["pi16"] = jnp.full((self.n_groups["pi16"], 16), 1.0 / 16)
        if self.n_groups.get("omega"):
            st["omega"] = jnp.ones((self.n_groups["omega"],))
        if self.n_groups.get("ny98"):
            g = self.n_groups["ny98"]
            st["omega1"] = jnp.full((g,), 0.1)
            st["omega3"] = jnp.full((g,), 2.0)
            st["omegaprobs"] = jnp.full((g, 3), 1.0 / 3)
        if self.n_groups.get("m10"):
            g = self.n_groups["m10"]
            st["m10beta"] = jnp.tile(jnp.asarray([1.0, 1.0]), (g, 1))
            st["m10gamma"] = jnp.tile(jnp.asarray([1.0, 1.0]), (g, 1))
            st["m10catprobs"] = jnp.full((g, 2), 0.5)
        if self.n_groups.get("m3"):
            g = self.n_groups["m3"]
            st["m3omega"] = jnp.tile(
                jnp.asarray([0.1, 1.0, 3.0], jnp.float32), (g, 1))
            st["m3probs"] = jnp.full((g, 3), 1.0 / 3)
        if self.n_groups.get("aamodel"):
            st["aamodel_idx"] = jnp.zeros((self.n_groups["aamodel"],),
                                          jnp.int32)
        if self.n_groups.get("covswitch"):
            st["covswitch"] = jnp.ones((self.n_groups["covswitch"], 2))
        if self.n_groups.get("ratecorr"):
            st["ratecorr"] = jnp.zeros((self.n_groups["ratecorr"],))
        if self.n_groups.get("symbeta"):
            st["symbeta"] = jnp.ones((self.n_groups["symbeta"],))
        if self.n_groups.get("brownscale"):
            st["brownscale"] = jnp.ones((self.n_groups["brownscale"],))
        for field, ng in self.n_groups.items():
            if field.startswith("sympi"):
                k = int(field[5:])
                st[field] = jnp.full((ng, k), 1.0 / k)
        if self.n_groups.get("mixtrates"):
            ks = {c.n_cats for c in self.div_cfg if c.mixt_group >= 0}
            if len(ks) > 1:
                raise ValueError("kmixture groups must share nmixtcat")
            k = ks.pop()
            st["mixtrates"] = jnp.full(
                (self.n_groups["mixtrates"], k), 1.0 / k)
        if self.n_groups.get("aarevmat"):
            st["aarevmat"] = jnp.full(
                (self.n_groups["aarevmat"], 190), 1.0 / 190)
        if self.n_groups.get("revmat"):
            st["revmat"] = jnp.full((self.n_groups["revmat"], 6), 1.0 / 6)
            if self._mixed_rev:
                st["gtr_class"] = jnp.tile(
                    jnp.arange(6, dtype=jnp.int32),
                    (self.n_groups["revmat"], 1))
        if self.n_groups.get("tratio"):
            st["tratio"] = jnp.ones((self.n_groups["tratio"],))
        if self.n_groups.get("shape"):
            st["shape"] = jnp.full((self.n_groups["shape"],), 0.5)
        if self.n_groups.get("pinvar"):
            st["pinvar"] = jnp.full((self.n_groups["pinvar"],), 0.1)
        if self.ratemult_on:
            st["ratemult"] = jnp.asarray(self.div_char_frac, jnp.float32)
        return st

    def init_chains(self, seed: int | None = None):
        """Vmapped initial states for all runs × chains + bookkeeping."""
        seed = self.mcmc.seed if seed is None else seed
        rng = np.random.default_rng(seed)
        states = [self.init_state(rng) for _ in
                  range(self.mcmc.n_chains_total)]
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        lnL = jax.vmap(self.log_likelihood)(states)
        lnP_tree = jax.vmap(self.log_prior_tree)(states)
        lnP_par = jax.vmap(self.log_prior_params)(states)
        states["lnL"] = lnL
        states["lnP"] = lnP_tree + lnP_par
        states["lnP_tree"] = lnP_tree
        states["lnP_par"] = lnP_par
        nt, nm = self.mcmc.n_chains_total, len(self.moves)
        bk = {
            "key": jax.random.PRNGKey(seed),
            "swap_key": jax.random.PRNGKey(self.mcmc.swapseed),
            "temp_id": jnp.tile(jnp.arange(self.mcmc.nchains),
                                self.mcmc.nruns),
            "tuning": jnp.tile(jnp.asarray(
                [m.tuning0 for m in self.moves], jnp.float32), (nt, 1)),
            "tries": jnp.zeros((nt, nm), jnp.int32),
            "accepts": jnp.zeros((nt, nm), jnp.int32),
            "tries_total": jnp.zeros((nt, nm), jnp.int32),
            "accepts_total": jnp.zeros((nt, nm), jnp.int32),
            "swap_tries": jnp.zeros(
                (self.mcmc.nruns, self.mcmc.nchains, self.mcmc.nchains),
                jnp.int32),
            "swap_accepts": jnp.zeros(
                (self.mcmc.nruns, self.mcmc.nchains, self.mcmc.nchains),
                jnp.int32),
            "batch": jnp.zeros((), jnp.int32),
            "gen": jnp.zeros((), jnp.int32),
            "power": jnp.ones((), jnp.float32),
        }
        return states, bk

    # ------------------------------------------------------------------
    # densities

    def _m10_omegas_weights(self, state, cfg):
        """M10 class omegas and weights from the sampled shape pairs and
        class probabilities (reference: BetaBreaks + DiscreteGamma + 1,
        src/model.c:11637-11643; weights = p_k / n_cats_k
        :11608-11611)."""
        from ..models.rates import beta_quantile_breaks
        g = cfg.m10_group
        B = cfg.settings.nm10betacat
        G = cfg.settings.nm10gammacat
        ab, bb = state["m10beta"][g][0], state["m10beta"][g][1]
        ag, bg = state["m10gamma"][g][0], state["m10gamma"][g][1]
        w_beta = beta_quantile_breaks(ab, bb, B)
        # class means of Gamma(ag, bg) = table(ag) * ag/bg, since the
        # table holds the class means of the mean-1 Gamma(ag, ag)
        w_gamma = 1.0 + self._gamma_tables[G](ag) \
            * ag / jnp.maximum(bg, 1e-6)
        omegas = jnp.concatenate([w_beta, w_gamma])
        p = state["m10catprobs"][g]
        weights = jnp.concatenate([jnp.full((B,), 1.0 / B) * p[0],
                                   jnp.full((G,), 1.0 / G) * p[1]])
        return omegas, weights

    def _division_q_pi(self, state, i):
        """(Q, pi) of division i from sampled/fixed params (the analog of
        reference SetNucQMatrix/UpDateCijk inputs, src/likelihood.c:8166)."""
        cfg = self.div_cfg[i]
        s = cfg.settings
        nstates = cfg.div.n_states
        pi = (state[cfg.pi_field][cfg.pi_group] if cfg.pi_group >= 0
              else jnp.asarray(cfg.fixed_pi, jnp.float32))
        if cfg.codon is not None:
            from ..models.substitution import codon_q
            single, transition, nonsyn = cfg.codon.pair_classes()
            kappa = (state["tratio"][cfg.tratio_group]
                     if cfg.tratio_group >= 0 else jnp.float32(1.0))
            weights = None
            if cfg.ny98_group >= 0:
                g = cfg.ny98_group
                omegas = jnp.stack([state["omega1"][g], jnp.float32(1.0),
                                    state["omega3"][g]])
                weights = state["omegaprobs"][g]
            elif cfg.m3_group >= 0:
                omegas = state["m3omega"][cfg.m3_group]
                weights = state["m3probs"][cfg.m3_group]
            elif cfg.m10_group >= 0:
                omegas, weights = self._m10_omegas_weights(state, cfg)
            else:
                omegas = state["omega"][cfg.omega_group][None]
            Q = codon_q(omegas, kappa, pi, jnp.asarray(single),
                        jnp.asarray(transition), jnp.asarray(nonsyn),
                        cat_weights=weights)
            return Q, pi
        if cfg.doublet:
            from ..models.substitution import doublet_q
            if cfg.revmat_group >= 0:
                r6 = state["revmat"][cfg.revmat_group]
            elif cfg.tratio_group >= 0:
                kap = state["tratio"][cfg.tratio_group]
                r6 = jnp.ones((6,)).at[1].set(kap).at[4].set(kap)
            else:
                r6 = jnp.ones((6,))
            return doublet_q(r6, pi), pi
        if cfg.div.dtype is DataType.PROTEIN:
            from ..models.aa_models import AA_MODELS
            if cfg.aamodel_group >= 0:
                exch_stack, pi_stack = self._aa_stacks()
                idx = state["aamodel_idx"][cfg.aamodel_group]
                exch = exch_stack[idx]
                pi = pi_stack[idx]
            elif cfg.aarevmat_group >= 0:
                # protein GTR: sampled 190-dim exchangeability simplex
                exch = state["aarevmat"][cfg.aarevmat_group]
            elif cfg.fixed_aarevmat is not None:
                exch = jnp.asarray(cfg.fixed_aarevmat, jnp.float32)
            else:
                # equalin = Poisson exchangeabilities with sampled pi;
                # anything else must be a known empirical matrix (the
                # setup already rejected unknown names)
                key = "poisson" if s.aamodel == "equalin" else s.aamodel
                exch = jnp.asarray(AA_MODELS[key][0], jnp.float32)
            Q = reversible_q(exch, pi)
        elif cfg.div.dtype in (DataType.DNA, DataType.RNA):
            if s.nst == "1":
                Q = nuc_q_nst1(pi)
            elif s.nst == "2":
                Q = nuc_q_nst2(state["tratio"][cfg.tratio_group], pi)
            else:
                Q = nuc_q_gtr(state["revmat"][cfg.revmat_group], pi)
        elif cfg.div.dtype is DataType.RESTRICTION:
            Q = reversible_q(jnp.ones((1,)), pi)
        elif cfg.div.dtype is DataType.STANDARD:
            if cfg.div.ctype == "ordered":
                from ..models.substitution import ordered_mk_q
                Q = ordered_mk_q(nstates)
            else:
                Q = mk_q(nstates)
            pi = jnp.full((nstates,), 1.0 / nstates)
        else:
            raise NotImplementedError(
                f"datatype {cfg.div.dtype} not yet wired")
        return Q, pi

    def _division_eig(self, state, i):
        Q, pi = self._division_q_pi(state, i)
        return eigh_reversible(Q, pi)

    def refresh_eigs(self, state):
        """(Re)compute the cached eigensystems for every division.  The
        cache lives in the chain state so it rides accept/reject for free;
        only Q-changing move branches call this (reference recomputes cijk
        only when upDateCijk is set, src/likelihood.c:10476)."""
        out = dict(state)
        for i in range(self.n_div):
            if self.div_cfg[i].covswitch_group >= 0 or \
                    self.div_cfg[i].fixed_covswitch is not None:
                continue   # covarion eigensystems are rate-dependent and
                           # rebuilt inline in _covarion_loglik
            if self.div_cfg[i].parsimony:
                continue   # Tuffley-Steel: no Q matrix
            if self.div_cfg[i].div.dtype is DataType.CONTINUOUS:
                continue   # Brownian motion: no Q matrix
            c = self.div_cfg[i]
            if c.sympi_group >= 0 or c.symbeta_group >= 0 \
                    or c.fixed_symbeta > 0:
                continue   # symdiri: pi-dependent Q built inline
            lam, U, Uinv = self._division_eig(state, i)
            out[f"eigL{i}"] = lam
            out[f"eigU{i}"] = U
            out[f"eigV{i}"] = Uinv
        return out

    def _division_eig_cached(self, state, i):
        if f"eigL{i}" in state:
            return state[f"eigL{i}"], state[f"eigU{i}"], state[f"eigV{i}"]
        return self._division_eig(state, i)

    def log_likelihood(self, state):
        if not self.mcmc.use_data:
            # mcmc data=no: prior-only sampling (reference LogLike is
            # skipped when the Data parameter is No)
            return jnp.float32(0.0)
        if self.best:
            # BEST: each division has its own strict-clock gene tree
            # (reference src/best.c; likelihood same machinery per gene)
            if self._best_batched is not None:
                return self._best_lnl_batched(state)
            total = jnp.float32(0.0)
            for i in range(self.n_div):
                par = state["parent"][i]
                age = state["age"][i]
                blen = jnp.where(par >= 0,
                                 age[jnp.maximum(par, 0)] - age, 0.0)
                view = {**state, "left": state["left"][i],
                        "right": state["right"][i], "parent": par}
                total = total + self._division_lnL(view, i, blen)
            return total
        if self.tree_settings.clock:
            from .clock import clock_blens, pin_sa_ages
            state = pin_sa_ages(state, self.n_tips)
            blen = clock_blens(state, self.n_tips,
                               self.tree_settings.clockvarpr)
        elif self.n_trees > 1:
            # unlinked topologies: each division prunes its own tree
            total = jnp.float32(0.0)
            for i in range(self.n_div):
                ti = self.div_tree[i]
                view = {**state, "left": state["left"][ti],
                        "right": state["right"][ti],
                        "parent": state["parent"][ti]}
                total = total + self._division_lnL(view, i,
                                                   state["blen"][ti])
            return total
        else:
            blen = state["blen"]
        total = jnp.float32(0.0)
        grouped_divs = set()
        if self._pallas_on() and not getattr(self, '_site_sharded',
                                             False):
            for idxs, gpruner in (self._multiwalk_pruners
                                  + self._stacked_pruners):
                if grouped_divs.intersection(idxs):
                    continue
                total = total + self._group_lnl(state, blen, idxs,
                                                gpruner)
                grouped_divs.update(idxs)
        for i in range(self.n_div):
            if i not in grouped_divs:
                total = total + self._division_lnL(state, i, blen)
        return total

    @staticmethod
    def _pallas_on() -> bool:
        from ..ops.pruning import _pallas_enabled
        return _pallas_enabled()

    def _group_lnl(self, state, blen, idxs, gpruner):
        """One fused kernel launch for a group of generic divisions
        sharing the tree (PruningPallasMultiwalk default, or the opt-in
        PruningPallasStacked), then the per-division root reductions
        (the tail of division_site_loglik, including ascertainment
        coding corrections and the pinvar mixture)."""
        from ..ops.pruning import _TINY, _coding_total
        from ..ops.tiprobs import transition_probs
        from ..ops.traversal import postorder_internal
        P_list = []
        metas = []
        for gi, i in enumerate(idxs):
            pi, coding, lam, U, Uinv, rates, pinv, cmask, mult = \
                self._generic_div_params(state, i)
            pinv0 = jnp.asarray(pinv, jnp.float32)
            base = jnp.asarray(mult, jnp.float32) / jnp.maximum(
                1.0 - pinv0, 1e-6)
            eff = (blen.astype(jnp.float32) * base)[:, None] \
                * rates[None, :].astype(jnp.float32)
            P_list.append(transition_probs(
                lam.astype(jnp.float32), U.astype(jnp.float32),
                Uinv.astype(jnp.float32), eff))
            metas.append((pi, coding, rates, pinv, cmask))
        order = postorder_internal(state["parent"], self.n_tips)
        root, ls = gpruner(order, state["left"], state["right"], P_list,
                           parent=state["parent"])
        total = jnp.float32(0.0)
        for gi, i in enumerate(idxs):
            pi, coding, rates, pinv, cmask = metas[gi]
            r, ls_d = gpruner.div_view(root, ls, gi)       # [K,S,P],[P]
            kk, S, P = r.shape
            w = jnp.full((kk,), 1.0 / kk, jnp.float32)
            site_l = jnp.maximum(
                jnp.einsum("ksp,k,s->p", r, w, pi.astype(jnp.float32)),
                _TINY)
            ln_var = jnp.log(site_l) + ls_d
            if cmask is not None:
                cm = cmask
                if coding != "all":
                    cm = jnp.concatenate(
                        [cm, jnp.eye(S, dtype=cm.dtype)], axis=0)
                const_l = jnp.einsum("ps,s->p", cm.astype(jnp.float32),
                                     pi.astype(jnp.float32))
                pv = jnp.asarray(pinv, jnp.float32)
                ln_inv = jnp.log(jnp.maximum(pv, _TINY)) + \
                    jnp.log(jnp.maximum(const_l, _TINY))
                ln_site = jnp.where(
                    pv > 0.0,
                    jnp.logaddexp(
                        jnp.log1p(-jnp.minimum(pv, 1 - 1e-7)) + ln_var,
                        ln_inv),
                    ln_var)
            else:
                ln_site = ln_var
            wts = self.weights[i]
            if coding == "all":
                total = total + jnp.sum(
                    wts.astype(jnp.float32) * ln_site)
            else:
                total = total + _coding_total(
                    ln_site[:-S], ln_site[-S:], wts, coding, S)
        return total

    def _is_generic_div(self, cfg) -> bool:
        """True when division i's lnL goes through the generic
        division_loglik tail (the stackable family)."""
        return (cfg.div.dtype is not DataType.CONTINUOUS
                and not cfg.parsimony
                and cfg.sympi_group < 0 and cfg.symbeta_group < 0
                and cfg.fixed_symbeta <= 0
                and cfg.codon is None
                and cfg.covswitch_group < 0
                and cfg.fixed_covswitch is None
                and cfg.ratecorr_group < 0)

    def _generic_div_params(self, state, i):
        """(pi_root, coding, lam, U, Uinv, rates, pinv, cmask, mult) of a
        generic-path division — the inputs division_loglik needs beyond
        the tree."""
        cfg = self.div_cfg[i]
        s = cfg.settings
        pi = (state[cfg.pi_field][cfg.pi_group] if cfg.pi_group >= 0
              else jnp.asarray(cfg.fixed_pi, jnp.float32))
        if cfg.div.dtype is DataType.PROTEIN and cfg.aamodel_group >= 0:
            _, pi_stack = self._aa_stacks()
            pi = pi_stack[state["aamodel_idx"][cfg.aamodel_group]]
        elif cfg.div.dtype is DataType.STANDARD:
            pi = jnp.full((cfg.div.n_states,), 1.0 / cfg.div.n_states)
        if cfg.rootpi_group >= 0 or cfg.fixed_rootpi is not None:
            # directional model: the ROOT reduction (and the
            # ascertainment dummy sum) weight with the root frequencies;
            # Q/tiprobs stay built from the stationary frequencies
            # (reference Likelihood_Res, src/likelihood.c:7155-7165)
            rpi = (state["rootpi2"][cfg.rootpi_group]
                   if cfg.rootpi_group >= 0
                   else jnp.asarray(cfg.fixed_rootpi, jnp.float32))
            if cfg.dirpi_mix:
                on = state["dirpi_on"][cfg.rootpi_group] > 0
                pi = jnp.where(on, rpi, pi)
            else:
                pi = rpi
        coding = {"all": "all", "variable": "variable",
                  "noabsencesites": "noabsence",
                  "nopresencesites": "nopresence"}.get(s.coding, "all")
        if cfg.div.dtype not in (DataType.STANDARD,
                                 DataType.RESTRICTION):
            coding = "all"
        lam, U, Uinv = self._division_eig_cached(state, i)
        if s.rates in ("gamma", "invgamma"):
            rates = self._gamma_tables[cfg.n_cats](
                state["shape"][cfg.shape_group])
        elif s.rates == "lnorm":
            rates = discrete_lognormal(state["shape"][cfg.shape_group],
                                       cfg.n_cats)
        elif s.rates == "kmixture":
            # simplex x K = rates with mean 1 across equal-weight cats
            rates = state["mixtrates"][cfg.mixt_group] * cfg.n_cats
        else:
            rates = jnp.ones((1,))
        pinv = (state["pinvar"][cfg.pinvar_group]
                if cfg.pinvar_group >= 0 else 0.0)
        if cfg.pinvar_group >= 0:
            # gamma rates describe the variable fraction; reference
            # applies them unscaled (likelihood.c invgamma path)
            cmask = self.const_masks[i]
        else:
            cmask = None
        # doublet sites span 2 nucleotide columns; branch lengths stay in
        # per-nucleotide substitution units (reference TiProbs_Gen
        # correctionFactor=2.0, src/likelihood.c:9437-9443 — codon is the
        # analogous 3.0)
        mult = 2.0 if cfg.doublet else 1.0
        if self.ratemult_on:
            mult = mult * state["ratemult"][i] / self.div_char_frac[i]
        return pi, coding, lam, U, Uinv, rates, pinv, cmask, mult

    def _division_lnL(self, state, i, blen):
        cfg = self.div_cfg[i]
        if cfg.div.dtype is DataType.CONTINUOUS:
            return self._brownian_lnL(state, i, cfg, blen)
        if cfg.parsimony:
            return self._pars_lnL(state, i, cfg)
        if cfg.sympi_group >= 0 or cfg.symbeta_group >= 0 \
                or cfg.fixed_symbeta > 0:
            return self._std_symdiri_loglik(state, i, cfg, blen)
        if cfg.codon is not None:
            pi = (state[cfg.pi_field][cfg.pi_group] if cfg.pi_group >= 0
                  else jnp.asarray(cfg.fixed_pi, jnp.float32))
            return self._codon_loglik(state, i, cfg, pi, blen)
        if cfg.covswitch_group >= 0 or cfg.fixed_covswitch is not None:
            return self._covarion_loglik(state, i, cfg, blen)
        if cfg.ratecorr_group >= 0:
            pi = (state[cfg.pi_field][cfg.pi_group] if cfg.pi_group >= 0
                  else jnp.asarray(cfg.fixed_pi, jnp.float32))
            return self._adgamma_loglik(state, i, cfg, pi, blen)
        pi, coding, lam, U, Uinv, rates, pinv, cmask, mult = \
            self._generic_div_params(state, i)
        return division_loglik(
            state["left"], state["right"], state["parent"],
            blen, self.tip_partials[i], self.weights[i],
            lam, U, Uinv, pi, rates, pinv, cmask, self.n_tips,
            rate_mult=mult, coding=coding, pruner=self._pruners[i],
            split_correction=getattr(self, '_site_sharded', False))

    def _pars_lnL(self, state, i, cfg: DivCfg):
        """Tuffley-Steel (1997) parsimony-model likelihood:
        lnL = -(T + n) log k with T the weighted Fitch tree length
        (reference Likelihood_Pars, src/likelihood.c:7593; the basal
        node's extra tip-0 comparison is the root step of our rooted-at-
        tip-0 layout, :7640-7655)."""
        from ..ops.traversal import postorder_internal
        masks, _ = self._pars_per_div[i]
        w = jnp.asarray(cfg.div.weights, jnp.float32)
        masks_j = jnp.asarray(masks)
        n_tips = self.n_tips
        n_nodes = 2 * n_tips - 1
        left, right = state["left"], state["right"]
        F = jnp.zeros((n_nodes, masks.shape[1]), jnp.uint32)
        F = F.at[:n_tips].set(masks_j)
        order = postorder_internal(state["parent"], n_tips)

        def fstep(carry, v):
            F, T = carry
            a, b = F[left[v]], F[right[v]]
            inter = a & b
            T = T + jnp.sum(jnp.where(inter == 0, w, 0.0))
            F = F.at[v].set(jnp.where(inter > 0, inter, a | b))
            return (F, T), None

        (F, T), _ = jax.lax.scan(fstep, (F, jnp.float32(0.0)), order)
        n_chars = float(cfg.div.weights.sum())
        k = max(2, cfg.div.n_states)
        return -(T + n_chars) * np.log(float(k))

    def _brownian_lnL(self, state, i, cfg: DivCfg, blen):
        """Continuous characters: Brownian-motion REML via independent
        contrasts (ops/brownian.py).  sigma^2 is the sampled brownscale
        parameter; characters are independent (browncorrpr fixed(0), the
        reference default src/bayes.c:792).  Continuous divisions do not
        join the ratepr=variable multiplier scheme — sigma^2 already
        absorbs the overall scale."""
        from ..ops.brownian import pic_logpdf
        sigma2 = state["brownscale"][cfg.brownscale_group]
        return pic_logpdf(state["left"], state["right"], state["parent"],
                          blen, self._cont_values[i], sigma2, self.n_tips)

    def _std_symdiri_loglik(self, state, i, cfg: DivCfg, blen):
        """Standard/restriction data under symdirihyperpr: binary
        characters integrate over nbetacat discretized symmetric-Beta
        state-frequency categories (reference BetaBreaks fill,
        src/model.c:12290); multistate characters use a sampled frequency
        vector with a symmetric Dirichlet(beta) prior (reference
        Move_StatefreqsSymDirMultistate, src/model.c:23171)."""
        from ..models.special import beta_category_freqs
        from ..models.substitution import binary_q, mk_q
        from ..ops.tiprobs import eigh_reversible
        s = cfg.settings
        kst = cfg.div.n_states
        coding = {"all": "all", "variable": "variable",
                  "noabsencesites": "noabsence",
                  "nopresencesites": "nopresence"}.get(s.coding, "all")
        krate = cfg.n_rate_cats
        if s.rates in ("gamma", "invgamma", "lnorm"):
            if s.rates == "lnorm":
                rates = discrete_lognormal(state["shape"][cfg.shape_group],
                                           krate)
            else:
                rates = self._gamma_tables[krate](
                    state["shape"][cfg.shape_group])
        else:
            rates = jnp.ones((krate,))
        mult = 1.0
        if self.ratemult_on:
            mult = state["ratemult"][i] / self.div_char_frac[i]
        if cfg.sympi_group >= 0:
            pi = state[cfg.sympi_field][cfg.sympi_group]
            Q = mk_q(kst, pi)
            lam, U, Uinv = eigh_reversible(Q, pi)
            return division_loglik(
                state["left"], state["right"], state["parent"], blen,
                self.tip_partials[i], self.weights[i], lam, U, Uinv, pi,
                rates, 0.0, None, self.n_tips, rate_mult=mult,
                coding=coding, pruner=self._pruners[i],
                split_correction=getattr(self, '_site_sharded',
                                         False))
        # binary beta-category mixture: fold beta cats into the category
        # axis next to the rate categories
        B = s.nbetacat
        beta = (state["symbeta"][cfg.symbeta_group]
                if cfg.symbeta_group >= 0
                else jnp.float32(cfg.fixed_symbeta))
        q = beta_category_freqs(beta, B)
        pis = jnp.stack([q, 1.0 - q], axis=-1)          # [B, 2]
        lam, U, Uinv = eigh_reversible(binary_q(pis), pis)
        lam_f = jnp.repeat(lam, krate, axis=0)
        U_f = jnp.repeat(U, krate, axis=0)
        V_f = jnp.repeat(Uinv, krate, axis=0)
        pi_f = jnp.repeat(pis, krate, axis=0)           # [B*K, 2]
        rates_f = jnp.tile(rates, B)
        return division_loglik(
            state["left"], state["right"], state["parent"], blen,
            self.tip_partials[i], self.weights[i], lam_f, U_f, V_f,
            pi_f, rates_f, 0.0, None, self.n_tips, rate_mult=mult,
            coding=coding, pruner=self._pruners[i],
            split_correction=getattr(self, '_site_sharded', False))

    def _covarion_loglik(self, state, i, cfg: DivCfg, blen):
        """Tuffley-Steel covarion likelihood: doubled state space, one
        eigensystem per rate category because the category rate scales the
        substitution block but not the switch rates (reference
        TiProbs_GenCov src/likelihood.c:9568, UpDateCijk :10511-10522)."""
        from ..models.substitution import covarion_q
        s = cfg.settings
        Q, pi = self._division_q_pi(state, i)
        if cfg.covswitch_group >= 0:
            swr = state["covswitch"][cfg.covswitch_group]
        else:
            swr = jnp.asarray(cfg.fixed_covswitch, jnp.float32)
        if cfg.shape_group >= 0:
            if s.rates == "lnorm":
                rates = discrete_lognormal(state["shape"][cfg.shape_group],
                                           cfg.n_cats)
            else:
                rates = self._gamma_tables[cfg.n_cats](
                    state["shape"][cfg.shape_group])
        else:
            rates = jnp.ones((1,))
        if self.ratemult_on:
            rates = rates * state["ratemult"][i] / self.div_char_frac[i]
        Qc, pic = jax.vmap(lambda r: covarion_q(Q, pi, swr[0], swr[1], r))(
            rates)
        lam, U, Uinv = eigh_reversible(Qc, pic[0])
        return division_loglik(
            state["left"], state["right"], state["parent"], blen,
            self.tip_partials[i], self.weights[i], lam, U, Uinv, pic[0],
            jnp.ones((rates.shape[0],)), 0.0, None, self.n_tips,
            pruner=self._pruners[i])

    def _adgamma_loglik(self, state, i, cfg: DivCfg, pi, blen):
        """Autocorrelated-gamma (rates=adgamma) likelihood: pruning for
        per-site category likelihoods, then the category HMM along sites
        (reference Likelihood_Adgamma src/likelihood.c:5692 +
        CalcLikeAdgamma src/mcmc.c:1575 + AutodGamma src/utils.c:8989)."""
        from ..models.rates import adgamma_transition
        from ..ops.pruning import adgamma_loglik_from_cats, root_clv
        lam, U, Uinv = self._division_eig_cached(state, i)
        rates = self._gamma_tables[cfg.n_cats](
            state["shape"][cfg.shape_group])
        mult = 1.0
        if self.ratemult_on:
            mult = state["ratemult"][i] / self.div_char_frac[i]
        root_cl, logscale = root_clv(
            state["left"], state["right"], state["parent"], blen,
            self.tip_partials[i], lam, U, Uinv, rates, 0.0, self.n_tips,
            mult, pruner=self._pruners[i])
        rP = jnp.einsum("pks,s->pk", root_cl, pi)
        poc, jump_idx, uniq = self._adg_maps[i]
        rho = state["ratecorr"][cfg.ratecorr_group]
        M = adgamma_transition(rho, cfg.n_cats)
        pows, cache = [], {}

        def mpow(j):
            if j in cache:
                return cache[j]
            if j == 1:
                r = M
            else:
                h = mpow(j // 2)
                r = jnp.matmul(h, h, precision=jax.lax.Precision.HIGHEST)
                if j % 2:
                    r = jnp.matmul(r, M,
                                   precision=jax.lax.Precision.HIGHEST)
            cache[j] = r
            return r

        M_pows = jnp.stack([mpow(int(j)) for j in uniq])
        return adgamma_loglik_from_cats(rP[poc], logscale[poc], M_pows,
                                        jump_idx)

    def _codon_loglik(self, state, i, cfg: DivCfg, pi, blen):
        """NY98/GY94 codon likelihood: 61-state pruning, optionally with
        three omega classes as the category axis."""
        if cfg.ny98_group >= 0:
            weights = state["omegaprobs"][cfg.ny98_group]
            n_cats = 3
        elif cfg.m3_group >= 0:
            weights = state["m3probs"][cfg.m3_group]
            n_cats = 3
        elif cfg.m10_group >= 0:
            _, weights = self._m10_omegas_weights(state, cfg)
            n_cats = cfg.settings.nm10betacat + cfg.settings.nm10gammacat
        else:
            weights = None
            n_cats = 1
        lam, U, Uinv = self._division_eig_cached(state, i)
        # branch lengths are in per-nucleotide substitution units; a codon
        # site evolves 3x as fast (verified against reference lnL)
        mult = 3.0
        if self.ratemult_on:
            mult = mult * state["ratemult"][i] / self.div_char_frac[i]
        return division_loglik(
            state["left"], state["right"], state["parent"], blen,
            self.tip_partials[i], self.weights[i], lam, U, Uinv, pi,
            jnp.ones((n_cats,)), 0.0, None, self.n_tips,
            rate_mult=mult, cat_weights=weights, pruner=self._pruners[i])

    def log_prior(self, state):
        """Full log prior = tree component + parameter component.

        The two components are carried separately through the MCMC scan
        (state["lnP_tree"], state["lnP_par"]) and a move recomputes only
        the component its prior_scope can change — the role the
        reference's per-move lnPriorRatio plays (each proposal returns
        the ratio for just the terms it touched, src/proposal.c), done
        here at component granularity so the carried values stay exact
        recomputations."""
        return self.log_prior_tree(state) + self.log_prior_params(state)

    def log_prior_params(self, state):
        """Prior over the substitution-model parameter groups — every
        term reads only group_priors fields (updated solely by the
        _finish_moves proposals)."""
        return self._grouped_params_prior(state)

    def log_prior_tree(self, state):
        """Prior over topology/branch lengths/node ages plus the
        tree-process scalars (clock rate, speciation/extinction/
        fossilization, popsize/growth, branch-rate variance, CPP) and
        constraint terms — everything log_prior_params does not cover."""
        if self.best:
            return self._log_prior_best(state)
        if self.tree_settings.clock:
            return self._log_prior_clock(state)
        lp = jnp.float32(0.0)
        # branch lengths (rooted non-clock: tip 0's branch is real)
        mask = np.ones(self.n_nodes, bool)
        mask[self.n_nodes - 1] = False
        if not self.rooted_nonclock:
            mask[0] = False
        mask_j = jnp.asarray(mask)
        bp = self.tree_settings.brlenspr

        def brlens_lp(blen):
            if bp.kind == "gammadir":
                a_t, b_t, a_f, c_i = bp.params
                interior = np.zeros(self.n_nodes, bool)
                interior[self.n_tips:] = True
                return brlens_gammadir_lpdf(
                    blen, mask_j, a_t, b_t, a_f, c_i,
                    jnp.asarray(interior) if c_i != 1.0 else None)
            if bp.kind == "exponential":
                return brlens_exponential_lpdf(blen, mask_j, bp.params[0])
            if bp.kind == "uniform":
                return brlens_uniform_lpdf(blen, mask_j,
                                           bp.params[0], bp.params[1])
            raise ValueError(f"brlenspr {bp.kind} not supported")

        if self.n_trees > 1:
            for t in range(self.n_trees):
                lp = lp + brlens_lp(state["blen"][t])
                view = {**state, "left": state["left"][t],
                        "right": state["right"][t],
                        "parent": state["parent"][t]}
                lp = lp + self._constraint_terms(view)
        else:
            lp = lp + brlens_lp(state["blen"])
            lp = lp + self._constraint_terms(state)
        return lp

    def _grouped_params_prior(self, state):
        lp = jnp.float32(0.0)
        # multistate standard pi under symmetric Dirichlet(beta); beta is
        # either fixed or the sampled symbeta hyperparameter (reference
        # SYMPI_* paramIds, src/model.c:19813 area)
        seen_sympi = set()
        for cfg in self.div_cfg:
            key = (cfg.sympi_field, cfg.sympi_group)
            if cfg.sympi_group < 0 or key in seen_sympi:
                continue
            seen_sympi.add(key)
            beta = (state["symbeta"][cfg.symbeta_group]
                    if cfg.symbeta_group >= 0
                    else jnp.float32(cfg.fixed_symbeta))
            x = state[cfg.sympi_field][cfg.sympi_group]
            lp = lp + dirichlet_lpdf(x, jnp.full(x.shape, beta))
        # directional root frequencies: Dirichlet prior, gated on the RJ
        # indicator for statefreqmodel=mixed (the stationary state has no
        # root-frequency dimension — reference NOT_APPLICABLE sentinel,
        # Move_Statefreqs_SplitMerge prior terms, src/proposal.c:16646)
        seen_rootpi = set()
        for cfg in self.div_cfg:
            g = cfg.rootpi_group
            if g < 0 or g in seen_rootpi:
                continue
            seen_rootpi.add(g)
            pr = cfg.settings.rootfreqpr
            ps = tuple(float(x) for x in (pr.params or (1.0,)))
            alpha = jnp.asarray(ps if len(ps) == 2 else (ps[0], ps[0]))
            term = dirichlet_lpdf(state["rootpi2"][g], alpha)
            if cfg.dirpi_mix:
                on = state["dirpi_on"][g] > 0
                term = jnp.where(on, term, 0.0)
            lp = lp + term
        for (param, gid), pr in self.group_priors.items():
            if param == "revmat" and gid in self._mixed_rev:
                from .mixed_gtr import ln_prior_mixed
                symdir = pr.params[0] if pr.params else 1.0
                lp = lp + ln_prior_mixed(state["gtr_class"][gid],
                                         state["revmat"][gid], symdir)
            elif param in ("pi", "pi20", "pi2", "pi61", "pi16", "revmat",
                           "aarevmat", "mixtrates"):
                x = state[param][gid]
                alpha = jnp.full(x.shape, pr.params[0] if pr.params else 1.0)
                lp = lp + dirichlet_lpdf(x, alpha)
            elif param in ("omegaprobs", "m3probs"):
                lp = lp + dirichlet_lpdf(state[param][gid],
                                         jnp.asarray(pr.params))
            elif param == "m3omega":
                # order statistics of iid exponential dN over shared dS
                # (reference LogOmegaPrior, src/mcmc.c:7498)
                w = state["m3omega"][gid]
                ordered_ok = (w[0] < w[1]) & (w[1] < w[2]) & (w[0] > 0)
                lp = lp + jnp.where(
                    ordered_ok,
                    jnp.log(36.0) - 4.0 * jnp.log1p(jnp.sum(w)), NEG_INF)
            elif param in ("tratio", "omega"):
                # Beta/Dirichlet(2) prior on x/(x+1) with Jacobian
                # 1/(1+x)^2 (reference tRatioDir / omegaDir)
                v = state[param][gid]
                x = v / (1.0 + v)
                a, b = (pr.params + (1.0, 1.0))[:2]
                lp = lp + beta_lpdf(x, a, b) - 2.0 * jnp.log1p(v)
            elif param == "covswitch":
                # both switch rates iid under the prior (reference fills
                # both from the same distribution, src/model.c:11891-11897)
                lp = lp + jnp.sum(_scalar_prior_lpdf(
                    pr, state["covswitch"][gid]))
            elif param in ("m10beta", "m10gamma"):
                # both shape parameters iid under the prior (reference
                # m10betapr Uniform(0,20) default, src/bayes.c:741-748)
                lp = lp + jnp.sum(_scalar_prior_lpdf(pr, state[param][gid]))
            elif param == "m10catprobs":
                lp = lp + dirichlet_lpdf(state[param][gid],
                                         jnp.asarray(pr.params))
            elif param == "omega1":
                lp = lp + beta_lpdf(state["omega1"][gid], *pr.params)
            elif param == "omega3":
                lp = lp + _scalar_prior_lpdf(pr, state["omega3"][gid])
            else:
                lp = lp + _scalar_prior_lpdf(pr, state[param][gid])
        if self.ratemult_on:
            lp = lp + dirichlet_lpdf(
                state["ratemult"],
                jnp.ones((self.n_div,)))
        return lp

    def _log_prior_best(self, state):
        """Joint gene-tree/species-tree prior (reference
        LnJointGeneTreeSpeciesTreePr src/best.c:775 = species-tree prior +
        Σ_genes MSC density) plus theta priors and ordering checks."""
        from . import best as B
        from . import clock as C
        ts = self.tree_settings
        S = self.n_species
        M = 2 * S - 1
        pf = B.ploidy_factor(ts.ploidy)
        theta = pf * (state["popsize"] if ts.popvarpr == "variable"
                      else jnp.broadcast_to(state["popsize"][0], (M,)))
        # one vmapped MSC density over the gene axis (the per-gene python
        # loop cost G separate dispatch chains per generation; finch has
        # 4 loci and 7-node trees, so dispatch dominated)
        lp = jnp.sum(jax.vmap(
            lambda par, age: B.msc_gene_log_prior(
                par, age, self.tip_species, state["s_parent"],
                state["s_age"], theta, self.n_tips, S))(
            state["parent"], state["age"]))

        def treeage_lpdf(t1):
            return _scalar_prior_lpdf(ts.treeagepr, t1)

        if ts.clockpr == "birthdeath":
            lp = lp + C.ln_birthdeath(state["s_age"], S,
                                      state["speciation"][0],
                                      state["extinction"][0],
                                      ts.sampleprob, treeage_lpdf)
            lp = lp + _scalar_prior_lpdf(ts.speciationpr,
                                         state["speciation"][0])
            lp = lp + _scalar_prior_lpdf(ts.extinctionpr,
                                         state["extinction"][0])
        else:
            lp = lp + C.ln_uniform_clock(state["s_age"], S, treeage_lpdf)
        lp = lp + jnp.sum(_scalar_prior_lpdf(ts.popsizepr,
                                             state["popsize"]))

        def ordered(par, age):
            return jnp.all(jnp.where(
                par >= 0, age[jnp.maximum(par, 0)] > age - 1e-12, True))

        ok = ordered(state["s_parent"], state["s_age"])
        ok = ok & jnp.all(jax.vmap(ordered)(state["parent"],
                                            state["age"]))
        return jnp.where(ok, lp, NEG_INF)

    def _log_prior_clock(self, state):
        from . import clock as C
        ts = self.tree_settings
        n = self.n_tips
        state = C.pin_sa_ages(state, n)

        def treeage_lpdf(t1):
            if self._root_calib is not None:
                return _scalar_prior_lpdf(self._root_calib, t1)
            return _scalar_prior_lpdf(ts.treeagepr, t1)

        cr = state["clockrate"][0] if "clockrate" in state else 1.0
        if ts.clockpr == "fossilization":
            lp = C.ln_fbd(state["age"], n, state["speciation"][0],
                          state["extinction"][0], state["fossilization"][0],
                          ts.sampleprob, self.fossil_tips,
                          treeage_lpdf, strategy=ts.samplestrat,
                          sa=state.get("sa"), parent=state["parent"])
            lp = lp + _scalar_prior_lpdf(ts.speciationpr,
                                         state["speciation"][0])
            lp = lp + _scalar_prior_lpdf(ts.extinctionpr,
                                         state["extinction"][0])
            lp = lp + _scalar_prior_lpdf(ts.fossilizationpr,
                                         state["fossilization"][0])
        elif ts.clockpr == "uniform" and self.has_dated_tips:
            lp = C.ln_uniform_clock_dated(
                state["age"], n, self.fossil_tips,
                treeage_lpdf, root_dated=False)
        elif ts.clockpr == "uniform":
            lp = C.ln_uniform_clock(state["age"], n, treeage_lpdf)
        elif ts.clockpr == "birthdeath":
            strat = (ts.samplestrat if ts.samplestrat in
                     ("random", "diversity", "cluster") else "random")
            lp = C.ln_birthdeath_strat(
                state["age"], n, state["speciation"][0],
                state["extinction"][0], ts.sampleprob, treeage_lpdf,
                strategy=strat)
            lp = lp + _scalar_prior_lpdf(ts.speciationpr,
                                         state["speciation"][0])
            lp = lp + _scalar_prior_lpdf(ts.extinctionpr,
                                         state["extinction"][0])
        elif ts.clockpr == "coalescence":
            if "growth" in state:
                growth = state["growth"][0]
                lp = _scalar_prior_lpdf(ts.growthpr, growth)
            else:
                growth = (ts.growthpr.params[0]
                          if ts.growthpr.params else 0.0)
                lp = jnp.float32(0.0)
            lp = lp + C.ln_coalescence(state["age"], n,
                                       state["popsize"][0], growth, cr)
            lp = lp + _scalar_prior_lpdf(ts.popsizepr, state["popsize"][0])
        else:
            raise ValueError(f"clockpr {ts.clockpr} not supported yet")
        if "clockrate" in state:
            lp = lp + _scalar_prior_lpdf(ts.clockratepr, cr)
        if ts.clockvarpr == "cpp":
            sigma = float((ts.cppmultdevpr.params or (0.4,))[0])
            lam = state["cpprate"][0]
            lp = lp + C.ln_cpp_prior(state, n, lam, sigma)
            lp = lp + _scalar_prior_lpdf(ts.cppratepr, lam)
        elif ts.clockvarpr != "strict":
            var = state["clockvar"][0]
            lp = lp + C.ln_branch_rates_prior(state, n, ts.clockvarpr, var)
            lp = lp + _scalar_prior_lpdf(ts.clockvar_prior(), var)
        for ti, pr in self.sampled_tip_ages:
            lp = lp + _scalar_prior_lpdf(pr, state["age"][ti])
        lp = lp + self._constraint_terms(state)
        # ordering sanity: every parent older than its children
        par = state["parent"]
        ok = jnp.all(jnp.where(par >= 0,
                               state["age"][jnp.maximum(par, 0)]
                               > state["age"] - 1e-12, True))
        return jnp.where(ok, lp, NEG_INF)

    # ------------------------------------------------------------------
    # generation step

    def _propose_scalar(self, k_move, cur, tuning_row, move_idx):
        """One move proposal with a SCALAR move index: exactly one
        switch branch executes.  The eigensystem refresh is hoisted out
        of the switch into one post-switch cond — with a scalar index
        the cond executes only when the selected move updates Q (same
        as refreshing inside the branch)."""
        def apply(i):
            def f(args):
                key, st, tun = args
                return self.moves[i].fn(key, st, tun)
            return f

        new, lnH = jax.lax.switch(
            move_idx, [apply(i) for i in range(len(self.moves))],
            (k_move, cur, tuning_row[move_idx]))
        if any(m.updates_q for m in self.moves):
            q_flags = jnp.asarray(
                [1 if m.updates_q else 0 for m in self.moves], jnp.int32)
            new = jax.lax.cond(q_flags[move_idx] == 1,
                               self.refresh_eigs, lambda s: s, new)
        return new, lnH

    def _chain_step(self, key, state, heat, tuning_row, power, move_idx):
        """One generation for one chain. Returns (state, accepted).
        ``power`` raises the likelihood for power-posterior (steppingstone)
        sampling; 1.0 for ordinary MCMC (reference src/mcmc.c:16325).

        ``move_idx`` is a SCALAR shared by all vmapped chains this
        generation: a per-chain traced index would force XLA to evaluate
        every move branch for every chain under vmap (measured 42% of the
        step); a shared state-independent random move type keeps the
        lax.switch scalar so exactly one branch executes.  Each chain's
        invariant distribution is unchanged (move selection is independent
        of chain state, as with the reference's per-chain PickProposal,
        src/mcmc.c:10094 — only the across-chain correlation differs)."""
        k_move, k_acc = jax.random.split(key, 2)
        cur = {k: v for k, v in state.items()
               if k not in ("lnL", "lnP", "lnP_tree", "lnP_par")}
        new, lnH = self._propose_scalar(k_move, cur, tuning_row, move_idx)
        lnL = self.log_likelihood(new)
        # recompute only the prior component the selected move can touch;
        # carry the other (exact: a "params" move leaves every tree-prior
        # input bit-identical, and vice versa).  move_idx is a shared
        # scalar, so under vmap each cond stays a real branch — one
        # component computation per generation for single-scope moves.
        lnP_tree = jax.lax.cond(
            self._prior_tflags[move_idx] == 1,
            self.log_prior_tree, lambda s: state["lnP_tree"], new)
        lnP_par = jax.lax.cond(
            self._prior_pflags[move_idx] == 1,
            self.log_prior_params, lambda s: state["lnP_par"], new)
        lnP = lnP_tree + lnP_par
        ln_r = heat * (power * (lnL - state["lnL"])
                       + lnP - state["lnP"]) + lnH
        ln_r = jnp.where(jnp.isnan(ln_r), NEG_INF, ln_r)
        accept = jnp.log(jax.random.uniform(k_acc)) < ln_r
        new["lnL"], new["lnP"] = lnL, lnP
        new["lnP_tree"], new["lnP_par"] = lnP_tree, lnP_par
        out = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), new, state)
        return out, accept

    def _per_chain_gen(self, keys, states, heats, tuning, power,
                       slot_moves, perm):
        """One generation with INDEPENDENT per-chain move selection at
        shared-mode cost per branch (reference PickProposal semantics,
        src/mcmc.c:10094).

        A batched move index under vmap(lax.switch) evaluates EVERY
        branch for every chain (measured 3.7x slower).  Instead: draw C
        i.i.d. slot moves from the move distribution and a uniform
        random permutation assigning slots to chains — permuting i.i.d.
        draws leaves them i.i.d., so each chain's move sequence has
        exactly the reference's joint distribution — then lax.scan over
        slots, each slot gathering ONE chain's state and running a
        SCALAR switch (one branch executes).  Proposal work per
        generation is C single-chain branches instead of n_moves
        full-batch branches; the lnL/prior/accept phase stays batched."""
        cur = {k: v for k, v in states.items()
               if k not in ("lnL", "lnP", "lnP_tree", "lnP_par")}
        C = self.mcmc.n_chains_total
        nm = len(self.moves)

        def slot(carry, xs):
            props, lnHs = carry
            m_j, c = xs
            st_c = jax.tree.map(lambda a: a[c], cur)
            k_move = jax.random.split(keys[c])[0]
            new_c, lnH = self._propose_scalar(
                k_move, st_c, tuning[c], m_j)
            props = jax.tree.map(lambda P, n: P.at[c].set(n),
                                 props, new_c)
            return (props, lnHs.at[c].set(lnH)), None

        (props, lnHs), _ = jax.lax.scan(
            slot, (cur, jnp.zeros((C,), jnp.float32)),
            (slot_moves, perm))
        lnL = jax.vmap(self.log_likelihood)(props)
        # per-chain move indices are batched here, so component conds
        # would lower to selects computing both branches — recompute both
        # components (still exact carries for the next generation)
        lnP_tree = jax.vmap(self.log_prior_tree)(props)
        lnP_par = jax.vmap(self.log_prior_params)(props)
        lnP = lnP_tree + lnP_par
        ln_r = heats * (power * (lnL - states["lnL"])
                        + lnP - states["lnP"]) + lnHs
        ln_r = jnp.where(jnp.isnan(ln_r), NEG_INF, ln_r)
        k_accs = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
        u = jax.vmap(jax.random.uniform)(k_accs)
        accepted = jnp.log(u) < ln_r
        props = {**props, "lnL": lnL, "lnP": lnP,
                 "lnP_tree": lnP_tree, "lnP_par": lnP_par}
        out = jax.tree.map(
            lambda a, b: jnp.where(
                accepted.reshape((-1,) + (1,) * (a.ndim - 1)), a, b),
            props, states)
        move_per_chain = jnp.zeros((C,), jnp.int32).at[perm].set(
            slot_moves)
        return out, accepted, move_per_chain

    def _swap_step(self, key, states, temp_id, power=1.0):
        """``nswaps`` swap attempts per run between random chain pairs
        (reference AttemptSwap, src/mcmc.c:591; acceptance math :718;
        attempts per cycle set by mcmc nswaps, src/bayes.c).

        Implemented as dense vector math over the [runs, chains] layout
        (one fused region per attempt) instead of scalar gather/scatter
        chains: the scatter-free formulation cut the measured swap cost
        from ~36 us to a few us per generation on v5e (the swap itself is
        a permutation of temperature ids — states never move, exactly the
        reference's MPI design, src/mcmc.c:826-842).

        Returns (temp_id, rec) where rec = (lo, hi, acc) per attempt
        ([nswaps, R] int32/bool) — the swap-rate matrices are
        accumulated from these compact records ONCE per block
        (run_block), not per generation.  ``key`` is (si, sj_off, su):
        the swap randomness pregenerated for the generation by
        run_block (it is state-independent, so batching its derivation
        over the whole block removes the per-generation key splits and
        randint/uniform kernels from the scan body)."""
        si, sj_off, su = key
        nc = self.mcmc.nchains
        R = self.mcmc.nruns
        lam = self.mcmc.temp
        E = (power * states["lnL"] + states["lnP"]).reshape(R, nc)
        tid = temp_id.reshape(R, nc)
        idx = jnp.arange(nc)
        los, his, accs = [], [], []
        for a in range(max(1, self.mcmc.nswaps)):
            i = si[a]
            j = (i + sj_off[a]) % nc
            sel_i = (idx[None, :] == i[:, None])
            sel_j = (idx[None, :] == j[:, None])
            ti = jnp.sum(jnp.where(sel_i, tid, 0), axis=1)
            tj = jnp.sum(jnp.where(sel_j, tid, 0), axis=1)
            Ei = jnp.sum(jnp.where(sel_i, E, 0.0), axis=1)
            Ej = jnp.sum(jnp.where(sel_j, E, 0.0), axis=1)
            beta_i = 1.0 / (1.0 + lam * ti.astype(jnp.float32))
            beta_j = 1.0 / (1.0 + lam * tj.astype(jnp.float32))
            ln_r = (beta_i - beta_j) * (Ej - Ei)
            acc = jnp.log(su[a]) < ln_r
            swapped = jnp.where(sel_i, tj[:, None],
                                jnp.where(sel_j, ti[:, None], tid))
            tid = jnp.where(acc[:, None], swapped, tid)
            los.append(jnp.minimum(ti, tj))
            his.append(jnp.maximum(ti, tj))
            accs.append(acc)
        rec = (jnp.stack(los), jnp.stack(his), jnp.stack(accs))
        return tid.reshape(-1), rec

    def _accumulate_swap_stats(self, swap_tries, swap_accepts, lo, hi,
                               acc, did):
        """Fold a block's compact swap records ([n_gens, nswaps, R]
        lo/hi/acc + did validity per generation) into the [R, nc, nc]
        swap-rate matrices with two scatter-adds."""
        nc = self.mcmc.nchains
        R = self.mcmc.nruns
        r_idx = jnp.broadcast_to(jnp.arange(R), lo.shape)
        flat = (r_idx * nc + lo) * nc + hi                  # [G, S, R]
        w = jnp.broadcast_to(did[:, None, None], lo.shape) \
            .astype(swap_tries.dtype)
        tries = jnp.zeros((R * nc * nc,), swap_tries.dtype) \
            .at[flat.reshape(-1)].add(w.reshape(-1))
        accw = (w * acc.astype(swap_tries.dtype)).reshape(-1)
        acc_a = jnp.zeros((R * nc * nc,), swap_accepts.dtype) \
            .at[flat.reshape(-1)].add(accw)
        return (swap_tries + tries.reshape(R, nc, nc),
                swap_accepts + acc_a.reshape(R, nc, nc))

    def _autotune(self, bk):
        """Batch autotune toward target acceptance (diminishing adaptation;
        role of reference Autotune* fns, src/mcmc.c:16916-16931)."""
        rate = bk["accepts"] / jnp.maximum(bk["tries"], 1)
        step = jnp.minimum(0.5, 1.0 / jnp.sqrt(1.0 + bk["batch"]))
        targets = jnp.asarray([m.target for m in self.moves])
        direction = jnp.asarray([float(m.direction) for m in self.moves])
        tunable = jnp.asarray([1.0 if m.tunable else 0.0
                               for m in self.moves])
        factor = jnp.exp(step * direction * (rate - targets) * tunable)
        tuning = bk["tuning"] * jnp.where(bk["tries"] > 0, factor, 1.0)
        tmin = jnp.asarray([m.tmin for m in self.moves])
        tmax = jnp.asarray([m.tmax for m in self.moves])
        tuning = jnp.clip(tuning, tmin, tmax)
        return {**bk, "tuning": tuning,
                "tries": jnp.zeros_like(bk["tries"]),
                "accepts": jnp.zeros_like(bk["accepts"]),
                "batch": bk["batch"] + 1}

    @partial(jax.jit, static_argnums=(0, 3))
    def run_block(self, states, bk, n_gens: int):
        """Advance all chains n_gens generations on device.

        Per-generation PRNG material (move selection, chain keys, swap
        keys) is pregenerated for the whole block in a few batched
        kernels and fed to the scan as xs — deriving it inside the body
        costs ~8 extra tiny kernels per generation, and at small chain
        counts the step is kernel-dispatch-bound (measured: an identity
        scan body already costs ~26 us/gen at 4 chains on v5e)."""
        nm = len(self.moves)
        lam = self.mcmc.temp
        gen0 = bk["gen"]
        gens = gen0 + jnp.arange(n_gens)
        gkeys = jax.vmap(lambda g: jax.random.fold_in(bk["key"], g))(gens)
        ksel_all = jax.vmap(lambda k: jax.random.split(k)[0])(gkeys)
        krest = jax.vmap(lambda k: jax.random.split(k)[1])(gkeys)
        ckeys_all = jax.vmap(
            lambda k: jax.random.split(k, self.mcmc.n_chains_total))(krest)
        if self.mcmc.per_chain_moves:
            C = self.mcmc.n_chains_total
            midx_all = jax.vmap(lambda k: jax.random.categorical(
                k, self.move_logits, shape=(C,)))(ksel_all)
            perm_all = jax.vmap(lambda k: jax.random.permutation(
                jax.random.fold_in(k, 7), C))(ksel_all)
        else:
            midx_all = jax.vmap(lambda k: jax.random.categorical(
                k, self.move_logits))(ksel_all)
            perm_all = jnp.zeros((n_gens, 1), jnp.int32)   # unused
        skeys_all = jax.vmap(
            lambda g: jax.random.fold_in(bk["swap_key"], g))(gens)
        # swap randomness is state-independent: derive the whole block's
        # pair choices + uniforms in three batched kernels (same stream
        # as the former in-body derivation: split(skey, 4) per attempt)
        nsw = max(1, self.mcmc.nswaps)
        R = self.mcmc.nruns
        nc = self.mcmc.nchains

        def pregen_swap(skey):
            iis, joffs, us = [], [], []
            key = skey
            for _ in range(nsw):
                key, k1, k1b, k2 = jax.random.split(key, 4)
                iis.append(jax.random.randint(k1, (R,), 0, nc))
                joffs.append(jax.random.randint(k1b, (R,), 1, nc))
                us.append(jax.random.uniform(k2, (R,)))
            return jnp.stack(iis), jnp.stack(joffs), jnp.stack(us)

        si_all, sj_all, su_all = jax.vmap(pregen_swap)(skeys_all)

        def gen(carry, xs):
            states, bk = carry
            g, keys, move_idx, perm, skey = xs
            heats = 1.0 / (1.0 + lam * bk["temp_id"].astype(jnp.float32))
            power = bk.get("power", jnp.float32(1.0))
            if self.mcmc.per_chain_moves:
                # reference-style independent PickProposal per chain via
                # the slot-permutation scan (scalar switch per slot —
                # see _per_chain_gen)
                states, accepted, mpc = self._per_chain_gen(
                    keys, states, heats, bk["tuning"], power,
                    move_idx, perm)
                onehot = jax.nn.one_hot(mpc, nm, dtype=jnp.int32)
            else:
                states, accepted = jax.vmap(
                    self._chain_step, in_axes=(0, 0, 0, 0, None, None))(
                    keys, states, heats, bk["tuning"], power, move_idx)
                onehot = jax.nn.one_hot(move_idx, nm,
                                        dtype=jnp.int32)[None, :]
            bk = {**bk,
                  "tries": bk["tries"] + onehot,
                  "accepts": bk["accepts"]
                  + onehot * accepted[:, None].astype(jnp.int32),
                  "tries_total": bk["tries_total"] + onehot,
                  "accepts_total": bk["accepts_total"]
                  + onehot * accepted[:, None].astype(jnp.int32)}
            rec = (jnp.zeros((nsw, R), jnp.int32),
                   jnp.zeros((nsw, R), jnp.int32),
                   jnp.zeros((nsw, R), bool))
            did = jnp.int32(0)
            if self.mcmc.nchains > 1:
                def swap(tid):
                    return self._swap_step(skey, states, tid, power)

                if self.mcmc.swapfreq == 1:
                    # swap every generation (the reference default):
                    # skip the lax.cond wrapper and its carry copies
                    temp_id, rec = swap(bk["temp_id"])
                    did = jnp.int32(1)
                else:
                    did = jnp.int32((g + 1) % self.mcmc.swapfreq == 0)
                    temp_id, rec = jax.lax.cond(
                        did == 1, swap,
                        lambda tid: (tid, rec), bk["temp_id"])
                bk = {**bk, "temp_id": temp_id}
            if self.mcmc.tune:
                bk = jax.lax.cond(
                    (g + 1) % self.mcmc.tunefreq == 0,
                    self._autotune, lambda b: b, bk)
            return (states, bk), (rec[0], rec[1], rec[2], did)

        (states, bk), (lo, hi, acc, did) = jax.lax.scan(
            gen, (states, bk),
            (gens, ckeys_all, midx_all, perm_all,
             (si_all, sj_all, su_all)))
        if self.mcmc.nchains > 1:
            st, sa = self._accumulate_swap_stats(
                bk["swap_tries"], bk["swap_accepts"], lo, hi, acc, did)
            bk = {**bk, "swap_tries": st, "swap_accepts": sa}
        bk = {**bk, "gen": gen0 + n_gens}
        return states, bk

    # ------------------------------------------------------------------
    # host-side helpers

    def cold_indices(self, bk) -> list[int]:
        """Chain-slot index of the cold chain of each run."""
        tid = np.asarray(bk["temp_id"])
        nc = self.mcmc.nchains
        return [int(r * nc + np.argmin(tid[r * nc:(r + 1) * nc]))
                for r in range(self.mcmc.nruns)]

    @property
    def tree_taxa_labels(self) -> list[str]:
        """Tip labels of the headline posterior tree: species names in
        BEST mode, taxa otherwise."""
        return self.species_names if self.best else list(self.data.taxa)

    def extract_gene_tree(self, states, slot: int, gene: int) -> Tree:
        """One gene tree of one chain (BEST mode)."""
        age = np.asarray(states["age"][slot, gene], np.float64)
        parent = np.asarray(states["parent"][slot, gene])
        blen = np.where(parent >= 0, age[np.maximum(parent, 0)] - age, 0.0)
        return Tree(parent=parent,
                    left=np.asarray(states["left"][slot, gene]),
                    right=np.asarray(states["right"][slot, gene]),
                    blen=blen, n_tips=self.n_tips, rooted=True)

    def effective_blens(self, states, slot: int,
                        tree: int = 0) -> np.ndarray:
        """Substitution-unit branch lengths for one chain (host-side)."""
        if self.best:
            age = np.asarray(states["s_age"][slot], np.float64)
            parent = np.asarray(states["s_parent"][slot])
            return np.where(parent >= 0,
                            age[np.maximum(parent, 0)] - age, 0.0)
        if not self.tree_settings.clock:
            if self.n_trees > 1:
                return np.asarray(states["blen"][slot, tree], np.float64)
            return np.asarray(states["blen"][slot], np.float64)
        from .clock import clock_blens, pin_sa_ages
        sub = jax.tree.map(lambda x: x[slot], states)
        sub = pin_sa_ages(sub, self.n_tips)
        return np.asarray(
            clock_blens(sub, self.n_tips, self.tree_settings.clockvarpr),
            np.float64)

    def extract_tree(self, states, slot: int, tree: int = 0) -> Tree:
        if self.best:
            return Tree(
                parent=np.asarray(states["s_parent"][slot]),
                left=np.asarray(states["s_left"][slot]),
                right=np.asarray(states["s_right"][slot]),
                blen=self.effective_blens(states, slot),
                n_tips=self.n_species, rooted=True)
        if self.n_trees > 1:
            return Tree(
                parent=np.asarray(states["parent"][slot, tree]),
                left=np.asarray(states["left"][slot, tree]),
                right=np.asarray(states["right"][slot, tree]),
                blen=self.effective_blens(states, slot, tree),
                n_tips=self.n_tips, rooted=False)
        return Tree(
            parent=np.asarray(states["parent"][slot]),
            left=np.asarray(states["left"][slot]),
            right=np.asarray(states["right"][slot]),
            blen=self.effective_blens(states, slot),
            n_tips=self.n_tips,
            rooted=self.tree_settings.clock or self.rooted_nonclock)
