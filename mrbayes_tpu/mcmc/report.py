"""Posterior reporting: ancestral states, site rates, positive selection.

Implements the reference's `report ancstates/siterates/possel/siteomega`
sample-time columns (reference: header construction src/mcmc.c:12566-12798,
value rows :13020-13140, up-pass CondLikeUp_* src/likelihood.c:4574-4938,
PrintAncStates_* src/mcmc.c:10709ff, PrintSiteRates_Gen :12212,
PosSelProbs/SiteOmegas :12297ff).

TPU-first design: instead of the reference's incremental scratch-buffer
up-pass woven into the chain state, reporting is a standalone jitted pass
over the cold chain run once per sample — a down-pass keeping every node's
partial, an up-pass scan (ops/pruning.final_partials), and closed-form
per-pattern posteriors, all in one XLA program.  Cost is one extra
likelihood-sized computation per samplefreq generations.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..nexus.datatypes import AA_ORDER, DataType
from ..ops.pruning import final_partials
from ..ops.traversal import ancestor_matrix
from .engine import Engine

_TINY = 1e-30


def _state_labels(cfg) -> list[str]:
    """Display labels per model state (reference StateCode /
    State_CODON, src/mcmc.c:12729)."""
    d = cfg.div
    if cfg.codon is not None:
        from ..models.codes import BASES
        return ["".join(BASES[b] for b in cfg.codon.bases[k])
                for k in range(cfg.codon.n_states)]
    if d.dtype in (DataType.DNA, DataType.RNA):
        return list("ACGT")
    if d.dtype is DataType.PROTEIN:
        return [c.upper() for c in AA_ORDER]
    return [str(k) for k in range(d.n_states)]


class Reporter:
    """Builds the extra .p columns for one engine + report-option set.

    ``opts``: {key: (value, user_division_tuple)} from the report
    command.  Divisions that cannot report (parsimony model, covarion,
    adgamma, symdiri, BEST) are skipped with a log note — same spirit as
    the reference enabling printAncStates only for supported models
    (src/mcmc.c:18012-18060)."""

    def __init__(self, eng: Engine, opts: dict, log=print):
        self.eng = eng
        self.log = log
        self.headers: list[str] = []
        self._div_plan: list[dict] = []
        if getattr(eng, "best", False):
            if any(v == "yes" for v, _ in opts.values()):
                log("   [report: not supported for BEST/speciestree runs]")
            return

        def want(key):
            v = opts.get(key)
            return (v[1] if v and v[0].startswith("y") else None)

        w_anc, w_rates = want("ancstates"), want("siterates")
        w_possel, w_omega = want("possel"), want("siteomega")
        # normalize hard-constraint masks for MRCA lookup: in the
        # unrooted (rooted-at-tip-0) layout a split containing tip 0
        # appears as its complement clade
        self.con_names = list(getattr(eng, "constraint_names", []) or [])
        masks = getattr(eng, "constraint_masks", None)
        self.con_masks = None
        if masks is not None and len(self.con_names):
            m = np.array(masks, bool)
            if not eng.tree_settings.clock:
                for c in range(m.shape[0]):
                    if m[c, 0]:
                        m[c] = ~m[c]
            self.con_masks = m
        if w_anc is not None and self.con_masks is None:
            log("   [report ancstates=yes: no active hard constraints; "
                "ancestral states are reported for constrained nodes "
                "only (reference src/mcmc.c:13129-13147)]")

        for i, cfg in enumerate(eng.div_cfg):
            s = cfg.settings
            ineligible = (cfg.parsimony or cfg.ratecorr_group >= 0
                          or cfg.covswitch_group >= 0
                          or cfg.fixed_covswitch is not None
                          or cfg.sympi_group >= 0 or cfg.symbeta_group >= 0
                          or cfg.fixed_symbeta > 0 or cfg.doublet)
            ui = cfg.div.user_index
            plan = {"div": i, "anc": False, "rates": False,
                    "possel": False, "omega": False}
            if w_anc is not None and ui in w_anc \
                    and self.con_masks is not None:
                if ineligible:
                    log(f"   [report ancstates: division {ui + 1} model "
                        "not supported (parsimony/covarion/adgamma/"
                        "symdiri/doublet)]")
                else:
                    plan["anc"] = True
            if w_rates is not None and ui in w_rates and not ineligible \
                    and cfg.shape_group >= 0 and cfg.codon is None:
                plan["rates"] = True
            has_classes = (cfg.ny98_group >= 0 or cfg.m3_group >= 0
                           or cfg.m10_group >= 0)
            if w_possel is not None and ui in w_possel and has_classes:
                plan["possel"] = True
            if w_omega is not None and ui in w_omega and has_classes:
                plan["omega"] = True
            if any(plan[k] for k in ("anc", "rates", "possel", "omega")):
                self._div_plan.append(plan)
        self._build_headers()
        self._fn = jax.jit(self._compute) if self._div_plan else None

    # ------------------------------------------------------------ headers
    def _chars_of(self, cfg):
        """(original 1-based char tuples, pattern index) per reported
        site, in original-alignment order within the division."""
        d = cfg.div
        if cfg.codon is not None:
            trips = np.sort(np.asarray(d.char_ids)).reshape(-1, 3)
            return ([tuple(int(c) + 1 for c in t) for t in trips],
                    np.asarray(cfg.codon_site_pattern))
        order = np.argsort(d.char_ids)
        return ([(int(d.char_ids[j]) + 1,) for j in order],
                np.asarray(d.pattern_of_char)[order])

    def _build_headers(self):
        eng = self.eng
        for plan in self._div_plan:
            cfg = eng.div_cfg[plan["div"]]
            chars, _ = self._chars_of(cfg)
            if plan["rates"]:
                self.headers += [f"r({c[0]})" for c in chars]
            if plan["possel"]:
                self.headers += ["pr+(" + ",".join(map(str, t)) + ")"
                                 for t in chars]
            if plan["omega"]:
                self.headers += ["omega(" + ",".join(map(str, t)) + ")"
                                 for t in chars]
            if plan["anc"]:
                labels = _state_labels(cfg)
                for ci, cname in enumerate(self.con_names):
                    for t in chars:
                        at = ",".join(map(str, t)) + "@" + cname
                        self.headers += [f"p({lb}){{{at}}}"
                                         for lb in labels]

    # ------------------------------------------------------------ compute
    def _div_tree_view(self, cold, i):
        eng = self.eng
        if eng.tree_settings.clock:
            from .clock import clock_blens, pin_sa_ages
            cold = pin_sa_ages(dict(cold), eng.n_tips)
            blen = clock_blens(cold, eng.n_tips,
                               eng.tree_settings.clockvarpr)
            return cold["left"], cold["right"], cold["parent"], blen
        if getattr(eng, "n_trees", 1) > 1:
            t = eng.div_tree[i]
            return (cold["left"][t], cold["right"][t], cold["parent"][t],
                    cold["blen"][t])
        return cold["left"], cold["right"], cold["parent"], cold["blen"]

    def _div_model(self, cold, i):
        """(lam, U, Uinv, pi, rates, cat_weights, pinv, mult, omegas)
        mirroring Engine._division_lnL / _codon_loglik wiring."""
        eng = self.eng
        cfg = eng.div_cfg[i]
        s = cfg.settings
        from .engine import discrete_lognormal
        lam, U, Uinv = eng._division_eig_cached(cold, i)
        pi = (cold[cfg.pi_field][cfg.pi_group] if cfg.pi_group >= 0
              else jnp.asarray(cfg.fixed_pi, jnp.float32))
        omegas = None
        if cfg.codon is not None:
            if cfg.ny98_group >= 0:
                g = cfg.ny98_group
                weights = cold["omegaprobs"][g]
                omegas = jnp.stack([cold["omega1"][g], jnp.float32(1.0),
                                    cold["omega3"][g]])
            elif cfg.m3_group >= 0:
                weights = cold["m3probs"][cfg.m3_group]
                omegas = cold["m3omega"][cfg.m3_group]
            elif cfg.m10_group >= 0:
                omegas, weights = eng._m10_omegas_weights(cold, cfg)
            else:
                weights = None
            n_cats = omegas.shape[0] if omegas is not None else 1
            mult = 3.0
            if eng.ratemult_on:
                mult = mult * cold["ratemult"][i] / eng.div_char_frac[i]
            return (lam, U, Uinv, pi, jnp.ones((n_cats,)), weights,
                    jnp.float32(0.0), mult, omegas)
        if cfg.div.dtype is DataType.PROTEIN and cfg.aamodel_group >= 0:
            _, pi_stack = eng._aa_stacks()
            pi = pi_stack[cold["aamodel_idx"][cfg.aamodel_group]]
        elif cfg.div.dtype is DataType.STANDARD:
            pi = jnp.full((cfg.div.n_states,), 1.0 / cfg.div.n_states)
        if s.rates in ("gamma", "invgamma"):
            rates = eng._gamma_tables[cfg.n_cats](
                cold["shape"][cfg.shape_group])
        elif s.rates == "lnorm":
            rates = discrete_lognormal(cold["shape"][cfg.shape_group],
                                       cfg.n_cats)
        elif s.rates == "kmixture":
            rates = cold["mixtrates"][cfg.mixt_group] * cfg.n_cats
        else:
            rates = jnp.ones((1,))
        pinv = (cold["pinvar"][cfg.pinvar_group]
                if cfg.pinvar_group >= 0 else jnp.float32(0.0))
        mult = 1.0
        if eng.ratemult_on:
            mult = cold["ratemult"][i] / eng.div_char_frac[i]
        return lam, U, Uinv, pi, rates, None, pinv, mult, omegas

    def _compute(self, cold):
        eng = self.eng
        out = []
        for plan in self._div_plan:
            i = plan["div"]
            cfg = eng.div_cfg[i]
            left, right, parent, blen = self._div_tree_view(cold, i)
            (lam, U, Uinv, pi, rates, cat_w, pinv, mult,
             omegas) = self._div_model(cold, i)
            K = rates.shape[0]
            if cat_w is None:
                cat_w = jnp.full((K,), 1.0 / K)
            has_pinv = cfg.pinvar_group >= 0
            D, F, flog, logscale = final_partials(
                left, right, parent, blen, eng.tip_partials[i],
                lam, U, Uinv, rates, pinv if has_pinv else 0.0,
                eng.n_tips, mult)
            root = eng.n_nodes - 1
            Lk = jnp.einsum("pks,s->pk", D[root], pi)     # [P, K]
            cmask = eng.const_masks[i]
            if plan["rates"]:
                # posterior-mean site rate (reference PrintSiteRates_Gen,
                # src/mcmc.c:12212: category freqs cancel; baseRate
                # compensated for pinvar); log-space for the pinvar mix
                base = mult / jnp.maximum(1.0 - pinv, 1e-6)
                num = base * jnp.einsum("pk,k,k->p", Lk, rates, cat_w)
                ln_num = jnp.log(jnp.maximum(num, _TINY)) + logscale \
                    + jnp.log1p(-jnp.minimum(pinv, 1 - 1e-7))
                ln_var = jnp.log(jnp.maximum(
                    jnp.einsum("pk,k->p", Lk, cat_w), _TINY)) + logscale \
                    + jnp.log1p(-jnp.minimum(pinv, 1 - 1e-7))
                if has_pinv and cmask is not None:
                    ln_inv = jnp.log(jnp.maximum(pinv, _TINY)) + jnp.log(
                        jnp.maximum(jnp.einsum("ps,s->p",
                                               cmask.astype(jnp.float32),
                                               pi), _TINY))
                    ln_den = jnp.logaddexp(ln_var, ln_inv)
                else:
                    ln_den = ln_var
                out.append(jnp.exp(ln_num - ln_den))
            if plan["possel"] or plan["omega"]:
                q = Lk * cat_w[None, :]
                q = q / jnp.maximum(q.sum(-1, keepdims=True), _TINY)
                if plan["possel"]:
                    # P(site in a class with omega > 1) (reference
                    # PosSelProbs, src/mcmc.c:12297)
                    out.append(jnp.einsum(
                        "pk,k->p", q, (omegas > 1.0).astype(jnp.float32)))
                if plan["omega"]:
                    out.append(jnp.einsum("pk,k->p", q, omegas))
            if plan["anc"]:
                # MRCA of each constraint in the current topology
                A = ancestor_matrix(parent)
                tipA = A[:eng.n_tips].astype(jnp.float32)
                sizes = tipA.sum(0)
                m = jnp.asarray(self.con_masks, jnp.float32)
                counts = m @ tipA
                ok = counts >= m.sum(1)[:, None] - 0.5
                mrca = jnp.argmin(jnp.where(ok, sizes[None, :], 1e9),
                                  axis=1)                       # [C]
                Fv = F[mrca]                                    # [C,P,K,S]
                fl = flog[mrca]                                 # [C,P]
                ln_var = jnp.log(jnp.maximum(
                    jnp.einsum("cpks,k->cps", Fv, cat_w), _TINY)) \
                    + jnp.log(jnp.maximum(pi, _TINY))[None, None, :] \
                    + (logscale[None, :] + fl)[:, :, None]
                if has_pinv and cmask is not None:
                    ln_var = ln_var + jnp.log1p(
                        -jnp.minimum(pinv, 1 - 1e-7))
                    ln_inv = jnp.log(jnp.maximum(pinv, _TINY)) \
                        + jnp.log(jnp.maximum(
                            cmask.astype(jnp.float32), _TINY))[None] \
                        + jnp.log(jnp.maximum(pi, _TINY))[None, None, :]
                    ln_post = jnp.logaddexp(ln_var, ln_inv)
                else:
                    ln_post = ln_var
                out.append(jax.nn.softmax(ln_post, axis=-1))    # [C,P,S]
        return tuple(out)

    # ------------------------------------------------------------- values
    def values(self, states, slot: int) -> list[float]:
        if self._fn is None:
            return []
        cold = {k: v[slot] for k, v in states.items()}
        arrays = [np.asarray(a) for a in self._fn(cold)]
        vals: list[float] = []
        ai = 0
        for plan in self._div_plan:
            cfg = self.eng.div_cfg[plan["div"]]
            _, pat = self._chars_of(cfg)
            if plan["rates"]:
                vals += [float(x) for x in arrays[ai][pat]]
                ai += 1
            if plan["possel"]:
                vals += [float(x) for x in arrays[ai][pat]]
                ai += 1
            if plan["omega"]:
                vals += [float(x) for x in arrays[ai][pat]]
                ai += 1
            if plan["anc"]:
                post = arrays[ai]                       # [C, P, S]
                ai += 1
                for ci in range(post.shape[0]):
                    vals += [float(x)
                             for x in post[ci][pat].reshape(-1)]
        return vals
