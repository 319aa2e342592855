"""MCMC run driver: sampling, output files, convergence, checkpointing.

Host-side orchestration around the jitted Engine.run_block: the device
advances ``samplefreq`` generations per dispatch; between dispatches the
driver writes ``.p``/``.t`` sample rows for the cold chain of each run,
updates split counters for ASDSF, prints progress, and checkpoints.
File formats follow the reference (PreparePrintFiles src/mcmc.c:10427,
PrintStatesToFiles :13186) so the reference's own sump/sumt can read them.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

from ..trees import Tree, to_newick, tree_length
from .diagnostics import SplitCounter
from .engine import Engine


def param_columns(eng: Engine):
    """Ordered (column-name, extractor) pairs mirroring the reference's .p
    layout; names get {d}/{all} suffixes for partitioned models."""
    cols = []
    n_div = eng.n_div
    multi = n_div > 1

    def suffix(param, gid):
        if not multi:
            return ""
        if param.startswith("pi"):
            # state-frequency fields share one group attr (pi_group)
            # keyed by pi_field (pi / pi20 / pi16 / pi61 / pi2)
            divs = [i + 1 for i, c in enumerate(eng.div_cfg)
                    if c.pi_field == param and c.pi_group == gid]
        else:
            divs = [i + 1 for i, c in enumerate(eng.div_cfg)
                    if getattr(c, f"{param}_group") == gid]
        if len(divs) == n_div:
            return "{all}"
        return "{" + ",".join(map(str, divs)) + "}"

    if getattr(eng, "n_trees", 1) > 1:
        # one TL column per unlinked tree, tagged with its divisions
        # (reference prints TL{divs} per brlens param)
        for t in range(eng.n_trees):
            divs = [i + 1 for i in range(n_div) if eng.div_tree[i] == t]
            cols.append(("TL{" + ",".join(map(str, divs)) + "}",
                         lambda st, s, t=t: float(np.sum(
                             eng.effective_blens(st, s, t)))))
    else:
        cols.append(("TL" + ("{all}" if multi else ""),
                     lambda st, s: float(np.sum(
                         eng.effective_blens(st, s)))))
    ts = eng.tree_settings
    if getattr(eng, "best", False):
        root = 2 * eng.n_species - 2
        cols.append(("speciesTreeHeight",
                     lambda st, s: float(st["s_age"][s, root])))
        npop = (2 * eng.n_species - 1 if ts.popvarpr == "variable" else 1)
        for k in range(npop):
            nm = f"theta[{k + 1}]" if npop > 1 else "theta"
            cols.append((nm, lambda st, s, k=k:
                         float(st["popsize"][s, k])))
        if ts.clockpr == "birthdeath":
            cols.append(("net_speciation",
                         lambda st, s: float(st["speciation"][s, 0])))
            cols.append(("relative_extinction",
                         lambda st, s: float(st["extinction"][s, 0])))
    if ts.clock and not getattr(eng, "best", False):
        root = eng.n_nodes - 1
        cols.append(("TH" + ("{all}" if multi else ""),
                     lambda st, s: float(st["age"][s, root])
                     * (float(st["clockrate"][s, 0])
                        if "clockrate" in st else 1.0)))
        if ts.clockratepr.kind != "fixed":
            cols.append(("clockrate",
                         lambda st, s: float(st["clockrate"][s, 0])))
        if ts.clockvarpr == "cpp":
            cols.append(("cppRate",
                         lambda st, s: float(st["cpprate"][s, 0])))
            cols.append(("nEvents",
                         lambda st, s: float(np.sum(
                             np.asarray(st["cpp_n"][s])))))
        elif ts.clockvarpr != "strict":
            cols.append((f"{ts.clockvarpr}var{{all}}" if multi
                         else f"{ts.clockvarpr}var",
                         lambda st, s: float(st["clockvar"][s, 0])))
            if ts.clockvarpr == "mixed":
                # 0 = IGR, 1 = ILN (reference RCL_* indicators)
                cols.append(("rclModel",
                             lambda st, s: float(st["rcl_model"][s, 0])))
        if ts.clockpr == "birthdeath":
            cols.append(("net_speciation",
                         lambda st, s: float(st["speciation"][s, 0])))
            cols.append(("relative_extinction",
                         lambda st, s: float(st["extinction"][s, 0])))
        if ts.clockpr == "coalescence":
            cols.append(("theta", lambda st, s: float(st["popsize"][s, 0])))
            if ts.growthpr.kind != "fixed":
                cols.append(("growthRate",
                             lambda st, s: float(st["growth"][s, 0])))
        if ts.clockpr == "fossilization":
            cols.append(("net_speciation",
                         lambda st, s: float(st["speciation"][s, 0])))
            cols.append(("relative_extinction",
                         lambda st, s: float(st["extinction"][s, 0])))
            cols.append(("relative_fossilization",
                         lambda st, s: float(st["fossilization"][s, 0])))
            if getattr(eng, "has_dated_tips", False) \
                    and ts.samplestrat != "fossiltip":
                cols.append(("nSampledAncestors",
                             lambda st, s: float(np.sum(
                                 np.asarray(st["sa"][s])))))
    rev_names = ("A<->C", "A<->G", "A<->T", "C<->G", "C<->T", "G<->T")
    for gid in range(eng.n_groups.get("revmat", 0)):
        for k, nm in enumerate(rev_names):
            cols.append((f"r({nm})" + suffix("revmat", gid),
                         lambda st, s, g=gid, k=k:
                         float(st["revmat"][s, g, k])))
        if gid in eng._mixed_rev:
            # submodel indicator: growth string as digits (e.g. 112123),
            # reference prints gtrsubmodel{...} (src/mcmc.c:12934)
            cols.append(("gtrsubmodel" + suffix("revmat", gid),
                         lambda st, s, g=gid: float("".join(
                             str(int(x) + 1)
                             for x in np.asarray(st["gtr_class"][s, g])))))
    AA = "ARNDCQEGHILKMFPSTWYV"
    for gid in range(eng.n_groups.get("aarevmat", 0)):
        # reference header: r(A<->R)... upper-triangle in StateCode_AA
        # order (src/model.c:19267-19285)
        k = 0
        for i in range(20):
            for j in range(i + 1, 20):
                cols.append((f"r({AA[i]}<->{AA[j]})"
                             + suffix("aarevmat", gid),
                             lambda st, s, g=gid, k=k:
                             float(st["aarevmat"][s, g, k])))
                k += 1
    for gid in range(eng.n_groups.get("tratio", 0)):
        cols.append(("kappa" + suffix("tratio", gid),
                     lambda st, s, g=gid: float(st["tratio"][s, g])))
    for gid in range(eng.n_groups.get("omega", 0)):
        cols.append(("omega" + suffix("omega", gid),
                     lambda st, s, g=gid: float(st["omega"][s, g])))
    for gid in range(eng.n_groups.get("ny98", 0)):
        cols.append((f"omega(1)", lambda st, s, g=gid:
                     float(st["omega1"][s, g])))
        cols.append((f"omega(3)", lambda st, s, g=gid:
                     float(st["omega3"][s, g])))
        for k, nm in enumerate(("-", "N", "+")):
            cols.append((f"pi({nm})", lambda st, s, g=gid, k=k:
                         float(st["omegaprobs"][s, g, k])))
    for gid in range(eng.n_groups.get("m3", 0)):
        for k in range(3):
            cols.append((f"omega({k + 1})", lambda st, s, g=gid, k=k:
                         float(st["m3omega"][s, g, k])))
            cols.append((f"pi({k + 1})", lambda st, s, g=gid, k=k:
                         float(st["m3probs"][s, g, k])))
    for gid in range(eng.n_groups.get("pi", 0)):
        for k, nm in enumerate("ACGT"):
            cols.append((f"pi({nm})" + suffix("pi", gid),
                         lambda st, s, g=gid, k=k: float(st["pi"][s, g, k])))
    aa3 = ("Ala", "Arg", "Asn", "Asp", "Cys", "Gln", "Glu", "Gly", "His",
           "Ile", "Leu", "Lys", "Met", "Phe", "Pro", "Ser", "Thr", "Trp",
           "Tyr", "Val")
    for gid in range(eng.n_groups.get("pi20", 0)):
        # reference prints 3-letter AA names (WhichAA / pi(Ala) columns)
        for k, nm in enumerate(aa3):
            cols.append((f"pi({nm})" + suffix("pi20", gid),
                         lambda st, s, g=gid, k=k:
                         float(st["pi20"][s, g, k])))
    for gid in range(eng.n_groups.get("pi2", 0)):
        for k, nm in enumerate(("0", "1")):
            cols.append((f"pi({nm})" + suffix("pi2", gid),
                         lambda st, s, g=gid, k=k:
                         float(st["pi2"][s, g, k])))
    for gid in range(eng.n_groups.get("rootpi2", 0)):
        # directional root frequencies; the reference prints -9999 when
        # a mixed run is in the stationary state, plus a statefrmod
        # indicator column (observed reference .p output)
        mixed = any(c.dirpi_mix for c in eng.div_cfg
                    if c.rootpi_group == gid)

        def rootv(st, s, g, k, mixed=mixed):
            if mixed and int(st["dirpi_on"][s, g]) == 0:
                return -9999.0
            return float(st["rootpi2"][s, g, k])

        for k in (0, 1):
            cols.append((f"rootpi({k})" + suffix("rootpi", gid),
                         lambda st, s, g=gid, k=k: rootv(st, s, g, k)))
        if mixed:
            cols.append(("statefrmod",
                         lambda st, s, g=gid:
                         float(st["dirpi_on"][s, g])))
    for gid in range(eng.n_groups.get("pi61", 0)):
        code = next(c.codon for c in eng.div_cfg
                    if c.pi_group == gid and c.pi_field == "pi61")
        from ..models.codes import BASES
        names = ["".join(BASES[b] for b in code.bases[k])
                 for k in range(code.n_states)]
        for k, nm in enumerate(names):
            cols.append((f"pi({nm})" + suffix("pi61", gid),
                         lambda st, s, g=gid, k=k:
                         float(st["pi61"][s, g, k])))
    doublets = [a + b for a in "ACGT" for b in "ACGT"]
    for gid in range(eng.n_groups.get("pi16", 0)):
        for k, nm in enumerate(doublets):
            cols.append((f"pi({nm})" + suffix("pi16", gid),
                         lambda st, s, g=gid, k=k:
                         float(st["pi16"][s, g, k])))
    for gid in range(eng.n_groups.get("shape", 0)):
        cols.append(("alpha" + suffix("shape", gid),
                     lambda st, s, g=gid: float(st["shape"][s, g])))
    for gid in range(eng.n_groups.get("mixtrates", 0)):
        kmix = next(c.n_cats for c in eng.div_cfg if c.mixt_group == gid)
        for k in range(kmix):
            # stored as a simplex; printed as rates with mean 1
            # (reference mixturerates columns, src/model.c:19830)
            cols.append((f"mixturerates{suffix('mixt', gid)}[{k + 1}]",
                         lambda st, s, g=gid, k=k, km=kmix:
                         float(st["mixtrates"][s, g, k]) * km))
    for gid in range(eng.n_groups.get("ratecorr", 0)):
        cols.append(("corr" + suffix("ratecorr", gid),
                     lambda st, s, g=gid: float(st["ratecorr"][s, g])))
    for gid in range(eng.n_groups.get("pinvar", 0)):
        cols.append(("pinvar" + suffix("pinvar", gid),
                     lambda st, s, g=gid: float(st["pinvar"][s, g])))
    for gid in range(eng.n_groups.get("covswitch", 0)):
        # reference column names: s(off->on) / s(on->off) (mcmc.c print)
        cols.append(("s(off->on)" + suffix("covswitch", gid),
                     lambda st, s, g=gid: float(st["covswitch"][s, g, 0])))
        cols.append(("s(on->off)" + suffix("covswitch", gid),
                     lambda st, s, g=gid: float(st["covswitch"][s, g, 1])))
    for gid in range(eng.n_groups.get("aamodel", 0)):
        cols.append(("aamodel" + suffix("aamodel", gid),
                     lambda st, s, g=gid: float(st["aamodel_idx"][s, g])))
    for gid in range(eng.n_groups.get("brownscale", 0)):
        # continuous-trait Brownian variance rate sigma^2
        cols.append(("brownScale" + suffix("brownscale", gid),
                     lambda st, s, g=gid: float(st["brownscale"][s, g])))
    if eng.ratemult_on:
        # BEST gene rates print as g_m{i} (reference P_GENETREERATE
        # header, src/model.c:20048); partition rates as m{i}
        mname = "g_m" if getattr(eng, "generate_on", False) else "m"
        for d in range(n_div):
            cols.append((f"{mname}{{{d + 1}}}",
                         lambda st, s, d=d: float(
                             st["ratemult"][s, d] / eng.div_char_frac[d])))
    return cols


class _NullFile:
    """Sink for non-main processes: the reference gates all file output
    to rank 0 (MrBayesPrint / cold-chain-owner -> rank-0 sends,
    src/mcmc.c:13263-13410); here non-zero processes keep the same code
    path but write nowhere."""
    name = os.devnull

    def write(self, s):
        return len(s)

    def flush(self):
        pass

    def close(self):
        pass


class McmcRunner:
    def __init__(self, engine: Engine, file_prefix: str | None = None,
                 log=print, report: dict | None = None, mesh=None):
        import jax
        self.eng = engine
        self.mc = engine.mcmc
        self.prefix = file_prefix or self.mc.filename
        self.mesh = mesh
        self.multiprocess = jax.process_count() > 1
        self.is_main = jax.process_index() == 0
        if not self.is_main:
            log = lambda msg: None   # noqa: E731  (rank-0-gated logging)
        self.log = log
        self.cols = param_columns(engine)
        # report ancstates/siterates/possel/siteomega columns
        # (mcmc/report.py; reference src/mcmc.c:12456-13147)
        self.reporter = None
        if report:
            from .report import Reporter
            rep = Reporter(engine, report, log=log)
            if rep.headers:
                self.reporter = rep
                log(f"   Reporting {len(rep.headers)} extra sample "
                    "columns (report command)")
        self.n_trees = getattr(engine, "n_trees", 1)
        self.splits = [SplitCounter(self.mc.nruns)
                       for _ in range(self.n_trees)]
        self.param_samples: list[list[dict]] = [
            [] for _ in range(self.mc.nruns)]
        self.asdsf_series: list[tuple[int, float]] = []

    # ------------------------------------------------------------- files
    @staticmethod
    def _truncate_after(path: str, gen: int, tree_file: bool):
        """Drop sample rows newer than the checkpoint generation so an
        append run continues seamlessly (reference ReusePreviousResults /
        file-position reconciliation, src/mcmc.c:15840, src/utils.c:289).
        """
        if not os.path.exists(path):
            return
        with open(path) as f:
            lines = f.readlines()
        kept = []
        for ln in lines:
            tok = ln.split()
            g = None
            if tree_file and len(tok) >= 2 and tok[0] == "tree" \
                    and tok[1].startswith("gen."):
                g = int(tok[1][4:])
            elif not tree_file and tok and tok[0].isdigit():
                g = int(tok[0])
            if g is not None and g > gen:
                continue
            if tree_file and ln.strip() == "end;":
                continue        # reopened for more samples
            kept.append(ln)
        with open(path, "w") as f:
            f.writelines(kept)

    def _open_files(self, append: bool, start_gen: int = 0):
        if append and self.is_main:
            for r in range(self.mc.nruns):
                base = f"{self.prefix}.run{r + 1}"
                self._truncate_after(base + ".p", start_gen, False)
                for path in self._tree_paths(r):
                    self._truncate_after(path, start_gen, True)
        return self._open_files_raw(append)

    def _tree_paths(self, r: int) -> list[str]:
        """Tree-sample file names for run r: one per tree parameter
        (reference naming <file>.tree<i>.run<r>.t for unlinked
        topologies, src/mcmc.c:10510)."""
        if self.n_trees > 1:
            return [f"{self.prefix}.tree{t + 1}.run{r + 1}.t"
                    for t in range(self.n_trees)]
        return [f"{self.prefix}.run{r + 1}.t"]

    def _open_files_raw(self, append: bool):
        mode = "a" if append else "w"
        self.pf, self.tf = [], []
        self.gf: list[list] = []       # BEST: per-run gene-tree files
        seed_id = self.mc.seed
        if not self.is_main:
            self.pf = [_NullFile() for _ in range(self.mc.nruns)]
            self.tf = [[_NullFile() for _ in self._tree_paths(r)]
                       for r in range(self.mc.nruns)]
            if getattr(self.eng, "best", False):
                self.gf = [[_NullFile() for _ in range(self.eng.n_div)]
                           for _ in range(self.mc.nruns)]
            self.mcmcf = _NullFile()
            return

        def tree_header(f, labels):
            f.write(f"#NEXUS\n[ID: {seed_id:010d}]\n[Param: tree]\n"
                    "begin trees;\n   translate\n")
            for i, name in enumerate(labels):
                sep = "," if i < len(labels) - 1 else ";"
                f.write(f"       {i + 1} {name}{sep}\n")

        for r in range(self.mc.nruns):
            base = f"{self.prefix}.run{r + 1}"
            pf = open(base + ".p", mode)
            tfs = [open(path, mode) for path in self._tree_paths(r)]
            if not append:
                pf.write(f"[ID: {seed_id:010d}]\n")
                hdr = "Gen\tlnLike\tlnPrior\t" \
                    + "\t".join(n for n, _ in self.cols)
                if self.reporter is not None:
                    hdr += "\t" + "\t".join(self.reporter.headers)
                pf.write(hdr + "\n")
                for tf in tfs:
                    tree_header(tf, self.eng.tree_taxa_labels)
            self.pf.append(pf)
            self.tf.append(tfs)
            if getattr(self.eng, "best", False):
                # sampled gene trees per partition (the reference samples
                # each gene tree to its own .t file in BEST runs)
                gfs = []
                for g in range(self.eng.n_div):
                    gtf = open(base + f".gene{g + 1}.t", mode)
                    if not append:
                        tree_header(gtf, list(self.eng.data.taxa))
                    gfs.append(gtf)
                self.gf.append(gfs)
        self.mcmcf = open(f"{self.prefix}.mcmc", mode)
        if not append:
            self.mcmcf.write(f"[ID: {seed_id:010d}]\n")
            self.mcmcf.write("Gen\tAvgStdDev(s)\n")

    def _np(self, x) -> np.ndarray:
        """Host copy of a possibly multi-process-sharded array."""
        if not self.multiprocess:
            return np.asarray(x)
        from ..parallel.mesh import gather_to_host
        return gather_to_host(x)

    def _debug_checks(self, gen: int, states_h, states_dev):
        """Opt-in in-loop invariants (role of the reference's
        --enable-debug generation checks: IsTreeConsistent
        src/utils.c:4778 and the DEBUG_LNLIKELIHOOD full-recompute
        cross-check, src/mcmc.c:16769-16861).  MB_DEBUG=1 validates
        every chain's tree structure at each sample boundary;
        MB_DEBUG_LNL=1 recomputes the carried lnL/lnP from scratch and
        errors on drift (catches stale-cache bugs in move branches)."""
        import jax
        if os.environ.get("MB_DEBUG"):
            for slot in range(self.mc.n_chains_total):
                for t_i in range(self.n_trees):
                    self.eng.extract_tree(states_h, slot, t_i).check()
        if os.environ.get("MB_DEBUG_LNL"):
            view = {k: v for k, v in states_dev.items()
                    if k not in ("lnL", "lnP", "lnP_tree", "lnP_par")}
            lnl = np.asarray(jax.vmap(self.eng.log_likelihood)(view))
            lnpt = np.asarray(jax.vmap(self.eng.log_prior_tree)(view))
            lnpp = np.asarray(jax.vmap(self.eng.log_prior_params)(view))
            carried_l = np.asarray(states_h["lnL"])
            carried_p = np.asarray(states_h["lnP"])
            dl = np.abs(lnl - carried_l).max()
            dp = np.abs((lnpt + lnpp) - carried_p).max()
            # the carried components must each match an exact recompute
            # (catches a move misclassified by prior_scope)
            dt = np.abs(lnpt - np.asarray(states_h["lnP_tree"])).max()
            dg = np.abs(lnpp - np.asarray(states_h["lnP_par"])).max()
            if dl > 0.5 or dp > 0.5 or dt > 1e-3 or dg > 1e-3:
                raise AssertionError(
                    f"DEBUG_LNL drift at gen {gen}: max |dlnL|={dl:.4f} "
                    f"|dlnP|={dp:.4f} |dlnP_tree|={dt:.5f} "
                    f"|dlnP_par|={dg:.5f} (carried vs recomputed)")

    def _write_sample(self, gen: int, states, bk):
        states_dev = states
        states, bk = self._host_view(states, bk)
        if not self.multiprocess:
            # one batched device->host fetch per sample boundary: the
            # column extractors index dozens of scalars, and over a TPU
            # tunnel each lazy read is a full round trip (measured
            # ~2s/boundary on the envelope config; ~50x the actual
            # device time).  jax.device_get pulls every array once.
            import jax
            states = jax.device_get(states)
            bk = jax.device_get(bk)
        if os.environ.get("MB_DEBUG") or os.environ.get("MB_DEBUG_LNL"):
            self._debug_checks(gen, states, states_dev)
        for r, slot in enumerate(self.eng.cold_indices(bk)):
            lnL = float(states["lnL"][slot])
            lnP = float(states["lnP"][slot])
            vals = [fn(states, slot) for _, fn in self.cols]
            rep_vals = (self.reporter.values(states, slot)
                        if self.reporter is not None else [])
            self.pf[r].write(
                f"{gen}\t{lnL:.6e}\t{lnP:.6e}\t"
                + "\t".join(f"{v:.6e}" for v in vals + rep_vals) + "\n")
            for t_i in range(self.n_trees):
                t = self.eng.extract_tree(states, slot, t_i)
                rooted_tag = "&R" if t.rooted else "&U"
                self.tf[r][t_i].write(
                    f"   tree gen.{gen} = [{rooted_tag}] "
                    + to_newick(t, numbers=True) + "\n")
                self.splits[t_i].add(r, t)
            if self.gf:
                for g, gtf in enumerate(self.gf[r]):
                    gt = self.eng.extract_gene_tree(states, slot, g)
                    gtf.write(f"   tree gen.{gen} = [&R] "
                              + to_newick(gt, numbers=True) + "\n")
            self.param_samples[r].append(
                dict(zip(["Gen", "lnLike", "lnPrior"]
                         + [n for n, _ in self.cols],
                         [gen, lnL, lnP] + vals)))

    # --------------------------------------------------------- checkpoint
    # The reference checkpoints every chain's full state + move tuning +
    # RNG seeds to a rotated .ckp file and resumes deterministically from
    # it (PrintCheckPoint src/mcmc.c:11192, resume :2449-2490).  Here the
    # state is a flat dict of arrays, so serialization is generic: every
    # state key (topology, ages/blens, all sampled params, rjMCMC
    # indicators) and every bookkeeping key except the PRNG keys (which
    # are reconstructed from the stored seeds; per-generation streams are
    # fold_in(key, absolute_gen), so restarting at the stored generation
    # reproduces the stream exactly).
    @staticmethod
    def _fmt_array(a: np.ndarray) -> str:
        flat = a.reshape(-1)
        if np.issubdtype(a.dtype, np.floating):
            # 9 significant digits round-trip float32 exactly
            return " ".join(f"{float(x):.9e}" for x in flat)
        return " ".join(str(int(x)) for x in flat)

    def _host_view(self, states, bk):
        """Host copies for sampling/checkpoint: a no-op single-process;
        multi-process, an allgather so every process sees the full chain
        state (reference Reassemble* gather, src/mcmc.c:14313 — here
        replicated so diagnostics need no broadcast back)."""
        if not self.multiprocess:
            return states, bk
        from ..parallel.mesh import gather_to_host
        return gather_to_host(states), gather_to_host(bk)

    def write_checkpoint(self, states, bk, gen: int, extra=None):
        """Rotated self-describing NEXUS checkpoint (the reference's .ckp
        is a self-executing NEXUS file, PrintCheckPoint src/mcmc.c:11192;
        rotation :11230).  A standard trees block carries every chain's
        current tree (readable by any NEXUS tool, including the
        reference); the exact device state rides in an `mbtpu_state`
        block — NEXUS readers skip unknown blocks — as one `array`
        command per state/bookkeeping key."""
        states, bk = self._host_view(states, bk)
        if not self.is_main:
            return
        if not self.multiprocess:
            import jax
            states = jax.device_get(states)   # one batched fetch (tunnel)
            bk = jax.device_get(bk)
        mc = self.mc
        nc = mc.nchains
        lines = ["#NEXUS",
                 f"[ID: {mc.seed:010d}]",
                 f"[generation: {gen}]",
                 f"[seed: {mc.seed}]", f"[swapseed: {mc.swapseed}]",
                 "begin trees;", "   translate"]
        labels = self.eng.tree_taxa_labels
        for i, name in enumerate(labels):
            sep = "," if i < len(labels) - 1 else ";"
            lines.append(f"       {i + 1} {name}{sep}")
        tid = np.asarray(bk["temp_id"])
        for slot in range(mc.n_chains_total):
            r, c = slot // nc, slot % nc
            for t_i in range(self.n_trees):
                t = self.eng.extract_tree(states, slot, t_i)
                tag = "&R" if t.rooted else "&U"
                nm = (f"gen.{gen}$tree={t_i + 1}.run={r + 1}.chain={c + 1}"
                      f".heat={int(tid[slot])}"
                      if self.n_trees > 1 else
                      f"gen.{gen}$run={r + 1}.chain={c + 1}"
                      f".heat={int(tid[slot])}")
                lines.append(f"   tree {nm} = [{tag}] "
                             + to_newick(t, numbers=True))
        lines.append("end;")
        lines.append("begin mbtpu_state;")
        lines.append(f"   generation {gen};")

        def dump(prefix, d, skip=()):
            for k, v in d.items():
                if k in skip or k.startswith("eig"):
                    continue
                a = np.asarray(v)
                shape = ",".join(str(s) for s in a.shape)
                lines.append(f"   array {prefix}.{k} {a.dtype.name} "
                             f"[{shape}] = {self._fmt_array(a)};")

        dump("states", states)
        dump("bk", bk, skip=("key", "swap_key"))
        if extra:
            # e.g. steppingstone accumulators (the reference stores SS
            # state in the .ckp too, src/mcmc.c:11253-11282)
            dump("ss", {k: np.asarray(v) for k, v in extra.items()})
        lines.append("end;")
        path = f"{self.prefix}.ckp"
        if os.path.exists(path):
            os.replace(path, path + "~")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

    def read_checkpoint(self):
        import jax
        import jax.numpy as jnp
        path = f"{self.prefix}.ckp"
        with open(path) as f:
            text = f.read()
        if text.lstrip().startswith("{"):       # legacy JSON checkpoints
            obj = json.loads(text)
            arrays = {"states." + k: np.asarray(v)
                      for k, v in obj["states"].items()}
            arrays.update({"bk." + k: np.asarray(v)
                           for k, v in obj["bk"].items()})
            gen = obj["generation"]
        else:
            arrays, gen = self._parse_nexus_ckp(text)
        states, bk = self.eng.init_chains()
        states = {k: (jnp.asarray(arrays["states." + k].reshape(v.shape),
                                  v.dtype)
                      if "states." + k in arrays else v)
                  for k, v in states.items()}
        bk = {k: (jnp.asarray(arrays["bk." + k].reshape(v.shape), v.dtype)
                  if "bk." + k in arrays else v)
              for k, v in bk.items()}
        states = jax.vmap(self.eng.refresh_eigs)(states)
        states["lnL"] = jax.vmap(self.eng.log_likelihood)(states)
        states["lnP_tree"] = jax.vmap(self.eng.log_prior_tree)(states)
        states["lnP_par"] = jax.vmap(self.eng.log_prior_params)(states)
        states["lnP"] = states["lnP_tree"] + states["lnP_par"]
        self._ckp_extra = {k[len("ss."):]: v for k, v in arrays.items()
                           if k.startswith("ss.")}
        return states, bk, gen

    @staticmethod
    def _parse_nexus_ckp(text: str):
        """Parse the mbtpu_state block of a NEXUS checkpoint."""
        arrays: dict = {}
        gen = 0
        body = text.split("begin mbtpu_state;", 1)[1]
        for stmt in body.split(";"):
            toks = stmt.split()
            if not toks:
                continue
            if toks[0] == "generation":
                gen = int(toks[1])
            elif toks[0] == "array":
                name, dtype, shape = toks[1], toks[2], toks[3]
                vals = toks[5:]          # skip '='
                shp = tuple(int(s) for s in shape.strip("[]").split(",")
                            if s)
                a = np.array([float(x) for x in vals], dtype=dtype)
                arrays[name] = a.reshape(shp)
            elif toks[0] == "end":
                break
        return arrays, gen

    # --------------------------------------------------------------- run
    def run(self):
        import signal
        mc = self.mc
        eng = self.eng
        start_gen = 0
        if mc.append and os.path.exists(f"{self.prefix}.ckp"):
            states, bk, start_gen = self.read_checkpoint()
            self.log(f"   Resuming from checkpoint at generation {start_gen}")
        else:
            states, bk = eng.init_chains()
        if self.mesh is not None:
            import jax
            from ..parallel.mesh import shard_chains
            states, bk = shard_chains(eng, self.mesh, states, bk)
            shape = dict(zip(self.mesh.axis_names,
                             self.mesh.devices.shape))
            self.log(f"   Sharding over mesh {shape} "
                     f"({jax.process_count()} process(es))")
        self._open_files(append=start_gen > 0, start_gen=start_gen)
        lnls = self._np(states["lnL"])
        self.log(f"   Running Markov chain ( {mc.nruns} runs x {mc.nchains} "
                 f"chains, {mc.ngen} generations )")
        self.log("   Initial log likelihoods: "
                 + " ".join(f"{v:.2f}" for v in lnls))
        if start_gen == 0:
            self._write_sample(0, states, bk)
        # graceful SIGINT: first ^C requests a stop at the next block
        # boundary (checkpoint written); a second ^C aborts immediately
        # (reference CatchInterrupt/ConfirmAbortRun, src/mcmc.c:2205,
        # :15495, checked each generation :16713)
        self._abort = False
        self.phase_times = {"device": 0.0, "sample_io": 0.0,
                            "diagnostics": 0.0, "checkpoint": 0.0}

        def on_sigint(sig, frame):
            if self._abort:
                raise KeyboardInterrupt
            self._abort = True
            self.log("   ^C received: stopping at the next sample "
                     "boundary (checkpoint will be written); "
                     "press ^C again to abort immediately")

        try:
            prev_handler = signal.signal(signal.SIGINT, on_sigint)
        except ValueError:       # not the main thread (tests)
            prev_handler = None
        t0 = time.time()
        gen = start_gen
        stopped = False
        while gen < mc.ngen and not stopped:
            n = min(mc.samplefreq, mc.ngen - gen)
            tb = time.time()
            states, bk = eng.run_block(states, bk, n)
            states["lnL"].block_until_ready()
            self.phase_times["device"] += time.time() - tb
            gen += n
            if self._abort:
                self.log(f"   Run aborted by user at generation {gen}")
                stopped = True
            tb = time.time()
            if gen % mc.samplefreq == 0 or gen == mc.ngen or stopped:
                self._write_sample(gen, states, bk)
            self.phase_times["sample_io"] += time.time() - tb
            if gen % mc.printfreq == 0 or gen == mc.ngen:
                lnls = self._np(states["lnL"])
                cold = eng.cold_indices({"temp_id": self._np(bk["temp_id"])})
                rate = (gen - start_gen) / max(time.time() - t0, 1e-9)
                eta = (mc.ngen - gen) / max(rate, 1e-9)
                self.log(f"   {gen} -- "
                         + " ".join(f"[{lnls[c]:.3f}]" for c in cold)
                         + f" -- {rate:.0f} gen/s -- {eta:.0f} s remaining")
            tb = time.time()
            if gen % mc.diagnfreq == 0 and mc.nruns > 1:
                asdsf = self._burned_asdsf()
                self.asdsf_series.append((gen, asdsf))
                self.mcmcf.write(f"{gen}\t{asdsf:.6f}\n")
                self.mcmcf.flush()
                self.log(f"   Average standard deviation of split "
                         f"frequencies: {asdsf:.6f}")
                if mc.stoprule and asdsf < mc.stopval:
                    self.log("   Analysis stopped: convergence criterion "
                             "reached")
                    stopped = True
            self.phase_times["diagnostics"] += time.time() - tb
            tb = time.time()
            if mc.checkfreq and gen % mc.checkfreq == 0:
                self.write_checkpoint(states, bk, gen)
            self.phase_times["checkpoint"] += time.time() - tb
        tb = time.time()
        self.write_checkpoint(states, bk, gen)
        self.phase_times["checkpoint"] += time.time() - tb
        if prev_handler is not None:
            import signal as _signal
            _signal.signal(_signal.SIGINT, prev_handler)
        for f in (self.pf + [t for ts in self.tf for t in ts]
                  + [g for gs in self.gf for g in gs]):
            f.write("end;\n" if f.name.endswith(".t") else "")
            f.close()
        self.mcmcf.close()
        dt = time.time() - t0
        self.log(f"   Analysis completed in {dt:.0f} seconds")
        self.log(f"   Analysis used {dt:.2f} seconds of total time")
        # per-phase wall-time breakdown (role of the reference's
        # TIMING_ANALIZ per-kernel clocks, src/likelihood.h:4-19 — here
        # the whole device step is one fused dispatch, so the phases are
        # device vs the host-side services around it)
        pt = self.phase_times
        tracked = sum(pt.values())
        self.log("   Time breakdown: "
                 + "  ".join(f"{k} {v:.2f}s ({v / max(dt, 1e-9):.0%})"
                             for k, v in pt.items())
                 + f"  other {max(dt - tracked, 0.0):.2f}s")
        lnls = self._np(states["lnL"])
        cold = eng.cold_indices({"temp_id": self._np(bk["temp_id"])})
        for r, slot in enumerate(cold):
            best = max((s["lnLike"] for s in self.param_samples[r]),
                       default=float(lnls[slot]))
            self.log(f"   Likelihood of best state for \"cold\" chain of "
                     f"run {r + 1} was {best:.2f}")
        self._print_move_summary(bk)
        return states, bk

    def _burned_asdsf(self) -> float:
        """Live ASDSF with relative burn-in applied over the recorded
        per-sample split sets (reference recomputes split frequencies over
        the post-burn-in window, src/mcmc.c:1750)."""
        mc = self.mc
        burn = mc.burninfrac if mc.relburnin else 0.0
        return max(sc.asdsf(mc.minpartfreq, burn_frac=burn)
                   for sc in self.splits)

    def _print_move_summary(self, bk):
        tries = self._np(bk["tries_total"]).sum(0)
        accepts = self._np(bk["accepts_total"]).sum(0)
        self.log("   Acceptance rates per move (all chains):")
        for i, mv in enumerate(self.eng.moves):
            if tries[i]:
                self.log(f"      {accepts[i] / tries[i]:6.1%}  "
                         f"({int(tries[i]):9d} tries)  {mv.name}")
        self._print_swap_info(bk)

    def _print_swap_info(self, bk):
        """Chain swap matrix per run: upper triangle = acceptance rate,
        lower triangle = attempt count (reference PrintSwapInfo,
        src/mcmc.c:13579)."""
        if self.mc.nchains < 2:
            return
        st = self._np(bk["swap_tries"])
        sa = self._np(bk["swap_accepts"])
        nc = self.mc.nchains
        for r in range(self.mc.nruns):
            self.log(f"   Chain swap information for run {r + 1} "
                     "(upper: acceptance rate, lower: attempts):")
            self.log("            " + "".join(f"{c + 1:>9d}"
                                              for c in range(nc)))
            for i in range(nc):
                cells = []
                for j in range(nc):
                    if j > i:
                        t = st[r, i, j]
                        cells.append(f"{sa[r, i, j] / t:9.2f}" if t
                                     else f"{'--':>9s}")
                    elif j < i:
                        cells.append(f"{int(st[r, j, i]):9d}")
                    else:
                        cells.append(f"{'--':>9s}")
                self.log(f"      {i + 1:>4d}  " + "".join(cells))
