"""``mb``-style command interpreter: runs reference NEXUS batch files.

Implements the command surface of the reference interpreter
(src/command.c commands[] table, 62 commands) for the subset wired into the
TPU engine: execute, set, lset, prset, link/unlink, partition, charset,
taxset, exclude/include, outgroup, mcmc/mcmcp, sump, sumt, showmodel,
showmatrix, about/version, log, quit.  Batch mode: ``python -m
mrbayes_tpu.cli file.nex``; interactive mode without arguments.
"""
from __future__ import annotations

import os
import sys
from dataclasses import dataclass, field, replace

import numpy as np

from .data import DataSet, make_divisions, parse_char_range
from .mcmc.engine import Engine
from .mcmc.settings import (DivisionSettings, McmcSettings, Prior,
                            TreeSettings)
from .nexus.lexer import TokenStream, tokenize
from .nexus.parser import NexusFile, read_nexus_file


@dataclass
class Environment:
    nexus: NexusFile | None = None
    data_path: str | None = None
    charsets: dict = field(default_factory=dict)
    taxsets: dict = field(default_factory=dict)
    partitions: dict = field(default_factory=dict)  # name -> list[list[int]]
    partition_names: dict = field(default_factory=dict)
    current_partition: str | None = None
    excluded: set = field(default_factory=set)
    ctypes: dict = field(default_factory=dict)  # 0-based col -> ordered|irreversible
    # speciespartition name -> [(species name, taxon tokens)], and the
    # active one (reference DoSpeciespartition, src/command.c)
    speciespartitions: dict = field(default_factory=dict)
    current_speciespartition: str | None = None
    report: dict = field(default_factory=dict)  # report command settings
    # settings per user-division (list index = user division)
    div_settings: list = field(default_factory=list)
    tree_settings: TreeSettings = field(default_factory=TreeSettings)
    mcmc: McmcSettings = field(default_factory=McmcSettings)
    links: dict = field(default_factory=dict)   # param -> list[int] per div
    constraints: dict = field(default_factory=dict)   # name -> bool mask
    calibrations: dict = field(default_factory=dict)  # name/taxon -> Prior
    enforced_constraints: list = field(default_factory=list)  # names
    deleted: set = field(default_factory=set)   # deleted taxon indices
    pairs: tuple = ()                           # doublet pair definitions
    move_overrides: dict = field(default_factory=dict)  # propset
    start_tree_name: str | None = None          # startvals tau=<tree>
    user_trees: dict = field(default_factory=dict)      # name -> newick
    outgroup: int = 0
    seed: int = 1
    swapseed: int = 2
    autoclose: bool = True
    nowarnings: bool = True
    quit_requested: bool = False
    logfile = None

    def n_user_divs(self) -> int:
        if self.current_partition:
            return len(self.partitions[self.current_partition])
        # default partition: one user division per datatype run (the
        # reference's implicit partition for mixed(...) matrices)
        if self.nexus is not None and self.nexus.matrix is not None:
            seen = []
            for dt in self.nexus.matrix.col_datatype:
                if dt not in seen:
                    seen.append(dt)
            return len(seen)
        return 1

    def ensure_div_settings(self):
        n = self.n_user_divs()
        while len(self.div_settings) < n:
            self.div_settings.append(DivisionSettings())
        del self.div_settings[n:]


class CommandError(Exception):
    pass


PARAM_ALIASES = {
    "statefreq": "pi", "revmat": "revmat", "tratio": "tratio",
    "shape": "shape", "pinvar": "pinvar", "ratemultiplier": "ratemult",
    "topology": "topology", "brlens": "brlens", "aamodel": "aamodel",
}


class Interpreter:
    def __init__(self, log=None):
        self.env = Environment()
        self._log_fn = log or self._default_log

    def _default_log(self, msg: str):
        print(msg)
        if self.env.logfile:
            self.env.logfile.write(msg + "\n")

    def log(self, msg: str):
        self._log_fn(msg)

    # ------------------------------------------------------------------
    def execute_file(self, path: str):
        self.log(f"   Executing file \"{path}\"")
        nf = read_nexus_file(path)
        if nf.matrix is not None:
            self.env.nexus = nf
            self.env.data_path = path
            # outputs go to the working directory (the reference names its
            # output files after the data file; keeping only the basename
            # avoids writing next to read-only input locations)
            self.env.mcmc.filename = os.path.basename(path)
            self.env.div_settings = [DivisionSettings()]
            self.env.current_partition = None
            self.env.excluded = set()
            self.log(f"   Matrix has {nf.matrix.ntax} taxa and "
                     f"{nf.matrix.nchar} characters")
        for tr in nf.trees:
            self.env.user_trees[tr.name.lower()] = tr.newick
        if nf.trees:
            self.log(f"   Read {len(nf.trees)} user tree(s): "
                     + ", ".join(t.name for t in nf.trees))
        base = os.path.dirname(os.path.abspath(path))
        for cmd in nf.commands:
            self.run_command(cmd, base_dir=base)
            if self.env.quit_requested:
                break

    def run_line(self, line: str, base_dir: str = "."):
        toks = tokenize(line)
        if toks:
            self.run_command(toks, base_dir)

    # ------------------------------------------------------------------
    # host-side summarization/plot commands run on process 0 only in a
    # distributed launch; MCMC/model commands run on every process
    HOST_ONLY = ("sump", "sumt", "sumss", "comparetree", "compareref",
                 "plot", "log")

    def run_command(self, toks: list[str], base_dir: str = "."):
        name = toks[0].lower()
        args = toks[1:]
        if getattr(self, "_worker", False) and name in self.HOST_ONLY:
            return
        handler = getattr(self, f"do_{name}", None)
        if handler is None:
            handler = self._abbrev_handler(name)
        if handler is None:
            # the reference rejects unknown commands ("Could not find
            # command", src/command.c FindValidCommand) rather than
            # silently skipping them — a typo'd command is a user error
            self.log(f"   [!] Could not find command \"{name}\"")
            raise CommandError(f"unknown command {name!r}")
        try:
            handler(args, base_dir)
        except CommandError as e:
            self.log(f"   [!] Error in \"{name}\": {e}")
            raise

    def _abbrev_handler(self, name):
        cands = [m for m in dir(self) if m.startswith("do_")
                 and m[3:].startswith(name)]
        if len(cands) == 1:
            return getattr(self, cands[0])
        return None

    # ------------------------------------------------------------------
    @staticmethod
    def _kv_pairs(args: list[str]):
        """Split 'a = b c = (x,y) d = u:v(1,2)' token runs into
        (key, value-token-list) pairs.  A new pair starts wherever a token
        is followed by '='; value tokens (including parens/colons) accrue
        to the current pair until the next such boundary."""
        pairs = []
        i = 0
        cur = None
        depth = 0
        while i < len(args):
            tok = args[i]
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth = max(0, depth - 1)
            starts_pair = (depth == 0 and i + 1 < len(args)
                           and args[i + 1] == "=" and tok not in "()=,:")
            if starts_pair:
                cur = (tok.lower(), [])
                pairs.append(cur)
                i += 2
                continue
            if cur is None:
                pairs.append((tok.lower(), []))
            else:
                cur[1].append(tok)
            i += 1
        return pairs

    @staticmethod
    def _canon(key: str, names: tuple) -> str:
        """Reference-style abbreviation matching: a key may be any
        unambiguous prefix of a parameter name (reference IsSame/
        CONSISTENT_WITH matching, src/command.c)."""
        if key in names:
            return key
        hits = [n for n in names if n.startswith(key)]
        return hits[0] if len(hits) == 1 else key

    @staticmethod
    def _canon_strict(key: str, names: tuple, cmd: str) -> str:
        """Like _canon but rejects unmatched keys — the reference errors
        with "Invalid argument" on unknown parameters (src/command.c
        DoesWordMatchToken / expecting-token checks) instead of silently
        dropping them."""
        if key in names:
            return key
        hits = [n for n in names if n.startswith(key)]
        if len(hits) == 1:
            return hits[0]
        if len(hits) > 1:
            raise CommandError(
                f"ambiguous {cmd} argument {key!r} (matches {hits})")
        raise CommandError(f"invalid {cmd} argument {key!r}")

    @staticmethod
    def _parse_prior(tokens: list[str]) -> Prior:
        """Parse 'exponential(10.0)' or 'dirichlet(1,1,1,1)' or 'fixed(equal)'
        possibly split across tokens."""
        text = "".join(tokens).lower()
        # reference accepts abbreviated distribution names (IsSame matches
        # prefixes, src/command.c); canonicalize the common ones
        aliases = {"exp": "exponential", "unif": "uniform",
                   "lognorm": "lognormal", "lognormal": "lognormal",
                   "offsetexponential": "offsetexp",
                   "offsetexp": "offsetexp", "norm": "normal",
                   "gaussian": "normal", "truncatednormal": "truncatednormal"}
        if "(" in text:
            kind, rest = text.split("(", 1)
            kind = aliases.get(kind, kind)
            rest = rest.rstrip(")")
            params = []
            for p in rest.split(","):
                p = p.strip()
                if not p:
                    continue
                try:
                    params.append(float(p))
                except ValueError:
                    params.append(p)
            return Prior(kind, tuple(params))
        return Prior(text, ())

    def _applyto(self, pairs) -> list[int]:
        """Divisions targeted by an applyto=() clause (0-based)."""
        self.env.ensure_div_settings()
        n = self.env.n_user_divs()
        for key, val in pairs:
            if self._canon(key, ("applyto",)) == "applyto":
                inner = [t for t in val if t not in "(),"]
                if any(t.lower() == "all" for t in inner):
                    return list(range(n))
                return [int(t) - 1 for t in inner if t.isdigit()]
        return list(range(n))

    # ------------------------------------------------------------------
    # commands

    def do_execute(self, args, base_dir):
        path = args[0].strip('"')
        if not os.path.isabs(path):
            cand = os.path.join(base_dir, path)
            path = cand if os.path.exists(cand) else path
        self.execute_file(path)

    SET_KEYS = ("autoclose", "nowarn", "nowarnings", "seed", "swapseed",
                "partition", "speciespartition", "dir", "quitonerror",
                "scientific", "precision", "ordertaxa",
                # BEAGLE resource selection: accepted for drive-file
                # compatibility; the XLA/Pallas engine subsumes BEAGLE's
                # role (reference set usebeagle..., src/command.c:7202)
                "usebeagle", "beagledevice", "beagleprecision",
                "beagleresource", "beaglescaling", "beaglesse",
                "beagleopenmp", "beaglefreq", "beaglethreads")

    def do_set(self, args, base_dir):
        for key, val in self._kv_pairs(args):
            key = self._canon_strict(key, self.SET_KEYS, "set")
            v = val[0].lower() if val else ""
            if key == "autoclose":
                self.env.autoclose = v.startswith("y")
            elif key in ("nowarn", "nowarnings"):
                self.env.nowarnings = v.startswith("y")
            elif key == "seed":
                self.env.seed = int(val[0])
                self.env.mcmc.seed = int(val[0])
            elif key == "swapseed":
                self.env.swapseed = int(val[0])
                self.env.mcmc.swapseed = int(val[0])
            elif key == "partition":
                name = val[0]
                matches = [p for p in self.env.partitions
                           if p.lower() == name.lower()]
                if not matches:
                    raise CommandError(f"unknown partition {name!r}")
                self.env.current_partition = matches[0]
                self.env.ensure_div_settings()
                self.log(f"   Setting partition to {matches[0]} "
                         f"({self.env.n_user_divs()} divisions)")
            elif key == "speciespartition":
                name = val[0]
                matches = [p for p in self.env.speciespartitions
                           if p.lower() == name.lower()]
                if not matches:
                    raise CommandError(f"unknown speciespartition {name!r}")
                self.env.current_speciespartition = matches[0]
                self.log(f"   Setting speciespartition to {matches[0]}")
            # usebeagle/beagle* silently accepted for compatibility

    def do_charset(self, args, base_dir):
        name = args[0]
        rest = args[1:]
        if rest and rest[0] == "=":
            rest = rest[1:]
        nchar = self.env.nexus.matrix.nchar
        cols = self._expand_sets(rest, nchar)
        self.env.charsets[name] = cols

    def _expand_sets(self, toks, nchar):
        """Expand tokens that may reference charset names or ranges."""
        out = []
        plain = []
        for t in toks:
            if t in self.env.charsets:
                if plain:
                    out.extend(parse_char_range(plain, nchar))
                    plain = []
                out.extend(self.env.charsets[t])
            else:
                plain.append(t)
        if plain:
            out.extend(parse_char_range(plain, nchar))
        return out

    def do_taxset(self, args, base_dir):
        name = args[0]
        rest = [t for t in args[1:] if t != "="]
        taxa = self.env.nexus.taxa
        ids = []
        for t in rest:
            if t in taxa:
                ids.append(taxa.index(t))
            elif t.isdigit():
                ids.append(int(t) - 1)
        self.env.taxsets[name] = ids

    def do_partition(self, args, base_dir):
        # partition name = N: ranges, ranges, ...
        name = args[0]
        rest = args[1:]
        if rest and rest[0] == "=":
            rest = rest[1:]
        try:
            colon = rest.index(":")
        except ValueError:
            raise CommandError("expected 'partition name = N: ...'")
        n_sub = int(rest[colon - 1])
        groups_toks = []
        cur = []
        for t in rest[colon + 1:]:
            if t == ",":
                groups_toks.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            groups_toks.append(cur)
        if len(groups_toks) != n_sub:
            raise CommandError(
                f"partition {name}: declared {n_sub} subsets, "
                f"found {len(groups_toks)}")
        nchar = self.env.nexus.matrix.nchar
        subsets = [self._expand_sets(g, nchar) for g in groups_toks]
        self.env.partitions[name] = subsets
        self.log(f"   Defined partition \"{name}\" with {n_sub} subsets")

    def do_exclude(self, args, base_dir):
        nchar = self.env.nexus.matrix.nchar
        self.env.excluded |= set(self._expand_sets(args, nchar))

    def do_include(self, args, base_dir):
        nchar = self.env.nexus.matrix.nchar
        self.env.excluded -= set(self._expand_sets(args, nchar))

    def do_ctype(self, args, base_dir):
        """ctype ordered|unordered|irreversible: chars — sets character
        ordering for standard data (reference DoCtype,
        src/command.c:3009).  Ordered characters use the adjacent-state Mk
        Q (src/likelihood.c:9257)."""
        kind = args[0].lower().rstrip(":")
        rest = [t for t in args[1:] if t != ":"]
        nchar = self.env.nexus.matrix.nchar
        cols = self._expand_sets(rest, nchar)
        if kind == "unordered":
            for c in cols:
                self.env.ctypes.pop(c, None)
        else:
            if kind == "irreversible":
                # exact parity: the reference itself rejects IRREV at
                # model setup ("Irreversible model not yet supported",
                # src/model.c:16527-16531)
                raise CommandError("irreversible model not supported "
                                   "(the reference rejects it too, "
                                   "src/model.c:16529)")
            for c in cols:
                self.env.ctypes[c] = kind
        self.log(f"   Set ctype {kind} for {len(cols)} characters")

    def do_speciespartition(self, args, base_dir):
        """speciespartition <name> = <species>: <taxa>, ... — assign taxa
        to species for BEST/MSC analyses (reference DoSpeciespartition,
        src/command.c; used with prset topologypr=speciestree)."""
        name = args[0]
        rest = args[1:]
        if rest and rest[0] == "=":
            rest = rest[1:]
        groups: list[tuple[str, list[str]]] = []
        cur_name, cur_toks = None, []
        i = 0
        while i < len(rest):
            t = rest[i]
            if i + 1 < len(rest) and rest[i + 1] == ":":
                if cur_name is not None:
                    groups.append((cur_name, cur_toks))
                cur_name, cur_toks = t, []
                i += 2
                continue
            if t == ",":
                i += 1
                continue
            cur_toks.append(t)
            i += 1
        if cur_name is not None:
            groups.append((cur_name, cur_toks))
        if not groups:
            raise CommandError("expected 'speciespartition name = "
                               "Species: taxa, ...'")
        self.env.speciespartitions[name] = groups
        self.log(f"   Defined speciespartition \"{name}\" with "
                 f"{len(groups)} species")

    REPORT_KEYS = ("applyto", "ancstates", "siterates", "possel",
                   "siteomega", "tree", "brlens", "apetree")

    def do_report(self, args, base_dir):
        """report [applyto=(..)] ancstates|siterates|possel|siteomega=yes
        — posterior reporting options (reference DoReport,
        src/command.c).  Stored as key -> (value, divisions); the runner
        appends the matching p(state)/r(i)/pr+/omega columns to the .p
        samples (mcmc/report.py)."""
        pairs = self._kv_pairs(args)
        targets = self._applyto(pairs)
        for key, val in pairs:
            key = self._canon_strict(key, self.REPORT_KEYS, "report")
            if key == "applyto" or not val:
                continue
            self.env.report[key] = ("".join(val).lower(), tuple(targets))
        self.log("   Set report options: "
                 + " ".join(f"{k}={v}" for k, (v, _)
                            in self.env.report.items()))

    def _expand_taxa(self, toks) -> list[int]:
        """Taxon tokens → 0-based indices: names, numbers, ranges (3-114,
        1-.), taxset names (reference taxon-set syntax, src/command.c)."""
        taxa = self.env.nexus.taxa
        ntax = len(taxa)
        lower = {t.lower(): i for i, t in enumerate(taxa)}
        out: list[int] = []
        plain: list[str] = []

        def flush():
            if plain:
                out.extend(parse_char_range(plain, ntax))
                plain.clear()

        for t in toks:
            if t.lower() in lower:
                flush()
                out.append(lower[t.lower()])
            elif t in self.env.taxsets:
                flush()
                out.extend(self.env.taxsets[t])
            else:
                plain.append(t)
        flush()
        return sorted(set(out))

    def do_propset(self, args, base_dir):
        """propset <move>$<setting>=<value> ... — adjust proposal
        probabilities/tuning (reference DoPropset, src/model.c:4282).
        Move names are this engine's (see the acceptance-rate table)."""
        toks = [t for t in args if t != ","]
        i = 0
        while i < len(toks):
            piece = toks[i]
            if i + 2 < len(toks) and toks[i + 1] == "=":
                piece = piece + "=" + toks[i + 2]
                i += 3
            else:
                i += 1
            if "$" not in piece or "=" not in piece:
                raise CommandError(f"propset: bad syntax {piece!r} "
                                   "(want move$setting=value)")
            mv, rest = piece.split("$", 1)
            setting, val = rest.split("=", 1)
            self.env.move_overrides.setdefault(mv.lower(), {})[
                setting.lower()] = float(val)
        self.log(f"   Set proposal parameters for "
                 f"{len(self.env.move_overrides)} moves")

    def do_startvals(self, args, base_dir):
        """startvals tau=<treename> — user starting tree (reference
        DoStartvals, src/model.c:10624; scalar params start at defaults)."""
        for key, val in self._kv_pairs(args):
            if key in ("tau", "topology", "tree"):
                self.env.start_tree_name = val[0]
            else:
                self.log(f"   startvals: parameter {key!r} ignored "
                         "(only tau=<tree> supported)")

    def do_usertree(self, args, base_dir):
        pass  # trees blocks register via execute

    def do_pairs(self, args, base_dir):
        """pairs 1:20, 2:19, ...;  — nucleotide pair (doublet) definitions
        (reference DoPairs, src/command.c:5599)."""
        text = "".join(args).replace(" ", "")
        pairs = []
        for piece in text.split(","):
            if not piece:
                continue
            a, b = piece.split(":")
            pairs.append((int(a) - 1, int(b) - 1))
        self.env.pairs = tuple(pairs)
        self.log(f"   Defined {len(pairs)} nucleotide pairs")

    def do_constraint(self, args, base_dir):
        """constraint <name> [hard|negative|partial] = <taxa> [: <taxa2>]
        (reference DoConstraint, src/command.c:2419; partial constraints
        carry a second taxon set after ':').  Enforced only when listed
        in prset topologypr=constraints(...)."""
        name = args[0]
        rest = [t for t in args[1:] if t != "="]
        ctype = "hard"
        if rest and rest[0].lower() in ("hard", "negative", "partial"):
            ctype = rest[0].lower()
            rest = rest[1:]
        ntax = len(self.env.nexus.taxa)
        mask2 = None
        if ctype == "partial":
            if ":" not in rest:
                raise CommandError(
                    f"partial constraint {name} needs two taxon sets "
                    "separated by ':'")
            cut = rest.index(":")
            ids2 = self._expand_taxa(rest[cut + 1:])
            rest = rest[:cut]
            mask2 = np.zeros(ntax, bool)
            mask2[ids2] = True
        ids = self._expand_taxa(rest)
        mask = np.zeros(ntax, bool)
        mask[ids] = True
        if ctype == "partial":
            if (mask & mask2).any():
                raise CommandError(
                    f"partial constraint {name}: the two taxon sets "
                    "intersect (reference src/command.c:2482)")
            if not mask2.any():
                raise CommandError(
                    f"partial constraint {name}: empty second set")
        if ctype in ("negative", "partial") and mask.sum() < 2:
            raise CommandError(
                f"{ctype} constraint {name} needs at least two taxa")
        self.env.constraints[name.lower()] = (ctype, mask, mask2)

    def do_calibrate(self, args, base_dir):
        """calibrate <taxon|constraint|root> = fixed(age)|uniform(a,b)|
        offsetexp(offset,mean) (reference DoCalibrate,
        src/command.c:1161)."""
        for key, val in self._kv_pairs(args):
            pr = self._parse_prior(val)
            if pr.kind in ("offsetexponential", "offsetexp"):
                pr = Prior("offsetexp", pr.params)
            self.env.calibrations[key.lower()] = pr

    def do_delete(self, args, base_dir):
        """delete <taxa|taxset|all> — exclude taxa from the analysis
        (reference DoDelete, src/command.c)."""
        if args and args[0].lower() == "all":
            self.env.deleted = set(range(len(self.env.nexus.taxa)))
        else:
            self.env.deleted |= set(self._expand_taxa(args))

    def do_restore(self, args, base_dir):
        if args and args[0].lower() == "all":
            self.env.deleted = set()
        else:
            self.env.deleted -= set(self._expand_taxa(args))

    def do_outgroup(self, args, base_dir):
        t = args[0]
        taxa = self.env.nexus.taxa
        self.env.outgroup = (taxa.index(t) if t in taxa else int(t) - 1)

    LSET_KEYS = ("applyto", "nst", "rates", "ngammacat", "nucmodel", "code",
                 "covarion", "coding", "omegavar", "parsmodel", "nbetacat",
                 "nmixtcat", "usegibbs", "gibbsfreq", "nlnormcat",
                 "numm10betacats", "numm10gammacats",
                 "statefreqmodel", "statefrmod")

    def do_lset(self, args, base_dir):
        pairs = self._kv_pairs(args)
        targets = self._applyto(pairs)
        for key, val in pairs:
            key = self._canon_strict(key, self.LSET_KEYS, "lset")
            if key == "applyto" or not val:
                continue
            v = "".join(val).lower()
            if key == "usegibbs":
                # Gibbs sampling of gamma categories deliberately not
                # carried over (dense rate categories are cheap on the
                # MXU; reference GibbsSampleGamma, src/mcmc.c:5263)
                if v.startswith("y"):
                    raise CommandError(
                        "usegibbs=yes is not supported: rate categories "
                        "are always integrated densely on the TPU")
                continue
            if key == "gibbsfreq":
                continue
            for d in targets:
                s = self.env.div_settings[d]
                if key == "nst":
                    s.nst = v
                elif key == "rates":
                    s.rates = v
                elif key == "ngammacat":
                    s.ngammacat = int(v)
                elif key == "nlnormcat":
                    s.nlnormcat = int(v)
                elif key == "nucmodel":
                    s.nucmodel = v
                elif key == "code":
                    s.code = v
                elif key == "covarion":
                    s.covarion = v.startswith("y")
                elif key == "coding":
                    s.coding = v
                elif key == "omegavar":
                    s.omegavar = v
                elif key == "parsmodel":
                    s.parsmodel = v.startswith("y")
                elif key == "nmixtcat":
                    s.nmixtcat = int(v)
                elif key == "nbetacat":
                    s.nbetacat = int(v)
                elif key == "numm10betacats":
                    s.nm10betacat = int(v)
                elif key == "numm10gammacats":
                    s.nm10gammacat = int(v)
                elif key in ("statefreqmodel", "statefrmod"):
                    if v not in ("stationary", "directional", "mixed"):
                        raise CommandError(
                            "statefreqmodel must be "
                            "stationary|directional|mixed")
                    s.statefreqmodel = v

    PRSET_KEYS = ("applyto", "statefreqpr", "revmatpr", "tratiopr",
                  "shapepr", "pinvarpr", "ratecorrpr", "covswitchpr",
                  "omegapr", "ny98omega1pr", "ny98omega3pr",
                  "codoncatfreqpr", "m3omegapr", "m10betapr", "m10gammapr",
                  "ratepr", "generatepr", "aamodelpr", "aarevmatpr",
                  "rootfreqpr",
                  "brlenspr", "topologypr", "clockvarpr", "clockratepr",
                  "treeagepr", "igrvarpr", "ilnvarpr", "tk02varpr",
                  "wnvarpr", "mixedvarpr", "cppratepr", "cppmultdevpr",
                  "speciationpr",
                  "extinctionpr", "popsizepr", "growthpr", "sampleprob",
                  "samplestrat", "fossilizationpr", "nodeagepr",
                  "popvarpr", "ploidy", "symdirihyperpr",
                  "browncorrpr", "brownscalepr")

    def do_prset(self, args, base_dir):
        pairs = self._kv_pairs(args)
        targets = self._applyto(pairs)
        for key, val in pairs:
            key = self._canon_strict(key, self.PRSET_KEYS, "prset")
            if key == "applyto" or not val:
                continue
            prior = self._parse_prior(val)
            for d in targets:
                s = self.env.div_settings[d]
                if key in ("statefreqpr",):
                    s.statefreqpr = prior
                elif key == "revmatpr":
                    s.revmatpr = prior
                elif key == "tratiopr":
                    s.tratiopr = prior
                elif key == "shapepr":
                    s.shapepr = prior
                elif key == "pinvarpr":
                    s.pinvarpr = prior
                elif key == "ratecorrpr":
                    s.adgammacorpr = prior
                elif key == "covswitchpr":
                    if prior.kind == "exp":
                        prior = Prior("exponential", prior.params)
                    s.covswitchpr = prior
                elif key == "omegapr":
                    s.omegapr = prior
                elif key == "ny98omega1pr":
                    s.ny98omega1pr = prior
                elif key == "ny98omega3pr":
                    if prior.kind == "exp":
                        prior = Prior("exponential", prior.params)
                    s.ny98omega3pr = prior
                elif key == "codoncatfreqpr":
                    s.codoncatfreqpr = prior
                elif key == "ratepr":
                    s.ratepr = ("variable" if prior.kind.startswith("var")
                                or prior.kind == "dirichlet" else "fixed")
                elif key == "generatepr":
                    s.generatepr = ("variable"
                                    if prior.kind.startswith("var")
                                    or prior.kind == "dirichlet"
                                    else "fixed")
                elif key == "symdirihyperpr":
                    # fixed(infinity) = equal frequencies (the default);
                    # fixed(b)/uniform(a,b)/exponential(r) activate the
                    # symmetric-Dirichlet machinery
                    if prior.kind == "fixed" and prior.params and \
                            isinstance(prior.params[0], str):
                        prior = Prior("fixed", (-1.0,))
                    if prior.kind == "exp":
                        prior = Prior("exponential", prior.params)
                    s.symdirihyperpr = prior
                elif key == "aamodelpr":
                    if prior.kind == "fixed" and prior.params:
                        name = str(prior.params[0]).lower()
                        valid = ("poisson", "jones", "dayhoff", "mtrev",
                                 "mtmam", "wag", "rtrev", "cprev", "vt",
                                 "blosum", "lg", "equalin", "gtr")
                        if name not in valid:
                            raise CommandError(
                                f"unknown amino-acid model '{name}' "
                                f"(valid: {', '.join(valid)})")
                        s.aamodel = name
                    s.aamodelpr = prior
                elif key == "aarevmatpr":
                    s.aarevmatpr = prior
                elif key == "rootfreqpr":
                    s.rootfreqpr = prior
                elif key == "brlenspr":
                    self._set_brlenspr(val)
                elif key == "topologypr":
                    if prior.kind == "constraints":
                        self.env.enforced_constraints = [
                            str(p).lower() for p in prior.params]
                    else:
                        self.env.enforced_constraints = []
                    if prior.kind == "speciestree":
                        self.env.tree_settings.speciestree = True
                    self.env.tree_settings.topologypr = prior
                elif key == "popvarpr":
                    self.env.tree_settings.popvarpr = prior.kind
                elif key == "ploidy":
                    self.env.tree_settings.ploidy = prior.kind
                elif key == "clockvarpr":
                    self.env.tree_settings.clockvarpr = prior.kind
                elif key == "clockratepr":
                    if prior.kind == "lognorm":
                        prior = Prior("lognormal", prior.params)
                    if prior.kind == "exp":
                        prior = Prior("exponential", prior.params)
                    self.env.tree_settings.clockratepr = prior
                elif key == "treeagepr":
                    self.env.tree_settings.treeagepr = prior
                elif key in ("igrvarpr", "ilnvarpr", "tk02varpr", "wnvarpr",
                             "mixedvarpr", "cppratepr", "cppmultdevpr"):
                    if prior.kind == "exp":
                        prior = Prior("exponential", prior.params)
                    setattr(self.env.tree_settings, key, prior)
                elif key == "speciationpr":
                    self.env.tree_settings.speciationpr = prior
                elif key == "extinctionpr":
                    self.env.tree_settings.extinctionpr = prior
                elif key == "popsizepr":
                    self.env.tree_settings.popsizepr = prior
                elif key == "growthpr":
                    self.env.tree_settings.growthpr = prior
                elif key == "sampleprob":
                    self.env.tree_settings.sampleprob = float(
                        prior.kind) if not prior.params else float(
                        prior.params[0])
                elif key == "samplestrat":
                    self.env.tree_settings.samplestrat = prior.kind
                elif key == "fossilizationpr":
                    self.env.tree_settings.fossilizationpr = prior
                elif key == "nodeagepr":
                    self.env.tree_settings.nodeagepr = prior.kind
                elif key == "browncorrpr":
                    s.browncorrpr = prior
                elif key == "brownscalepr":
                    s.brownscalepr = prior
                elif key == "m10betapr":
                    s.m10betapr = prior
                elif key == "m10gammapr":
                    s.m10gammapr = prior
                elif key == "m3omegapr":
                    # reference default: exponential order statistics
                    # (src/command.c:10819); fixed(w1,w2,w3) not wired
                    if prior.kind not in ("exponential", "exp"):
                        raise CommandError(
                            "m3omegapr supports only 'exponential' "
                            "(order-statistic prior)")

    def _set_brlenspr(self, val):
        text = "".join(val).lower()
        # unconstrained:gammadir(...) | unconstrained:exp(10) | clock:...
        if text.startswith("unconstrained"):
            self.env.tree_settings.clock = False
            sub = text.split(":", 1)[1] if ":" in text else "gammadir"
            pr = self._parse_prior([sub])
            kind = pr.kind
            if kind in ("exponential", "exp"):
                self.env.tree_settings.brlenspr = Prior(
                    "exponential", pr.params or (10.0,))
            elif kind == "uniform":
                self.env.tree_settings.brlenspr = Prior(
                    "uniform", pr.params or (1e-6, 100.0))
            elif kind == "gammadir":
                self.env.tree_settings.brlenspr = Prior(
                    "gammadir", pr.params or (1.0, 0.1, 1.0, 1.0))
            else:
                raise CommandError(f"brlenspr {text!r} not supported yet")
        elif text.startswith("clock"):
            self.env.tree_settings.clock = True
            sub = text.split(":", 1)[1] if ":" in text else "uniform"
            kind = sub.split("(")[0]
            if kind in ("uniform", "birthdeath", "coalescence",
                        "fossilization"):
                self.env.tree_settings.clockpr = kind
            elif kind in ("speciestree", "speciestreecoalescence"):
                # BEST: gene trees under the multispecies coalescent
                # inside a species tree (reference src/best.c)
                self.env.tree_settings.speciestree = True
                self.env.tree_settings.clockpr = "uniform"
            else:
                raise CommandError(f"unknown clock prior {kind!r}")

    def do_link(self, args, base_dir):
        self._link_unlink(args, link=True)

    def do_unlink(self, args, base_dir):
        self._link_unlink(args, link=False)

    def _link_unlink(self, args, link: bool):
        self.env.ensure_div_settings()
        n = self.env.n_user_divs()
        for key, val in self._kv_pairs(args):
            # abbreviation matching ("statefr" -> statefreq -> pi),
            # reference IsSame prefix semantics
            key = self._canon(key, tuple(PARAM_ALIASES))
            param = PARAM_ALIASES.get(key, key)
            inner = [t for t in val if t not in "(),"]
            if any(t.lower() == "all" for t in inner):
                targets = list(range(n))
            else:
                targets = [int(t) - 1 for t in inner if t.isdigit()]
            cur = self.env.links.get(param, [0] * n)
            cur = (cur + [0] * n)[:n]
            if link:
                for d in targets:
                    cur[d] = 0
            else:
                for d in targets:
                    cur[d] = d + 1
            self.env.links[param] = cur

    # ------------------------------------------------------------------
    def build_engine(self) -> Engine:
        env = self.env
        if env.nexus is None or env.nexus.matrix is None:
            raise CommandError("no data matrix read in")
        env.ensure_div_settings()
        matrix = env.nexus.matrix
        taxa = list(env.nexus.taxa)
        keep = np.array([i not in env.deleted for i in range(len(taxa))])
        if env.deleted:
            taxa = [t for i, t in enumerate(taxa) if keep[i]]
            matrix = replace(matrix, codes=matrix.codes[keep], taxa=taxa)
        if env.current_partition:
            subsets = env.partitions[env.current_partition]
            divisions = make_divisions(matrix, subsets,
                                       excluded=env.excluded,
                                       ctype=env.ctypes)
        else:
            divisions = make_divisions(matrix, excluded=env.excluded,
                                       ctype=env.ctypes)
        ds = DataSet(taxa=taxa, nchar=matrix.nchar,
                     divisions=divisions, charsets=env.charsets,
                     taxsets=env.taxsets)
        self._wire_dating(taxa, keep)
        self._wire_species_partition(keep)
        div_settings = [replace(env.div_settings[d.user_index])
                        for d in divisions]
        for s in div_settings:
            if s.nucmodel == "doublet":
                s.pairs = getattr(env, "pairs", ())
        links = None
        if env.links:
            links = {p: [groups[d.user_index] for d in divisions]
                     for p, groups in env.links.items()}
        for d, s in zip(divisions, div_settings):
            self.log(f"   Division {d.index + 1} ({d.name}): "
                     f"{d.npat} unique site patterns, nst={s.nst} "
                     f"rates={s.rates}")
        start_tree = None
        if env.start_tree_name:
            nm = env.start_tree_name.lower()
            if nm not in env.user_trees:
                raise CommandError(f"startvals: no user tree {nm!r}")
            if env.tree_settings.clock:
                self.log("   [startvals tau: clock starting trees not "
                         "supported yet; using a random calibrated tree]")
            else:
                from .trees import parse_newick
                start_tree = parse_newick(env.user_trees[nm], taxa)
                # user trees without lengths parse as 0; give the
                # reference's default starting length (0.1) so length
                # multipliers aren't pinned at zero
                free = np.ones(start_tree.n_nodes, bool)
                free[[0, start_tree.root]] = False
                bl = start_tree.blen
                bl[free & (bl <= 1e-9)] = 0.1
        return Engine(ds, div_settings, env.tree_settings, env.mcmc,
                      links=links, move_overrides=env.move_overrides,
                      start_tree=start_tree)

    def _wire_species_partition(self, keep: "np.ndarray"):
        """Resolve the active speciespartition into TreeSettings
        (reference: speciespartition + topologypr=speciestree enable the
        BEST machinery, src/best.c:1715)."""
        env = self.env
        ts = env.tree_settings
        if not ts.speciestree:
            return
        if not env.current_speciespartition:
            raise CommandError(
                "topologypr=speciestree requires 'speciespartition <name> "
                "= ...' and 'set speciespartition=<name>'")
        groups = env.speciespartitions[env.current_speciespartition]
        # original index -> post-delete index
        remap = np.cumsum(keep) - 1
        parts = []
        for spname, toks in groups:
            ids = self._expand_taxa(toks)
            kept = [int(remap[i]) for i in ids if keep[i]]
            if kept:
                parts.append((spname, kept))
        ts.species_partition = parts

    def _wire_dating(self, taxa: list[str], keep: "np.ndarray"):
        """Resolve calibrate/constraint declarations against the current
        (post-delete) taxon set into TreeSettings fields."""
        env = self.env
        ts = env.tree_settings
        lower = {t.lower(): i for i, t in enumerate(taxa)}
        ts.tip_calibrations = {}
        cons: list = []
        ntax = len(taxa)
        calibs = env.calibrations if ts.nodeagepr == "calibrated" else {}
        if env.calibrations and ts.nodeagepr != "calibrated":
            self.log("   [calibrations ignored: nodeagepr=unconstrained "
                     "(set prset nodeagepr=calibrated)]")
        for name, pr in calibs.items():
            if name == "root":
                cons.append(("root", np.ones(ntax, bool), pr))
            elif name in lower:
                ts.tip_calibrations[lower[name]] = pr
            elif name in env.constraints:
                pass   # attached below when the constraint is emitted
            else:
                self.log(f"   [calibrate {name}: no such taxon or "
                         "constraint in the current taxon set]")
        for name in env.enforced_constraints:
            if name == "root":
                if "root" in calibs:
                    continue   # already added above
                cons.append(("root", np.ones(ntax, bool), None))
                continue
            if name not in env.constraints:
                raise CommandError(f"constraint {name!r} not defined")
            ctype, mask, mask2 = env.constraints[name]
            mask = mask[keep]
            if ctype == "hard":
                cons.append((name, mask, calibs.get(name)))
            else:
                cons.append((name, ctype, mask,
                             None if mask2 is None else mask2[keep],
                             calibs.get(name)))
        ts.constraints = cons

    MCMC_KEYS = ("ngen", "nruns", "nchains", "temp", "samplefreq",
                 "printfreq", "diagnfreq", "swapfreq", "nswaps",
                 "burninfrac", "relburnin", "stoprule", "stopval",
                 "filename", "checkfreq", "append", "seed", "swapseed",
                 "minpartfreq", "tune", "tunefreq", "nsteps", "alpha",
                 "burninss", "reheat", "diagnstat", "mcmcdiagn",
                 "printall", "printmax", "savebrlens", "checkpoint",
                 "autotune", "ordertaxa", "data",
                 "starttree", "startingtrees", "nperts", "startparams",
                 "reweight", "allchains", "allcomps", "savetrees")

    def _set_mcmc_params(self, args):
        mc = self.env.mcmc
        for key, val in self._kv_pairs(args):
            if not val:
                continue
            key = self._canon_strict(key, self.MCMC_KEYS, "mcmc")
            v = "".join(val)
            vl = v.lower()
            if key in ("ngen", "n"):
                mc.ngen = int(float(v))
            elif key == "nruns":
                mc.nruns = int(v)
            elif key == "nchains":
                mc.nchains = int(v)
            elif key == "temp":
                mc.temp = float(v)
            elif key == "samplefreq":
                mc.samplefreq = int(v)
            elif key == "printfreq":
                mc.printfreq = int(v)
            elif key == "diagnfreq":
                mc.diagnfreq = int(v)
            elif key == "swapfreq":
                mc.swapfreq = int(v)
            elif key == "nswaps":
                mc.nswaps = int(v)
            elif key == "burninfrac":
                mc.burninfrac = float(v)
            elif key == "relburnin":
                mc.relburnin = vl.startswith("y")
            elif key == "stoprule":
                mc.stoprule = vl.startswith("y")
            elif key == "stopval":
                mc.stopval = float(v)
            elif key in ("filename", "file"):
                mc.filename = v
            elif key == "checkfreq":
                mc.checkfreq = int(v)
            elif key == "append":
                mc.append = vl.startswith("y")
            elif key == "seed":
                mc.seed = int(v)
            elif key == "swapseed":
                mc.swapseed = int(v)
            elif key == "minpartfreq":
                mc.minpartfreq = float(v)
            elif key == "tune":
                mc.tune = vl.startswith("y")
            elif key == "tunefreq":
                mc.tunefreq = int(v)
            elif key == "autotune":
                mc.tune = vl.startswith("y")
            elif key == "savebrlens":
                if not vl.startswith("y"):
                    raise CommandError(
                        "savebrlens=no not supported: .t samples always "
                        "carry branch lengths")
            elif key == "checkpoint":
                if not vl.startswith("y"):
                    mc.checkfreq = 1 << 62   # effectively off
            elif key == "data":
                # data=no: run the chain on the prior alone (reference
                # Data parameter, src/command.c; useful for checking
                # prior propriety and move mixing)
                mc.use_data = vl.startswith("y")
            elif key in ("starttree", "startingtrees"):
                # reference chainParams.startTree (src/command.c:14520);
                # "startingtrees" is the deprecated alias
                if vl not in ("random", "current", "user", "parsimony",
                              "nj"):
                    raise CommandError(
                        f"starttree={v}: expected random, current, "
                        f"user, parsimony or nj")
                mc.starttree = vl
            elif key == "nperts":
                mc.nperts = int(v)
            elif key == "startparams":
                if vl not in ("reset", "current"):
                    raise CommandError(
                        f"startparams={v}: expected reset or current")
                mc.startparams = vl
            elif key in ("reweight", "allchains", "allcomps",
                         "savetrees"):
                # reference-only diagnostics/output toggles
                # (src/command.c:14644-14695); accepted for drive-file
                # compatibility, no effect here
                self.log(f"   [mcmc {key}={v} accepted (no effect)]")
            elif key in ("diagnstat", "mcmcdiagn", "ordertaxa", "reheat",
                         "printall", "printmax", "nsteps", "alpha",
                         "burninss"):
                pass   # accepted: ss params read by do_ss; the rest are
                       # cosmetic output options in the reference

    def do_mcmcp(self, args, base_dir):
        self._set_mcmc_params(args)

    def _analysis_mesh(self):
        """Device mesh for a run: multi-process always shards; a
        single-process multi-device host shards when requested via
        MB_AUTOSHARD=1 (chains x site-patterns; reference analog: chains
        over MPI ranks, src/mcmc.c:18331, plus the site axis the
        reference never built)."""
        import jax
        if jax.device_count() <= 1:
            return None
        if jax.process_count() == 1 and not os.environ.get("MB_AUTOSHARD"):
            return None
        from .parallel.mesh import auto_mesh
        return auto_mesh(self.env.mcmc.n_chains_total)

    def do_mcmc(self, args, base_dir):
        from .mcmc.run import McmcRunner
        self._set_mcmc_params(args)
        cap = os.environ.get("MB_MAX_NGEN")   # test-harness generation cap
        if cap and self.env.mcmc.ngen > int(cap):
            self.log(f"   [MB_MAX_NGEN: ngen capped at {cap}]")
            self.env.mcmc.ngen = int(cap)
        eng = self.build_engine()
        mc = self.env.mcmc
        if eng.tree_settings.clock and (
                mc.starttree in ("random", "parsimony", "nj")
                or mc.nperts):
            self.log("   [starttree/nperts apply to non-clock trees; "
                     "clock runs keep their standard starting trees]")
        mesh = self._analysis_mesh()
        if mesh is not None and mesh.shape.get("sites", 1) > 1:
            from .parallel.mesh import shard_engine_data
            shard_engine_data(eng, mesh)
        runner = McmcRunner(eng, log=self.log, report=self.env.report,
                            mesh=mesh)
        runner.run()
        self._last_runner = runner

    def do_ss(self, args, base_dir):
        from .mcmc.steppingstone import SsRunner
        self._set_mcmc_params(args)
        nsteps, alpha, burninss = 50, 0.4, -1
        for key, val in self._kv_pairs(args):
            if key == "nsteps":
                nsteps = int(val[0])
            elif key == "alpha":
                alpha = float(val[0])
            elif key == "burninss":
                burninss = int(val[0])
        eng = self.build_engine()
        runner = SsRunner(eng, nsteps=nsteps, alpha=alpha,
                          burninss=burninss, log=self.log)
        runner.run_ss()

    def do_ssp(self, args, base_dir):
        self._set_mcmc_params(args)

    def do_sumss(self, args, base_dir):
        from .mcmc.steppingstone import sumss
        prefix = self.env.mcmc.filename
        for key, val in self._kv_pairs(args):
            if key in ("filename", "file"):
                prefix = val[0]
        sumss(prefix, log=self.log)

    def do_comparetree(self, args, base_dir):
        from .summarize.compare import comparetree
        f1 = f2 = out = None
        kv = {}
        for key, val in self._kv_pairs(args):
            key = self._canon_strict(key, self.COMPARETREE_KEYS,
                                     "comparetree")
            if key in self.COMPARETREE_NOOP:
                self.log(f"   [comparetree option '{key}' accepted but "
                         f"has no effect here (ignored)]")
                continue
            kv[key] = val
        f1 = kv.get("filename1", [None])[0]
        f2 = kv.get("filename2", [None])[0]
        out = kv.get("outputname", [None])[0]
        if not f1 or not f2:
            raise CommandError("comparetree needs filename1 and filename2")
        comparetree(f1, f2, outputname=out,
                    burninfrac=self._burnin_frac(kv), log=self.log)

    def do_compareref(self, args, base_dir):
        """compareref: running SDSF of a tree-sample file against
        reference tree samples (reference DoCompRefTree,
        src/command.c:359, src/sumpt.c:4609; hidden command)."""
        from .summarize.compare import compareref
        kv = {}
        for key, val in self._kv_pairs(args):
            key = self._canon_strict(key, self.COMPAREREF_KEYS,
                                     "compareref")
            kv[key] = val
        f1 = kv.get("filename1", [None])[0]
        f2 = kv.get("filename2", [None])[0]
        if not f1 or not f2:
            raise CommandError("compareref needs filename1 and filename2")
        out = kv.get("outputname", [f1])[0]
        nruns = int(kv.get("nruns", [self.env.mcmc.nruns])[0])
        stat = "maxstddev" if kv.get("diagnstat", ["a"])[0].lower() \
            .startswith("m") else "avgstddev"
        compareref(f1, f2, outputname=out, nruns=nruns,
                   burninfrac=self._burnin_frac(kv),
                   minpartfreq=float(kv.get("minpartfreq", [0.1])[0]),
                   stat=stat, log=self.log)

    COMPAREREF_KEYS = ("filename1", "filename2", "outputname", "burnin",
                       "burninfrac", "relburnin", "minpartfreq", "nruns",
                       "diagnstat")

    # full reference parameter surface (src/command.c Plot/Sump/Sumt
    # param tables); keys listed in *_NOOP are accepted with a visible
    # "(ignored)" note instead of erroring — they are reference-valid
    # but have no effect here
    PLOT_KEYS = ("filename", "file", "parameter", "match", "burnin",
                 "burninfrac", "relburnin")
    SUMP_KEYS = ("filename", "file", "outputname", "burnin", "burninfrac",
                 "relburnin", "nruns", "hpd", "printtofile", "plot",
                 "table", "minprob")
    SUMP_NOOP = ("table", "minprob")
    SUMT_KEYS = ("filename", "file", "outputname", "burnin", "burninfrac",
                 "relburnin", "nruns", "ntrees", "contype", "conformat",
                 "minpartfreq", "calctreeprobs", "showtreeprobs", "hpd",
                 "savebrparams", "minbrparamfreq", "ordertaxa", "table",
                 "summary", "consensus")
    SUMT_NOOP = ("showtreeprobs", "hpd", "savebrparams", "minbrparamfreq",
                 "ordertaxa", "table", "summary", "consensus")
    COMPARETREE_KEYS = ("filename1", "filename2", "outputname", "burnin",
                        "burninfrac", "relburnin", "minpartfreq")
    COMPARETREE_NOOP = ("minpartfreq",)

    def _burnin_frac(self, kv, n_hint=None):
        """Resolve relburnin/burninfrac/burnin triplet into a fraction.
        Absolute 'burnin=N' needs the sample count; callers lacking it
        treat N relative to the run's sample total at read time — here we
        approximate with ngen/samplefreq as the reference's own default
        display does."""
        rel = kv.get("relburnin")
        frac = self.env.mcmc.burninfrac
        if "burninfrac" in kv:
            frac = float(kv["burninfrac"][0])
        if "burnin" in kv and (rel is None or
                               rel[0].lower().startswith("n")):
            n = int(kv["burnin"][0])
            total = max(1, self.env.mcmc.ngen // max(
                1, self.env.mcmc.samplefreq))
            frac = min(0.99, n / total)
        return frac

    def do_plot(self, args, base_dir):
        from .summarize.compare import plot
        prefix = self.env.mcmc.filename
        param = "LnL"
        kv = {}
        for key, val in self._kv_pairs(args):
            key = self._canon_strict(key, self.PLOT_KEYS, "plot")
            kv[key] = val
        if "filename" in kv or "file" in kv:
            prefix = kv.get("filename", kv.get("file"))[0]
        if "parameter" in kv:
            param = kv["parameter"][0]
        if "match" in kv and kv["match"][0].lower() not in (
                "perfect", "consistentwith", "all"):
            raise CommandError("plot match must be "
                               "perfect|consistentwith|all")
        plot(prefix, parameter=param, burninfrac=self._burnin_frac(kv),
             log=self.log)

    def do_sump(self, args, base_dir):
        from .summarize.compare import plot as trace_plot
        from .summarize.sump import sump
        prefix = self.env.mcmc.filename
        kv = {}
        for key, val in self._kv_pairs(args):
            key = self._canon_strict(key, self.SUMP_KEYS, "sump")
            if key in self.SUMP_NOOP:
                self.log(f"   [sump option '{key}' accepted but has no "
                         f"effect here (ignored)]")
                continue
            kv[key] = val
        if "filename" in kv or "file" in kv:
            prefix = kv.get("filename", kv.get("file"))[0]
        yes = lambda v: v[0].lower().startswith("y")  # noqa: E731
        burn = self._burnin_frac(kv)
        sump(prefix, burninfrac=burn, log=self.log,
             hpd=yes(kv["hpd"]) if "hpd" in kv else True,
             write_files=(yes(kv["printtofile"])
                          if "printtofile" in kv else True),
             outputname=kv.get("outputname", [None])[0],
             nruns=int(kv["nruns"][0]) if "nruns" in kv else None)
        if "plot" in kv and yes(kv["plot"]):
            trace_plot(prefix, parameter="LnL", burninfrac=burn,
                       log=self.log)

    def do_sumt(self, args, base_dir):
        from .summarize.sumt import sumt
        prefix = self.env.mcmc.filename
        kv = {}
        for key, val in self._kv_pairs(args):
            key = self._canon_strict(key, self.SUMT_KEYS, "sumt")
            if key in self.SUMT_NOOP:
                self.log(f"   [sumt option '{key}' accepted but has no "
                         f"effect here (ignored)]")
                continue
            kv[key] = val
        if "filename" in kv or "file" in kv:
            prefix = kv.get("filename", kv.get("file"))[0]
        yes = lambda v: v[0].lower().startswith("y")  # noqa: E731
        burn = self._burnin_frac(kv)
        allcompat = ("contype" in kv
                     and "allcompat" in kv["contype"][0].lower())
        conformat = "figtree"
        if "conformat" in kv:
            cf = kv["conformat"][0].lower()
            if not ("figtree".startswith(cf) or "simple".startswith(cf)):
                raise CommandError("sumt conformat must be "
                                   "figtree|simple")
            conformat = "simple" if "simple".startswith(cf) else "figtree"
        opts = dict(
            burninfrac=burn, log=self.log, allcompat=allcompat,
            conformat=conformat,
            minpartfreq=(float(kv["minpartfreq"][0])
                         if "minpartfreq" in kv else 0.10),
            calctreeprobs=(yes(kv["calctreeprobs"])
                           if "calctreeprobs" in kv else True),
            outputname=kv.get("outputname", [None])[0],
            nruns=int(kv["nruns"][0]) if "nruns" in kv else None)
        import glob as _glob
        tree_pfx = sorted({p.rsplit(".run", 1)[0] for p in
                           _glob.glob(f"{prefix}.tree*.run*.t")})
        if "ntrees" in kv and tree_pfx \
                and int(kv["ntrees"][0]) != len(tree_pfx):
            raise CommandError(
                f"sumt ntrees={kv['ntrees'][0]} but "
                f"{len(tree_pfx)} tree parameters found")
        if tree_pfx:
            # unlinked topologies: one summary per tree parameter
            # (reference sumt loops numTrees, src/sumpt.c:4899)
            for tp in tree_pfx:
                self.log(f"   Summarizing tree parameter "
                         f"\"{tp[len(prefix) + 1:]}\"")
                topts = dict(opts)
                if topts["outputname"]:
                    topts["outputname"] += tp[len(prefix):]
                sumt(tp, **topts)
                self.log("   Consensus tree written to "
                         f"\"{(topts['outputname'] or tp)}.con.tre\"")
        else:
            sumt(prefix, **opts)
            self.log("   Consensus tree written to "
                     f"\"{(opts['outputname'] or prefix)}.con.tre\"")

    def do_showmodel(self, args, base_dir):
        self.env.ensure_div_settings()
        for i, s in enumerate(self.env.div_settings):
            self.log(f"   Division {i + 1}: nst={s.nst} rates={s.rates} "
                     f"ngammacat={s.ngammacat} statefreqpr="
                     f"{s.statefreqpr.kind}{s.statefreqpr.params}")
        ts = self.env.tree_settings
        self.log(f"   Brlens: {ts.brlenspr.kind}{ts.brlenspr.params} "
                 f"clock={ts.clock}")

    def do_showmatrix(self, args, base_dir):
        m = self.env.nexus.matrix
        self.log(f"   Matrix: {m.ntax} x {m.nchar} ({m.fmt.datatype.value})")

    def do_showmoves(self, args, base_dir):
        """List every registered move with its weight, tuning parameter
        and autotune target (reference ShowMoves via 'showmoves',
        src/command.c:271 table; our registry is Engine.moves)."""
        eng = self.build_engine()
        total = sum(m.weight for m in eng.moves)
        self.log("   Moves that will be used by the MCMC sampler:")
        self.log(f"   {'move':<22}{'rel.prob':>9}{'prob(%)':>9}"
                 f"{'tuning':>10}{'target':>8}{'autotune':>9}")
        for m in eng.moves:
            self.log(f"   {m.name:<22}{m.weight:>9.2f}"
                     f"{100.0 * m.weight / total:>9.1f}"
                     f"{m.tuning0:>10.4g}{m.target:>8.2f}"
                     f"{'yes' if m.tunable else 'no':>9}")
        self.log(f"   {len(eng.moves)} moves registered")

    def do_showparams(self, args, base_dir):
        """Dump the current model/prior settings per division plus the
        chain/run configuration (reference 'showparams' prints the Param
        table, src/command.c)."""
        self.env.ensure_div_settings()
        for i, s in enumerate(self.env.div_settings):
            self.log(f"   Division {i + 1}:")
            self.log(f"      lset: nst={s.nst} rates={s.rates} "
                     f"ngammacat={s.ngammacat} nucmodel={s.nucmodel} "
                     f"covarion={s.covarion} coding={s.coding} "
                     f"omegavar={s.omegavar} parsmodel={s.parsmodel}")
            for fld in ("statefreqpr", "revmatpr", "tratiopr", "shapepr",
                        "pinvarpr", "omegapr", "symdirihyperpr",
                        "aamodelpr"):
                pr = getattr(s, fld)
                self.log(f"      {fld} = {pr.kind}{pr.params}")
        ts = self.env.tree_settings
        self.log(f"   Tree: brlenspr={ts.brlenspr.kind}{ts.brlenspr.params}"
                 f" clock={ts.clock} clockpr={ts.clockpr} "
                 f"clockvarpr={ts.clockvarpr} "
                 f"topologypr={ts.topologypr.kind}")
        mc = self.env.mcmc
        self.log(f"   MCMC: ngen={mc.ngen} nruns={mc.nruns} "
                 f"nchains={mc.nchains} temp={mc.temp} "
                 f"samplefreq={mc.samplefreq} seed={mc.seed}")

    def do_charstat(self, args, base_dir):
        """Per-character status table (reference DoCharStat,
        src/command.c): included/excluded and datatype summary."""
        if self.env.nexus is None or self.env.nexus.matrix is None:
            raise CommandError("no data matrix read in")
        m = self.env.nexus.matrix
        n_excl = len(self.env.excluded)
        self.log(f"   Number of characters: {m.nchar}")
        self.log(f"   Included characters:  {m.nchar - n_excl}")
        self.log(f"   Excluded characters:  {n_excl}")
        by_dt: dict = {}
        for c in range(m.nchar):
            by_dt[m.col_datatype[c]] = by_dt.get(m.col_datatype[c], 0) + 1
        for dt, n in by_dt.items():
            self.log(f"      {dt.value}: {n}")
        if self.env.ctypes:
            self.log(f"   Ordered characters:   "
                     f"{sum(1 for v in self.env.ctypes.values() if v == 'ordered')}")

    def do_taxastat(self, args, base_dir):
        """Per-taxon status table (reference DoTaxaStat,
        src/command.c): deleted/included."""
        if self.env.nexus is None:
            raise CommandError("no data matrix read in")
        taxa = self.env.nexus.taxa
        self.log(f"   Number of taxa: {len(taxa)}")
        for i, t in enumerate(taxa):
            mark = "deleted" if i in self.env.deleted else "included"
            self.log(f"   {i + 1:>4}  {t:<30} {mark}")

    def do_showusertrees(self, args, base_dir):
        """List user trees read from trees blocks (reference
        DoShowUserTrees, src/command.c)."""
        if not self.env.user_trees:
            self.log("   No user trees have been defined")
            return
        for name, nwk in self.env.user_trees.items():
            short = nwk if len(nwk) < 60 else nwk[:57] + "..."
            self.log(f"   Tree \"{name}\": {short}")

    def do_databreaks(self, args, base_dir):
        """Show datatype boundaries in a mixed matrix (reference
        DoDatabreaks, src/command.c)."""
        m = self.env.nexus.matrix
        breaks = [c for c in range(1, m.nchar)
                  if m.col_datatype[c] != m.col_datatype[c - 1]]
        if breaks:
            self.log("   Data breaks after characters: "
                     + " ".join(str(b) for b in breaks))
        else:
            self.log("   No data breaks (single datatype)")

    def do_citations(self, args, base_dir):
        self.log("   Ronquist F. et al. (2012) MrBayes 3.2: efficient "
                 "Bayesian phylogenetic inference and model choice across "
                 "a large model space. Syst. Biol. 61:539-542.")
        self.log("   This reimplementation: mrbayes_tpu (JAX/XLA/Pallas "
                 "TPU-native engine with the MrBayes 3.2.8 capability "
                 "surface).")

    def do_about(self, args, base_dir):
        self.log("   mrbayes_tpu — TPU-native Bayesian phylogenetics "
                 "(MrBayes 3.2 capability set)")

    # informational commands a reference drive file may contain; they
    # must not kill the run (reference DoAcknowledgments/DoDisclaimer/
    # DoShowBeagle/DoShowMcmcTrees, src/command.c)
    def do_acknowledgments(self, args, base_dir):
        self.log("   MrBayes was originally written by John Huelsenbeck "
                 "and Fredrik Ronquist;")
        self.log("   this TPU reimplementation follows the 3.2 "
                 "capability surface.")

    def do_disclaimer(self, args, base_dir):
        self.log("   This software is distributed WITHOUT ANY WARRANTY, "
                 "express or implied.")

    def do_showbeagle(self, args, base_dir):
        self.log("   BEAGLE is not used: likelihood evaluation runs on "
                 "the built-in JAX/Pallas TPU engine (the role BEAGLE "
                 "plays in the reference).")

    def do_showmcmctrees(self, args, base_dir):
        self.log("   No MCMC trees are held between commands: chain "
                 "state lives on-device during mcmc and in the .ckp "
                 "checkpoint between runs (see 'mcmc append=yes').")

    def do_version(self, args, base_dir):
        from . import __version__
        self.log(f"   Version {__version__}")

    def do_log(self, args, base_dir):
        for key, val in self._kv_pairs(args):
            if key == "start":
                fname = val[0] if val else "log.out"
                self.env.logfile = open(fname, "a")
            elif key == "stop":
                if self.env.logfile:
                    self.env.logfile.close()
                    self.env.logfile = None
            elif key in ("filename", "file") and val:
                self.env.logfile = open(val[0], "a")

    def do_quit(self, args, base_dir):
        self.env.quit_requested = True

    def do_help(self, args, base_dir):
        """help [command] — list commands, or show one command's
        documentation (reference autogenerated help, src/command.c)."""
        if args:
            name = args[0].lower()
            handler = getattr(self, f"do_{name}", None) \
                or self._abbrev_handler(name)
            if handler is None:
                raise CommandError(f"no such command {name!r}")
            doc = handler.__doc__ or "(no documentation)"
            for line in doc.splitlines():
                self.log("   " + line.strip())
            return
        cmds = sorted(m[3:] for m in dir(self) if m.startswith("do_"))
        self.log("   Available commands: " + " ".join(cmds))
        self.log("   'help <command>' shows details; full dump: 'manual'")

    def do_manual(self, args, base_dir):
        """manual [filename] — write the full command reference to a
        text file (reference DoManual, src/command.c:4991; content here
        is each handler's documentation)."""
        fname = args[0] if args else "commref.mbtpu.txt"
        with open(fname, "w") as f:
            f.write("mrbayes_tpu command reference\n"
                    "=============================\n\n")
            for m in sorted(dir(self)):
                if not m.startswith("do_"):
                    continue
                doc = getattr(self, m).__doc__ or "(no documentation)"
                f.write(m[3:] + "\n" + "-" * len(m[3:]) + "\n")
                for line in doc.splitlines():
                    f.write(line.strip() + "\n")
                f.write("\n")
        self.log(f"   Command reference written to \"{fname}\"")


BANNER = """
                     mrbayes_tpu v{version}
      TPU-native Bayesian inference of phylogeny
      (capability set of MrBayes 3.2.8, rebuilt on JAX/XLA)
"""


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(
        prog="mrbayes_tpu",
        description="TPU-native Bayesian phylogenetics (MrBayes 3.2 "
                    "capability set)")
    parser.add_argument("files", nargs="*", help="NEXUS batch files")
    # multi-host launch (replaces the reference's mpirun,
    # src/bayes.c:176-195): run the same command on every host with
    # --nprocs N --procid <i> --coordinator host:port (or env vars
    # MB_COORDINATOR / MB_NPROCS / MB_PROCID)
    parser.add_argument("--coordinator",
                        default=os.environ.get("MB_COORDINATOR"),
                        help="host:port of process 0 (jax.distributed)")
    parser.add_argument("--nprocs", type=int,
                        default=int(os.environ.get("MB_NPROCS", 0)) or None)
    parser.add_argument("--procid", type=int,
                        default=(int(os.environ["MB_PROCID"])
                                 if "MB_PROCID" in os.environ else None))
    args = parser.parse_args(sys.argv[1:] if argv is None else argv)
    plat = os.environ.get("MB_PLATFORM")
    if plat:  # e.g. MB_PLATFORM=cpu to bypass the TPU backend
        import jax
        jax.config.update("jax_platforms", plat)
    if args.coordinator:
        from .parallel.mesh import init_distributed
        init_distributed(args.coordinator, args.nprocs, args.procid)
    import jax
    is_main = jax.process_index() == 0 if args.coordinator else True
    from . import __version__
    interp = Interpreter()
    if not is_main:
        # rank-0-gated output + host-only commands skipped (reference
        # MrBayesPrint gating, src/utils.c:1136)
        interp._log_fn = lambda msg: None
        interp._worker = True
    if is_main:
        print(BANNER.format(version=__version__))
    if args.files:
        for path in args.files:
            interp.execute_file(path)
        return 0
    # interactive REPL
    while not interp.env.quit_requested:
        try:
            line = input("mrbayes_tpu > ")
        except EOFError:
            break
        line = line.strip().rstrip(";")
        if not line:
            continue
        try:
            interp.run_line(line)
        except Exception as e:  # REPL keeps going
            print(f"   [!] {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
