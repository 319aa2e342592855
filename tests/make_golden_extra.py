"""Regenerate tests/golden_extra.json: reference-binary states for model
classes beyond the primates single-division family (kim mixed-datatype
HKY+G, partitioned+unlinked+ratepr=variable GTR+G, NY98 codon).

Runs the SCALAR reference build (/tmp/mbscalar/src/mb).  The SIMD build
must NOT be used here: its 16-state doublet likelihood is corrupt (a
tiny 4-taxon doublet case gives -8.92 from the SSE kernels vs -41.43
from the scalar kernels, where -41.43 is provably right — for equal
pi16 the nst=1 doublet model factorizes into two independent JC
positions and must equal the 4by4 lnL, which both builds agree is
-41.43).  Scalar and SIMD agree on the 4-state/20-state/61-state paths.

Usage: python tests/make_golden_extra.py
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
EXAMPLES = "/root/reference/examples"
MB = "/tmp/mbscalar/src/mb"

KIM_CMDS = [
    f"execute {EXAMPLES}/kim.nex",
    "lset applyto=(1,2) nst=2 rates=gamma",
    "lset applyto=(3) rates=gamma",
    "lset applyto=(4) rates=gamma",
    "prset applyto=(3) statefreqpr=fixed(equal)",
]
PART_CMDS = [
    f"execute {EXAMPLES}/primates.nex",
    "charset first_second = 1-898\\3 2-898\\3",
    "charset third = 3-898\\3",
    "partition bycodon = 2: first_second, third",
    "set partition = bycodon",
    "lset applyto=(all) nst=6 rates=gamma",
    "unlink statefreq=(all) revmat=(all) shape=(all)",
    "prset applyto=(all) ratepr=variable",
]
NY98_CMDS = [
    f"execute {EXAMPLES}/replicase.nex",
    "lset nucmodel=codon omegavar=ny98",
]
M10_CMDS = [
    f"execute {EXAMPLES}/replicase.nex",
    "lset nucmodel=codon omegavar=m10",
]
COV_CMDS = [
    f"execute {EXAMPLES}/primates.nex",
    "lset nst=2 covarion=yes",
]
DBL_CMDS = [
    f"execute {EXAMPLES}/kim.nex",
    "set partition=by_gene_and_struct",
    "lset applyto=(1) nucmodel=doublet nst=6",
    "prset applyto=(2,4) statefreqpr=fixed(equal)",
    "prset applyto=(3,5,6) statefreqpr=fixed(equal)",
]

AAGTR_CMDS = [
    f"execute {EXAMPLES}/kim.nex",
    "prset applyto=(1,2) statefreqpr=fixed(equal)",
    "prset applyto=(3) aamodelpr=fixed(gtr)",
]
# directional/mixed state-frequency model (restriction data only; the
# reference binary accepts the model via 'lset statefrmod=...' — its
# prset has no reachable rootfreqpr key, so the default Dirichlet(1,1)
# root prior applies on both sides)
DIRFREQ_CMDS = [
    "execute /root/repo/tests/data/restriction.nex",
    "lset coding=noabsencesites",
    "lset statefrmod=directional",
    "prset statefreqpr=dirichlet(1,1)",
]
MIXFREQ_CMDS = [
    "execute /root/repo/tests/data/restriction.nex",
    "lset coding=noabsencesites",
    "lset statefrmod=mixed",
    "prset statefreqpr=dirichlet(1,1)",
]

# hymfossil total-evidence composition: FBD clock + sampled ancestors +
# dated fossil tips + morphology (coding=variable, ordered chars) +
# 7 partitions, everything unlinked with per-partition rate multipliers
# (the example's own tutorial tiers, examples/hymfossil.nex:1213-1285;
# FBD prior reference src/mcmc.c:8763, ProcessStdChars src/model.c:16435)
_HYM_CALIBRATE = (
    "calibrate Triassoxyela=fixed(235) Asioxyela=fixed(235) "
    "Nigrimonticola=fixed(157) Gigantoxyelinae=fixed(135) "
    "Spathoxyela=fixed(135) Xyela_mesozoica=fixed(135) "
    "Angaridyela=fixed(135) Xyelotoma=fixed(157) Undatoma=fixed(148) "
    "Dahuratoma=fixed(134) Mesolyda=fixed(157) Turgidontes=fixed(134) "
    "Aulidontes=fixed(157) Protosirex=fixed(157) Aulisca=fixed(157) "
    "Anaxyela=fixed(157) Syntexyela=fixed(157) Karatavites=fixed(157) "
    "Stephanogaster=fixed(157) Leptephialtites=fixed(157) "
    "Cleistogaster=fixed(179) Sepulca=fixed(157) Onochoius=fixed(135) "
    "Ghilarella=fixed(119) Paroryssus=fixed(157) Praeoryssus=fixed(157) "
    "Mesorussus=fixed(97) Trematothorax=fixed(135) "
    "Thoracotrema=fixed(119) Prosyntexis=fixed(83) "
    "Kulbastavia=fixed(157) Brachysyntexis=fixed(157) "
    "Symphytopterus=fixed(157) Eoxyela=fixed(179) Liadoxyela=fixed(179) "
    "Abrotoxyela=fixed(164) Pseudoxyelocerus=fixed(182) "
    "Palaeathalia=fixed(135) Ferganolyda=fixed(179) "
    "PamphiliidaeUndesc=fixed(164) Rudisiricius=fixed(164) "
    "Sogutia=fixed(187) Xyelula=fixed(182) Brigittepterus=fixed(182) "
    "Grimmaratavites=fixed(182)")

HYMFBD_CMDS = [
    f"execute {EXAMPLES}/hymfossil.nex",
    "charset MV = 1-236", "charset MS = 237-353",
    "charset 12S = 354-556", "charset 16S = 557-778",
    "charset 18S = 779-1669", "charset 28S = 1670-2221",
    "charset CO1 = 2222-3265",
    "charset CO1_12 = 2222-3265\\3 2223-3265\\3",
    "charset CO1_3 = 2224-3265\\3",
    "charset Ef1aF2 = 3266-4357",
    "charset Ef1aF2_12 = 3266-4357\\3 3267-4357\\3",
    "charset Ef1aF2_3 = 3268-4357\\3",
    "charset Ef1aF1 = 4358-5449",
    "charset Ef1aF1_12 = 4358-5449\\3 4359-5449\\3",
    "charset Ef1aF1_3 = 4360-5449\\3",
    "charset morph_ordered = 20 23 27 30 35 36 41 42 44 46 48 59 65 75 "
    "78 79 89 99 112 117 134 146 157 159 171 185 191 192 193 196 218 "
    "228 229 230 237 263 266 288 296 299 304 343 347 349",
    "charset morph_excluded = 96 136 212 216 217 218 219 220",
    "charset morph_constant = 277 331",
    "ctype ordered: morph_ordered",
    "exclude morph_excluded morph_constant",
    "partition without_CO1_3 = 7: MV MS, 12S 16S, 18S, 28S, "
    "CO1_12 CO1_3, Ef1aF1_12 Ef1aF2_12, Ef1aF1_3 Ef1aF2_3",
    "exclude CO1_3",
    "set partition = without_CO1_3",
    "lset applyto=(1) coding=variable rates=gamma",
    "lset applyto=(2,3,4,5,6,7) nst=6 rates=gamma",
    "prset applyto=(4) statefreqpr=fixed(equal)",
    "unlink statefreq=(all) revmat=(all) shape=(all)",
    "prset applyto=(all) ratepr=variable",
    _HYM_CALIBRATE,
    "prset brlenspr=clock:fossilization",
    "prset speciationpr=exp(20)",
    "prset extinctionpr=beta(1,1)",
    "prset fossilizationpr=beta(1,1)",
    "prset sampleprob=0.0005",
    "prset nodeagepr=calibrated",
    "prset clockratepr=lognorm(-7.1,0.5)",
]

REVS = ("A<->C", "A<->G", "A<->T", "C<->G", "C<->T", "G<->T")
AA = "ARNDCQEGHILKMFPSTWYV"
AA3 = ("Ala", "Arg", "Asn", "Asp", "Cys", "Gln", "Glu", "Gly", "His",
       "Ile", "Leu", "Lys", "Met", "Phe", "Pro", "Ser", "Thr", "Trp",
       "Tyr", "Val")
AA_PAIRS = [f"{AA[i]}<->{AA[j]}" for i in range(20)
            for j in range(i + 1, 20)]


def kim_state(row, eng):
    st = {}
    st["tratio"] = [float(row["kappa{1,2}"])]
    g = eng.div_cfg[0].pi_group
    pi = [[0.0] * 4 for _ in range(eng.n_groups["pi"])]
    pi[g] = [float(row[f"pi({b}){{1,2}}"]) for b in "ACGT"]
    st["pi"] = pi
    shape = [1.0] * eng.n_groups["shape"]
    shape[eng.div_cfg[0].shape_group] = float(row["alpha{1,2}"])
    prot = next(i for i, c in enumerate(eng.div_cfg)
                if c.div.dtype.value == "protein")
    shape[eng.div_cfg[prot].shape_group] = float(row["alpha{3}"])
    stdd = next(i for i, c in enumerate(eng.div_cfg)
                if c.div.dtype.value == "standard")
    shape[eng.div_cfg[stdd].shape_group] = float(row["alpha{4}"])
    st["shape"] = shape
    return st


def part_state(row, eng):
    st = {"revmat": [[0.0] * 6, [0.0] * 6], "pi": [[0.0] * 4, [0.0] * 4],
          "shape": [1.0, 1.0], "ratemult": [0.0, 0.0]}
    for i, cfg in enumerate(eng.div_cfg):
        d = i + 1
        st["revmat"][cfg.revmat_group] = [
            float(row[f"r({r}){{{d}}}"]) for r in REVS]
        st["pi"][cfg.pi_group] = [
            float(row[f"pi({b}){{{d}}}"]) for b in "ACGT"]
        st["shape"][cfg.shape_group] = float(row[f"alpha{{{d}}}"])
        st["ratemult"][i] = float(row[f"m{{{d}}}"]) \
            * float(eng.div_char_frac[i])
    return st


def ny98_state(row, eng):
    from mrbayes_tpu.models.codes import BASES
    code = eng.div_cfg[0].codon
    names = ["".join(BASES[b] for b in code.bases[k])
             for k in range(code.n_states)]
    return {
        "omega1": [float(row["omega(-)"])],
        "omega3": [float(row["omega(+)"])],
        "omegaprobs": [[float(row["pi(-)"]), float(row["pi(N)"]),
                        float(row["pi(+)"])]],
        "pi61": [[float(row[f"pi({n})"]) for n in names]],
    }


def m10_state(row, eng):
    from mrbayes_tpu.models.codes import BASES
    code = eng.div_cfg[0].codon
    names = ["".join(BASES[b] for b in code.bases[k])
             for k in range(code.n_states)]
    st = {
        "m10beta": [[float(row["beta(alpha)"]), float(row["beta(beta)"])]],
        "m10gamma": [[float(row["gamma(alpha)"]),
                      float(row["gamma(beta)"])]],
        "m10catprobs": [[float(row["pi(1)"]), float(row["pi(2)"])]],
        "pi61": [[float(row[f"pi({n})"]) for n in names]],
    }
    # also record the reference's per-class omegas for the
    # discretization cross-check
    st["_ref_omegas"] = [float(row[f"omega({k})"]) for k in range(1, 9)]
    return st


def cov_state(row, eng):
    # engine state shapes: tratio [n_groups], pi [n_groups, 4],
    # covswitch [n_groups, 2]
    return {
        "tratio": [float(row["kappa"])],
        "pi": [[float(row[f"pi({b})"]) for b in "ACGT"]],
        "covswitch": [[float(row["s(off->on)"]),
                       float(row["s(on->off)"])]],
    }


def dbl_state(row, eng):
    # reference doublet state labels A/B/C/D = A/C/G/T, row-major
    # (first base x second base) — same order as our pi16 layout
    DL = "ABCD"
    names = [a + b for a in DL for b in DL]
    return {
        "revmat": [[float(row[f"r({r}){{1}}"]) for r in REVS]],
        "pi16": [[float(row[f"pi({n}){{1}}"]) for n in names]],
    }


def aagtr_state(row, eng):
    # protein GTR on kim division 3: sampled pi20 + 190 exchangeabilities
    return {
        "aarevmat": [[float(row[f"r({p}){{3}}"]) for p in AA_PAIRS]],
        "pi20": [[float(row[f"pi({a}){{3}}"]) for a in AA3]],
    }


def dirfreq_state(row, eng):
    st = {
        "pi2": [[float(row["pi(0)"]), float(row["pi(1)"])]],
        "rootpi2": [[0.5, 0.5]],
    }
    r0 = float(row["rootpi(0)"])
    if r0 > -1000:
        st["rootpi2"] = [[r0, float(row["rootpi(1)"])]]
    if "statefrmod" in row:
        st["dirpi_on"] = [int(float(row["statefrmod"]))]
    return st


def hymfbd_state(row, eng, tree):
    """Map a reference FBD total-evidence sample into engine state.

    Substitution-model params come from the .p columns per USER
    partition (engine divisions map back via div.user_index; the
    morphology buckets all share partition 1's alpha/m).  The clock tree
    state is baked directly: node ages are root-relative depths of the
    sampled newick, and the clockrate is resolved empirically — the
    reference prints clock trees in substitution-unit lengths, in which
    case ages are in those units and clockrate must be 1.0, else the
    printed lengths are time units and the sampled clockrate applies
    (main() verifies the row's lnL at generation time, so a units
    mismatch cannot land in the fixture silently)."""
    import numpy as np
    nrev = eng.n_groups.get("revmat", 0)
    npi = eng.n_groups.get("pi", 0)
    nsh = eng.n_groups.get("shape", 0)
    rev = [[1.0 / 6] * 6 for _ in range(nrev)]
    pi = [[0.25] * 4 for _ in range(npi)]
    shape = [1.0] * nsh
    ratemult = [0.0] * eng.n_div
    for i, cfg in enumerate(eng.div_cfg):
        d = cfg.div.user_index + 1
        if cfg.revmat_group >= 0 and f"r(A<->C){{{d}}}" in row:
            rev[cfg.revmat_group] = [float(row[f"r({r}){{{d}}}"])
                                     for r in REVS]
        if cfg.pi_group >= 0 and f"pi(A){{{d}}}" in row:
            pi[cfg.pi_group] = [float(row[f"pi({b}){{{d}}}"])
                                for b in "ACGT"]
        if cfg.shape_group >= 0 and f"alpha{{{d}}}" in row:
            shape[cfg.shape_group] = float(row[f"alpha{{{d}}}"])
        ratemult[i] = float(row[f"m{{{d}}}"]) \
            * float(eng.div_char_frac[i])
    n_nodes = tree.n_nodes
    depth = np.zeros(n_nodes)
    order = list(tree.postorder())[::-1]
    for v in order:
        for c in (tree.left[v], tree.right[v]):
            if c >= 0:
                depth[c] = depth[v] + tree.blen[c]
    age = (depth.max() - depth).tolist()
    st = {"revmat": rev, "pi": pi, "shape": shape, "ratemult": ratemult,
          "age": age, "sa": [0] * eng.n_tips,
          "clockrate": [float(row["clockrate{all}"])]}
    return st


CONFIGS = [
    ("kim_hky_g_mixed4", KIM_CMDS, kim_state, 200, 100, 0.6),
    ("primates_part2_unlinked_gtr_g", PART_CMDS, part_state, 200, 100,
     0.6),
    ("replicase_ny98", NY98_CMDS, ny98_state, 60, 30, 1.0),
    ("replicase_m10", M10_CMDS, m10_state, 40, 20, 1.5),
    ("primates_covarion_hky", COV_CMDS, cov_state, 60, 30, 1.0),
    ("kim_stems_doublet_gtr", DBL_CMDS, dbl_state, 60, 30, 1.0),
    ("kim_protein_gtr", AAGTR_CMDS, aagtr_state, 60, 30, 1.0),
    ("restriction_directional", DIRFREQ_CMDS, dirfreq_state, 60, 30, 0.3),
    ("restriction_mixedfreq", MIXFREQ_CMDS, dirfreq_state, 60, 30, 0.3),
    ("hymfossil_fbd_totev", HYMFBD_CMDS, hymfbd_state, 60, 30, 3.0),
]


def ref_drive(cmds, ngen, freq, prefix):
    body = "\n    ".join(c.replace(EXAMPLES + "/", "") + ";"
                         for c in cmds)
    return (f"#NEXUS\nbegin mrbayes;\n"
            f"    set autoclose=yes nowarnings=yes seed=31 swapseed=32;\n"
            f"    {body}\n"
            f"    mcmc ngen={ngen} nruns=1 nchains=1 samplefreq={freq} "
            f"printfreq={freq} file={prefix};\nend;\n")


def main():
    from mrbayes_tpu.cli import Interpreter
    out = []
    for name, cmds, mapper, ngen, freq, tol in CONFIGS:
        with tempfile.TemporaryDirectory() as td:
            for c in cmds:
                if c.startswith("execute"):
                    import shutil
                    shutil.copy(c.split()[-1], td)
            path = os.path.join(td, "drive.nex")
            with open(path, "w") as f:
                f.write(ref_drive(cmds, ngen, freq, name))
            r = subprocess.run([MB, path], cwd=td, capture_output=True,
                               text=True, timeout=1200)
            assert "Analysis completed" in r.stdout, r.stdout[-2000:]
            plines = open(os.path.join(td, name + ".p")).readlines()
            hdr = plines[1].rstrip("\n").split("\t")
            tlines = [ln for ln in
                      open(os.path.join(td, name + ".t"))
                      if "tree gen." in ln]
            it = Interpreter(log=lambda m: None)
            for c in cmds:
                it.run_line(c, base_dir=".")
            eng = it.build_engine()
            for gi, pline in enumerate(plines[2:]):
                row = dict(zip(hdr, pline.rstrip("\n").split("\t")))
                rooted = "[&R]" in tlines[gi]
                import re
                # strip ALL bracket comments ([&U]/[&R] rooting tags and
                # clock-tree annotations like [&clockrate=...])
                nwk = re.sub(r"\[[^\]]*\]", "",
                             tlines[gi].split("=", 1)[1]).strip()
                if mapper.__code__.co_argcount == 3:
                    # clock composition: the mapper bakes the tree state
                    # (ages); verify the row NOW, resolving the printed
                    # tree's units (substitution vs time) empirically
                    import jax.numpy as jnp

                    from mrbayes_tpu.trees import parse_newick
                    t = parse_newick(nwk, eng.data.taxa, rooted=rooted)
                    state = mapper(row, eng, t)

                    def eval_lnl(st_dict):
                        st = {"left": jnp.asarray(t.left),
                              "right": jnp.asarray(t.right),
                              "parent": jnp.asarray(t.parent),
                              "blen": jnp.asarray(t.blen, jnp.float32)}
                        for k, v in st_dict.items():
                            dt = jnp.int32 if k == "sa" else jnp.float32
                            st[k] = jnp.asarray(v, dt)
                        return float(eng.log_likelihood(st))

                    want = float(row["lnLike"])
                    if abs(eval_lnl(state) - want) > tol:
                        alt = dict(state, clockrate=[1.0])
                        got = eval_lnl(alt)
                        assert abs(got - want) <= tol, (
                            name, row["Gen"], got, want,
                            "neither time-unit nor substitution-unit "
                            "tree interpretation matches")
                        state = alt
                else:
                    state = mapper(row, eng)
                out.append({
                    "name": name, "commands": cmds, "gen": int(row["Gen"]),
                    "newick": nwk, "rooted": rooted,
                    "lnL": float(row["lnLike"]),
                    "state": state, "tol": tol})
            print(f"{name}: {len(plines) - 2} rows")
    with open(os.path.join(HERE, "golden_extra.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
