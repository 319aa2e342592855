"""Strict command-surface behavior: unknown commands/keys error instead
of silently dropping (reference rejects bad input: FindValidCommand /
"Invalid argument", src/command.c), informational commands (showmoves,
showparams, charstat, taxastat), and .trprobs tree rendering
(reference TreeProb, src/sumpt.c:8579-8692)."""
import pytest

from mrbayes_tpu.cli import CommandError, Interpreter
from conftest import example

PRIMATES = example("primates.nex")


@pytest.fixture()
def it():
    lines = []
    interp = Interpreter(log=lines.append)
    interp.lines = lines
    interp.run_line(f"execute {PRIMATES}")
    return interp


def test_unknown_command_raises(it):
    with pytest.raises(CommandError):
        it.run_line("frobnicate all=yes")


def test_typo_prset_raises(it):
    with pytest.raises(CommandError):
        it.run_line("prset statefreqqr=dirichlet(1,1,1,1)")


def test_typo_lset_raises(it):
    with pytest.raises(CommandError):
        it.run_line("lset nstt=6")


def test_typo_mcmc_key_raises(it):
    with pytest.raises(CommandError):
        it.run_line("mcmcp ngenn=100")


def test_typo_set_raises(it):
    with pytest.raises(CommandError):
        it.run_line("set seedd=5")


def test_usegibbs_yes_rejected(it):
    with pytest.raises(CommandError):
        it.run_line("lset rates=gamma usegibbs=yes")
    # the default (no) is accepted silently
    it.run_line("lset rates=gamma usegibbs=no")


def test_ctype_irreversible_rejected(it):
    # parity: the reference errors too ("Irreversible model not yet
    # supported", src/model.c:16529)
    with pytest.raises(CommandError):
        it.run_line("ctype irreversible: 1-10")


def test_abbreviated_keys_still_work(it):
    it.run_line("lset ns=6 rat=invgamma")
    s = it.env.div_settings[0]
    assert s.nst == "6" and s.rates == "invgamma"


def test_showmoves_lists_registry(it):
    it.run_line("lset nst=6 rates=invgamma")
    it.run_line("showmoves")
    text = "\n".join(it.lines)
    assert "ext_spr" in text or "ExtSPR" in text
    assert "moves registered" in text
    # weights and targets present in the table
    assert any("rel.prob" in ln for ln in it.lines)


def test_showparams_dumps_settings(it):
    it.run_line("lset nst=6 rates=invgamma")
    it.run_line("showparams")
    text = "\n".join(it.lines)
    assert "nst=6" in text and "rates=invgamma" in text
    assert "shapepr" in text and "MCMC:" in text


def test_charstat_taxastat(it):
    it.run_line("charstat")
    it.run_line("taxastat")
    text = "\n".join(it.lines)
    assert "Number of characters: 898" in text
    assert "Number of taxa: 12" in text


def test_informational_misc(it):
    it.run_line("databreaks")
    it.run_line("citations")
    it.run_line("showusertrees")
    assert any("MrBayes 3.2" in ln for ln in it.lines)


# ---------------------------------------------------------------- trprobs

T_FILE = """#NEXUS
begin trees;
   translate
       1 a,
       2 b,
       3 c,
       4 d,
       5 e;
   tree gen.0 = [&U] (1:0.1,(2:0.1,(3:0.1,(4:0.1,5:0.1):0.1):0.1):0.1);
   tree gen.1 = [&U] (1:0.1,(2:0.1,(3:0.1,(4:0.1,5:0.1):0.1):0.1):0.1);
   tree gen.2 = [&U] (1:0.1,(3:0.1,(2:0.1,(4:0.1,5:0.1):0.1):0.1):0.1);
   tree gen.3 = [&U] (1:0.1,(2:0.1,(3:0.1,(4:0.1,5:0.1):0.1):0.1):0.1);
end;
"""


def test_trprobs_contains_trees(tmp_path):
    from mrbayes_tpu.summarize.sumt import sumt
    from mrbayes_tpu.trees import parse_newick
    p = tmp_path / "x.run1.t"
    p.write_text(T_FILE)
    sumt(str(tmp_path / "x"), burninfrac=0.0, log=lambda m: None)
    text = (tmp_path / "x.trprobs").read_text()
    assert "begin trees;" in text and "translate" in text
    tree_lines = [ln for ln in text.splitlines()
                  if ln.strip().startswith("tree tree_")]
    assert len(tree_lines) == 2          # two unique topologies
    # most probable topology first, with p = 3/4
    assert "[p = 0.750" in tree_lines[0]
    assert "[&W 0.750000]" in tree_lines[0]
    # the Newick must parse back with our own parser and group (4,5)
    nwk = tree_lines[0].split("]")[-1].strip().rstrip(";")
    t = parse_newick(nwk + ";", ["a", "b", "c", "d", "e"])
    from mrbayes_tpu.mcmc.diagnostics import splits_of_tree
    splits = splits_of_tree(t)
    assert frozenset({3, 4}) in splits


def test_help_and_manual(it, tmp_path):
    it.run_line("help lset")
    it.run_line(f"manual {tmp_path}/ref.txt")
    text = (tmp_path / "ref.txt").read_text()
    assert "prset" in text and "mcmc" in text
    assert any("help" in ln for ln in it.lines)


def test_prior_only_sampling(it, tmp_path):
    """mcmc data=no samples the prior: lnLike column is 0 and branch
    lengths follow the prior, not the data."""
    prefix = str(tmp_path / "prior")
    it.run_line("lset nst=1 rates=equal")
    it.run_line(f"mcmc data=no ngen=200 nruns=1 nchains=1 samplefreq=50 "
                f"printfreq=200 diagnfreq=200 file={prefix}")
    lines = open(prefix + ".run1.p").readlines()
    hdr = lines[1].rstrip("\n").split("\t")
    for ln in lines[2:]:
        row = dict(zip(hdr, ln.rstrip("\n").split("\t")))
        assert float(row["lnLike"]) == 0.0


def test_unknown_aamodel_rejected():
    """aamodelpr=fixed(<bad name>) must be a hard error, never a silent
    Poisson fallback (protein GTR gap fixed in round 4)."""
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {example('kim.nex')}")
    with pytest.raises(CommandError):
        it.run_line("prset applyto=(3) aamodelpr=fixed(gtrx)")
    # the real model names and gtr are accepted
    it.run_line("prset applyto=(3) aamodelpr=fixed(gtr)")
    it.run_line("prset applyto=(3) aamodelpr=fixed(wag)")


def test_propset_uncarried_reference_move_rejected():
    """The reference's zero-default-weight move types (ExtSS, LSPR,
    ParsEraser1, ...) are intentionally uncarried; propset on them must
    error with the documented rationale, not a generic unknown-name
    message (COVERAGE.md round-5)."""
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {PRIMATES}")
    it.run_line("propset extss$prob=10")
    with pytest.raises(Exception, match="default weight 0"):
        it.build_engine()
