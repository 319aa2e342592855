import glob
import os

import numpy as np
import pytest

from mrbayes_tpu.data import make_divisions, parse_char_range
from mrbayes_tpu.nexus.datatypes import DataType
from mrbayes_tpu.nexus.parser import read_nexus_file

from conftest import REF_EXAMPLES as EX, ref_testing


def test_primates_matrix(primates):
    m = primates.matrix
    assert m.ntax == 12 and m.nchar == 898
    assert m.taxa[0] == "Tarsius_syrichta"
    assert m.taxa[-1] == "Saimiri_sciureus"
    # first three sites of first taxon: A A G
    assert list(m.codes[0, :3]) == [1, 1, 4]
    # gap coded as full ambiguity
    assert np.any(m.codes == 15)


@pytest.mark.parametrize("name", [
    "primates.nex", "kim.nex", "finch.nex", "hym.nex",
    "replicase.nex", "avian_ovomucoids.nex", "cynmix.nex", "hymfossil.nex",
])
def test_parse_all_examples(name):
    nf = read_nexus_file(os.path.join(EX, name))
    assert nf.matrix is not None
    assert nf.matrix.ntax == len(nf.matrix.taxa)
    assert nf.matrix.codes.shape == (nf.matrix.ntax, nf.matrix.nchar)
    assert np.all(nf.matrix.codes > 0)  # every cell coded


def test_parse_command_only_file():
    # codon.nex carries no matrix; it executes replicase.nex
    nf = read_nexus_file(os.path.join(EX, "codon.nex"))
    assert nf.matrix is None
    assert any(c[0].lower() == "execute" for c in nf.commands)


def test_mixed_datatype():
    nf = read_nexus_file(os.path.join(EX, "hymfossil.nex"))
    dts = set(nf.matrix.col_datatype)
    assert DataType.STANDARD in dts and DataType.DNA in dts


def test_char_ranges():
    assert parse_char_range(["1-5"], 10) == [0, 1, 2, 3, 4]
    assert parse_char_range(["7", "-", "."], 10) == [6, 7, 8, 9]
    assert parse_char_range(["1-.\\3"], 9) == [0, 3, 6]
    assert parse_char_range(["2", "5-6"], 10) == [1, 4, 5]


def test_divisions_compression(primates):
    divs = make_divisions(primates.matrix)
    assert len(divs) == 1
    d = divs[0]
    assert d.n_states == 4
    assert d.weights.sum() == 898
    assert d.npat < 898
    # reconstruction: pattern_of_char maps back to original columns
    recon = d.patterns[:, d.pattern_of_char]
    assert np.array_equal(recon, primates.matrix.codes)


def test_partitioned_divisions(primates):
    cols1 = parse_char_range(["1-400"], 898)
    cols2 = parse_char_range(["401-."], 898)
    divs = make_divisions(primates.matrix, [cols1, cols2], ["d1", "d2"])
    assert len(divs) == 2
    assert divs[0].weights.sum() == 400
    assert divs[1].weights.sum() == 498


def test_tip_partials(primates):
    d = make_divisions(primates.matrix)[0]
    tp = d.tip_partials()
    assert tp.shape == (12, d.npat, 4)
    assert np.all(tp.sum(-1) >= 1)


def test_mrbayes_block_commands():
    nf = read_nexus_file(ref_testing("test1.nex"))
    cmds = [c[0].lower() for c in nf.commands]
    assert "execute" in cmds and "mcmc" in cmds and "sumt" in cmds
