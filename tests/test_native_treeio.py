"""The native .t parser (native/treeio.cpp) must reproduce the pure-
Python sumt summarization exactly — same split frequencies, branch-length
moments, topology counts, consensus string."""
import importlib
import os

import numpy as np
import pytest

import mrbayes_tpu.native as native
from mrbayes_tpu.trees import random_clock_tree, random_unrooted, to_newick


def _write_t(path, trees, taxa, rooted=False):
    with open(path, "w") as f:
        f.write("#NEXUS\n[ID: 0000000001]\nbegin trees;\n   translate\n")
        for i, nm in enumerate(taxa):
            sep = "," if i < len(taxa) - 1 else ";"
            f.write(f"       {i + 1} {nm}{sep}\n")
        for g, t in enumerate(trees):
            tag = "&R" if rooted else "&U"
            f.write(f"   tree gen.{g * 100} = [{tag}] "
                    + to_newick(t, numbers=True) + "\n")
        f.write("end;\n")


def _summaries(tmp_path, rooted):
    from mrbayes_tpu.summarize.sumt import sumt
    n = 9
    taxa = [f"tax{i}" for i in range(n)]
    rng = np.random.default_rng(5)
    for r in (1, 2):
        trees = []
        for _ in range(40):
            if rooted:
                t, _ages = random_clock_tree(n, rng)
            else:
                t = random_unrooted(n, rng, 0.1)
            trees.append(t)
        _write_t(tmp_path / f"x.run{r}.t", trees, taxa, rooted)
    prefix = str(tmp_path / "x")
    if native.lib() is None:
        pytest.skip("native treeio unavailable")
    fast = sumt(prefix, burninfrac=0.25, log=lambda m: None,
                write_files=False)
    os.environ["MB_TPU_NO_NATIVE"] = "1"
    native._TRIED, native._LIB = False, None
    try:
        slow = sumt(prefix, burninfrac=0.25, log=lambda m: None,
                    write_files=False)
    finally:
        del os.environ["MB_TPU_NO_NATIVE"]
        native._TRIED, native._LIB = False, None
    return fast, slow


@pytest.mark.parametrize("rooted", [False, True])
def test_native_matches_python(tmp_path, rooted):
    fast, slow = _summaries(tmp_path, rooted)
    assert fast["n_splits"] == slow["n_splits"]
    assert abs(fast["asdsf"] - slow["asdsf"]) < 1e-12, \
        (fast["asdsf"], slow["asdsf"])
    assert set(fast["split_freqs"]) == set(slow["split_freqs"])
    for k, v in slow["split_freqs"].items():
        assert abs(fast["split_freqs"][k] - v) < 1e-12
    assert fast["consensus"] == slow["consensus"]
    tf, tsl = fast["summary"], slow["summary"]
    assert set(tf.blen_count) == set(tsl.blen_count)
    for k in tsl.blen_count:
        assert tf.blen_count[k] == tsl.blen_count[k], k
        assert abs(tf.blen_sum[k] - tsl.blen_sum[k]) < 1e-9
    assert (sorted(tf.topo_counts.values())
            == sorted(tsl.topo_counts.values()))
