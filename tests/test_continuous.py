"""Continuous (Brownian-motion) characters: PIC/REML likelihood
(ops/brownian.py) against a dense multivariate-normal oracle, plus the
end-to-end CLI path.

The reference declares the capability (datatype=continuous,
brownscalepr/browncorrpr priors, src/command.c:14605) but its
Likelihood_Cont is an empty stub returning 0 (src/likelihood.c:7554
"//chi TODO"), so there is no reference value to golden against — the
oracle is the REML density computed from the full phylogenetic
variance-covariance matrix: contrasts Y = D x with D the (n-1) x n
contrast operator; equivalently the density of the mean-centered GLS
residuals.  We check against the standard REML formula
  lnL = -0.5 [ (n-1) log(2 pi sigma^2) + log det(V)/... ]
computed numerically via the marginal likelihood of differences from
taxon 0."""
import numpy as np
import pytest

import jax.numpy as jnp

from mrbayes_tpu.ops.brownian import pic_logpdf
from mrbayes_tpu.trees import parse_newick

TAXA = ["a", "b", "c", "d", "e"]
NWK = "((a:0.3,b:0.2):0.15,(c:0.25,(d:0.1,e:0.4):0.3):0.2);"


def _vcv(t, n):
    """Phylogenetic variance-covariance matrix from shared path lengths
    to the root of the rooted-at-tip-0 layout."""
    depth = np.zeros(t.n_nodes)
    anc = [[] for _ in range(t.n_nodes)]
    order = list(reversed([t.root] + [v for v in reversed(range(t.n_nodes))
                                      if v != t.root]))
    # walk down from root accumulating path lengths
    V = np.zeros((n, n))

    def ancestors(v):
        out = []
        while v != t.root:
            out.append(v)
            v = t.parent[v]
        return out

    for i in range(n):
        for j in range(n):
            ai = set(ancestors(i))
            aj = set(ancestors(j))
            shared = ai & aj
            V[i, j] = sum(t.blen[v] for v in shared)
    return V


def _mvn_reml(x, V, sigma2):
    """REML log-density: likelihood of the contrasts x_i - x_0 under the
    induced MVN (root-state-free)."""
    n = len(x)
    D = np.zeros((n - 1, n))
    D[:, 0] = -1.0
    for i in range(n - 1):
        D[i, i + 1] = 1.0
    W = D @ V @ D.T * sigma2
    y = D @ x
    sign, logdet = np.linalg.slogdet(W)
    return float(-0.5 * ((n - 1) * np.log(2 * np.pi) + logdet
                         + y @ np.linalg.solve(W, y)))


@pytest.mark.parametrize("sigma2", [1.0, 0.37, 4.2])
def test_pic_matches_mvn_oracle(sigma2):
    t = parse_newick(NWK, TAXA)
    rng = np.random.default_rng(5)
    X = rng.normal(size=(5, 3))
    V = _vcv(t, 5)
    ours = float(pic_logpdf(
        jnp.asarray(t.left), jnp.asarray(t.right), jnp.asarray(t.parent),
        jnp.asarray(t.blen, jnp.float32), jnp.asarray(X, jnp.float32),
        jnp.float32(sigma2), 5))
    oracle = sum(_mvn_reml(X[:, c], V, sigma2) for c in range(3))
    assert abs(ours - oracle) < 1e-3, (ours, oracle)


CONT_NEX = """#NEXUS
begin data;
  dimensions ntax=5 nchar=4;
  format datatype=continuous missing=?;
  matrix
  a  0.12  1.4  -0.3  2.2
  b  0.18  1.1  -0.2  2.0
  c  0.50  0.9   0.4  1.1
  d  0.55  0.8   0.6  1.0
  e  0.60  0.7   0.5  0.9
  ;
end;
"""


def test_continuous_end_to_end(tmp_path):
    """Full CLI run on a continuous matrix: sigma^2 sampled (brownScale
    column), topology moves mix, posterior groups the similar taxa."""
    from mrbayes_tpu.cli import Interpreter
    (tmp_path / "cont.nex").write_text(CONT_NEX)
    prefix = str(tmp_path / "cont_out")
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {tmp_path}/cont.nex")
    it.run_line("prset brownscalepr=gamma(1,10)")
    it.run_line(f"mcmc ngen=500 nruns=1 nchains=2 samplefreq=50 "
                f"printfreq=500 diagnfreq=500 file={prefix}")
    lines = open(prefix + ".run1.p").readlines()
    hdr = lines[1].rstrip("\n").split("\t")
    assert "brownScale" in hdr
    rows = [dict(zip(hdr, ln.split("\t"))) for ln in lines[2:]]
    sig = [float(r["brownScale"]) for r in rows]
    assert all(s > 0 for s in sig)
    assert len(set(f"{s:.6f}" for s in sig)) > 1   # actually sampled
    lnl = [float(r["lnLike"]) for r in rows]
    assert all(np.isfinite(lnl))
    # a,b and d,e are similar pairs; check the (a,b) split is sampled
    from mrbayes_tpu.summarize.sumt import sumt
    res = sumt(prefix, burninfrac=0.3, log=lambda m: None,
               write_files=False)
    assert frozenset({3, 4}) in res["split_freqs"] \
        or frozenset({1, 2}) in res["split_freqs"]


def test_missing_continuous_rejected(tmp_path):
    from mrbayes_tpu.cli import Interpreter
    bad = CONT_NEX.replace("0.12", "?   ")
    (tmp_path / "bad.nex").write_text(bad)
    it = Interpreter(log=lambda m: None)
    it.run_line(f"execute {tmp_path}/bad.nex")
    with pytest.raises(Exception, match="missing continuous"):
        it.run_line("mcmc ngen=10 nruns=1 nchains=1")
