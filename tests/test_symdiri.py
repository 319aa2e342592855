"""symdirihyperpr: symmetric-Dirichlet state frequencies for standard
data — beta-category mixture for binary characters (reference BetaBreaks
fill, src/model.c:12290), sampled frequency vectors for multistate
characters, and a sampled beta hyperparameter (SYMPI_UNI/EXP paramIds).
"""
import os

import jax.numpy as jnp
import numpy as np

NEX = """
#NEXUS
begin data;
  dimensions ntax=6 nchar=30;
  format datatype=standard symbols="012";
  matrix
    a 010010110100101101001011010010
    b 110011010010110100101101001100
    c 010110100101101001011010010110
    d 011010010112101001211010020110
    e 010010110100101101021011010010
    f 112011010210110100101101001100
  ;
end;
begin mrbayes;
  set autoclose=yes nowarn=yes;
  {cmds}
end;
"""


def _engine(tmp_path, cmds):
    from mrbayes_tpu.cli import Interpreter
    nex = tmp_path / "s.nex"
    nex.write_text(NEX.format(cmds=cmds))
    it = Interpreter(log=lambda m: None)
    it.execute_file(str(nex))
    return it.build_engine()


def test_symdiri_off_by_default(tmp_path):
    eng = _engine(tmp_path, "lset coding=variable;")
    assert all(c.symbeta_group < 0 and c.sympi_group < 0
               and c.fixed_symbeta <= 0 for c in eng.div_cfg)


def test_symdiri_binary_one_cat_equals_mk(tmp_path):
    """With nbetacat=1 the single beta category sits at the Beta(b,b)
    median = 1/2, so the mixture reduces exactly to the uniform Mk
    model."""
    e1 = _engine(tmp_path, "lset nbetacat=1;"
                 "prset symdirihyperpr=fixed(2.0);")
    e0 = _engine(tmp_path, "")
    s1, _ = e1.init_chains()
    s0, _ = e0.init_chains()
    assert abs(float(s1["lnL"][0]) - float(s0["lnL"][0])) < 1e-2


def test_symdiri_binary_mixture_and_multistate(tmp_path):
    eng = _engine(tmp_path, "lset nbetacat=4;"
                  "prset symdirihyperpr=fixed(1.5);")
    # two buckets: binary chars (beta mixture) and 3-state (sampled pi)
    has_binary = any(c.fixed_symbeta > 0 and c.div.n_states == 2
                     for c in eng.div_cfg)
    has_multi = any(c.sympi_group >= 0 and c.div.n_states == 3
                    for c in eng.div_cfg)
    assert has_binary and has_multi
    states, bk = eng.init_chains()
    assert "sympi3" in states
    # at the uniform starting pi the multistate likelihood equals Mk,
    # so the total only differs through the binary beta mixture
    assert np.isfinite(float(states["lnL"][0]))
    states, bk = eng.run_block(states, bk, 300)
    assert np.isfinite(np.asarray(states["lnL"])).all()
    pi3 = np.asarray(states["sympi3"][0, 0])
    assert abs(pi3.sum() - 1.0) < 1e-5
    assert pi3.std() > 1e-6        # sampled away from uniform


def test_symdiri_sampled_beta(tmp_path):
    eng = _engine(tmp_path, "prset symdirihyperpr=exponential(1.0);")
    assert any(m.name == "symbeta_mult" for m in eng.moves)
    states, bk = eng.init_chains()
    assert "symbeta" in states
    lp0 = float(states["lnP"][0])
    assert np.isfinite(lp0)
    states, bk = eng.run_block(states, bk, 300)
    assert np.isfinite(np.asarray(states["lnL"])).all()
    assert abs(float(states["symbeta"][0, 0]) - 1.0) > 1e-6


def test_symdiri_binary_oracle(tmp_path):
    """Beta-mixture lnL equals the average of per-category F81 binary
    likelihoods computed through the generic path."""
    from mrbayes_tpu.models.special import beta_category_freqs
    from mrbayes_tpu.models.substitution import binary_q
    from mrbayes_tpu.ops.pruning import division_loglik
    from mrbayes_tpu.ops.tiprobs import eigh_reversible
    # coding=all pins off the Mkv correction (since the datatype default
    # became variable, matching the reference) so the oracle below can
    # combine plain per-category site likelihoods
    eng = _engine(tmp_path, "lset nbetacat=3 coding=all;"
                  "prset symdirihyperpr=fixed(0.8);")
    states, _ = eng.init_chains()
    i = next(k for k, c in enumerate(eng.div_cfg)
             if c.div.n_states == 2 and c.fixed_symbeta > 0)
    cfg = eng.div_cfg[i]
    st = {k: states[k][0] for k in ("left", "right", "parent", "blen")}
    got = float(eng._division_lnL(st, i, st["blen"]))
    q = np.asarray(beta_category_freqs(jnp.float32(0.8), 3))
    per_cat = []
    for qb in q:
        pi = jnp.asarray([qb, 1.0 - qb])
        lam, U, V = eigh_reversible(binary_q(pi), pi)
        ln = division_loglik(
            st["left"], st["right"], st["parent"], st["blen"],
            eng.tip_partials[i], eng.weights[i], lam, U, V, pi,
            jnp.ones((1,)), 0.0, None, eng.n_tips, coding="all")
        per_cat.append(float(ln))
    # mixture over categories is an average of site likelihoods, not of
    # division lnLs — recompute per-site to combine
    from mrbayes_tpu.ops.pruning import division_site_loglik
    site_ls = []
    for qb in q:
        pi = jnp.asarray([qb, 1.0 - qb])
        lam, U, V = eigh_reversible(binary_q(pi), pi)
        ls = division_site_loglik(
            st["left"], st["right"], st["parent"], st["blen"],
            eng.tip_partials[i], lam, U, V, pi,
            jnp.ones((1,)), 0.0, None, eng.n_tips)
        site_ls.append(np.asarray(ls, np.float64))
    want = float(np.sum(np.asarray(eng.weights[i])
                        * np.log(np.mean(np.exp(site_ls), axis=0))))
    assert abs(got - want) < 1e-2, (got, want)
