"""Mixing evidence for the dedicated BEST species-tree move and the
clock move tail: ESS/generation with and without the new moves.

Not a pytest (MCMC ESS comparisons are too noisy for CI); run manually:

    python tests/mixing_report.py best    # finch.nex speciesTreeHeight
    python tests/mixing_report.py clock   # primates clock:uniform TH

Results are recorded in BASELINE.md (mixing notes section).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("MB_TPU_NO_CACHE", "1")

import jax  # noqa: E402

if os.environ.get("MB_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def ess(x: np.ndarray) -> float:
    """Autocorrelation-time ESS (reference EstimatedSampleSize,
    src/utils.c:1423)."""
    x = np.asarray(x, float)
    n = len(x)
    if n < 10 or np.var(x) == 0:
        return float(n)
    c = np.correlate(x - x.mean(), x - x.mean(), "full")[n - 1:]
    c = c / c[0]
    s = 0.0
    for k in range(1, n):
        if c[k] < 0.05:
            break
        s += c[k]
    return float(n / (1.0 + 2.0 * s))


def run_case(tag: str, cmds: list[str], ngen: int, column: str,
             disable: list[str]):
    from mrbayes_tpu.cli import Interpreter
    from mrbayes_tpu.mcmc.run import McmcRunner
    from mrbayes_tpu.mcmc.settings import McmcSettings
    out = {}
    for label, off in (("with", []), ("without", disable)):
        it = Interpreter(log=lambda m: None)
        for c in cmds:
            it.run_line(c, base_dir=".")
        for mv in off:
            it.run_line(f"propset {mv}$prob=0")
        it.env.mcmc = McmcSettings(nruns=1, nchains=1, seed=7, ngen=ngen,
                                   samplefreq=20, printfreq=ngen,
                                   diagnfreq=ngen, checkfreq=1 << 40,
                                   filename=f"/tmp/mix_{tag}_{label}")
        eng = it.build_engine()
        runner = McmcRunner(eng, log=lambda m: None)
        runner.run()
        rows = runner.param_samples[0]
        burn = len(rows) // 4
        series = [r[column] for r in rows[burn:]]
        out[label] = ess(np.asarray(series))
        print(f"{tag} {label:8s}: ESS({column}) = {out[label]:8.1f} over "
              f"{ngen} gens = {out[label] / ngen * 1000:.2f} ESS/kgen",
              flush=True)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "best"
    ex = "/root/reference/examples"
    if which == "best":
        cmds = [f"execute {ex}/finch.nex"]
        run_case("best", cmds, 12000, "speciesTreeHeight",
                 disable=["sp_distmatrix"])
    else:
        cmds = [f"execute {ex}/primates.nex",
                "lset nst=2 rates=gamma",
                "prset brlenspr=clock:uniform"]
        run_case("clock", cmds, 8000, "TH",
                 disable=["subtree_swap_clock", "node_slider_clock"])


if __name__ == "__main__":
    main()
