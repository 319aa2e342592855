"""Benchmark: MCMC generations/sec on primates.nex GTR+I+G (BASELINE.json
config 1), 1 run x 4 Metropolis-coupled chains, single chip.

Baseline: reference MrBayes 3.2.8 (`/root/reference` built -O3, no SSE
flags beyond defaults) on the same model/config: 20000 generations in
3.89 s CPU = 5141 gens/sec (measured on this machine, 2026-08-17;
see BASELINE.md).  vs_baseline > 1 means faster than the reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import sys
import time

REF_GENS_PER_SEC_4CH = 5141.0   # reference CPU, 4 chains (measured)
REF_GENS_PER_SEC_32CH = 643.0   # reference CPU scales ~1/nchains (serial)


def main():
    import jax
    # persistent compile cache (CPU-feature-keyed dir; see
    # mrbayes_tpu._cache_dir): first invocation pays the (tunnel)
    # compile, later invocations start in seconds
    from mrbayes_tpu import _cache_dir
    jax.config.update("jax_compilation_cache_dir", _cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from mrbayes_tpu.data import DataSet, make_divisions
    from mrbayes_tpu.mcmc.engine import Engine
    from mrbayes_tpu.mcmc.settings import DivisionSettings, McmcSettings
    from mrbayes_tpu.nexus.parser import read_nexus_file

    nf = read_nexus_file("/root/reference/examples/primates.nex")
    ds = DataSet(taxa=nf.taxa, nchar=nf.matrix.nchar,
                 divisions=make_divisions(nf.matrix))

    def measure(nchains: int, block: int = 500, blocks: int = 6) -> float:
        eng = Engine(ds, [DivisionSettings(nst="6", rates="invgamma")],
                     mcmc=McmcSettings(nruns=1, nchains=nchains, seed=3))
        states, bk = eng.init_chains()
        states, bk = eng.run_block(states, bk, block)   # compile + warmup
        states["lnL"].block_until_ready()
        t0 = time.time()
        for _ in range(blocks):
            states, bk = eng.run_block(states, bk, block)
        states["lnL"].block_until_ready()
        rate = block * blocks / (time.time() - t0)
        # sanity: chains must have moved toward the posterior
        assert float(np.max(np.asarray(states["lnL"]))) > -8500.0
        return rate

    r4 = measure(4)
    r32 = measure(32)
    print(json.dumps({
        "metric": "mcmc_generations_per_sec_primates_gtr_ig_4chains",
        "value": round(r4, 1),
        "unit": "gens/sec",
        "vs_baseline": round(r4 / REF_GENS_PER_SEC_4CH, 3),
        "chains32_gens_per_sec": round(r32, 1),
        "chains32_vs_baseline": round(r32 / REF_GENS_PER_SEC_32CH, 3),
    }))
    return 0


EXAMPLES = "/root/reference/examples"

# BASELINE.json configs 2-5 (the headline primates config is `main`).
# Each entry: (name, setup commands executed through the NEXUS front
# end, runs, chains, lnL floor for the post-warmup sanity check).
# hymfossil's documented model (its in-file mrbayes block is commented
# out); morphology + 6 DNA subsets, DNA under nst=mixed rjMCMC
HYMFOSSIL_SETUP = [
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
    "lset applyto=(2,3,5,6,7) nst=mixed rates=gamma",
    "lset applyto=(4) nst=mixed rates=gamma",
    "prset applyto=(4) statefreqpr=fixed(equal)",
    "unlink statefreq=(all) revmat=(all) shape=(all)",
    "prset applyto=(all) ratepr=variable",
]

ALL_CONFIGS = [
    ("kim_gtr_ig",
     [f"execute {EXAMPLES}/kim.nex", "lset nst=6 rates=invgamma"],
     1, 4, None),
    ("finch_gtr_ig",
     [f"execute {EXAMPLES}/finch.nex", "lset nst=6 rates=invgamma"],
     1, 4, None),
    ("codon_m0_61state",
     [f"execute {EXAMPLES}/replicase.nex", "lset nucmodel=codon"],
     1, 4, None),
    ("codon_ny98_61state",
     [f"execute {EXAMPLES}/replicase.nex",
      "lset nucmodel=codon omegavar=ny98"],
     1, 4, None),
    ("hymfossil_rjmcmc_partitioned",
     [f"execute {EXAMPLES}/hymfossil.nex"] + HYMFOSSIL_SETUP,
     1, 4, None),
    ("avian_2x32_chains",
     [f"execute {EXAMPLES}/avian_ovomucoids.nex",
      "lset nst=6 rates=invgamma"],
     2, 32, None),
]


def bench_all():
    """Measure BASELINE.json configs 2-5; one JSON line per config plus
    a BENCH_ALL.json artifact.  lnl_evals_per_sec = gens/s x chains (one
    full-tree likelihood recompute per chain per generation — unlike the
    reference, which skips untouched subtrees)."""
    import time as _time

    import numpy as np

    from mrbayes_tpu.cli import Interpreter
    from mrbayes_tpu.mcmc.settings import McmcSettings

    results = []
    for name, setup, nruns, nchains, floor in ALL_CONFIGS:
        it = Interpreter(log=lambda m: None)
        for cmd in setup:
            it.run_line(cmd, base_dir=".")
        it.env.mcmc = McmcSettings(nruns=nruns, nchains=nchains, seed=3,
                                   ngen=1000)
        eng = it.build_engine()
        states, bk = eng.init_chains()
        block = 100
        states, bk = eng.run_block(states, bk, block)   # compile+warmup
        states["lnL"].block_until_ready()
        t0 = _time.time()
        blocks = 5
        for _ in range(blocks):
            states, bk = eng.run_block(states, bk, block)
        states["lnL"].block_until_ready()
        dt = _time.time() - t0
        rate = block * blocks / dt
        patterns = sum(d.npat for d in eng.data.divisions)
        rec = {
            "config": name,
            "gens_per_sec": round(rate, 1),
            "chains": nruns * nchains,
            "lnl_evals_per_sec": round(rate * nruns * nchains, 1),
            "taxa": eng.n_tips,
            "site_patterns": patterns,
            "pallas": all(p is not None for p in eng._pruners),
            "best_lnl": float(np.max(np.asarray(states["lnL"]))),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    with open("BENCH_ALL.json", "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(bench_all() if "--all" in sys.argv else main())
