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

    def one(name, setup, nruns, nchains):
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
        return {
            "config": name,
            "gens_per_sec": round(rate, 1),
            "chains": nruns * nchains,
            "lnl_evals_per_sec": round(rate * nruns * nchains, 1),
            "taxa": eng.n_tips,
            "site_patterns": patterns,
            "pallas": all(p is not None for p in eng._pruners),
            "best_lnl": float(np.max(np.asarray(states["lnL"]))),
        }

    results = []
    for name, setup, nruns, nchains, floor in ALL_CONFIGS:
        import jax as _jax
        try:
            rec = one(name, setup, nruns, nchains)
        except Exception as e:       # transient tunnel/compile flake:
            print(json.dumps({"config": name,
                              "retrying_after": repr(e)[:200]}),
                  flush=True)
            _time.sleep(20)
            rec = one(name, setup, nruns, nchains)
        results.append(rec)
        print(json.dumps(rec), flush=True)
        with open("BENCH_ALL.json", "w") as f:
            json.dump(results, f, indent=1)   # incremental: crash-safe
    return 0


REF_MB = "/tmp/mbbuild/src/mb"

# NEXUS mrbayes-block bodies equivalent to ALL_CONFIGS, for timing the
# reference binary (1 run x 4 chains unless noted).  hymfossil uses the
# same model commands as HYMFOSSIL_SETUP.
REF_CONFIGS = {
    "kim_gtr_ig": ("kim.nex", ["lset nst=6 rates=invgamma"], 1, 4, 2000),
    "finch_gtr_ig": ("finch.nex", ["lset nst=6 rates=invgamma"],
                     1, 4, 4000),
    "codon_m0_61state": ("replicase.nex", ["lset nucmodel=codon"],
                         1, 4, 200),
    "codon_ny98_61state": ("replicase.nex",
                           ["lset nucmodel=codon omegavar=ny98"],
                           1, 4, 200),
    "hymfossil_rjmcmc_partitioned": ("hymfossil.nex", HYMFOSSIL_SETUP,
                                     1, 4, 500),
    "avian_2x32_chains": ("avian_ovomucoids.nex",
                          ["lset nst=6 rates=invgamma"], 2, 32, 500),
}


def bench_reference():
    """Time the reference binary (SIMD -O3 build) on the same configs;
    merge ref_gens_per_sec + vs_baseline into BENCH_ALL.json.  Startup
    cost is removed by subtracting an ngen=2 run."""
    import os
    import shutil
    import subprocess
    import tempfile
    import time as _time

    results = {}
    for name, (data, setup, nruns, nchains, ngen) in REF_CONFIGS.items():
        with tempfile.TemporaryDirectory() as td:
            shutil.copy(os.path.join(EXAMPLES, data), td)
            times = {}
            for tag, n in (("warm", 2), ("full", ngen)):
                body = "\n    ".join(s + ";" for s in setup)
                nex = (f"#NEXUS\nbegin mrbayes;\n"
                       f"    set autoclose=yes nowarnings=yes seed=7 "
                       f"swapseed=9;\n    execute {data};\n    {body}\n"
                       f"    mcmc ngen={n} nruns={nruns} "
                       f"nchains={nchains} samplefreq={max(n, 100)} "
                       f"printfreq={max(n, 100)} diagnfreq={max(n, 100)} "
                       f"checkfreq=1000000 file=bref_{tag};\nend;\n")
                path = os.path.join(td, f"b_{tag}.nex")
                with open(path, "w") as f:
                    f.write(nex)
                t0 = _time.time()
                r = subprocess.run([REF_MB, path], cwd=td,
                                   capture_output=True, text=True,
                                   timeout=3000)
                times[tag] = _time.time() - t0
                if "Analysis completed" not in r.stdout:
                    print(json.dumps({"config": name, "error":
                                      r.stdout[-500:]}), flush=True)
                    times = None
                    break
            if times is None:
                continue
            dt = max(times["full"] - times["warm"], 1e-9)
            rate = (ngen - 2) / dt
            results[name] = round(rate, 1)
            print(json.dumps({"config": name,
                              "ref_gens_per_sec": round(rate, 1),
                              "seconds": round(dt, 2)}), flush=True)
    if os.path.exists("BENCH_ALL.json"):
        recs = json.load(open("BENCH_ALL.json"))
        for rec in recs:
            if rec["config"] in results:
                ref = results[rec["config"]]
                rec["ref_gens_per_sec"] = ref
                rec["vs_baseline"] = round(rec["gens_per_sec"] / ref, 3)
        with open("BENCH_ALL.json", "w") as f:
            json.dump(recs, f, indent=1)
    return 0


def bench_large(nsites: int = 100_000, mode: str = "ours"):
    """Long-alignment scaling (the site axis SURVEY §5 calls the
    long-context analog): synthetic 12-taxon alignment with 80%
    shared-column structure, GTR+G, 1 run x 4 chains.

    Measured 2026-08-21 (12 x 100k sites = 23,673 unique patterns):
    ours 1,696 gens/s on one v5e chip vs reference 64-bit -O3 SIMD at
    65 gens/s = 26x.  Patterns ride the Pallas lane axis, so 57x the
    primates pattern count costs only ~3.5x the generation time."""
    import tempfile
    import time as _time

    import numpy as np
    rng = np.random.default_rng(7)
    NTAX = 12
    base = rng.integers(0, 4, size=nsites)
    M = np.where(rng.random((NTAX, nsites)) < 0.8, base[None, :],
                 rng.integers(0, 4, size=(NTAX, nsites)))
    rows = ["".join("ACGT"[b] for b in M[i]) for i in range(NTAX)]
    td = tempfile.mkdtemp()
    nex = ["#NEXUS", "begin data;",
           f"  dimensions ntax={NTAX} nchar={nsites};",
           "  format datatype=dna gap=- missing=? interleave=yes;",
           "  matrix"]
    W = 10000
    for off in range(0, nsites, W):
        for i, r in enumerate(rows):
            nex.append(f"  t{i:<8} {r[off:off + W]}")
        nex.append("")
    nex += ["  ;", "end;"]
    with open(f"{td}/big.nex", "w") as f:
        f.write("\n".join(nex) + "\n")
    if mode == "ref":
        import subprocess
        out = {}
        for tag, n in (("warm", 2), ("full", 200)):
            with open(f"{td}/d.nex", "w") as f:
                f.write(f"""#NEXUS
begin mrbayes;
    set autoclose=yes nowarnings=yes seed=7 swapseed=9;
    execute big.nex;
    lset nst=6 rates=gamma;
    mcmc ngen={n} nruns=1 nchains=4 samplefreq={n} printfreq={n}
         diagnfreq={n} checkfreq=1000000 file=big_{tag};
end;
""")
            t0 = _time.time()
            r = subprocess.run([REF_MB, f"{td}/d.nex"], cwd=td,
                               capture_output=True, text=True,
                               timeout=3000)
            assert "Analysis completed" in r.stdout, r.stdout[-400:]
            out[tag] = _time.time() - t0
        rate = 198 / max(out["full"] - out["warm"], 1e-9)
        print(json.dumps({"metric": f"large_{nsites}sites_ref",
                          "gens_per_sec": round(rate, 1)}))
        return 0
    import jax
    from mrbayes_tpu import _cache_dir
    jax.config.update("jax_compilation_cache_dir", _cache_dir())
    from mrbayes_tpu.data import DataSet, make_divisions
    from mrbayes_tpu.mcmc.engine import Engine
    from mrbayes_tpu.mcmc.settings import DivisionSettings, McmcSettings
    from mrbayes_tpu.nexus.parser import read_nexus_file
    nf = read_nexus_file(f"{td}/big.nex")
    ds = DataSet(taxa=nf.taxa, nchar=nf.matrix.nchar,
                 divisions=make_divisions(nf.matrix))
    eng = Engine(ds, [DivisionSettings(nst="6", rates="gamma")],
                 mcmc=McmcSettings(nruns=1, nchains=4, seed=3))
    states, bk = eng.init_chains()
    states, bk = eng.run_block(states, bk, 100)
    states["lnL"].block_until_ready()
    t0 = _time.time()
    for _ in range(3):
        states, bk = eng.run_block(states, bk, 100)
    states["lnL"].block_until_ready()
    rate = 300 / (_time.time() - t0)
    print(json.dumps({"metric": f"large_{nsites}sites",
                      "gens_per_sec": round(rate, 1),
                      "site_patterns": int(ds.divisions[0].npat),
                      "pallas": eng._pruners[0] is not None}))
    return 0


V5E_PEAK_BF16 = 197e12      # public TPU v5e spec
V5E_HBM_BW = 819e9          # bytes/sec, public spec


def bench_roofline():
    """Isolated likelihood-evaluation throughput + roofline placement of
    the Pallas pruning kernel (the BASELINE.json headline metric:
    site-pattern lnL evals/sec/chip).

    Model flops per eval per chain (pruning only): each internal node
    does two [KSp,KSp]x[KSp,Ppad] matmuls = 2 * n_int * 2 * KSp^2 * Ppad
    (ops/pruning_pallas.py cost_estimate).  Fraction-of-peak is quoted
    against the v5e bf16 MXU peak (197 TFLOP/s); the kernel runs fp32,
    whose MXU rate is lower, so the bf16 fraction is a lower bound on
    utilization.  Also reports the arithmetic intensity and the
    bandwidth-roofline bound."""
    import time as _time

    import jax
    import numpy as np

    from mrbayes_tpu import _cache_dir
    jax.config.update("jax_compilation_cache_dir", _cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from mrbayes_tpu.cli import Interpreter
    from mrbayes_tpu.mcmc.settings import McmcSettings

    configs = [
        ("primates_gtr_ig_4ch",
         [f"execute {EXAMPLES}/primates.nex", "lset nst=6 rates=invgamma"],
         4),
        ("primates_gtr_ig_32ch",
         [f"execute {EXAMPLES}/primates.nex", "lset nst=6 rates=invgamma"],
         32),
        ("codon_ny98_61state_4ch",
         [f"execute {EXAMPLES}/replicase.nex",
          "lset nucmodel=codon omegavar=ny98"], 4),
    ]
    results = []
    for name, setup, nchains in configs:
        it = Interpreter(log=lambda m: None)
        for cmd in setup:
            it.run_line(cmd, base_dir=".")
        it.env.mcmc = McmcSettings(nruns=1, nchains=nchains, seed=3,
                                   ngen=100)
        eng = it.build_engine()
        states, bk = eng.init_chains()
        st = {k: v for k, v in states.items() if k not in ("lnL", "lnP")}
        # measure inside ONE device dispatch (lax.scan over evals):
        # per-call jit dispatch over the tunnel is ~1 ms and would
        # otherwise dominate these sub-ms kernels
        import jax.numpy as jnp
        iters = 200
        f = jax.jit(lambda: jax.lax.scan(
            lambda c, _: (c + jnp.sum(jax.vmap(eng.log_likelihood)(st)),
                          None), 0.0, None, length=iters)[0])
        f().block_until_ready()             # compile
        t0 = _time.time()
        f().block_until_ready()
        dt = (_time.time() - t0) / iters
        C = nchains
        flops = 0
        bytes_acc = 0
        for i, cfg in enumerate(eng.div_cfg):
            pr = eng._pruners[i]
            if pr is None:
                continue
            n_int = pr.n_tips - 1
            flops += 2 * C * n_int * 2 * pr.KSp ** 2 * pr.Ppad
            bytes_acc += C * (n_int * 2 * pr.KSp ** 2
                              + 2 * pr.KSp * pr.Ppad) * 4
        achieved = flops / dt
        intensity = flops / max(bytes_acc, 1)
        bw_bound = intensity * V5E_HBM_BW
        rec = {
            "config": name,
            "lnl_evals_per_sec_per_chip": round(C / dt, 1),
            "eval_ms": round(dt * 1e3, 3),
            "model_gflops_per_eval": round(flops / C / 1e9, 4),
            "achieved_gflops": round(achieved / 1e9, 1),
            "fraction_of_bf16_peak": round(achieved / V5E_PEAK_BF16, 5),
            "arithmetic_intensity_flops_per_byte": round(intensity, 1),
            "bandwidth_roofline_gflops": round(bw_bound / 1e9, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    with open("ROOFLINE.json", "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    if "--reference" in sys.argv:
        sys.exit(bench_reference())
    if "--roofline" in sys.argv:
        sys.exit(bench_roofline())
    if "--large" in sys.argv:
        sys.exit(bench_large(
            mode="ref" if "--ref" in sys.argv else "ours"))
    sys.exit(bench_all() if "--all" in sys.argv else main())
