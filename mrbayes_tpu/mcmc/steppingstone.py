"""Steppingstone sampling: marginal-likelihood estimation via power
posteriors (Xie et al. 2011; reference DoSs src/mcmc.c:4057, step ladder
from Beta(alpha,1) quantiles src/mcmc.c:16325-16430).

The chain samples p(D|theta)^beta p(theta) for a descending ladder
beta_0=1 > beta_1 > ... > beta_K=0 with beta_k = ((K-k)/K)^(1/alpha);
each step k contributes log E_{beta_k}[ exp((beta_{k-1}-beta_k) lnL) ]
estimated from the cold chain's samples; the sum estimates the log
marginal likelihood.
"""
from __future__ import annotations

import numpy as np

from .engine import Engine
from .run import McmcRunner


def beta_ladder(nsteps: int, alpha: float = 0.4) -> np.ndarray:
    """beta_0..beta_K descending from 1.0 to 0.0."""
    k = np.arange(nsteps + 1)
    return ((nsteps - k) / nsteps) ** (1.0 / alpha)


class SsRunner(McmcRunner):
    """Runs the steppingstone analysis and writes the .ss file
    (reference format: per-step mean power-posterior contributions)."""

    def __init__(self, engine: Engine, nsteps: int = 50, alpha: float = 0.4,
                 burninss: int = -1, **kw):
        super().__init__(engine, **kw)
        self.nsteps = nsteps
        self.alpha = alpha
        self.burninss = burninss  # <0: |burninss| steps' worth of burnin

    def _ss_extra(self, lnZ, step, samples):
        """SS accumulators for the checkpoint (the reference stores its
        SS state in the .ckp too: stepScalerSS/marginalLnLSS etc.,
        src/mcmc.c:11253-11282)."""
        n_in_step = len(samples[0]) if samples else 0
        pad = np.full((self.mc.nruns, max(1, n_in_step)), np.nan)
        for r in range(min(self.mc.nruns, len(samples))):
            pad[r, :len(samples[r])] = samples[r]
        return {"lnZ": np.asarray(lnZ, np.float64),
                "step": np.asarray([step], np.int64),
                "n_in_step": np.asarray([n_in_step], np.int64),
                "samples": pad}

    def run_ss(self):
        import os

        import jax.numpy as jnp
        mc = self.mc
        eng = self.eng
        betas = beta_ladder(self.nsteps, self.alpha)
        gens_per_step = max(mc.samplefreq,
                            (mc.ngen // self.nsteps)
                            // mc.samplefreq * mc.samplefreq)
        n_samples = max(1, gens_per_step // mc.samplefreq)
        burn_gens = gens_per_step * abs(self.burninss) \
            if self.burninss != 0 else 0
        lnZ = np.zeros(mc.nruns)
        gen = 0
        start_step, start_sample = 1, 0
        resume_samples = None
        resumed = False
        if mc.append and os.path.exists(f"{self.prefix}.ckp"):
            states, bk, gen = self.read_checkpoint()
            ex = getattr(self, "_ckp_extra", {})
            if "lnZ" in ex:
                lnZ = np.asarray(ex["lnZ"], np.float64).reshape(mc.nruns)
                start_step = int(np.asarray(ex["step"]).reshape(-1)[0])
                start_sample = int(
                    np.asarray(ex["n_in_step"]).reshape(-1)[0])
                pad = np.asarray(ex.get("samples", np.zeros((mc.nruns, 0))))
                resume_samples = [
                    [float(x) for x in pad[r][:start_sample]
                     if np.isfinite(x)] for r in range(mc.nruns)]
                resumed = True
                self.log(f"   Resuming steppingstone at step "
                         f"{start_step}/{self.nsteps} (sample "
                         f"{start_sample}/{n_samples}), generation {gen}")
            else:
                self.log("   Checkpoint has no steppingstone state; "
                         "restarting the ladder from step 1")
        if not resumed:
            states, bk = eng.init_chains()
            gen = 0
        self._open_files(append=resumed, start_gen=gen)
        # .ss rows for completed steps survive a resume
        old_rows = []
        if resumed and os.path.exists(f"{self.prefix}.ss"):
            for line in open(f"{self.prefix}.ss"):
                parts = line.split("\t")
                if parts and parts[0].isdigit() \
                        and int(parts[0]) < start_step:
                    old_rows.append(line.rstrip("\n"))
        ssf = open(f"{self.prefix}.ss", "w")
        ssf.write(f"[ID: {mc.seed:010d}]\n")
        ssf.write("Step\tbeta\tmeanLnL\tcontribution\n")
        for row in old_rows:
            ssf.write(row + "\n")
        ssf.flush()
        self.log(f"   Steppingstone: {self.nsteps} steps x {gens_per_step} "
                 f"generations (alpha={self.alpha})")
        # initial burn-in at beta=1 (fresh starts only)
        if burn_gens and not resumed:
            bk = {**bk, "power": jnp.float32(1.0)}
            for _ in range(burn_gens // mc.samplefreq):
                states, bk = eng.run_block(states, bk, mc.samplefreq)
        for step in range(start_step, self.nsteps + 1):
            b_prev, b_k = betas[step - 1], betas[step]
            bk = {**bk, "power": jnp.float32(b_k)}
            if step == start_step and resume_samples is not None:
                samples = resume_samples
                first_sample = start_sample
            else:
                samples = [[] for _ in range(mc.nruns)]
                first_sample = 0
            for si in range(first_sample, n_samples):
                states, bk = eng.run_block(states, bk, mc.samplefreq)
                gen += mc.samplefreq
                for r, slot in enumerate(eng.cold_indices(bk)):
                    lnl = float(states["lnL"][slot])
                    samples[r].append(lnl)
                self._write_sample(gen, states, bk)
                if mc.checkfreq and gen % mc.checkfreq == 0:
                    self.write_checkpoint(
                        states, bk, gen,
                        extra=self._ss_extra(lnZ, step, samples))
            # log mean exp((b_prev - b_k) * lnL), numerically stable
            step_contrib = []
            for r in range(mc.nruns):
                x = (b_prev - b_k) * np.asarray(samples[r])
                m = x.max()
                c = m + np.log(np.mean(np.exp(x - m)))
                lnZ[r] += c
                step_contrib.append(c)
            ssf.write(f"{step}\t{b_k:.6f}\t"
                      f"{np.mean([np.mean(s) for s in samples]):.4f}\t"
                      f"{np.mean(step_contrib):.6f}\n")
            ssf.flush()
            # step boundary: checkpoint with the step completed so a
            # resume never re-runs finished steps
            if mc.checkfreq:
                self.write_checkpoint(
                    states, bk, gen,
                    extra=self._ss_extra(lnZ, step + 1, []))
            if step % max(1, self.nsteps // 10) == 0:
                self.log(f"   Step {step}/{self.nsteps} (beta={b_k:.4f}): "
                         f"running lnZ = "
                         + " ".join(f"{z:.2f}" for z in lnZ))
        ssf.close()
        for f in self.pf + [t for ts in self.tf for t in ts]:
            f.write("end;\n" if f.name.endswith(".t") else "")
            f.close()
        self.mcmcf.close()
        for r in range(mc.nruns):
            self.log(f"   Marginal likelihood (SS) for run {r + 1} = "
                     f"{lnZ[r]:.2f}")
        self.log("   Analysis completed")
        return lnZ


def sumss(prefix: str, log=print) -> dict:
    """Summarize a .ss file (reference DoSumSs src/sumpt.c:534)."""
    steps = []
    with open(f"{prefix}.ss") as f:
        for line in f:
            if line.startswith(("[", "Step")):
                continue
            parts = line.split()
            if len(parts) >= 4:
                steps.append((int(parts[0]), float(parts[1]),
                              float(parts[2]), float(parts[3])))
    lnZ = sum(s[3] for s in steps)
    log(f"   Steppingstone steps: {len(steps)}")
    log(f"   Marginal likelihood (SS) = {lnZ:.2f}")
    log("   Step  beta      meanLnL      contribution")
    for s in steps[:: max(1, len(steps) // 10)]:
        log(f"   {s[0]:4d}  {s[1]:.4f}  {s[2]:12.2f}  {s[3]:10.4f}")
    return {"lnZ": lnZ, "steps": steps}
