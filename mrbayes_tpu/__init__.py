__version__ = "0.1.0"


def _cache_dir() -> str:
    """Persistent-cache directory keyed by host CPU features.

    XLA:CPU cache entries embed AOT machine code for the compiling host's
    CPU features; loading them on a host without those features (the
    build fleet migrates between machine types) raises SIGILL and kills
    the process.  Hashing the feature set into the directory name makes
    mismatched hosts use disjoint caches.  TPU entries are unaffected
    either way (same dir per feature set is fine).
    """
    import hashlib
    import os
    import platform
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = line
                    break
    except OSError:
        pass
    tag = hashlib.sha1((platform.machine() + feats).encode()).hexdigest()[:8]
    return os.environ.get("MB_TPU_CACHE_DIR",
                          f"/tmp/mb_tpu_jax_cache_{tag}")


def _enable_compile_cache():
    """Persistent XLA compile cache: first compile of a model config pays
    the full cost (~1-3 min over a TPU tunnel); every later process start
    reuses it.  Opt out with MB_TPU_NO_CACHE=1."""
    import os
    if os.environ.get("MB_TPU_NO_CACHE"):
        return
    try:
        import jax
        # XLA:CPU executable (de)serialization is unreliable on this
        # fleet (SIGILL loading entries AOT-compiled on a different
        # machine type; SIGSEGV inside put_executable_and_time) — the
        # cache only pays off for TPU-tunnel compiles, so enable it only
        # when the effective platform is not CPU.
        platforms = (jax.config.jax_platforms
                     or os.environ.get("JAX_PLATFORMS", ""))
        if "cpu" in str(platforms).lower().split(","):
            return
        jax.config.update("jax_compilation_cache_dir", _cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _set_matmul_precision():
    """Full-f32 matmul accumulation everywhere.

    JAX's default matmul precision on TPU (and this fleet's CPU backend)
    runs float32 contractions through reduced-precision (bf16-pass)
    multiplies, which biases per-pattern log-likelihoods by ~1e-2 —
    measured against a float64 oracle and the reference binary (which
    computes full-float32 like the SSE/FMA kernels it ships,
    src/likelihood.c).  The pruning kernel is latency-bound, not
    FLOP-bound (see ROOFLINE.json), so the extra MXU passes are nearly
    free; correctness wins.  Override with MB_MATMUL_PRECISION=default
    to restore the fast-and-loose behavior."""
    import os
    pref = os.environ.get("MB_MATMUL_PRECISION", "highest")
    if pref in ("default", ""):
        return
    try:
        import jax
        jax.config.update("jax_default_matmul_precision", pref)
    except Exception:
        pass


_enable_compile_cache()
_set_matmul_precision()
