__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA compile cache: first compile of a model config pays
    the full cost (~1-3 min over a TPU tunnel); every later process start
    reuses it.  Safe on CPU too.  Opt out with MB_TPU_NO_CACHE=1."""
    import os
    if os.environ.get("MB_TPU_NO_CACHE"):
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("MB_TPU_CACHE_DIR",
                                         "/tmp/mb_tpu_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()
