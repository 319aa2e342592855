"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests work without TPU hardware (mirrors the reference's
``mpirun -np 2`` CI trick, testing/runtests.sh.in:38-47)."""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")
# XLA:CPU executable serialization segfaults on this fleet; the
# persistent cache is TPU-only (see mrbayes_tpu._enable_compile_cache)
os.environ["MB_TPU_NO_CACHE"] = "1"

import jax  # noqa: E402  (may be pre-imported by sitecustomize)

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_EXAMPLES = "/root/reference/examples"


@pytest.fixture(scope="session")
def primates():
    from mrbayes_tpu.nexus.parser import read_nexus_file
    return read_nexus_file(os.path.join(REF_EXAMPLES, "primates.nex"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
