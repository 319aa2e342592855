"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests work without TPU hardware (mirrors the reference's
``mpirun -np 2`` CI trick, testing/runtests.sh.in:38-47).

Fixture resolution: the NEXUS datasets the suite drives (the reference
distribution's ``examples/*.nex``) are vendored under
``tests/data/ref/examples`` so the suite runs without ``/root/reference``
present (CI).  ``MB_REF_EXAMPLES`` overrides the directory.  Tests that
additionally need the reference *source tree* or a built reference
*binary* (golden regeneration, strict-surface cross-checks) self-skip
via ``ref_src_or_skip`` when it is absent.
"""
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

_HERE = os.path.dirname(os.path.abspath(__file__))
REF_SRC = os.environ.get("MB_REF_SRC", "/root/reference")
REF_EXAMPLES = os.environ.get(
    "MB_REF_EXAMPLES",
    REF_SRC + "/examples" if os.path.isdir(REF_SRC + "/examples")
    else os.path.join(_HERE, "data", "ref", "examples"))


def example(name: str) -> str:
    """Path of a reference example dataset (vendored fallback)."""
    return os.path.join(REF_EXAMPLES, name)


def ref_testing(name: str) -> str:
    """Path of a reference testing/ fixture (vendored fallback)."""
    p = os.path.join(REF_SRC, "testing", name)
    if os.path.exists(p):
        return p
    return os.path.join(_HERE, "data", "ref", "testing", name)


def ref_src_or_skip(*sub: str) -> str:
    """Path under the reference SOURCE tree, or skip the test when the
    tree is absent (CI without /root/reference)."""
    p = os.path.join(REF_SRC, *sub)
    if not os.path.exists(p):
        pytest.skip(f"reference source not present: {p}")
    return p


@pytest.fixture(scope="session")
def primates():
    from mrbayes_tpu.nexus.parser import read_nexus_file
    return read_nexus_file(example("primates.nex"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
