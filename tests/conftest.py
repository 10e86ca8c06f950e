"""Test config: run all tests on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / the driver; tests need
determinism and multi-device sharding, which the CPU backend provides via
xla_force_host_platform_device_count (SURVEY.md §4 implication (c)).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the axon TPU plugin registers itself regardless of the environment
# variable; the config flag is authoritative
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ORACLE_BUILD = pathlib.Path("/tmp/dav1d-ref")


@pytest.fixture(scope="session")
def oracle():
    """Path to the reference dav1d CLI binary (test oracle). Builds it on
    first use; skips oracle-based tests if the reference tree is absent."""
    ref = pathlib.Path("/root/reference")
    if not ref.exists():
        pytest.skip("reference tree not available")
    binary = ORACLE_BUILD / "dav1d"
    if not binary.exists():
        subprocess.run(
            [str(REPO / "tools" / "build_reference.sh"), str(ORACLE_BUILD)],
            check=True,
            capture_output=True,
        )
    return binary


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_state():
    """r5: the full suite segfaulted twice inside XLA:CPU's compiler
    (LLVM codegen for the SGR program) only after ~40 modules of
    accumulated live executables — standalone and subset runs of the
    same tests pass.  Dropping the jit caches between modules bounds
    the in-process compiler state (and peak RSS); each module
    recompiles its own programs, which the CPU backend does cheaply."""
    yield
    import jax

    jax.clear_caches()
