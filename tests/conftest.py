"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding paths
compile and execute without TPU hardware (the driver separately dry-runs the
multichip path). This must be set before jax is imported anywhere.
"""

import os

# The session's sitecustomize imports jax at interpreter start and pins the
# TPU platform, so env vars alone are too late — override through the config
# API before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")
FIXTURE = REFERENCE / "tests" / "data_test" / "km_out_dir"
FIXTURE_FASTA = REFERENCE / "tests" / "data_test" / "fasta"
EXAMPLES = REFERENCE / "examples"


@pytest.fixture(scope="session")
def fixture_dir():
    if not FIXTURE.exists():
        pytest.skip("reference fixture not available")
    return str(FIXTURE)


@pytest.fixture(scope="session")
def fixture_fasta_dir():
    if not FIXTURE_FASTA.exists():
        pytest.skip("reference fixture fasta not available")
    return str(FIXTURE_FASTA)


@pytest.fixture(scope="session")
def examples_dir():
    if not EXAMPLES.exists():
        pytest.skip("reference examples not available")
    return str(EXAMPLES)


@pytest.fixture(autouse=True)
def _reset_mesh_runtime():
    """The CLI commands configure the global mesh runtime; reset it after
    every test so unit tests see a deterministic (unconfigured,
    single-device) state regardless of ordering."""
    yield
    from kmdiff_tpu.parallel import runtime

    runtime.configure(None)
