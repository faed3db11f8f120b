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


@pytest.fixture(scope="session")
def examples_count_dir(examples_dir, tmp_path_factory):
    """`count` over the reference examples/ cohort (10+10 samples, k=31,
    hard-min 2 — examples/run.sh), once per session; shared by the golden
    and oracle end-to-end tests."""
    import os

    from kmdiff_tpu.cli import main

    root = tmp_path_factory.mktemp("examples_count")
    fof = root / "fof.txt"
    lines = []
    for line in open(os.path.join(examples_dir, "fof.txt")):
        if ":" not in line:
            continue
        sid, _, path = line.partition(":")
        lines.append(
            f"{sid.strip()} : {os.path.join(examples_dir, path.strip())}"
        )
    fof.write_text("\n".join(lines) + "\n")
    run_dir = root / "kc_dir"
    rc = main([
        "count", "--file", str(fof), "--run-dir", str(run_dir),
        "--kmer-size", "31", "--hard-min", "2",
    ])
    assert rc == 0
    return run_dir


@pytest.fixture(autouse=True)
def _reset_mesh_runtime():
    """The CLI commands configure the global mesh runtime; reset it after
    every test so unit tests see a deterministic (unconfigured,
    single-device) state regardless of ordering."""
    yield
    from kmdiff_tpu.parallel import runtime

    runtime.configure(None)
