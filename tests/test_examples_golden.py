"""The examples/ north-star golden, committed as a CI assertion.

BASELINE.json's primary parity target: the reference examples/ workload
(10 controls + 10 cases, k=31, hard-min 2, examples/run.sh) through our
`count` + `diff` must keep producing the recorded significant sets. The
numbers below were produced by this framework and cross-validated against
the reference-exact C++ oracle (bench/ref_oracle.cpp — vendored-alglib
chi², verbatim PoissonLikelihood/corrector semantics); any drift in
counting, merge, LRT numerics, correction, or output formatting fails
here. FASTA sha256 pins byte-exact output incl. p-values in headers.
"""

import hashlib
import json

import pytest

from kmdiff_tpu.cli import main

GOLDEN_TOTAL = 139_876
GOLDEN_CONTROL = 23_761
GOLDEN_CASE = 34_837
GOLDEN_SHA = {
    "control_kmers.fasta":
        "bd782c9bbdb94319770692efe28132556b01d763a5e34db06da471948fc128a1",
    "case_kmers.fasta":
        "ef380b58b05c30970ba917125293642228992218ffc27005e38c9b6f37934719",
}


@pytest.fixture(scope="session")
def examples_run(examples_count_dir, tmp_path_factory):
    """diff over the session count run (examples/run.sh parameters)."""
    out_dir = tmp_path_factory.mktemp("examples_golden") / "out"
    rc = main([
        "diff", "--km-run-dir", str(examples_count_dir), "-1", "10",
        "-2", "10", "--output-dir", str(out_dir), "-s", "0.01",
    ])
    assert rc == 0
    return out_dir


def test_examples_golden_counts(examples_run):
    manifest = json.loads((examples_run / "options.json").read_text())
    assert manifest["total_kmers"] == GOLDEN_TOTAL


def test_examples_golden_fasta_hashes(examples_run):
    for name, want in GOLDEN_SHA.items():
        digest = hashlib.sha256((examples_run / name).read_bytes()).hexdigest()
        assert digest == want, f"{name} drifted from the recorded golden"


def test_examples_golden_set_sizes(examples_run):
    from kmdiff_tpu.io.fasta import read_fasta

    control = read_fasta(examples_run / "control_kmers.fasta")
    case = read_fasta(examples_run / "case_kmers.fasta")
    assert len(control) == GOLDEN_CONTROL
    assert len(case) == GOLDEN_CASE
