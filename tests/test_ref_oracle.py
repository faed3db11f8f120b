"""Significant-set equality against the reference-exact C++ oracle.

bench/ref_oracle.cpp re-executes kmdiff's diff pipeline independently —
verbatim PoissonLikelihood semantics (model.hpp:133-176), the VENDORED
alglib chi^2 (the reference's actual special-function code), the
histogram-total subtraction (kmtricks_utils.cpp:78-139), corrector state
machines (corrector.cpp:9-116) and the sorted-aggregator walk
(aggregator.hpp:286-310) — reading the same run dir our `count` produces.
These tests assert, for EVERY corrector and for both cutoff regimes, that
the product pipeline's significant sets match the oracle's exactly
(sequences, class routing, %g-formatted p-values, and the size_t-truncated
scaled control means the reference serializes into FASTA headers).
"""

import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALGLIB = "/root/reference/thirdparty/alglib/src"
ORACLE_SRC = os.path.join(REPO, "bench", "ref_oracle.cpp")
ORACLE_BIN = os.path.join(REPO, "bench", "ref_oracle")

CORRECTORS = ["bonferroni", "benjamini", "holm", "sidak", "disabled"]


@pytest.fixture(scope="session")
def oracle_bin():
    if not os.path.isdir(ALGLIB):
        pytest.skip("vendored alglib not available")
    srcs = [
        ORACLE_SRC,
        *(os.path.join(ALGLIB, f"{m}.cpp")
          for m in ("specialfunctions", "ap", "alglibinternal", "alglibmisc")),
        os.path.join(REPO, "kmdiff_tpu", "native", "io_codec.cpp"),
        os.path.join(REPO, "kmdiff_tpu", "native", "lz4_codec.cpp"),
    ]
    if (not os.path.exists(ORACLE_BIN)
            or os.path.getmtime(ORACLE_BIN)
            < max(os.path.getmtime(s) for s in srcs)):
        subprocess.run(
            ["g++", "-O2", f"-I{ALGLIB}", *srcs, "-o", ORACLE_BIN],
            check=True, capture_output=True,
        )
    return ORACLE_BIN


def _run_oracle(oracle_bin, run_dir, out_dir, alpha, cutoff):
    res = subprocess.run(
        [oracle_bin, str(run_dir), str(out_dir), "10", "10", str(alpha),
         str(cutoff), ",".join(CORRECTORS)],
        check=True, capture_output=True, text=True,
    )
    return json.loads(res.stdout)


def _read_oracle_class(path):
    out = {}
    with open(path) as f:
        for line in f:
            seq, p, mc, mk = line.rstrip("\n").split("\t")
            out[seq] = (float(p), float(mc), float(mk))
    return out


def _read_fasta_class(path):
    from kmdiff_tpu.io.fasta import read_fasta

    out = {}
    for name, seq in read_fasta(path):
        p = float(name.split("pval=")[1].split("_")[0])
        mc = int(name.split("control=")[1].split("_")[0])
        out[seq] = (p, mc)
    return out


def _assert_class_match(ours_fasta, oracle_txt, corrector):
    ours = _read_fasta_class(ours_fasta)
    oracle = _read_oracle_class(oracle_txt)
    missing = set(oracle) - set(ours)
    extra = set(ours) - set(oracle)
    assert not missing and not extra, (
        f"{corrector}: set mismatch ({len(missing)} missing, "
        f"{len(extra)} extra)"
    )
    for seq, (p, mc) in ours.items():
        po, mco, _mko = oracle[seq]
        # header p is {:g}: the oracle's f64 p must round to the same string
        assert f"{po:g}" == f"{p:g}", (corrector, seq, po, p)
        # header control mean is size_t-truncated (aggregator.hpp:56-59)
        assert mc == int(mco), (corrector, seq, mc, mco)


@pytest.fixture(scope="session")
def oracle_default(oracle_bin, examples_count_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("oracle_default")
    counts = _run_oracle(oracle_bin, examples_count_dir, out, 0.01, 1e5)
    return out, counts


@pytest.fixture(scope="session")
def oracle_cutoff1(oracle_bin, examples_count_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("oracle_cutoff1")
    counts = _run_oracle(oracle_bin, examples_count_dir, out, 0.01, 1.0)
    return out, counts


def _our_diff(run_dir, out_dir, correction, cutoff):
    from kmdiff_tpu.cli import main

    rc = main([
        "diff", "--km-run-dir", str(run_dir), "-1", "10", "-2", "10",
        "--output-dir", str(out_dir), "-s", "0.01",
        "--correction", correction, "--cutoff", str(cutoff),
    ])
    assert rc == 0


@pytest.mark.parametrize("corrector", CORRECTORS)
def test_oracle_set_equality_default_cutoff(
    corrector, oracle_default, examples_count_dir, tmp_path
):
    oracle_out, counts = oracle_default
    assert counts["total_tested"] == 139_876
    out = tmp_path / "out"
    _our_diff(examples_count_dir, out, corrector, 1e5)
    manifest = json.loads((out / "options.json").read_text())
    assert manifest["total_kmers"] == counts["total_tested"]
    for i, cls in enumerate(("control", "case")):
        ours = out / f"{cls}_kmers.fasta"
        _assert_class_match(
            ours, oracle_out / f"{corrector}_{cls}.txt", corrector
        )
        n = len(_read_fasta_class(ours))
        assert n == counts[corrector][i]


@pytest.mark.parametrize("corrector", ["bonferroni", "benjamini"])
def test_oracle_set_equality_no_prefilter(
    corrector, oracle_cutoff1, examples_count_dir, tmp_path
):
    """cutoff=1: the merge pre-filter keeps everything with p <= alpha, so
    correction sees the full candidate stream (diff.hpp:147 semantics)."""
    oracle_out, counts = oracle_cutoff1
    out = tmp_path / "out"
    _our_diff(examples_count_dir, out, corrector, 1.0)
    for cls in ("control", "case"):
        _assert_class_match(
            out / f"{cls}_kmers.fasta",
            oracle_out / f"{corrector}_{cls}.txt", corrector,
        )
