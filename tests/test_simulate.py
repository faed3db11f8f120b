"""Cohort simulator + ground-truth recovery: the full-loop statistical
validation (simulate -> count -> diff -> recover planted case variants)
that neither the reference nor its tests provide."""

import os

import numpy as np
import pytest

from kmdiff_tpu.pipeline.simulate import SimOptions, simulate


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    out = tmp_path_factory.mktemp("sim")
    res = simulate(SimOptions(
        output_directory=str(out),
        genome_len=20_000,
        nb_controls=5,
        nb_cases=5,
        mean_sv_len=300,
        sd_sv_len=30,
        nb_sv_controls=2,
        nb_sv_cases=2,
        prob_case=0.0,
        prob_control=0.0,
        sv_per_indiv=1.0,  # every case carries every case variant
        read_size=100,
        coverage=8,
        error_rate=0.0,
        seed=7,
    ))
    return str(out), res


def test_simulate_outputs(cohort):
    out, res = cohort
    from kmdiff_tpu.io.fasta import read_fasta

    assert os.path.exists(res["fof"])
    assert os.path.exists(res["truth"])
    truth = read_fasta(res["truth"])
    assert len(truth) == 4  # 2 control + 2 case variants
    fasta = read_fasta(os.path.join(out, "case_5.fasta"))
    assert len(fasta) > 100
    assert all(len(s) == 100 for _n, s in fasta)


def test_simulate_reproducible(tmp_path):
    a = simulate(SimOptions(output_directory=str(tmp_path / "a"),
                            genome_len=5_000, seed=3))
    b = simulate(SimOptions(output_directory=str(tmp_path / "b"),
                            genome_len=5_000, seed=3))
    fa = open(os.path.join(str(tmp_path / "a"), "control_0.fasta")).read()
    fb = open(os.path.join(str(tmp_path / "b"), "control_0.fasta")).read()
    assert fa == fb


def test_ground_truth_recovery(cohort):
    """diff must flag k-mers from planted case variants as case-associated."""
    out, res = cohort
    from kmdiff_tpu.cmd.count import main_count
    from kmdiff_tpu.cmd.diff import main_diff
    from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
    from kmdiff_tpu.core.corrector import CorrectionType
    from kmdiff_tpu.core.kmer import (
        canonical_packed,
        kmers_from_codes,
        seq_to_codes,
    )
    from kmdiff_tpu.io.fasta import read_fasta

    k = 21
    run = os.path.join(out, "run")
    main_count(CountOptions(fof=res["fof"], directory=run, kmer_size=k,
                            hard_min=2, nb_partitions=4, nb_threads=2))
    diff_out = os.path.join(out, "diff")
    main_diff(DiffOptions(
        kmtricks_dir=run, output_directory=diff_out,
        nb_controls=5, nb_cases=5,
        threshold=0.05, correction=CorrectionType.BONFERRONI,
        nb_threads=2,
    ))

    def canon_set(seqs):
        acc = set()
        for s in seqs:
            codes, valid = seq_to_codes(s)
            km = canonical_packed(kmers_from_codes(codes, valid, k), k)
            acc.update(km[:, 0].tolist())
        return acc

    case_hits = canon_set(
        s for _n, s in read_fasta(os.path.join(diff_out, "case_kmers.fasta"))
    )
    truth = read_fasta(res["truth"])
    case_truth = canon_set(s for n, s in truth if n.startswith("case"))
    control_truth = canon_set(s for n, s in truth if n.startswith("control"))

    # recall: most case-variant k-mers are recovered (coverage 8, so nearly
    # all variant k-mers survive hard-min=2 in every case sample)
    recall = len(case_hits & case_truth) / len(case_truth)
    assert recall > 0.8, f"recall {recall:.2f}"

    # precision proxy: control-variant k-mers must NOT be case-flagged
    assert len(case_hits & control_truth) / len(control_truth) < 0.05


def test_cli_popsim(tmp_path):
    from kmdiff_tpu.cli import main

    rc = main([
        "popsim", "-o", str(tmp_path / "sim"), "--genome-len", "3000",
        "-1", "2", "-2", "2", "--nb-sv-controls", "1", "--nb-sv-cases", "1",
        "--mean-sv-len", "120", "--coverage", "4",
    ])
    assert rc == 0
    assert (tmp_path / "sim" / "fof.txt").exists()
    assert (tmp_path / "sim" / "truth.fasta").exists()
