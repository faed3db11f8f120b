"""`call` command: k-mer -> reference locus mapping."""

import os

import numpy as np

from kmdiff_tpu.pipeline.call import CallOptions, main_call


def _revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def test_call_maps_kmers(tmp_path):
    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), 500))
    (tmp_path / "ref.fasta").write_text(f">chr1\n{genome}\n")

    k = 21
    # queries: forward hit at 10, reverse-complement hit at 100, one miss
    q1 = genome[10 : 10 + k]
    q2 = _revcomp(genome[100 : 100 + k])
    q3 = "A" * k
    (tmp_path / "q.fasta").write_text(
        f">hit_fwd\n{q1}\n>hit_rc\n{q2}\n>miss\n{q3}\n"
    )

    res = main_call(CallOptions(
        kmer_file=str(tmp_path / "q.fasta"),
        reference=str(tmp_path / "ref.fasta"),
        output=str(tmp_path / "calls.tsv"),
    ))
    assert res["queries"] == 3
    assert res["mapped"] == 2

    lines = (tmp_path / "calls.tsv").read_text().strip().splitlines()
    rows = [l.split("\t") for l in lines[1:]]
    by_name = {}
    for r in rows:
        by_name.setdefault(r[0], []).append(r)
    assert int(by_name["hit_fwd"][0][3]) == 10
    assert int(by_name["hit_rc"][0][3]) == 100
    assert "miss" not in by_name


def test_call_multi_contig_and_repeats(tmp_path):
    k = 11
    motif = "ACGTACGTACG"
    (tmp_path / "ref.fasta").write_text(
        f">c1\n{'T' * 30}{motif}{'G' * 30}\n>c2 description\n{motif}CCCC\n"
    )
    (tmp_path / "q.fasta").write_text(f">m\n{motif}\n")
    res = main_call(CallOptions(
        kmer_file=str(tmp_path / "q.fasta"),
        reference=str(tmp_path / "ref.fasta"),
        output=str(tmp_path / "calls.tsv"),
    ))
    assert res["hits"] == 2
    rows = [l.split("\t") for l in
            (tmp_path / "calls.tsv").read_text().strip().splitlines()[1:]]
    assert {(r[2], int(r[3])) for r in rows} == {("c1", 30), ("c2", 0)}


def test_cli_call_on_diff_output(fixture_dir, tmp_path, fixture_fasta_dir):
    from kmdiff_tpu.cli import main

    out = tmp_path / "out"
    main([
        "diff", "--km-run-dir", str(fixture_dir), "-o", str(out),
        "-1", "1", "-2", "1", "-s", "0.5", "-u", "1", "-c", "disabled",
    ])
    rc = main([
        "call", "-i", str(out / "case_kmers.fasta"),
        "-r", f"{fixture_fasta_dir}/case1.fasta",
        "-o", str(tmp_path / "calls.tsv"),
    ])
    assert rc == 0
    lines = (tmp_path / "calls.tsv").read_text().strip().splitlines()
    # all case k-mers come from case1.fasta: everything maps
    assert len(lines) - 1 >= 160
