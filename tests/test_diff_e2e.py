"""End-to-end `diff` tests over the reference's checked-in kmtricks run dir.

Coverage the reference lacks (SURVEY.md §4): full-pipeline golden assertions
on outputs, resume semantics, and option-manifest redo logic.
"""

import json
import os
import shutil

import numpy as np

PLUGINS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "plugins",
)
import pytest

from kmdiff_tpu.cmd.diff import main_diff
from kmdiff_tpu.cmd.options import DiffOptions, compare_options, load_options
from kmdiff_tpu.core.corrector import CorrectionType
from kmdiff_tpu.io.fasta import read_fasta


def _opts(fixture_dir, out, **kw):
    base = dict(
        kmtricks_dir=str(fixture_dir),
        output_directory=str(out),
        nb_controls=1,
        nb_cases=1,
        threshold=0.05,
        cutoff=1e5,
        correction=CorrectionType.BONFERRONI,
        nb_threads=2,
    )
    base.update(kw)
    return DiffOptions(**base)


def test_diff_default_no_significant(fixture_dir, tmp_path):
    # reference golden: 320 tested, 0 significant at alpha/cutoff
    res = main_diff(_opts(fixture_dir, tmp_path / "out"))
    assert res["total_kmers"] == 320
    assert res["control"] == 0 and res["case"] == 0
    assert (tmp_path / "out" / "control_kmers.fasta").exists()
    assert (tmp_path / "out" / "case_kmers.fasta").exists()
    assert read_fasta(tmp_path / "out" / "control_kmers.fasta") == []


def test_diff_disabled_correction_cutoff_1(fixture_dir, tmp_path):
    """cutoff=1 + disabled correction keeps everything with p < alpha."""
    res = main_diff(
        _opts(
            fixture_dir,
            tmp_path / "out",
            threshold=0.5,
            cutoff=1.0,
            correction=CorrectionType.NOTHING,
        )
    )
    assert res["total_kmers"] == 320
    n_out = res["control"] + res["case"]
    control = read_fasta(tmp_path / "out" / "control_kmers.fasta")
    case = read_fasta(tmp_path / "out" / "case_kmers.fasta")
    assert len(control) == res["control"]
    assert len(case) == res["case"]
    assert n_out > 0
    # every k-mer is 20bp and headers carry p < threshold (strict, output
    # filter is p < alpha while merge keeps p <= alpha/cutoff)
    for name, seq in control + case:
        assert len(seq) == 20
        p = float(name.split("pval=")[1].split("_")[0])
        assert p < 0.5


def test_diff_resume_skips_merge(fixture_dir, tmp_path):
    out = tmp_path / "out"
    opt = _opts(fixture_dir, out, keep_tmp=True)
    res1 = main_diff(opt)
    manifest = json.loads((out / "options.json").read_text())
    assert manifest["total_kmers"] == 320

    spill = out / "partitions" / "p0_uncorrected"
    assert spill.exists()
    t0 = spill.stat().st_mtime_ns

    # identical rerun: merge skipped -> spill untouched
    res2 = main_diff(_opts(fixture_dir, out, keep_tmp=True))
    assert spill.stat().st_mtime_ns == t0
    assert res2["total_kmers"] == res1["total_kmers"]

    # threshold change -> redo merge -> spill rewritten
    res3 = main_diff(
        _opts(fixture_dir, out, keep_tmp=True, threshold=0.4, cutoff=1.0,
              correction=CorrectionType.NOTHING)
    )
    assert spill.stat().st_mtime_ns != t0
    assert res3["total_kmers"] == 320
    assert res3["control"] + res3["case"] > 0


def test_compare_options_bitmask():
    a = DiffOptions(threshold=0.05, cutoff=10, correction=CorrectionType.BONFERRONI)
    b = DiffOptions(threshold=0.05, cutoff=10, correction=CorrectionType.BONFERRONI)
    assert compare_options(a, b) == 0
    b2 = DiffOptions(threshold=0.01, cutoff=10)
    assert compare_options(b2, a) & 0b1
    b3 = DiffOptions(cutoff=10, correction=CorrectionType.HOLM)
    assert compare_options(b3, a) == 0b100
    b4 = DiffOptions(cutoff=10, pop_correction=True)
    assert compare_options(b4, a) == 0b11


def test_cli_diff(fixture_dir, tmp_path):
    from kmdiff_tpu.cli import main

    out = tmp_path / "cli_out"
    rc = main([
        "diff",
        "--km-run-dir", str(fixture_dir),
        "-o", str(out),
        "-1", "1",
        "-2", "1",
        "-s", "0.05",
    ])
    assert rc == 0
    assert (out / "control_kmers.fasta").exists()
    assert json.loads((out / "options.json").read_text())["total_kmers"] == 320


def test_cli_infos(capsys):
    from kmdiff_tpu.cli import main

    assert main(["infos"]) == 0
    out = capsys.readouterr().out
    assert "kmdiff-tpu" in out
    assert "jax" in out


def test_cli_reference_flag_spellings():
    """The reference run-script spellings parse (cli.cpp: --km-run via -d,
    --cpr, --repartition-type, --cmodel/--config plugin flags)."""
    from kmdiff_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args([
        "diff", "--km-run", "rd", "-1", "2", "-2", "2", "-r",
        "--cmodel", "m.py", "--config", "x=1",
    ])
    assert a.km_run_dir == "rd"
    assert a.model_lib_path == "m.py"
    assert a.model_config == "x=1"
    a = p.parse_args(["diff", "-d", "rd", "-1", "1", "-2", "1"])
    assert a.km_run_dir == "rd"
    a = p.parse_args([
        "count", "--file", "f", "--run-dir", "d", "--repartition-type", "1",
    ])
    assert a.repartition_type == 1


def test_diff_kff_output(fixture_dir, tmp_path):
    from kmdiff_tpu.io.kff import KffReader

    res = main_diff(
        _opts(
            fixture_dir,
            tmp_path / "out",
            threshold=0.5,
            cutoff=1.0,
            correction=CorrectionType.NOTHING,
            kff=True,
        )
    )
    with KffReader(str(tmp_path / "out" / "case_kmers.kff")) as r:
        kmers = list(r.kmers())
    assert len(kmers) == res["case"]
    assert all(len(s) == 20 for s in kmers)


def test_diff_save_sk(fixture_dir, tmp_path):
    """--save-sk dumps the SURVIVOR k-mer count matrix — only rows with
    p <= threshold, like the reference's MatrixWriter call inside the
    observer's significance branch (merge.hpp:78-87) — via the device
    merge path."""
    from kmdiff_tpu.io.kmtricks import read_matrix_file

    res = main_diff(_opts(
        fixture_dir, tmp_path / "out", save_sk=True,
        threshold=0.5, cutoff=1.0, correction=CorrectionType.NOTHING,
    ))
    mdir = tmp_path / "out" / "positive_kmer_matrix" / "matrices"
    files = sorted(os.listdir(mdir))
    assert files == [f"matrix_{i}.count.lz4" for i in range(4)]
    n_rows = 0
    kmer_set = set()
    for i, fname in enumerate(files):
        info, kmers, counts = read_matrix_file(str(mdir / fname))
        assert info.kmer_size == 20
        assert counts.shape[1] == 2
        n_rows += len(kmers)
        kmer_set.update(int(k) for k in kmers[:, 0])
    # matrix rows == the merge-stage survivors == final output here
    # (correction NOTHING keeps every pre-filter hit)
    assert n_rows == res["control"] + res["case"] > 0
    # and the k-mer set matches the FASTA outputs exactly
    from kmdiff_tpu.core.kmer import string_to_packed

    out_kmers = set()
    for f in ("control_kmers.fasta", "case_kmers.fasta"):
        for _name, seq in read_fasta(tmp_path / "out" / f):
            out_kmers.add(int(string_to_packed(seq)[0]))
    assert kmer_set == out_kmers


def test_diff_save_sk_zero_survivors(fixture_dir, tmp_path):
    """Default strict threshold: matrices exist but hold zero rows."""
    from kmdiff_tpu.io.kmtricks import read_matrix_file

    res = main_diff(_opts(fixture_dir, tmp_path / "out", save_sk=True))
    assert res["control"] == 0 and res["case"] == 0
    mdir = tmp_path / "out" / "positive_kmer_matrix" / "matrices"
    for i in range(4):
        _info, kmers, _counts = read_matrix_file(
            str(mdir / f"matrix_{i}.count.lz4"))
        assert len(kmers) == 0


def test_diff_from_matrix_files(fixture_dir, tmp_path):
    """Matrix streaming path (reference: diff.hpp:80-101 matrix_proxy): a
    run dir with prebuilt matrices/ is consumed instead of per-sample
    count files, producing identical results."""
    import numpy as np

    from kmdiff_tpu.io.kmtricks import (
        get_partition_paths,
        read_config,
        read_kmer_file,
        write_matrix_file,
    )
    from kmdiff_tpu.pipeline.merge import merge_sorted_streams

    # synthesize a matrix-mode run dir from the fixture
    mdir = tmp_path / "run"
    shutil.copytree(fixture_dir, mdir)
    os.makedirs(mdir / "matrices")
    config = read_config(str(fixture_dir))
    for p, paths in enumerate(get_partition_paths(str(fixture_dir), 4)):
        kl, cl = [], []
        for path in paths:
            _i, km, ct = read_kmer_file(path)
            kl.append(km)
            cl.append(ct)
        kmers, counts = merge_sorted_streams(kl, cl)
        write_matrix_file(str(mdir / "matrices" / f"matrix_{p}.count.lz4"),
                          kmers, counts, config.kmer_size, p)

    res_m = main_diff(_opts(mdir, tmp_path / "out_m", threshold=0.5,
                            cutoff=1.0, correction=CorrectionType.NOTHING))
    res_f = main_diff(_opts(fixture_dir, tmp_path / "out_f", threshold=0.5,
                            cutoff=1.0, correction=CorrectionType.NOTHING))
    assert res_m == res_f
    a = sorted(read_fasta(tmp_path / "out_m" / "case_kmers.fasta"))
    b = sorted(read_fasta(tmp_path / "out_f" / "case_kmers.fasta"))
    assert a == b


def test_diff_with_model_plugin(fixture_dir, tmp_path):
    """Custom model plugin path (reference: plugins/ex_model.cpp via
    dlopen; ours loads a Python module)."""
    res = main_diff(_opts(
        fixture_dir, tmp_path / "out",
        threshold=0.5, cutoff=1.0,
        correction=CorrectionType.NOTHING,
        model_lib_path=os.path.join(PLUGINS_DIR, "fold_change_model.py"),
        model_config="1.5",
    ))
    assert res["total_kmers"] == 320
    # fixture samples are disjoint: every k-mer is infinitely fold-changed
    assert res["control"] + res["case"] == 320


def test_diff_cohort_size_mismatch(fixture_dir, tmp_path):
    from kmdiff_tpu.utils.exceptions import InputError

    with pytest.raises(InputError, match="cohort size mismatch"):
        main_diff(_opts(fixture_dir, tmp_path / "out", nb_controls=2,
                        nb_cases=3))


def test_cli_warmup(monkeypatch):
    """warmup compiles the canonical kernels without error (CPU backend).
    The fused-chunk shape shrinks via CHUNK_ROWS so the CPU test doesn't
    pay the production 2^24-row sort."""
    import kmdiff_tpu.pipeline.fused as fmod
    from kmdiff_tpu.cli import main

    monkeypatch.setattr(fmod, "CHUNK_ROWS", 1 << 10)
    assert main(["warmup", "-1", "2", "-2", "2", "-k", "21", "--pop"]) == 0


def test_diff_in_memory(fixture_dir, tmp_path):
    """-m/--in-memory: identical outputs with zero spill files (the
    reference parses the flag but never uses it, diff.hpp:103-107; here
    it works)."""
    r1 = main_diff(_opts(fixture_dir, tmp_path / "ref",
                         threshold=0.5, cutoff=1.0,
                         correction=CorrectionType.NOTHING))
    r2 = main_diff(_opts(fixture_dir, tmp_path / "mem",
                         threshold=0.5, cutoff=1.0,
                         correction=CorrectionType.NOTHING, in_memory=True))
    assert r1 == r2
    for name in ("control_kmers.fasta", "case_kmers.fasta"):
        assert (tmp_path / "mem" / name).read_bytes() == (
            tmp_path / "ref" / name
        ).read_bytes()
    # no spill files were ever written in -m mode
    assert not [f for f in os.listdir(tmp_path / "mem" / "partitions")]


def test_count_then_diff_k96(tmp_path):
    """k=96 (3 u64 words, 6 u32 lanes) through the full product path:
    count + device merge + outputs (the reference's Kmer<96>
    instantiation, src/main.cc:29-50)."""
    from kmdiff_tpu.cmd.count import main_count
    from kmdiff_tpu.cmd.options import CountOptions

    rng = np.random.default_rng(23)
    bases = np.array(list("ACGT"))
    shared = ["".join(rng.choice(bases, 200)) for _ in range(3)]
    fof_lines = []
    for sid in ("C1", "C2", "K1", "K2"):
        fa = tmp_path / f"{sid}.fasta"
        with open(fa, "w") as f:
            if sid.startswith("K"):
                for j, s in enumerate(shared):
                    for r in range(5):
                        f.write(f">s{j}_{r}\n{s}\n")
            for j in range(5):
                f.write(f">r{j}\n{''.join(rng.choice(bases, 200))}\n")
        fof_lines.append(f"{sid} : {fa}")
    (tmp_path / "fof.txt").write_text("\n".join(fof_lines) + "\n")

    run = tmp_path / "run"
    main_count(CountOptions(fof=str(tmp_path / "fof.txt"), directory=str(run),
                            kmer_size=96, hard_min=1, nb_partitions=2,
                            nb_threads=1))
    res = main_diff(DiffOptions(
        kmtricks_dir=str(run), output_directory=str(tmp_path / "out"),
        nb_controls=2, nb_cases=2, threshold=0.8, cutoff=1.0,
        correction=CorrectionType.NOTHING, nb_threads=1,
    ))
    assert res["total_kmers"] > 0
    assert res["case"] > 0  # case-shared reads must surface
    case = read_fasta(tmp_path / "out" / "case_kmers.fasta")
    assert len(case) == res["case"]
    assert all(len(s) == 96 for _n, s in case)
    # the shared k-mers really are from the planted case reads
    planted = set()
    for s in shared:
        for i in range(len(s) - 95):
            planted.add(s[i : i + 96])
    from kmdiff_tpu.core.kmer import canonical_packed, string_to_packed

    canon_planted = set()
    for p in planted:
        canon_planted.add(tuple(canonical_packed(
            string_to_packed(p)[None, :], 96)[0].tolist()))
    hit = 0
    for _n, seq in case:
        if tuple(string_to_packed(seq).tolist()) in canon_planted:
            hit += 1
    assert hit > 0


def test_diff_matrix_streaming_bounded(fixture_dir, tmp_path, monkeypatch):
    """The matrix path streams in bounded row blocks (reference:
    matrix_proxy/km::MatrixReader, merge.hpp:319-432): forcing 7-row
    blocks through the product path produces byte-identical outputs to
    the whole-file read, proving block boundaries are invisible."""
    import numpy as np

    from kmdiff_tpu.io import kmtricks as kio
    from kmdiff_tpu.pipeline.merge import merge_sorted_streams

    mdir = tmp_path / "run"
    shutil.copytree(fixture_dir, mdir)
    os.makedirs(mdir / "matrices")
    config = kio.read_config(str(fixture_dir))
    for p, paths in enumerate(kio.get_partition_paths(str(fixture_dir), 4)):
        kl, cl = [], []
        for path in paths:
            _i, km, ct = kio.read_kmer_file(path)
            kl.append(km)
            cl.append(ct)
        kmers, counts = merge_sorted_streams(kl, cl)
        kio.write_matrix_file(str(mdir / "matrices" / f"matrix_{p}.count.lz4"),
                              kmers, counts, config.kmer_size, p)

    res_big = main_diff(_opts(mdir, tmp_path / "out_big", threshold=0.5,
                              cutoff=1.0, correction=CorrectionType.NOTHING))
    monkeypatch.setattr(kio, "MATRIX_STREAM_ROWS", 7)
    res_tiny = main_diff(_opts(mdir, tmp_path / "out_tiny", threshold=0.5,
                               cutoff=1.0, correction=CorrectionType.NOTHING))
    assert res_tiny == res_big
    for f in ("control_kmers.fasta", "case_kmers.fasta"):
        a = sorted(read_fasta(tmp_path / "out_big" / f))
        b = sorted(read_fasta(tmp_path / "out_tiny" / f))
        assert a == b and res_big["total_kmers"] == 320


def test_diff_with_device_model_plugin(fixture_dir, tmp_path):
    """The process_block_jax plugin ABI (device-tiled custom models) runs
    through the full pipeline and matches the host numpy plugin
    byte-for-byte on the fixture (both implement the same fold-change
    rule; fixture counts are small ints, exact in f32)."""
    outs = {}
    for tag, plugin in (
        ("host", "fold_change_model.py"),
        ("dev", "device_fold_change_model.py"),
    ):
        res = main_diff(_opts(
            fixture_dir, tmp_path / f"out_{tag}",
            threshold=0.5, cutoff=1.0,
            correction=CorrectionType.NOTHING,
            model_lib_path=os.path.join(PLUGINS_DIR, plugin),
            model_config="1.5",
        ))
        blobs = {}
        for f in ("control_kmers.fasta", "case_kmers.fasta"):
            with open(tmp_path / f"out_{tag}" / f, "rb") as fh:
                blobs[f] = fh.read()
        outs[tag] = (res, blobs)
    assert outs["host"][0] == outs["dev"][0]
    assert outs["host"][0]["control"] + outs["host"][0]["case"] > 0
    assert outs["host"][1] == outs["dev"][1]
