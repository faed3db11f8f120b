"""kmtricks run-dir interop tests against the reference's checked-in fixture."""

import os

import numpy as np
import pytest

from kmdiff_tpu.io import kmtricks as kio


def test_read_config(fixture_dir):
    cfg = kio.read_config(fixture_dir)
    assert cfg.kmer_size == 20
    assert cfg.nb_partitions == 4
    assert cfg.abundance_min == 1


def test_read_fof(fixture_dir):
    fof = kio.read_fof(fixture_dir)
    assert len(fof) == 2
    assert fof.get_id(0) == "Control1"
    assert fof.get_id(1) == "Case1"
    assert fof.get_i("Case1") == 1


def test_fof_ab_min_roundtrip(tmp_path):
    p = tmp_path / "fof.txt"
    p.write_text("S1 : a.fasta; b.fasta ! 3\nS2 : c.fasta\n")
    fof = kio.Fof.parse(str(p))
    assert fof.entries[0].paths == ["a.fasta", "b.fasta"]
    assert fof.entries[0].ab_min == 3
    assert fof.entries[1].ab_min == 0
    out = tmp_path / "fof2.txt"
    fof.dump(str(out))
    assert kio.Fof.parse(str(out)).entries == fof.entries


def test_hist_fixture_golden(fixture_dir):
    """Histogram totals drive the Poisson normalization; fixture golden is
    160 per sample (reference: tests/merge_test.cpp:38-40)."""
    for sample, idx in [("Control1", 0), ("Case1", 1)]:
        h = kio.read_hist(os.path.join(fixture_dir, "histograms", f"{sample}.hist"))
        assert h.idx == idx
        assert (h.lower, h.upper) == (1, 255)
        assert h.total == 160 and h.unique == 160
        assert h.unique_per_bin[0] == 160
        assert h.unique_per_bin[1:].sum() == 0


def test_get_total_kmer(fixture_dir):
    controls, cases = kio.get_total_kmer(fixture_dir, 1, 1, 1)
    assert controls == [160] and cases == [160]


def test_total_kmer_ab_min_subtraction(tmp_path):
    """total -= j * unique_bin[j-1] for j < ab_min
    (reference: src/kmtricks_utils.cpp:100-109)."""
    counts = np.array([1, 1, 2, 3, 3, 5], dtype=np.uint32)
    h = kio.hist_from_counts(counts, idx=0, kmer_size=21)
    assert h.total == 15 and h.unique == 6
    kio.write_hist(str(tmp_path / "histograms" / "S.hist"), h) if (
        tmp_path / "histograms"
    ).mkdir() or True else None
    (tmp_path / "kmtricks.fof").write_text("S : s.fasta\n")
    controls, cases = kio.get_total_kmer(str(tmp_path), 1, 0, 3)
    # ab_min=3: subtract 1*2 (two count-1 kmers) + 2*1 (one count-2 kmer) = 4
    assert controls == [15 - 2 - 2]


def test_hist_writer_byte_identical(fixture_dir, tmp_path):
    """Our hist writer must reproduce the kmtricks v1.1.1 file byte-for-byte
    for the fixture's all-count-1 distribution."""
    counts = np.ones(160, dtype=np.uint32)
    h = kio.hist_from_counts(counts, idx=1, kmer_size=20)
    out = tmp_path / "Case1.hist"
    kio.write_hist(str(out), h)
    ref = open(os.path.join(fixture_dir, "histograms", "Case1.hist"), "rb").read()
    assert out.read_bytes() == ref


def test_kmer_file_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    kmers = np.sort(rng.integers(0, 2**40, 500, dtype=np.uint64))[:, None]
    counts = rng.integers(1, 1000, 500, dtype=np.uint32)
    path = str(tmp_path / "S.kmer.lz4")
    kio.write_kmer_file(path, kmers, counts, 20, sample_idx=3, partition=7)
    info, k2, c2 = kio.read_kmer_file(path)
    assert info.kmer_size == 20 and info.sample_idx == 3 and info.partition == 7
    assert np.array_equal(kmers, k2)
    assert np.array_equal(counts, c2)


def test_kmer_file_header_matches_kmtricks(fixture_dir, tmp_path):
    """Header bytes (pre-payload) must match the kmtricks layout."""
    kmers = np.zeros((1, 1), dtype=np.uint64)
    counts = np.ones(1, dtype=np.uint32)
    path = str(tmp_path / "x.kmer.lz4")
    kio.write_kmer_file(path, kmers, counts, 20, sample_idx=1, partition=0)
    ours = open(path, "rb").read(41)
    ref = open(
        os.path.join(fixture_dir, "counts", "partition_0", "Case1.kmer.lz4"), "rb"
    ).read(41)
    assert ours == ref


def test_partition_paths(fixture_dir):
    paths = kio.get_partition_paths(fixture_dir, 4)
    assert len(paths) == 4
    assert all(len(p) == 2 for p in paths)
    assert paths[0][0].endswith("partition_0/Control1.kmer.lz4")
    assert all(os.path.exists(f) for p in paths for f in p)


def test_matrix_file_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    kmers = np.sort(rng.integers(0, 2**62, 200, dtype=np.uint64))[:, None]
    counts = rng.integers(0, 500, (200, 6)).astype(np.uint32)
    path = str(tmp_path / "matrix_0.count.lz4")
    kio.write_matrix_file(path, kmers, counts, 31, partition=0)
    info, k2, c2 = kio.read_matrix_file(path)
    assert info.count_slots == 6
    assert np.array_equal(kmers, k2)
    assert np.array_equal(counts, c2)


def test_matrix_stream_blocks_match_whole_read(tmp_path):
    """open_matrix_stream with a tiny block size yields exactly the rows of
    read_matrix_file, in order — the constant-memory path is lossless
    (reference streams matrices via km::MatrixReader, merge.hpp:319-432)."""
    rng = np.random.default_rng(11)
    n = 1000
    kmers = np.sort(rng.integers(0, 2**62, n, dtype=np.uint64))[:, None]
    counts = rng.integers(0, 70000, (n, 5)).astype(np.uint32)
    path = str(tmp_path / "matrix_1.count.lz4")
    kio.write_matrix_file(path, kmers, counts, 31, partition=1)

    info_w, kw, cw = kio.read_matrix_file(path)
    info_s, blocks = kio.open_matrix_stream(path, rows_per_block=37)
    assert (info_s.kmer_size, info_s.count_slots, info_s.count_bytes) == (
        info_w.kmer_size, info_w.count_slots, info_w.count_bytes)
    got_k, got_c, sizes = [], [], []
    for bk, bc in blocks:
        got_k.append(bk)
        got_c.append(bc)
        sizes.append(len(bk))
    assert max(sizes) <= 37 and sum(sizes) == n
    assert np.array_equal(np.concatenate(got_k), kw)
    assert np.array_equal(np.concatenate(got_c), cw)


def test_matrix_stream_uncompressed(tmp_path):
    rng = np.random.default_rng(12)
    kmers = np.sort(rng.integers(0, 2**62, 64, dtype=np.uint64))[:, None]
    counts = rng.integers(0, 200, (64, 2)).astype(np.uint32)
    path = str(tmp_path / "m.count")
    kio.write_matrix_file(path, kmers, counts, 21, partition=0, compressed=False)
    _info, blocks = kio.open_matrix_stream(path, rows_per_block=10)
    k = np.concatenate([b[0] for b in blocks])
    assert np.array_equal(k, kmers)


def test_matrix_stream_trailing_garbage(tmp_path):
    from kmdiff_tpu.utils.exceptions import FormatError

    kmers = np.arange(8, dtype=np.uint64)[:, None]
    counts = np.ones((8, 2), dtype=np.uint32)
    path = str(tmp_path / "m.count")
    kio.write_matrix_file(path, kmers, counts, 21, partition=0, compressed=False)
    with open(path, "ab") as f:
        f.write(b"\x01\x02\x03")  # not a whole record
    _info, blocks = kio.open_matrix_stream(path, rows_per_block=4)
    with pytest.raises(FormatError, match="whole record"):
        list(blocks)
