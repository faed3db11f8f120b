"""Counting engine tests.

The decisive check: counting the reference's fixture FASTA with our TPU
pipeline must reproduce the k-mer/count multiset that kmtricks produced in
the checked-in run dir (tests/data_test/km_out_dir) — true cross-engine
parity on real data, which the reference's own suite never asserts.
"""

import os

import numpy as np
import pytest

from kmdiff_tpu.cmd.options import CountOptions
from kmdiff_tpu.core.kmer import (
    canonical_packed,
    kmers_from_codes,
    packed_to_strings,
    seq_to_codes,
    string_to_packed,
)
from kmdiff_tpu.pipeline.count import (
    _flat_codes,
    count_codes_device,
    count_sample,
    host_partition_ids,
    run_count,
)


def _rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def test_device_codec_matches_host_codec():
    rng = np.random.default_rng(0)
    seq = _rand_seq(rng, 500)
    k = 21
    codes, valid = seq_to_codes(seq)
    host = canonical_packed(kmers_from_codes(codes, valid, k), k)

    km, _parts = count_codes_device(_flat_codes([seq.encode()]), k, 4)
    assert np.array_equal(km, host)


def test_device_codec_k32_and_k16_boundaries():
    rng = np.random.default_rng(1)
    seq = _rand_seq(rng, 300)
    for k in (8, 16, 17, 20, 31, 32):
        codes, valid = seq_to_codes(seq)
        host = canonical_packed(kmers_from_codes(codes, valid, k), k)
        km, _ = count_codes_device(_flat_codes([seq.encode()]), k, 4)
        assert np.array_equal(km, host), f"k={k}"


def test_device_codec_invalid_bases_and_read_breaks():
    # 'N' breaks windows; separate reads never share a window
    km, _ = count_codes_device(_flat_codes([b"ACGTNACGT"]), 4, 2)
    a = canonical_packed(
        np.stack([string_to_packed("ACGT")] * 1), 4
    )
    # each side contributes exactly one 4-mer window set: ACGT twice
    assert len(km) == 2
    assert np.array_equal(km[0], a[0]) and np.array_equal(km[1], a[0])

    km2, _ = count_codes_device(_flat_codes([b"ACGT", b"ACGT"]), 4, 2)
    assert len(km2) == 2


def test_partition_hash_host_device_agree():
    rng = np.random.default_rng(2)
    seq = _rand_seq(rng, 1000)
    km, parts = count_codes_device(_flat_codes([seq.encode()]), 21, 7)
    assert np.array_equal(host_partition_ids(km, 7), parts)
    assert parts.max() < 7


def test_count_sample_synthetic(tmp_path):
    # AAAA appears in both reads; counts accumulate across reads
    fa = tmp_path / "s.fasta"
    fa.write_text(">r1\nAAAAA\n>r2\nAAAAT\n")
    kmers, parts, counts = count_sample([str(fa)], 4, 2)
    seqs = packed_to_strings(kmers, 4)
    got = dict(zip(seqs, counts.tolist()))
    # canonical forms: AAAA (3x: 2 from r1, 1 from r2), AAAT->ATTT? canonical
    # of AAAT vs its rc ATTT -> AAAT (A<C<T<G encoded order, AAAT < ATTT)
    assert got["AAAA"] == 3
    assert got["AAAT"] == 1
    assert sum(counts) == 4


@pytest.fixture(scope="module")
def counted_fixture(tmp_path_factory, fixture_fasta_dir):
    """Run our counting engine over the reference's fixture reads."""
    out = tmp_path_factory.mktemp("km_run")
    fof = out / "fof.txt"
    fof.write_text(
        f"Control1 : {fixture_fasta_dir}/control1.fasta\n"
        f"Case1 : {fixture_fasta_dir}/case1.fasta\n"
    )
    opt = CountOptions(
        fof=str(fof), directory=str(out / "run"), kmer_size=20,
        hard_min=1, nb_partitions=4, nb_threads=2,
    )
    run_count(opt)
    with open(out / "run" / "kmdiff-count.opt", "w") as f:
        f.write("kmer_size=20, abundance_min=1\n")
    return str(out / "run")


def _load_sample_multiset(run_dir, sample, nb_parts):
    """Union of (kmer, count) across partitions, sorted by kmer."""
    from kmdiff_tpu.io.kmtricks import read_kmer_file

    all_k, all_c = [], []
    for p in range(nb_parts):
        path = os.path.join(run_dir, "counts", f"partition_{p}",
                            f"{sample}.kmer.lz4")
        _info, kmers, counts = read_kmer_file(path)
        all_k.append(kmers)
        all_c.append(counts)
    kmers = np.concatenate(all_k)
    counts = np.concatenate(all_c)
    order = np.argsort(kmers[:, 0], kind="stable")
    return kmers[order], counts[order]


def test_count_parity_with_kmtricks(counted_fixture, fixture_dir):
    """Our counts of the fixture reads == kmtricks' checked-in output."""
    for sample in ("Control1", "Case1"):
        ours_k, ours_c = _load_sample_multiset(counted_fixture, sample, 4)
        ref_k, ref_c = _load_sample_multiset(fixture_dir, sample, 4)
        assert np.array_equal(ours_k, ref_k), f"{sample}: k-mer sets differ"
        assert np.array_equal(ours_c, ref_c), f"{sample}: counts differ"


def test_count_histogram_totals_parity(counted_fixture, fixture_dir):
    from kmdiff_tpu.io.kmtricks import get_total_kmer

    ours = get_total_kmer(counted_fixture, 1, 1, 1)
    ref = get_total_kmer(fixture_dir, 1, 1, 1)
    assert ours == ref == ([160], [160])


def test_count_then_diff_e2e(counted_fixture):
    """Full own-pipeline run: our count dir through our diff."""
    from kmdiff_tpu.cmd.diff import main_diff
    from kmdiff_tpu.cmd.options import DiffOptions
    from kmdiff_tpu.core.corrector import CorrectionType

    out = os.path.join(os.path.dirname(counted_fixture), "diff_out")
    res = main_diff(DiffOptions(
        kmtricks_dir=counted_fixture,
        output_directory=out,
        nb_controls=1,
        nb_cases=1,
        threshold=0.05,
        correction=CorrectionType.BONFERRONI,
        nb_threads=2,
    ))
    assert res["total_kmers"] == 320
    assert res["control"] == 0 and res["case"] == 0


def test_count_hard_min(tmp_path):
    fa = tmp_path / "s.fasta"
    fa.write_text(">r\nAAAAAA\n>r2\nCCCC\n")  # AAAA x3, CCCC x1 (canon GGGG->CCCC)
    fof = tmp_path / "fof.txt"
    fof.write_text(f"S1 : {fa}\n")
    run_count(CountOptions(fof=str(fof), directory=str(tmp_path / "run"),
                           kmer_size=4, hard_min=2, nb_partitions=2,
                           nb_threads=1))
    from kmdiff_tpu.io.kmtricks import read_hist, read_kmer_file

    kept = []
    for p in range(2):
        _i, km, ct = read_kmer_file(
            str(tmp_path / "run" / "counts" / f"partition_{p}" / "S1.kmer.lz4"))
        kept += list(zip(packed_to_strings(km, 4), ct.tolist()))
    assert kept == [("AAAA", 3)]
    # histogram keeps pre-filter mass: total = 3 + 1
    h = read_hist(str(tmp_path / "run" / "histograms" / "S1.hist"))
    assert h.total == 4
    assert h.unique == 2


@pytest.mark.parametrize("k", [33, 40, 48, 63, 64, 65, 80, 96, 97, 127, 128])
def test_device_codec_multiword_matches_host(k):
    """Generic lane machinery covers the reference's full KMER_LIST range
    (Kmer<32/64/96/128>, /root/reference/src/main.cc:29-50) on device."""
    rng = np.random.default_rng(7)
    seq = _rand_seq(rng, 400)
    codes, valid = seq_to_codes(seq)
    host = canonical_packed(kmers_from_codes(codes, valid, k), k)
    km, parts = count_codes_device(_flat_codes([seq.encode()]), k, 4)
    assert np.array_equal(km, host), f"k={k}"
    assert np.array_equal(
        host_partition_ids(km, 4), parts
    ), f"k={k} partition hash"


@pytest.mark.parametrize("k", [40, 96, 127])
def test_count_sample_device_multiword(k):
    """Fused device counting (sort+RLE, O(distinct) D2H) for multi-word k:
    multiset parity with the host codec."""
    rng = np.random.default_rng(17)
    # duplicated reads force real counts > 1 across the sample
    reads = [_rand_seq(rng, 200) for _ in range(6)] * 2
    from kmdiff_tpu.pipeline.count import count_sample_device

    kmers, parts, counts = count_sample_device(
        [_flat_codes([s.encode() for s in reads])], k, 4
    )
    # host reference multiset
    host_all = []
    for s in reads:
        codes, valid = seq_to_codes(s)
        host_all.append(canonical_packed(kmers_from_codes(codes, valid, k), k))
    host_all = np.concatenate(host_all)
    uniq, host_counts = np.unique(host_all, axis=0, return_counts=True)
    assert len(kmers) == len(uniq)
    # compare as sorted (kmer -> count) maps
    got = {tuple(r): int(c) for r, c in zip(kmers.tolist(), counts.tolist())}
    want = {tuple(r): int(c) for r, c in zip(uniq.tolist(), host_counts.tolist())}
    assert got == want
    assert np.array_equal(host_partition_ids(kmers, 4), parts)
    # sorted by (partition, kmer) within the output
    assert np.all(np.diff(parts.astype(np.int64)) >= 0)


def test_count_then_diff_k64(tmp_path):
    """Large-k config (BASELINE.json config 4): count + diff at k=64."""
    rng = np.random.default_rng(8)
    bases = np.array(list("ACGT"))
    fof_lines = []
    for sid in ("C1", "C2", "K1", "K2"):
        fa = tmp_path / f"{sid}.fasta"
        with open(fa, "w") as f:
            for j in range(20):
                f.write(f">r{j}\n{''.join(rng.choice(bases, 120))}\n")
        fof_lines.append(f"{sid} : {fa}")
    (tmp_path / "fof.txt").write_text("\n".join(fof_lines) + "\n")

    from kmdiff_tpu.cmd.count import main_count
    from kmdiff_tpu.cmd.diff import main_diff
    from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
    from kmdiff_tpu.core.corrector import CorrectionType

    run = tmp_path / "run"
    main_count(CountOptions(fof=str(tmp_path / "fof.txt"), directory=str(run),
                            kmer_size=64, hard_min=1, nb_partitions=2,
                            nb_threads=1))
    res = main_diff(DiffOptions(
        kmtricks_dir=str(run), output_directory=str(tmp_path / "out"),
        nb_controls=2, nb_cases=2, threshold=0.9, cutoff=1.0,
        correction=CorrectionType.NOTHING, nb_threads=1,
    ))
    # every 120bp read contributes 57 64-mers; all reads distinct random
    assert res["total_kmers"] > 0
    from kmdiff_tpu.io.fasta import read_fasta

    fa = read_fasta(tmp_path / "out" / "case_kmers.fasta")
    assert all(len(s) == 64 for _n, s in fa)
    assert len(fa) == res["case"]


def test_count_k96_run_dir(tmp_path):
    """k > 64 through the full run_count path (3 u64 words on device)."""
    rng = np.random.default_rng(9)
    bases = np.array(list("ACGT"))
    fa = tmp_path / "s.fasta"
    with open(fa, "w") as f:
        for j in range(5):
            f.write(f">r{j}\n{''.join(rng.choice(bases, 200))}\n")
    (tmp_path / "fof.txt").write_text(f"S1 : {fa}\n")
    run_count(CountOptions(fof=str(tmp_path / "fof.txt"),
                           directory=str(tmp_path / "run"), kmer_size=96,
                           hard_min=1, nb_partitions=2, nb_threads=1))
    from kmdiff_tpu.io.kmtricks import read_kmer_file

    total = 0
    for p in range(2):
        info, km, ct = read_kmer_file(
            str(tmp_path / "run" / "counts" / f"partition_{p}" / "S1.kmer.lz4"))
        assert info.kmer_size == 96
        assert km.shape[1] == 3
        # partition files must be sorted (lexicographic over words)
        if len(km) > 1:
            rows = np.ascontiguousarray(km.astype(">u8")).tobytes()
            keys = [rows[i * 24 : (i + 1) * 24] for i in range(len(km))]
            assert keys == sorted(keys)
        total += int(ct.sum())
    assert total == 5 * (200 - 96 + 1)


def test_flat_codes_vectorized_parser(tmp_path):
    """Vectorized FASTA/FASTQ -> codes equals the record-parser path,
    including multi-line FASTA joins and FASTQ quality masking."""
    from kmdiff_tpu.io.fasta import flat_codes, read_sequences
    from kmdiff_tpu.ops.codec import INVALID

    fa = tmp_path / "m.fasta"
    fa.write_text(">r1 desc\nACGTAC\nGTTT\n>r2\nGGGG\n")
    codes = flat_codes(str(fa))
    # reconstruct: valid runs must be the joined sequences
    runs = []
    cur = []
    for c in codes:
        if c == INVALID:
            if cur:
                runs.append(cur)
                cur = []
        else:
            cur.append(int(c))
    if cur:
        runs.append(cur)
    seqs = read_sequences(str(fa))
    from kmdiff_tpu.core.kmer import seq_to_codes

    expect = [list(seq_to_codes(s)[0]) for s in seqs]
    assert runs == expect
    assert seqs == [b"ACGTACGTTT", b"GGGG"]

    # FASTQ with ACGT-looking quality bytes must not leak into codes
    fq = tmp_path / "m.fastq"
    fq.write_text("@r1\nACGT\n+\nACGT\n@r2\nTTTT\n+\nGGGG\n")
    codes_q = flat_codes(str(fq))
    runs_q = []
    cur = []
    for c in codes_q:
        if c == INVALID:
            if cur:
                runs_q.append(cur)
                cur = []
        else:
            cur.append(int(c))
    if cur:
        runs_q.append(cur)
    expect_q = [list(seq_to_codes(s)[0]) for s in (b"ACGT", b"TTTT")]
    assert runs_q == expect_q


def test_flat_codes_gz_and_counting_equivalence(tmp_path):
    import gzip as _gz

    from kmdiff_tpu.io.fasta import flat_codes

    rng = np.random.default_rng(13)
    seqs = ["".join(rng.choice(list("ACGT"), 80)) for _ in range(30)]
    text = "".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs))
    (tmp_path / "a.fasta").write_text(text)
    with _gz.open(tmp_path / "a.fasta.gz", "wt") as f:
        f.write(text)
    np.testing.assert_array_equal(
        flat_codes(str(tmp_path / "a.fasta")),
        flat_codes(str(tmp_path / "a.fasta.gz")),
    )

    # counting through the new parser matches the per-read path
    kmers, parts, counts = count_sample([str(tmp_path / "a.fasta")], 21, 4)
    codes = _flat_codes([s.encode() for s in seqs])
    km2, pt2 = count_codes_device(codes, 21, 4)
    uniq = np.unique(km2[:, 0])
    assert np.array_equal(np.sort(kmers[:, 0]), np.sort(uniq))
    assert counts.sum() == len(km2)


def test_count_multi_file_sample_and_fof_ab_min(tmp_path):
    """fof features: multiple read files per sample ('a; b') and per-sample
    hard-min override ('! n') (reference: kmtricks fof syntax)."""
    (tmp_path / "a.fasta").write_text(">r\nAAAAAA\n")   # AAAA x3
    (tmp_path / "b.fasta").write_text(">r\nAAAAA\n")    # AAAA x2 more
    (tmp_path / "c.fasta").write_text(">r\nAAAACCCC\n")  # AAAA x1, others
    fof = tmp_path / "fof.txt"
    fof.write_text(
        f"S1 : {tmp_path}/a.fasta; {tmp_path}/b.fasta\n"
        f"S2 : {tmp_path}/c.fasta ! 2\n"
    )
    run_count(CountOptions(fof=str(fof), directory=str(tmp_path / "run"),
                           kmer_size=4, hard_min=1, nb_partitions=2,
                           nb_threads=1))
    from kmdiff_tpu.io.kmtricks import read_kmer_file

    def sample_counts(sid):
        got = {}
        for p in range(2):
            _i, km, ct = read_kmer_file(str(
                tmp_path / "run" / "counts" / f"partition_{p}" / f"{sid}.kmer.lz4"))
            for s, c in zip(packed_to_strings(km, 4), ct.tolist()):
                got[s] = c
        return got

    s1 = sample_counts("S1")
    assert s1["AAAA"] == 5  # counts accumulate across the sample's files
    s2 = sample_counts("S2")
    # S2's ab_min override (2) drops its count-1 k-mers (AAAA appears once)
    assert "AAAA" not in s2


@pytest.mark.parametrize("n", [1, 15, 16, 17, 31, 32, 33, 4097])
def test_pack_codes_roundtrip(n):
    """pack_codes_host -> unpack_codes reproduces the u8 code array
    exactly, INVALID marks included, at every word-boundary edge."""
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import (
        INVALID,
        pack_codes_host,
        unpack_codes,
    )

    rng = np.random.default_rng(n)
    codes = rng.integers(0, 4, n, dtype=np.uint8)
    bad = rng.random(n) < 0.1
    codes[bad] = INVALID
    buf = pack_codes_host(codes)
    got = np.asarray(unpack_codes(jnp.asarray(buf), n))
    assert np.array_equal(got, codes)


def test_count_packed_vs_raw_upload_identity(monkeypatch):
    """The opt-in packed-upload dispatch (KMDIFF_PACKED_CODES=1) and the
    default raw-u8 kernel produce identical streams."""
    import kmdiff_tpu.pipeline.count as pc

    rng = np.random.default_rng(5)
    reads = [_rand_seq(rng, 400) for _ in range(20)] * 2
    codes = _flat_codes([s.encode() for s in reads])
    raw = pc.count_sample_device([codes], 21, 4)
    monkeypatch.setenv("KMDIFF_PACKED_CODES", "1")
    packed = pc.count_sample_device([codes], 21, 4)
    for a, b in zip(packed, raw):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("k", [21, 55])
def test_count_sample_device_chunked_parity(k, monkeypatch):
    """The chunked sort path (blocks grouped into <= SORT_ROWS sorts +
    host k-way merge of the distinct streams) is byte-identical to the
    single-sort path."""
    import kmdiff_tpu.pipeline.count as pc

    rng = np.random.default_rng(23)
    reads = [_rand_seq(rng, 500) for _ in range(40)] * 3
    codes = _flat_codes([s.encode() for s in reads])

    big = pc.count_sample_device([codes], k, 4)
    # a tiny chunk budget forces several sort chunks AND a multi-stream
    # host merge with cross-chunk duplicate k-mers
    monkeypatch.setattr(pc, "SORT_ROWS", 1 << 13)
    small = pc.count_sample_device([codes], k, 4)
    for a, b in zip(big, small):
        assert np.array_equal(a, b)


def test_merge_streams_fallback_parity():
    """numpy fallback of _merge_streams matches the native k-way merge."""
    from kmdiff_tpu.pipeline.count import _merge_streams

    rng = np.random.default_rng(31)
    streams = []
    for _ in range(4):
        km = rng.integers(0, 60, (rng.integers(1, 400), 2), dtype=np.uint64)
        km = km[np.lexsort((km[:, 1], km[:, 0]))]
        keep = np.ones(len(km), bool)
        keep[1:] = np.any(km[1:] != km[:-1], axis=1)
        km = km[keep]
        streams.append((km, rng.integers(1, 9, len(km), dtype=np.uint32)))
    native_k, native_c = _merge_streams(streams)

    import builtins

    real_import = builtins.__import__

    def block_native(name, *a, **kw):
        if name == "kmdiff_tpu.native":
            raise ImportError("blocked for test")
        return real_import(name, *a, **kw)

    builtins.__import__ = block_native
    try:
        fb_k, fb_c = _merge_streams(streams)
    finally:
        builtins.__import__ = real_import
    assert np.array_equal(native_k, fb_k)
    assert np.array_equal(native_c, fb_c)


def test_merge_streams_beyond_native_cap():
    """>64 chunk streams reduce hierarchically through the 64-way native
    merge instead of erroring."""
    from kmdiff_tpu.pipeline.count import _merge_streams

    streams = [
        (np.array([[s]], dtype=np.uint64), np.array([1], dtype=np.uint32))
        for s in range(70)
    ] + [(np.array([[7]], dtype=np.uint64), np.array([3], dtype=np.uint32))]
    km, ct = _merge_streams(streams)
    assert len(km) == 70
    got = dict(zip(km[:, 0].tolist(), ct.tolist()))
    assert got[7] == 4 and got[0] == 1


def test_count_chunk_cut_points(monkeypatch):
    """Chunk cut points carry k-1 codes of overlap: every window lands in
    exactly one chunk even when a cut slices through a read, and the
    chunked result is byte-identical to the single-chunk one."""
    import kmdiff_tpu.pipeline.count as pc

    rng = np.random.default_rng(41)
    # one long read far wider than the forced chunk budget: windows
    # MUST span cut points (the multi-read case can hide off-by-ones when
    # cuts land on separators)
    reads = [_rand_seq(rng, 30_000)]
    codes = _flat_codes([s.encode() for s in reads])
    ref = pc.count_sample_device([codes], 21, 4)
    monkeypatch.setattr(pc, "SORT_ROWS", 1 << 12)
    got = pc.count_sample_device([codes], 21, 4)
    for a, b in zip(ref, got):
        assert np.array_equal(a, b)
    # counts must cover every window exactly once
    assert int(got[2].sum()) == len(codes) - 21 + 1
