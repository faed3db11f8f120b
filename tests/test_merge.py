"""Merge layer tests: vectorized union merge + device-filtered LRT.

Mirrors the reference's integration test (reference: tests/merge_test.cpp:
12-46 — histogram totals 160/160, 320 k-mers tested, 0 significant) and adds
exactness checks the reference lacks.
"""

import numpy as np
import pytest

from kmdiff_tpu.core.model import PoissonLikelihood, Significance
from kmdiff_tpu.io.accumulator import VectorAccumulator
from kmdiff_tpu.io.kmtricks import get_partition_paths, get_total_kmer, read_config
from kmdiff_tpu.io.accumulator import KmerSignBlock
from kmdiff_tpu.pipeline.merge import (
    GlobalMerge,
    PartitionProcessor,
    merge_sorted_streams,
)


def test_merge_sorted_streams_union():
    # two sorted streams with partial overlap
    k1 = np.array([[1], [3], [5]], dtype=np.uint64)
    c1 = np.array([10, 20, 30], dtype=np.uint32)
    k2 = np.array([[2], [3], [7]], dtype=np.uint64)
    c2 = np.array([1, 2, 3], dtype=np.uint32)
    kmers, counts = merge_sorted_streams([k1, k2], [c1, c2])
    assert kmers[:, 0].tolist() == [1, 2, 3, 5, 7]
    assert counts.tolist() == [[10, 0], [0, 1], [20, 2], [30, 0], [0, 3]]


def test_merge_sorted_streams_multiword():
    k1 = np.array([[0, 5], [1, 0]], dtype=np.uint64)
    c1 = np.array([7, 8], dtype=np.uint32)
    k2 = np.array([[0, 6], [1, 0]], dtype=np.uint64)
    c2 = np.array([9, 4], dtype=np.uint32)
    kmers, counts = merge_sorted_streams([k1, k2], [c1, c2])
    assert kmers.tolist() == [[0, 5], [0, 6], [1, 0]]
    assert counts.tolist() == [[7, 0], [0, 9], [8, 4]]


def test_merge_sorted_streams_empty():
    k = np.zeros((0, 1), dtype=np.uint64)
    c = np.zeros(0, dtype=np.uint32)
    kmers, counts = merge_sorted_streams([k, k], [c, c])
    assert kmers.shape == (0, 1)
    assert counts.shape == (0, 2)


@pytest.fixture(scope="module")
def fixture_setup(fixture_dir):
    config = read_config(fixture_dir)
    totals_c, totals_k = get_total_kmer(fixture_dir, 1, 1, config.abundance_min)
    return fixture_dir, config, totals_c, totals_k


def test_fixture_totals(fixture_setup):
    _dir, config, totals_c, totals_k = fixture_setup
    assert config.kmer_size == 20
    assert config.nb_partitions == 4
    # golden values from reference tests/merge_test.cpp:38-41
    assert totals_c == [160]
    assert totals_k == [160]


def _run_fixture_merge(fixture_setup, threshold):
    fdir, config, totals_c, totals_k = fixture_setup
    model = PoissonLikelihood(1, 1, totals_c, totals_k)
    proc = PartitionProcessor(model, 1, 1, threshold)
    accs = [VectorAccumulator() for _ in range(config.nb_partitions)]
    merger = GlobalMerge(proc, accs, nb_threads=2)
    total = merger.merge_partitions(
        get_partition_paths(fdir, config.nb_partitions)
    )
    return merger, accs, total


def test_fixture_merge_totals(fixture_setup):
    # reference golden: 320 k-mers tested, 0 significant at alpha/cutoff
    merger, _accs, total = _run_fixture_merge(fixture_setup, 0.05 / 1e5)
    assert total == 320
    assert merger.nb_sign() == 0


def test_fixture_merge_threshold_one_keeps_everything(fixture_setup):
    merger, accs, total = _run_fixture_merge(fixture_setup, 1.0)
    assert total == 320
    assert merger.nb_sign() == 320
    n = sum(a.size() for a in accs)
    assert n == 320


def test_fixture_pvalues_match_exact_model(fixture_setup):
    """Device-filtered p-values == direct f64 scoring of the merged matrix."""
    fdir, config, totals_c, totals_k = fixture_setup
    from kmdiff_tpu.io.kmtricks import read_kmer_file

    model = PoissonLikelihood(1, 1, totals_c, totals_k)
    merger, accs, _ = _run_fixture_merge(fixture_setup, 1.0)

    for p, paths in enumerate(get_partition_paths(fdir, config.nb_partitions)):
        kmers_list, counts_list = [], []
        for path in paths:
            _info, kmers, counts = read_kmer_file(path)
            kmers_list.append(kmers)
            counts_list.append(counts)
        kmers, counts = merge_sorted_streams(kmers_list, counts_list)
        pv, sg, mc, mk = model.process_block(counts, 1)
        got = list(accs[p].blocks())
        assert len(got) == 1
        blk = got[0]
        assert np.array_equal(blk.kmers, kmers)
        np.testing.assert_array_equal(blk.pvalues, pv)
        np.testing.assert_array_equal(blk.signs, sg)
        np.testing.assert_array_equal(blk.mean_control, mc)
        np.testing.assert_array_equal(blk.mean_case, mk)


def test_device_filter_never_drops_f64_hits(fixture_setup):
    """The f32 device filter with margin keeps every exact-f64 survivor."""
    fdir, config, totals_c, totals_k = fixture_setup
    from kmdiff_tpu.io.kmtricks import read_kmer_file

    model = PoissonLikelihood(1, 1, totals_c, totals_k)
    # a threshold in the interesting range for this tiny fixture
    for threshold in (0.5, 0.1, 0.01):
        merger, accs, _ = _run_fixture_merge(fixture_setup, threshold)
        expected = 0
        for p, paths in enumerate(get_partition_paths(fdir, config.nb_partitions)):
            kmers_list, counts_list = [], []
            for path in paths:
                _info, kmers, counts = read_kmer_file(path)
                kmers_list.append(kmers)
                counts_list.append(counts)
            _, counts = merge_sorted_streams(kmers_list, counts_list)
            pv, _, _, _ = model.process_block(counts, 1)
            expected += int(np.sum(pv <= threshold))
        assert merger.nb_sign() == expected


def test_chunked_device_merge_matches_single_dispatch(fixture_setup, monkeypatch):
    """Key-range streaming (MAX_DEVICE_ROWS exceeded) must produce the
    same totals, survivors, and p-values as one dispatch."""
    import kmdiff_tpu.pipeline.merge as pm

    ref_merger, ref_accs, ref_total = _run_fixture_merge(fixture_setup, 0.5)
    ref_blocks = [list(a.blocks()) for a in ref_accs]

    monkeypatch.setattr(pm, "MAX_DEVICE_ROWS", 64)  # force ~3 chunks/partition
    merger, accs, total = _run_fixture_merge(fixture_setup, 0.5)
    assert total == ref_total == 320
    assert merger.nb_sign() == ref_merger.nb_sign()
    assert merger.signs() == ref_merger.signs()
    for p in range(4):
        got = pm.KmerSignBlock.concat(list(accs[p].blocks()))
        want = pm.KmerSignBlock.concat(ref_blocks[p])
        assert np.array_equal(got.kmers, want.kmers)
        np.testing.assert_array_equal(got.pvalues, want.pvalues)
        np.testing.assert_array_equal(got.signs, want.signs)


def test_chunked_device_merge_with_sampler(fixture_setup, monkeypatch):
    """Geno sampling across chunks equals the single-dispatch sampling."""
    import kmdiff_tpu.pipeline.merge as pm
    from kmdiff_tpu.core.model import PoissonLikelihood
    from kmdiff_tpu.io.accumulator import VectorAccumulator

    fdir, config, totals_c, totals_k = fixture_setup

    class Collect:
        def __init__(self):
            self.rate = 0.5
            self.seed = 3
            self.rows = {}

        def add_sampled(self, partition, presence):
            self.rows[partition] = presence

        def sample_block(self, partition, kmers, counts, nb_controls):
            from kmdiff_tpu.pipeline.popstrat import sample_mask

            mask = sample_mask(kmers, self.rate, self.seed)
            self.add_sampled(partition, (counts[mask] > 0).astype(np.uint8))

    def run(sampler):
        model = PoissonLikelihood(1, 1, totals_c, totals_k)
        proc = PartitionProcessor(model, 1, 1, 0.5, keep_counts=True,
                                  sampler=sampler)
        accs = [VectorAccumulator() for _ in range(config.nb_partitions)]
        GlobalMerge(proc, accs, nb_threads=1).merge_partitions(
            get_partition_paths(fdir, config.nb_partitions))
        return sampler.rows

    ref_rows = run(Collect())
    monkeypatch.setattr(pm, "MAX_DEVICE_ROWS", 64)
    got_rows = run(Collect())
    for p in range(4):
        np.testing.assert_array_equal(got_rows[p], ref_rows[p])


def test_device_merge_empty_partition(tmp_path):
    """A partition where no sample has k-mers must not crash and count 0."""
    from kmdiff_tpu.io.kmtricks import write_kmer_file

    paths = []
    for sid in ("A", "B"):
        p = tmp_path / f"{sid}.kmer.lz4"
        write_kmer_file(str(p), np.zeros((0, 1), np.uint64),
                        np.zeros(0, np.uint32), 21, 0, 0)
        paths.append(str(p))
    model = PoissonLikelihood(1, 1, [100], [100])
    proc = PartitionProcessor(model, 1, 1, 0.5)
    acc = VectorAccumulator()
    res = proc.process_files(0, paths, acc)
    assert res.total_kmers == 0
    assert res.nb_sign == 0


def test_device_merge_single_sample_has_kmers(tmp_path):
    from kmdiff_tpu.core.kmer import string_to_packed
    from kmdiff_tpu.io.kmtricks import write_kmer_file

    km = np.sort(np.stack([string_to_packed("ACGTACGTACGTACGTACGTA"),
                           string_to_packed("TTTTACGTACGTACGTACGTA")])[:, :1],
                 axis=0).astype(np.uint64)
    pa = tmp_path / "A.kmer.lz4"
    pb = tmp_path / "B.kmer.lz4"
    write_kmer_file(str(pa), km, np.array([5, 9], np.uint32), 21, 0, 0)
    write_kmer_file(str(pb), np.zeros((0, 1), np.uint64),
                    np.zeros(0, np.uint32), 21, 1, 0)
    model = PoissonLikelihood(1, 1, [1000], [1000])
    proc = PartitionProcessor(model, 1, 1, 1.0)
    acc = VectorAccumulator()
    res = proc.process_files(0, [str(pa), str(pb)], acc)
    assert res.total_kmers == 2
    blk = next(iter(acc.blocks()))
    assert len(blk) == 2
    # all counts on the control side -> CONTROL sign
    assert (blk.signs == 0).all()


def test_device_merge_k40_matches_host_path(tmp_path):
    """4-lane device merge (32 < k <= 64) == dense host scoring."""
    from kmdiff_tpu.core.kmer import kmers_from_codes, seq_to_codes, canonical_packed, sort_packed
    from kmdiff_tpu.io.kmtricks import write_kmer_file

    k = 40
    rng = np.random.default_rng(11)
    paths = []
    sample_kmers = []
    for sid in ("A", "B", "C", "D"):
        seq = "".join(rng.choice(list("ACGT"), 500))
        codes, valid = seq_to_codes(seq)
        km = canonical_packed(kmers_from_codes(codes, valid, k), k)
        km, = sort_packed(km)
        # dedup with counts
        uniq, counts = np.unique(km, axis=0, return_counts=True)
        p = tmp_path / f"{sid}.kmer.lz4"
        write_kmer_file(str(p), uniq, counts.astype(np.uint32), k, 0, 0)
        paths.append(str(p))
        sample_kmers.append((uniq, counts.astype(np.uint32)))

    model = PoissonLikelihood(2, 2, [1000, 1000], [1000, 1000])
    # device path
    proc = PartitionProcessor(model, 2, 2, 0.9)
    acc_dev = VectorAccumulator()
    res = proc.process_files(0, paths, acc_dev)

    # host reference scoring
    kmers, counts = merge_sorted_streams(
        [x[0] for x in sample_kmers], [x[1] for x in sample_kmers]
    )
    pv, sg, mc, mk = model.process_block(counts, 2)
    keep = pv <= 0.9
    assert res.total_kmers == len(kmers)
    blk = KmerSignBlock.concat(list(acc_dev.blocks())) if acc_dev.size() else None
    from kmdiff_tpu.io.accumulator import KmerSignBlock as KSB

    assert blk is not None
    assert np.array_equal(blk.kmers, kmers[keep])
    np.testing.assert_array_equal(blk.pvalues, pv[keep])
    np.testing.assert_array_equal(blk.signs, sg[keep])


def test_wide_sums_counts_near_u32_max(tmp_path):
    """Cohort totals >= 2^31 switch the device merge to the 16-bit-split
    wide sum path; sums, means, and p-values must be exact at counts
    beyond int32 range (VERDICT item 7: int32 group sums capped cohort
    scale)."""
    from kmdiff_tpu.io.kmtricks import write_kmer_file

    k = 20
    # 2 controls + 2 cases; each sample holds the same 3 k-mers with
    # counts big enough that group sums exceed 2^31
    kmers = np.array([[5], [9], [123456]], dtype=np.uint64)
    per_sample = [
        np.array([2_000_000_000, 1_500_000_000, 7], dtype=np.uint32),
        np.array([1_900_000_000, 1_600_000_000, 5], dtype=np.uint32),
        np.array([400_000_000, 3_100_000_000, 6], dtype=np.uint32),
        np.array([300_000_000, 3_000_000_000, 8], dtype=np.uint32),
    ]
    paths = []
    for i, cts in enumerate(per_sample):
        path = str(tmp_path / f"s{i}.kmer.lz4")
        write_kmer_file(path, kmers, cts, k, sample_idx=i, partition=0,
                        count_bytes=4)
        paths.append(path)

    tot_c = [int(per_sample[0].sum()), int(per_sample[1].sum())]
    tot_k = [int(per_sample[2].sum()), int(per_sample[3].sum())]
    model = PoissonLikelihood(2, 2, tot_c, tot_k)
    proc = PartitionProcessor(model, 2, 2, threshold=1.0, keep_counts=True)
    assert proc.params.wide_sums

    acc = VectorAccumulator()
    res = proc.process_files(0, paths, acc)
    assert res.total_kmers == 3
    assert res.nb_sign == 3
    blk = KmerSignBlock.concat(list(acc.blocks()))

    # exact expectation from int64 host arithmetic
    s_c = per_sample[0].astype(np.int64) + per_sample[1].astype(np.int64)
    s_k = per_sample[2].astype(np.int64) + per_sample[3].astype(np.int64)
    pv, sg, mc, mk = model.process_sums(s_c, s_k)
    order = np.argsort(blk.kmers[:, 0])
    np.testing.assert_array_equal(blk.kmers[order], kmers)
    np.testing.assert_array_equal(blk.pvalues[order], pv)
    np.testing.assert_array_equal(blk.signs[order], sg)
    np.testing.assert_array_equal(blk.mean_control[order], mc)
    np.testing.assert_array_equal(blk.mean_case[order], mk)
    # survivor count rows round-trip as exact uint32 magnitudes
    np.testing.assert_array_equal(
        blk.counts_ratio[order],
        np.stack(per_sample, axis=1).astype(np.float64),
    )

    # the host-merge path (process_arrays) agrees
    from kmdiff_tpu.pipeline.merge import merge_sorted_streams

    km2, counts2 = merge_sorted_streams(
        [kmers] * 4, [c for c in per_sample]
    )
    acc2 = VectorAccumulator()
    proc2 = PartitionProcessor(model, 2, 2, threshold=1.0)
    proc2.process_arrays(0, km2, counts2, acc2, kmer_size=k)
    blk2 = KmerSignBlock.concat(list(acc2.blocks()))
    order2 = np.argsort(blk2.kmers[:, 0])
    np.testing.assert_array_equal(blk2.pvalues[order2], pv)
    np.testing.assert_array_equal(blk2.signs[order2], sg)


def test_packed16_parity_with_packed32():
    """u16 count packing (ctrl bit 15) and i32 packing (sign bit) produce
    identical kernel outputs when counts < 2^15."""
    import jax.numpy as jnp

    from kmdiff_tpu.ops.merge_dev import (
        build_triples_packed,
        merge_lrt_kernel,
        pack16_ok,
    )

    rng = np.random.default_rng(3)
    S = 6
    kmers_list, counts_list = [], []
    pool = np.sort(rng.integers(0, 1 << 40, 600, dtype=np.uint64))
    for s in range(S):
        take = np.sort(rng.choice(len(pool), 400, replace=False))
        kmers_list.append(pool[take].reshape(-1, 1))
        counts_list.append(rng.integers(1, 30000, 400, dtype=np.uint32))
    assert pack16_ok(counts_list)
    big = [c.copy() for c in counts_list]
    big[0][0] = 1 << 15
    assert not pack16_ok(big)

    pad_to = 1 << 12
    outs = []
    for p16 in (False, True):
        lanes, count, _ = build_triples_packed(
            kmers_list, counts_list, pad_to, 3, pack16=p16
        )
        assert count.dtype == (np.uint16 if p16 else np.int32)
        out = merge_lrt_kernel(
            tuple(jnp.asarray(l.copy()) for l in lanes),
            jnp.zeros(1, jnp.int32),
            jnp.asarray(count.copy()),
            3, jnp.float32(1.0), jnp.float32(1.0), jnp.float32(0.5),
            jnp.uint32(0), jnp.uint32(0), 1 << 10, 1, False,
            packed_ctrl=True,
        )
        nh = int(out["n_hits"])
        blob = np.asarray(out["hit_blob"])[:nh]  # [nh, L + 2]
        outs.append((
            int(out["n_distinct"]), nh,
            blob.tolist(),
        ))
        assert list(np.asarray(out["meta"])) == [
            int(out["n_distinct"]), nh, 0,
        ]
    assert outs[0] == outs[1]
    assert outs[0][1] > 0  # the comparison covered real hits


def test_meta_in_blob_matches_separate_outputs():
    """meta_in_blob=True prepends [n_distinct, n_hits, n_geno] as blob
    row 0 and leaves the survivor rows identical to the separate-output
    dispatch (the single-read fast path in pipeline.merge)."""
    import jax.numpy as jnp

    from kmdiff_tpu.ops.merge_dev import (
        build_triples_packed,
        merge_lrt_kernel,
    )

    rng = np.random.default_rng(11)
    S = 6
    pool = np.sort(rng.integers(0, 1 << 40, 600, dtype=np.uint64))
    kmers_list, counts_list = [], []
    for _s in range(S):
        take = np.sort(rng.choice(len(pool), 400, replace=False))
        kmers_list.append(pool[take].reshape(-1, 1))
        counts_list.append(rng.integers(1, 30000, 400, dtype=np.uint32))
    pad_to = 1 << 12
    lanes, count, _ = build_triples_packed(
        kmers_list, counts_list, pad_to, 3, pack16=True
    )
    args = (
        tuple(jnp.asarray(l.copy()) for l in lanes),
        jnp.zeros(1, jnp.int32),
        jnp.asarray(count.copy()),
        3, jnp.float32(1.0), jnp.float32(1.0), jnp.float32(0.5),
        jnp.uint32(0), jnp.uint32(0), 1 << 10, 1, False,
    )
    plain = merge_lrt_kernel(*args, packed_ctrl=True)
    emb = merge_lrt_kernel(*args, packed_ctrl=True, meta_in_blob=True)
    meta = np.asarray(plain["meta"])
    blob_all = np.asarray(emb["hit_blob"])
    assert list(blob_all[0, :3]) == list(meta)
    assert (blob_all[0, 3:] == 0).all()
    nh = int(meta[1])
    assert nh > 0
    assert np.array_equal(
        blob_all[1 : 1 + nh], np.asarray(plain["hit_blob"])[:nh]
    )


def test_ranged_sort_kernel_identical():
    """The quantile-ranged batched sub-sort layout (KMDIFF_RANGED_SORT)
    must produce EXACTLY the flat kernel's outputs: same n_distinct, same
    survivor order (ranges are ascending and key-disjoint), same sums —
    mid-array sentinel pads must be invisible."""
    import jax.numpy as jnp

    from kmdiff_tpu.ops.merge_dev import (
        build_triples_packed,
        build_triples_packed_ranged,
        merge_lrt_kernel,
    )

    rng = np.random.default_rng(17)
    S = 8
    kmers_list, counts_list = [], []
    pool = np.sort(rng.integers(0, 1 << 44, 40000, dtype=np.uint64))
    for s in range(S):
        take = np.sort(rng.choice(len(pool), 30000, replace=False))
        kmers_list.append(pool[take].reshape(-1, 1))
        # strong control/case disparity so the LR filter keeps real hits
        hi = 1000 if s < 3 else 5
        counts_list.append(rng.integers(1, hi + 1, 30000, dtype=np.uint32))
    N = S * 30000
    pad_to = 1 << (N - 1).bit_length()  # 2^18

    def run(lanes, count, range_rows):
        out = merge_lrt_kernel(
            tuple(jnp.asarray(np.ascontiguousarray(l)) for l in lanes),
            jnp.zeros(1, jnp.int32),
            jnp.asarray(np.ascontiguousarray(count)),
            3, jnp.float32(0.5), jnp.float32(0.5), jnp.float32(0.2),
            jnp.uint32(0), jnp.uint32(0), 1 << 12, 1, False,
            packed_ctrl=True, range_rows=range_rows,
        )
        meta = np.asarray(out["meta"])
        nh = int(meta[1])
        return list(meta), np.asarray(out["hit_blob"])[:nh].tolist()

    lanes_f, count_f, _ = build_triples_packed(
        kmers_list, counts_list, pad_to, 3, pack16=True
    )
    flat = run(lanes_f, count_f, 0)

    res = build_triples_packed_ranged(
        kmers_list, counts_list, pad_to, 3, pack16=True,
        target_range=1 << 14,
    )
    assert res is not None, "ranged build unexpectedly fell back"
    lanes_r, count_r, n_r, M = res
    assert n_r == N and M == 1 << 14
    ranged = run(lanes_r, count_r, M)
    assert ranged == flat
    assert flat[0][1] > 0  # survivors were actually compared
