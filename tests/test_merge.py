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
