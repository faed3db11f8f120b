"""Accumulator tests: push -> finish -> blocks roundtrip for all three
strategies (reference: tests/accumulator_test.cpp:26-107), including the
LZ4 file spill, counts_ratio payloads, and resume probing."""

import os

import numpy as np
import pytest

from kmdiff_tpu.io.accumulator import (
    FileAccumulator,
    KmerSignBlock,
    SetAccumulator,
    VectorAccumulator,
    partitions_exist,
)


def _block(rng, n, nw=1, nb_samples=0):
    return KmerSignBlock(
        rng.integers(0, 2**63, (n, nw), dtype=np.uint64),
        rng.uniform(0, 1, n),
        rng.integers(0, 3, n).astype(np.int8),
        rng.uniform(0, 100, n),
        rng.uniform(0, 100, n),
        rng.uniform(0, 50, (n, nb_samples)) if nb_samples else None,
    )


def _assert_blocks_equal(a: KmerSignBlock, b: KmerSignBlock):
    np.testing.assert_array_equal(a.kmers, b.kmers)
    np.testing.assert_array_equal(a.pvalues, b.pvalues)
    np.testing.assert_array_equal(a.signs, b.signs)
    np.testing.assert_array_equal(a.mean_control, b.mean_control)
    np.testing.assert_array_equal(a.mean_case, b.mean_case)
    if a.counts_ratio is None:
        assert b.counts_ratio is None
    else:
        np.testing.assert_array_equal(a.counts_ratio, b.counts_ratio)


def test_vector_accumulator_roundtrip():
    rng = np.random.default_rng(0)
    acc = VectorAccumulator()
    blocks = [_block(rng, 10), _block(rng, 5)]
    for b in blocks:
        acc.push_block(b)
    acc.finish()
    assert acc.size() == 15
    got = list(acc.blocks())
    assert len(got) == 2
    for a, b in zip(blocks, got):
        _assert_blocks_equal(a, b)
    acc.destroy()
    assert acc.size() == 0


def test_set_accumulator_dedups():
    rng = np.random.default_rng(1)
    b1 = _block(rng, 8)
    # duplicate the first 3 k-mers with different payloads
    b2 = KmerSignBlock(
        b1.kmers[:3].copy(),
        np.full(3, 0.5),
        np.zeros(3, np.int8),
        np.zeros(3),
        np.zeros(3),
    )
    acc = SetAccumulator()
    acc.push_block(b1)
    acc.push_block(b2)
    acc.finish()
    assert acc.size() == 8  # duplicates collapsed, first wins
    got = KmerSignBlock.concat(list(acc.blocks()))
    # k-mer set equals b1's set
    assert {tuple(r) for r in got.kmers.tolist()} == {
        tuple(r) for r in b1.kmers.tolist()
    }


@pytest.mark.parametrize("nb_samples", [0, 4])
def test_file_accumulator_spill_roundtrip(tmp_path, nb_samples):
    rng = np.random.default_rng(2)
    path = str(tmp_path / "p0_uncorrected")
    acc = FileAccumulator(path, kmer_size=31, nb_samples=nb_samples)
    blocks = [_block(rng, 100, nb_samples=nb_samples),
              _block(rng, 7, nb_samples=nb_samples)]
    for b in blocks:
        acc.push_block(b)
    acc.finish()
    assert acc.size() == 107
    got = list(acc.blocks())
    assert sum(len(b) for b in got) == 107
    _assert_blocks_equal(blocks[0], got[0])
    _assert_blocks_equal(blocks[1], got[1])

    # re-open in read mode (the resume path)
    acc2 = FileAccumulator(path, kmer_size=0, read=True)
    assert acc2.kmer_size == 31
    assert acc2.nb_samples == nb_samples
    got2 = list(acc2.blocks())
    _assert_blocks_equal(blocks[0], got2[0])

    # delete_on_destroy honors keep semantics
    acc3 = FileAccumulator(path, kmer_size=0, read=True, delete_on_destroy=True)
    acc3.destroy()
    assert not os.path.exists(path)


def test_file_accumulator_multiword(tmp_path):
    rng = np.random.default_rng(3)
    path = str(tmp_path / "p0")
    acc = FileAccumulator(path, kmer_size=96)
    b = _block(rng, 20, nw=3)
    acc.push_block(b)
    acc.finish()
    _assert_blocks_equal(b, next(iter(acc.blocks())))


def test_partitions_exist(tmp_path):
    assert not partitions_exist("{}/p{}_x", 2, str(tmp_path))
    (tmp_path / "p0_x").write_bytes(b"")
    (tmp_path / "p1_x").write_bytes(b"")
    assert partitions_exist("{}/p{}_x", 2, str(tmp_path))


def test_empty_push_ignored(tmp_path):
    acc = FileAccumulator(str(tmp_path / "p"), kmer_size=21)
    acc.push_block(KmerSignBlock.empty(1))
    acc.finish()
    assert acc.size() == 0
    assert list(acc.blocks()) == []


def test_unfinished_spill_invisible_to_resume(tmp_path):
    """A crash mid-spill must not leave a file at the final name: resume's
    partitions_exist probe would re-open a TRUNCATED spill and die in the
    LZ4 decoder mid-aggregation (observed with a killed popstrat pass).
    Spills live at <path>.part until finish() renames them."""
    from kmdiff_tpu.io.accumulator import (
        FileAccumulator,
        KmerSignBlock,
        partitions_exist,
    )

    path = str(tmp_path / "p0_uncorrected")
    acc = FileAccumulator(path, 21)
    block = KmerSignBlock(
        np.arange(4, dtype=np.uint64).reshape(4, 1),
        np.full(4, 0.5), np.zeros(4, np.int8), np.ones(4), np.ones(4), None,
    )
    acc.push_block(block)
    # "crash": no finish(); only the .part file exists
    assert not os.path.exists(path)
    assert os.path.exists(path + ".part")
    assert not partitions_exist("{}/p{}_uncorrected", 1, str(tmp_path))

    acc.destroy()  # abandoned write cleans its .part
    assert not os.path.exists(path + ".part")

    acc2 = FileAccumulator(path, 21)
    acc2.push_block(block)
    acc2.finish()
    assert os.path.exists(path) and not os.path.exists(path + ".part")
    assert partitions_exist("{}/p{}_uncorrected", 1, str(tmp_path))
    got = list(acc2.blocks())
    assert len(got) == 1 and len(got[0]) == 4
    acc2.destroy()
