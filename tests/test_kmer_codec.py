"""Host k-mer codec tests (packing, canonical form, fixture cross-check).

Mirrors the reference's kmer_test.cpp roundtrip strategy and adds a golden
cross-check: canonical k-mer sets extracted from the fixture FASTA must equal
the sets in the kmtricks-produced partition files.
"""

import numpy as np
import pytest

from kmdiff_tpu.core import kmer as KC
from kmdiff_tpu.io.kmtricks import read_kmer_file


def _random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


@pytest.mark.parametrize("k", [11, 20, 31, 32, 33, 64, 65, 128])
def test_pack_unpack_roundtrip(k):
    seqs = [_random_dna(k, s) for s in range(20)]
    packed = np.stack([KC.string_to_packed(s) for s in seqs])
    assert packed.shape == (20, KC.n_words(k))
    back = KC.packed_to_strings(packed, k)
    assert back == seqs


@pytest.mark.parametrize("k", [15, 32, 33, 96])
def test_revcomp_involution(k):
    seqs = [_random_dna(k, 100 + s) for s in range(10)]
    packed = np.stack([KC.string_to_packed(s) for s in seqs])
    rc2 = KC.revcomp_packed(KC.revcomp_packed(packed, k), k)
    assert np.array_equal(packed, rc2)


def test_revcomp_string():
    p = KC.string_to_packed("ACGTT")[None, :]
    rc = KC.revcomp_packed(p, 5)
    assert KC.packed_to_strings(rc, 5) == ["AACGT"]


def test_canonical_is_min_of_pair():
    # encoded order is A<C<T<G (code order), not alphabetical
    for s in ["ACGTACGTAC", "TTTTTTTTTT", "GGGGGGGGGG", "ATATATATAT"]:
        p = KC.string_to_packed(s)[None, :]
        canon = KC.canonical_packed(p, len(s))
        rc = KC.revcomp_packed(p, len(s))
        expect = p if p[0, 0] <= rc[0, 0] else rc
        assert np.array_equal(canon, expect)


def test_sort_packed_lexicographic():
    k = 40  # two words
    seqs = sorted(_random_dna(k, 200 + s) for s in range(50))
    packed = np.stack([KC.string_to_packed(s) for s in seqs])
    rng = np.random.default_rng(0)
    perm = rng.permutation(50)
    shuffled = packed[perm]
    srt, payload = KC.sort_packed(shuffled, perm.astype(np.int64))
    # lexicographic string order == encoded order only when compared on
    # encoded codes; verify against python sort of encoded tuples instead
    enc_sorted = sorted(map(tuple, packed.tolist()))
    assert [tuple(r) for r in srt.tolist()] == enc_sorted


def test_kmers_from_codes_drops_invalid():
    codes, valid = KC.seq_to_codes("ACGTNACGTACGT")
    out = KC.kmers_from_codes(codes, valid, 5)
    # windows overlapping the N (positions 0..4) are dropped: 13-5+1=9 windows,
    # N at index 4 kills windows starting 0..4 -> 4 remain... window starts
    # 0,1,2,3,4 contain index 4; starts 5..8 are clean
    assert len(out) == 4


def test_fixture_kmer_sets_match_fasta(fixture_dir, fixture_fasta_dir):
    """Golden: canonical 20-mer sets from FASTA == kmtricks file contents,
    and per-partition files are sorted (reference fixture golden totals:
    160 k-mers/sample, tests/merge_test.cpp:38-45)."""
    import os

    for sample, fasta in [("Control1", "control1.fasta"), ("Case1", "case1.fasta")]:
        kmers_file = []
        for p in range(4):
            info, kmers, counts = read_kmer_file(
                os.path.join(fixture_dir, "counts", f"partition_{p}", f"{sample}.kmer.lz4")
            )
            assert info.kmer_size == 20
            if len(kmers) > 1:
                assert np.all(kmers[:-1, 0] <= kmers[1:, 0])
            kmers_file.append(kmers[:, 0])
        kmers_file = np.sort(np.concatenate(kmers_file))
        assert len(kmers_file) == 160

        seqs = []
        cur = []
        with open(os.path.join(fixture_fasta_dir, fasta)) as f:
            for line in f:
                if line.startswith(">"):
                    if cur:
                        seqs.append("".join(cur))
                        cur = []
                else:
                    cur.append(line.strip())
            if cur:
                seqs.append("".join(cur))
        allk = []
        for seq in seqs:
            codes, valid = KC.seq_to_codes(seq)
            allk.append(KC.kmers_from_codes(codes, valid, 20))
        canon = KC.canonical_packed(np.concatenate(allk), 20)
        mine = np.unique(canon[:, 0])
        assert np.array_equal(mine, kmers_file)
