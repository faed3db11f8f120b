"""Aggregator / output tests: correction routing, FASTA format, KFF roundtrip.

The vectorized prefix-walk must match the reference's sequential corrector
semantics (reference: aggregator.hpp:240-322 + src/corrector.cpp).
"""

import os

import numpy as np
import pytest

from kmdiff_tpu.core.corrector import (
    Benjamini,
    CorrectionType,
    Holm,
    make_corrector,
)
from kmdiff_tpu.core.kmer import string_to_packed
from kmdiff_tpu.core.model import Significance
from kmdiff_tpu.io.accumulator import KmerSignBlock, VectorAccumulator
from kmdiff_tpu.io.fasta import format_header, read_fasta
from kmdiff_tpu.io.kff import KffReader, KffWriter, pack_2bit, unpack_2bit
from kmdiff_tpu.pipeline.aggregate import Aggregator


def _rand_block(rng, n, k=21, signs=None, pvals=None):
    bases = np.array(list("ACGT"))
    seqs = ["".join(rng.choice(bases, k)) for _ in range(n)]
    kmers = np.stack([string_to_packed(s) for s in seqs])
    pv = rng.uniform(0, 1, n) if pvals is None else np.asarray(pvals, float)
    sg = (
        rng.integers(0, 3, n).astype(np.int8)
        if signs is None
        else np.asarray(signs, np.int8)
    )
    return (
        KmerSignBlock(kmers, pv, sg, np.floor(pv * 100), np.floor(pv * 50)),
        seqs,
    )


def _agg(tmp_path, blocks, ctype, threshold, total, kff=False, k=21):
    accs = []
    for b in blocks:
        acc = VectorAccumulator()
        acc.push_block(b)
        acc.finish()
        accs.append(acc)
    corrector = make_corrector(ctype, threshold, total)
    agg = Aggregator(
        accs, corrector, k, str(tmp_path), kff=kff, threshold=threshold,
        total_kmers=total,
    )
    agg.run()
    return agg


def test_fasta_header_format():
    # reference format: {rank}_pval={:g}_control={int}_case={double}
    assert format_header(0, 0.25, 10.7, 3.0) == "0_pval=0.25_control=10_case=3"
    assert format_header(5, 1.5e-9, 2.0, 4.5) == "5_pval=1.5e-09_control=2_case=4.5"


def test_streaming_routing(tmp_path):
    rng = np.random.default_rng(0)
    signs = [0, 1, 2, 0, 1]  # CONTROL, CASE, NO, CONTROL, CASE
    pvals = [0.001, 0.002, 0.003, 0.5, 0.9]
    block, seqs = _rand_block(rng, 5, signs=signs, pvals=pvals)
    agg = _agg(tmp_path, [block], CorrectionType.NOTHING, 0.05, 5)
    # threshold 0.05 keeps the first three; NO routes to case file
    assert agg.counts() == (1, 2)
    control = read_fasta(tmp_path / "control_kmers.fasta")
    case = read_fasta(tmp_path / "case_kmers.fasta")
    assert [s for _, s in control] == [seqs[0]]
    assert [s for _, s in case] == [seqs[1], seqs[2]]
    assert control[0][0] == format_header(0, 0.001, block.mean_control[0],
                                          block.mean_case[0])


def test_bonferroni_boundary(tmp_path):
    rng = np.random.default_rng(1)
    total = 100
    alpha = 0.05
    cut = alpha / total
    block, _ = _rand_block(rng, 4, signs=[1, 1, 1, 1],
                           pvals=[cut / 2, cut, cut * 2, 1e-9])
    agg = _agg(tmp_path, [block], CorrectionType.BONFERRONI, alpha, total)
    # strict < boundary (reference: src/corrector.cpp:11)
    assert agg.counts() == (0, 2)


@pytest.mark.parametrize("ctype,cls", [
    (CorrectionType.BENJAMINI, Benjamini),
    (CorrectionType.HOLM, Holm),
])
def test_sorted_aggregator_matches_scalar_walk(tmp_path, ctype, cls):
    rng = np.random.default_rng(2)
    total = 5000
    alpha = 0.05
    blocks = []
    all_p = []
    for _ in range(3):
        b, _ = _rand_block(rng, 40, pvals=rng.uniform(0, 0.01, 40))
        blocks.append(b)
        all_p.extend(b.pvalues.tolist())
    agg = _agg(tmp_path, blocks, ctype, alpha, total)
    # scalar reference walk: ascending p, stop at first rejection
    scalar = cls(alpha, total)
    kept = 0
    for p in sorted(all_p):
        if not scalar.apply(p):
            break
        kept += 1
    assert sum(agg.counts()) == kept


def test_sorted_aggregator_output_is_p_ordered(tmp_path):
    rng = np.random.default_rng(3)
    block, _ = _rand_block(rng, 50, pvals=rng.uniform(0, 1e-6, 50),
                           signs=[1] * 50)
    agg = _agg(tmp_path, [block], CorrectionType.BENJAMINI, 0.05, 100)
    case = read_fasta(tmp_path / "case_kmers.fasta")
    ps = [float(name.split("pval=")[1].split("_")[0]) for name, _ in case]
    assert ps == sorted(ps)


def test_pack_unpack_2bit():
    for seq in ("ACGT", "A", "ACGTACGTACGTACGTACGTA", "TTTGGGCCCAAA"):
        assert unpack_2bit(pack_2bit(seq), len(seq)) == seq


def test_kff_roundtrip(tmp_path):
    # mirrors reference tests/kff_test.cpp: 100 random 21-mers roundtrip
    rng = np.random.default_rng(4)
    bases = np.array(list("ACGT"))
    seqs = ["".join(rng.choice(bases, 21)) for _ in range(100)]
    path = str(tmp_path / "out.kff")
    with KffWriter(path, 21) as w:
        for s in seqs:
            w.write_kmer(s)
    with KffReader(path) as r:
        got = list(r.kmers())
    assert got == seqs


def test_kff_aggregator_output(tmp_path):
    rng = np.random.default_rng(5)
    block, seqs = _rand_block(rng, 6, signs=[0, 1, 0, 1, 2, 1],
                              pvals=[1e-9] * 6)
    agg = _agg(tmp_path, [block], CorrectionType.NOTHING, 0.05, 10, kff=True)
    assert agg.counts() == (2, 4)
    with KffReader(str(tmp_path / "control_kmers.kff")) as r:
        assert list(r.kmers()) == [seqs[0], seqs[2]]
    with KffReader(str(tmp_path / "case_kmers.kff")) as r:
        assert list(r.kmers()) == [seqs[1], seqs[3], seqs[4], seqs[5]]


@pytest.mark.parametrize("ctype", [
    CorrectionType.NOTHING, CorrectionType.BONFERRONI, CorrectionType.SIDAK,
    CorrectionType.BENJAMINI, CorrectionType.HOLM,
])
def test_aggregator_matches_reference_simulation(tmp_path, ctype):
    """Randomized adversarial check against a faithful Python simulation of
    the reference's aggregation (per-partition drain + corrector calls for
    streaming types; global min-p priority-queue walk with
    stop-at-first-rejection for sorted types; CONTROL vs CASE+NO routing).
    Includes duplicated p-values to exercise tie handling."""
    rng = np.random.default_rng(int(ctype) + 10)
    total = 5000
    alpha = 0.05
    blocks, sim_items = [], []
    for part in range(3):
        n = 30
        pv = rng.uniform(0, 0.02, n)
        pv[rng.random(n) < 0.3] = 0.001  # ties
        b, seqs = _rand_block(rng, n, pvals=pv)
        blocks.append(b)
        for i in range(n):
            sim_items.append((part, float(b.pvalues[i]), int(b.signs[i]),
                              seqs[i]))

    agg = _agg(tmp_path, blocks, ctype, alpha, total)

    # --- reference simulation ---
    from kmdiff_tpu.core.corrector import make_corrector

    corrector = make_corrector(ctype, alpha, total)
    control_sim, case_sim = [], []
    if ctype in (CorrectionType.BENJAMINI, CorrectionType.HOLM):
        # sorted_aggregator: ascending p walk, stop at first rejection
        for part, p, sign, seq in sorted(sim_items, key=lambda t: t[1]):
            if not corrector.apply(p):
                break
            (control_sim if sign == 0 else case_sim).append(seq)
    else:
        # streaming aggregator: per-partition drain (order-free predicates)
        for part, p, sign, seq in sim_items:
            if corrector.apply(p):
                (control_sim if sign == 0 else case_sim).append(seq)

    control = [s for _n, s in read_fasta(tmp_path / "control_kmers.fasta")]
    case = [s for _n, s in read_fasta(tmp_path / "case_kmers.fasta")]
    if ctype in (CorrectionType.BENJAMINI, CorrectionType.HOLM):
        # tie order within equal p may differ; sets and sizes must match
        assert len(control) == len(control_sim)
        assert len(case) == len(case_sim)
        assert set(control) == set(control_sim)
        assert set(case) == set(case_sim)
    else:
        assert sorted(control) == sorted(control_sim)
        assert sorted(case) == sorted(case_sim)


@pytest.mark.parametrize("ctype", [CorrectionType.BENJAMINI, CorrectionType.HOLM])
def test_sorted_aggregator_spill_matches_in_memory(tmp_path, ctype, monkeypatch):
    """Forcing a tiny in-memory budget routes the order-dependent path
    through the external sorted-run merge; outputs must be byte-identical
    to the unconstrained in-memory walk (SURVEY.md §7(d): graceful spill;
    reference holds everything in RAM, aggregator.hpp:240-322)."""
    rng = np.random.default_rng(9)
    blocks = []
    for i in range(5):
        # duplicated p-values across blocks exercise the stable tie-break
        pv = np.round(rng.uniform(0, 0.02, 37), 4)
        b, _ = _rand_block(rng, 37, pvals=pv)
        blocks.append(b)

    ref_dir = tmp_path / "ref"
    spill_dir = tmp_path / "spill"
    ref_dir.mkdir()
    spill_dir.mkdir()
    _agg(ref_dir, [b for b in blocks], ctype, 0.05, 4000)
    monkeypatch.setattr(Aggregator, "SORT_BUDGET_ROWS", 50)
    _agg(spill_dir, [b for b in blocks], ctype, 0.05, 4000)

    for name in ("control_kmers.fasta", "case_kmers.fasta"):
        assert (spill_dir / name).read_bytes() == (ref_dir / name).read_bytes()
    # spill temp files are cleaned up
    assert not [p for p in os.listdir(spill_dir) if p.startswith("agg_run_")]


def test_kff_golden_bytes(tmp_path):
    """Pin the on-disk KFF format against a hand-derived byte string per
    the KFF v1.0 spec (reference semantics: kff_utils.hpp:32-169) — not
    just a self-roundtrip.

    Two 5-mers, k=5: ACGTA and TTTTG. Codes (ascii>>1)&3: A=0 C=1 G=3 T=2.
      ACGTA -> 0,1,3,2,0 ; first byte holds k%4=1 base (left-padded): 0x00,
               then GTA? no: remaining 4 bases C,G,T,A -> 0b01_11_10_00 = 0x78
      TTTTG -> 2,2,2,2,3 ; first byte 0x02, then T,T,T,G -> 0b10_10_10_11 = 0xAB
    """
    import struct

    path = tmp_path / "g.kff"
    with KffWriter(str(path), 5) as w:
        w.write_kmer("ACGTA")
        w.write_kmer("TTTTG")
    got = path.read_bytes()

    expect = b"KFF"
    expect += bytes([1, 0, 0b00011110, 0, 0])        # v1.0, enc ACGT=0,1,3,2
    expect += struct.pack(">I", 0)                    # free_size
    expect += b"v" + struct.pack(">Q", 3)
    expect += b"k\x00" + struct.pack(">Q", 5)
    expect += b"max\x00" + struct.pack(">Q", 1)
    expect += b"data_size\x00" + struct.pack(">Q", 0)
    expect += b"r" + struct.pack(">Q", 2)             # 2 blocks
    expect += bytes([0x00, 0x78])                     # ACGTA
    expect += bytes([0x02, 0xAB])                     # TTTTG
    expect += b"KFF"
    assert got == expect
