"""Poisson LRT model tests — golden values mirroring the reference's
model_test.cpp plus exactness properties of the reduced-form device math."""

import numpy as np
import pytest
from scipy.stats import chi2

from kmdiff_tpu.core.model import (
    LogFactorialTable,
    PoissonLikelihood,
    Significance,
    chi2_sf1,
    significance_to_char,
)


def test_significance_chars():
    assert significance_to_char(Significance.CONTROL) == "-"
    assert significance_to_char(Significance.CASE) == "+"
    assert significance_to_char(Significance.NO) == "$"


def test_log_factorial_table_golden():
    """Reference: tests/factorial_test.cpp:7-16 (table size 50, fallback
    beyond)."""
    t = LogFactorialTable(50)
    assert t.lookup_scalar(0) == 0
    assert t.lookup_scalar(1) == 0
    assert abs(t.lookup_scalar(10) - 15.104412573075514) < 1e-10
    assert abs(t.lookup_scalar(50) - 148.47776695177302) < 1e-9
    assert abs(t.lookup_scalar(51) - 152.40959258449737) < 1e-9
    assert abs(t.lookup_scalar(100) - 363.7393755555635) < 1e-9


def test_poisson_sign_rule():
    """Reference: tests/model_test.cpp:45-81 — 30v30 cohort, totals all 1."""
    nb = 30
    totals = [1] * nb
    model = PoissonLikelihood(nb, nb, totals, totals, log_size=10)
    controls = np.full(nb, 200, dtype=np.uint32)
    cases = np.full(nb, 100, dtype=np.uint32)

    _, sign, _, _ = model.process(controls, cases)
    assert sign == Significance.CONTROL
    _, sign, _, _ = model.process(cases, controls)
    assert sign == Significance.CASE
    _, sign, _, _ = model.process(cases, cases)
    assert sign == Significance.NO


def test_pvalue_against_direct_formula():
    """p must equal chi2.sf(2*LR, 1) with LR from the written-out alt/null
    Poisson log-likelihoods (f64, independent recomputation)."""
    import math

    Tc, Tk = 1_000_000, 1_200_000
    model = PoissonLikelihood(3, 3, [Tc // 3] * 3 + [Tc - 2 * (Tc // 3)][:0], [Tk // 3] * 3, 100)
    model = PoissonLikelihood(3, 3, [400_000, 300_000, 300_000], [400_000, 400_000, 400_000], 100)
    counts = np.array([[10, 5, 8, 1, 0, 2], [0, 0, 0, 9, 9, 9], [3, 3, 3, 3, 3, 3]])
    p, sign, mc, mk = model.process_block(counts, 3)

    for row, pv in zip(counts, p):
        sC, sK = int(row[:3].sum()), int(row[3:].sum())
        mu = (sC + sK) / (Tc + Tk)

        def pp(k, lam):
            if lam <= 0:
                return 0.0
            return -lam + k * math.log(lam) - math.lgamma(k + 1)

        lr = (pp(sC, sC) + pp(sK, sK)) - (pp(sC, mu * Tc) + pp(sK, mu * Tk))
        lr = max(lr, 0.0)
        assert pv == pytest.approx(chi2.sf(2 * lr, 1), rel=1e-10)


def test_zero_counts_p_is_one():
    model = PoissonLikelihood(2, 2, [100, 100], [100, 100], 10)
    p, sign, mc, mk = model.process_block(np.zeros((1, 4), dtype=np.uint32), 2)
    assert p[0] == 1.0
    assert sign[0] == Significance.NO


def test_scalar_vs_block_consistency():
    rng = np.random.default_rng(1)
    model = PoissonLikelihood(5, 7, list(rng.integers(1e5, 1e6, 5)),
                              list(rng.integers(1e5, 1e6, 7)), 1000)
    counts = rng.integers(0, 50, (64, 12)).astype(np.uint32)
    p_blk, s_blk, mc_blk, mk_blk = model.process_block(counts, 5)
    for i in range(0, 64, 17):
        p, s, mc, mk = model.process(counts[i, :5], counts[i, 5:])
        assert p == pytest.approx(p_blk[i], rel=1e-14)
        assert s == s_blk[i]
        assert mc == pytest.approx(mc_blk[i], rel=1e-14)
        assert mk == mk_blk[i]


def test_chi2_sf1_matches_scipy():
    xs = np.array([0.0, 0.5, 2.0, 10.0, 40.0])
    np.testing.assert_allclose(chi2_sf1(xs), chi2.sf(xs, 1), rtol=1e-14)
