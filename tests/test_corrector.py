"""Corrector tests — exact boundary goldens from the reference's
corrector_test.cpp:9-45 plus scalar/vectorized equivalence."""

import numpy as np
import pytest

from kmdiff_tpu.core.corrector import (
    BasicThreshold,
    Benjamini,
    Bonferroni,
    CorrectionType,
    Holm,
    Sidak,
    correction_type_from_str,
    correction_type_str,
    make_corrector,
)
from kmdiff_tpu.ops.correct import apply_correction, correction_mask_sorted


def test_basic_threshold():
    c = BasicThreshold(0.05)
    assert c.apply(0.04)
    assert not c.apply(0.06)


def test_bonferroni():
    c = Bonferroni(0.05, 100)
    assert c.apply(0.0004)
    assert not c.apply(0.0006)


def test_benjamini_rank_progression():
    c = Benjamini(0.25, 25)
    assert c.apply(0.009)  # rank 1: 0.009 < 0.01
    assert not c.apply(0.02)  # rank 2: 0.02 !< 0.02 (strict)


def test_sidak():
    c = Sidak(0.05, 100)
    assert c.apply(0.00050)
    assert not c.apply(0.00052)


def test_holm_mutating_denominator():
    c = Holm(0.05, 100)
    for _ in range(90):
        assert c.apply(0.0)
    assert c.apply(0.004)  # 0.004 < 0.05/10
    assert not c.apply(0.006)  # 0.006 !< 0.05/9


def test_factory_and_names():
    for ctype, cls in [
        (CorrectionType.BONFERRONI, Bonferroni),
        (CorrectionType.BENJAMINI, Benjamini),
        (CorrectionType.SIDAK, Sidak),
        (CorrectionType.HOLM, Holm),
        (CorrectionType.NOTHING, BasicThreshold),
    ]:
        c = make_corrector(ctype, 0.05, 1000)
        assert isinstance(c, cls)
        assert c.type() == ctype
        assert correction_type_from_str(correction_type_str(ctype)) == ctype


@pytest.mark.parametrize(
    "ctype",
    [
        CorrectionType.NOTHING,
        CorrectionType.BONFERRONI,
        CorrectionType.SIDAK,
        CorrectionType.BENJAMINI,
        CorrectionType.HOLM,
    ],
)
def test_vectorized_matches_scalar_walk(ctype):
    """The prefix-mask form must reproduce the reference's sequential walk
    (ascending-p order with stop-at-first-rejection for the order-dependent
    correctors)."""
    rng = np.random.default_rng(42)
    p = np.sort(rng.uniform(0, 1e-3, 200) ** 2)
    total = 1_000_000
    alpha = 0.05

    scalar = make_corrector(ctype, alpha, total)
    keep_scalar = np.zeros(len(p), dtype=bool)
    for i, pv in enumerate(p):
        ok = scalar.apply(pv)
        keep_scalar[i] = ok
        if not ok and scalar.order_dependent:
            break  # sorted_aggregator breaks at first rejection

    mask = correction_mask_sorted(p, ctype, alpha, total)
    np.testing.assert_array_equal(mask, keep_scalar)


def test_apply_correction_unsorted_input():
    p = np.array([0.5, 1e-9, 0.03, 1e-7])
    order, keep = apply_correction(p, CorrectionType.BONFERRONI, 0.05, 1000)
    assert list(p[order]) == sorted(p)
    np.testing.assert_array_equal(keep, [False, True, False, True])
