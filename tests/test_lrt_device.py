"""Device LRT kernel tests: reduced-form f32 LR vs exact f64 host scoring,
and soundness of the margin-backed threshold filter."""

import numpy as np
import pytest
from scipy.stats import chi2

from kmdiff_tpu.core.model import PoissonLikelihood
from kmdiff_tpu.ops.lrt import (
    MARGIN_ABS,
    MARGIN_PER_COUNT,
    LrtParams,
    lr_threshold_for_pvalue,
    run_filter,
)


def _exact_lr(model, counts, nb_controls):
    p, _, _, _ = model.process_block(counts, nb_controls)
    # invert p = chi2.sf(2 LR) for comparison
    return chi2.isf(np.clip(p, 1e-300, 1), 1) / 2.0


def test_lr_threshold_inversion():
    for t in [0.5, 0.05, 1e-4, 5e-7, 1e-12]:
        cut = lr_threshold_for_pvalue(t)
        assert chi2.sf(2 * cut, 1) == pytest.approx(t, rel=1e-10)
    assert lr_threshold_for_pvalue(1.0) == 0.0
    assert lr_threshold_for_pvalue(0.0) == float("inf")


def test_device_lr_matches_exact():
    rng = np.random.default_rng(0)
    nb_c, nb_k = 10, 10
    totals_c = list(rng.integers(500_000, 1_000_000, nb_c))
    totals_k = list(rng.integers(500_000, 1_000_000, nb_k))
    model = PoissonLikelihood(nb_c, nb_k, totals_c, totals_k, 10000)
    params = LrtParams(nb_c, nb_k, model.sum_controls, model.sum_cases, 0.05)

    counts = rng.integers(0, 60, (4096, nb_c + nb_k)).astype(np.int32)
    counts[:50] = 0  # all-zero rows
    keep, lr, s_c, s_k = run_filter(params, counts)

    exact = _exact_lr(model, counts, nb_c)
    # f32 absolute error scales with the row's total count; assert the bound
    # the filter margin relies on
    tot = counts.sum(axis=1)
    bound = MARGIN_PER_COUNT * tot + MARGIN_ABS
    assert np.all(np.abs(lr - exact) <= bound)
    # all-zero rows: LR exactly 0
    assert np.all(lr[:50] == 0.0)
    # integer sums exact
    np.testing.assert_array_equal(s_c, counts[:, :nb_c].sum(axis=1))
    np.testing.assert_array_equal(s_k, counts[:, nb_c:].sum(axis=1))


def test_filter_never_drops_true_hits():
    """Every k-mer the exact f64 test accepts (p <= threshold) must survive
    the f32 device filter — the margin guarantees no false negatives; false
    positives are later removed by the exact re-score."""
    rng = np.random.default_rng(7)
    nb_c = nb_k = 8
    totals = [750_000] * 8
    model = PoissonLikelihood(nb_c, nb_k, totals, totals, 10000)
    p_threshold = 0.05 / 100  # threshold/cutoff pre-filter style
    params = LrtParams(nb_c, nb_k, model.sum_controls, model.sum_cases, p_threshold)

    # mix of null-ish and strongly differential rows
    counts = np.concatenate(
        [
            rng.integers(0, 10, (20000, 16)),
            np.concatenate(
                [rng.integers(20, 60, (2000, 8)), rng.integers(0, 4, (2000, 8))], axis=1
            ),
        ]
    ).astype(np.int32)
    keep, lr, s_c, s_k = run_filter(params, counts)

    p_exact, _, _, _ = model.process_block(counts, nb_c)
    true_hits = p_exact <= p_threshold
    assert true_hits.sum() > 100  # the scenario actually produces hits
    missed = true_hits & ~keep
    assert missed.sum() == 0
    # filter should not be uselessly loose either: survivors within ~2x
    assert keep.sum() <= max(2 * true_hits.sum(), true_hits.sum() + 50)


def test_margin_positive():
    assert MARGIN_ABS > 0 and MARGIN_PER_COUNT > 0


def test_compact_indices_matches_nonzero():
    """ops.merge_dev._compact_indices (the index-sort replacement for
    jnp.nonzero(size) — 2.8x faster on the bench rig) must reproduce
    nonzero's exact contract: ascending indices of True rows, truncated
    at `size`, fill past the count."""
    import jax.numpy as jnp
    import numpy as np

    from kmdiff_tpu.ops.merge_dev import _compact_indices

    rng = np.random.default_rng(5)
    for n, density, size in [
        (1 << 12, 0.001, 16), (1 << 12, 0.3, 64), (257, 1.0, 512),
        (64, 0.0, 8), (1000, 0.01, 4),  # overflow: more hits than size
    ]:
        mask = rng.random(n) < density
        got = np.asarray(_compact_indices(jnp.asarray(mask), size, n - 1))
        want = np.asarray(
            jnp.nonzero(jnp.asarray(mask), size=size, fill_value=n - 1)[0]
        )
        np.testing.assert_array_equal(got, want)

    import pytest

    with pytest.raises(ValueError):
        _compact_indices(jnp.zeros(1 << 30, bool), 8, 0)
