"""Pallas LRT kernel vs the lax reference implementation (interpret mode on
the CPU test backend; the real-TPU path is exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kmdiff_tpu.ops.lrt import LrtParams, lrt_filter_block
from kmdiff_tpu.ops.lrt_pallas import TILE_B, lrt_filter_block_pallas


@pytest.mark.parametrize("nb_controls,S", [(10, 20), (3, 8), (1, 2)])
def test_pallas_matches_lax(nb_controls, S):
    rng = np.random.default_rng(0)
    B = 2 * TILE_B
    counts = rng.integers(0, 64, size=(B, S), dtype=np.int32)
    # sprinkle all-zero rows (padding shape)
    counts[rng.random(B) < 0.1] = 0
    params = LrtParams(nb_controls, S - nb_controls, 500_000, 600_000,
                       0.05 / 1e5)
    args = (
        jnp.asarray(counts),
        nb_controls,
        jnp.float32(params.ratio_c),
        jnp.float32(params.ratio_k),
        jnp.float32(params.lr_min),
    )
    keep_l, lr_l, sc_l, sk_l = lrt_filter_block(*args)
    keep_p, lr_p, sc_p, sk_p = lrt_filter_block_pallas(*args, interpret=True)

    np.testing.assert_array_equal(np.asarray(sc_p), np.asarray(sc_l))
    np.testing.assert_array_equal(np.asarray(sk_p), np.asarray(sk_l))
    np.testing.assert_allclose(np.asarray(lr_p), np.asarray(lr_l), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(keep_p), np.asarray(keep_l))
