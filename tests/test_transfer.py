"""Device->host transfer helpers (utils.transfer).

The slow-uplink D2H discipline: padded kernel outputs leave the device as
pow2-bucketed prefixes (at most 2n rows move), fetched chunk-parallel.
"""

import jax.numpy as jnp
import numpy as np

from kmdiff_tpu.utils.transfer import device_fetch, fetch_prefix


def test_device_fetch_matches_asarray():
    x = np.arange(3 * (1 << 20), dtype=np.int32).reshape(-1, 3)
    np.testing.assert_array_equal(device_fetch(jnp.asarray(x)), x)


def test_fetch_prefix_exact_rows():
    x = np.arange(1 << 16, dtype=np.int32)
    d = jnp.asarray(x)
    for n in (0, 1, 7, 1023, 1024, 1025, 40000, 1 << 16):
        got = fetch_prefix(d, n)
        np.testing.assert_array_equal(got, x[:n])


def test_fetch_prefix_2d_and_small_pad():
    x = np.arange(2048 * 4, dtype=np.uint32).reshape(2048, 4)
    got = fetch_prefix(jnp.asarray(x), 900)
    assert got.shape == (900, 4)
    np.testing.assert_array_equal(got, x[:900])
    # n larger than the pow2 bucket floor but pad smaller than bucket
    y = np.arange(100, dtype=np.int32)
    np.testing.assert_array_equal(fetch_prefix(jnp.asarray(y), 100), y)
