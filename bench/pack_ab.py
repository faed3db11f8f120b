#!/usr/bin/env python3
"""A/B: raw-u8 fused count kernel vs packed-upload variants (with/without
an optimization barrier after unpack) on one 10.49M-code chunk."""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kmdiff_tpu.ops.codec import (
        count_sort_rle_lanes,
        extract_canonical_lanes,
        fused_count_kernel,
        fused_count_packed,
        pack_codes_host,
        unpack_codes,
    )

    k = 31
    n = (5 << 21) - 64
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, n, dtype=np.uint8)
    codes[rng.random(n) < 0.005] = 0xFF
    W = n - k + 1
    buf = pack_codes_host(codes)

    @functools.partial(
        jax.jit, static_argnames=("k", "n", "max_distinct", "with_hist")
    )
    def packed_barrier(b, k, n, max_distinct, with_hist=False):
        c = jax.lax.optimization_barrier(unpack_codes(b, n))
        lanes, _ = extract_canonical_lanes(c, k, mask_invalid=True)
        return count_sort_rle_lanes(lanes, max_distinct, with_hist=with_hist)

    variants = {
        "raw u8": lambda: fused_count_kernel(
            jnp.asarray(codes), k, W, with_hist=True),
        "packed": lambda: fused_count_packed(
            jnp.asarray(buf), k, n, W, with_hist=True),
        "packed+barrier": lambda: packed_barrier(
            jnp.asarray(buf), k, n, W, with_hist=True),
    }
    for name, fn in variants.items():
        t0 = time.perf_counter()
        stats, blob, counts = fn()
        s = np.asarray(stats)
        cold = time.perf_counter() - t0
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            s2 = np.asarray(fn()[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"[pab] {name}: {dt*1e3:.0f} ms warm (cold {cold:.0f}s, "
              f"U={int(s[0])})", flush=True)


if __name__ == "__main__":
    main()
