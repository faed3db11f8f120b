#!/usr/bin/env python3
"""Probe: compile + run cost of lax.sort at shapes past the 2^23 ceiling
(quarter-pow2 ladder), and H2D cost of one big vs several small uploads.
Decides whether the counting path can serve an 8.4 Mbp sample in ONE
chunk (sort ~10.5M rows) instead of 2 chunks + a dedup re-sort."""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)

    def timed_sort(n):
        a = rng.integers(0, 2**32, n, dtype=np.uint32)
        b = rng.integers(0, 2**32, n, dtype=np.uint32)
        ad, bd = jnp.asarray(a), jnp.asarray(b)
        f = jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=2)[0][-1])
        t0 = time.perf_counter()
        v = int(f(ad, bd))
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            v += int(f(ad + jnp.uint32(i), bd))
        t_warm = (time.perf_counter() - t0) / reps
        print(f"[sprobe] sort n={n} ({n/2**20:.1f}Mi): cold {t_cold:.1f}s "
              f"warm {t_warm*1e3:.0f}ms", flush=True)

    for n in (1 << 23, 5 << 21, 3 << 22, 7 << 21, 1 << 24):
        timed_sort(n)

    # H2D: one 8.6MB u8 upload vs 3 blocks
    big = rng.integers(0, 4, 8_650_000, dtype=np.uint8)
    f1 = jax.jit(lambda x: x[::1024].astype(jnp.uint32).sum())
    for tag, parts in (("1x8.6MB", [big]),
                       ("3 blocks", [big[:1 << 22], big[1 << 22: 1 << 23],
                                     big[1 << 23:]])):
        # warm the compile first
        for p in parts:
            int(f1(jnp.asarray(p)))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            acc = 0
            for p in parts:
                acc += int(f1(jnp.asarray(p)))
        print(f"[sprobe] h2d {tag}: {(time.perf_counter()-t0)/reps*1e3:.0f}"
              f"ms/sample", flush=True)


if __name__ == "__main__":
    main()
