#!/usr/bin/env python3
"""Probe: pure H2D cost of a sample's code stream, unpacked (u8/base) vs
2-bit packed (u32 words), and the device-side unpack cost. Decides
whether the counting upload should pack codes 16-per-u32 on host."""

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
    N = 5 << 21  # the 8.4 Mbp sample's quarter-pow2 code bucket
    codes = rng.integers(0, 4, N, dtype=np.uint8)

    # enter sync-dispatch mode first (every consumer is in it)
    _ = int(jnp.asarray(np.ones(8, np.uint8)).sum())

    def timed(label, fn, reps=6):
        fn()  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        print(f"[h2d] {label}: {(time.perf_counter()-t0)/reps*1e3:.0f} ms",
              flush=True)

    timed("u8 upload (8.6MB) only",
          lambda: jnp.asarray(codes).block_until_ready())

    packed = np.zeros(N // 16, np.uint32)
    for i in range(16):
        packed |= codes[i::16].astype(np.uint32) << (2 * i)

    timed("packed u32 upload (2.1MB) only",
          lambda: jnp.asarray(packed).block_until_ready())

    def pack_host():
        p = np.zeros(N // 16, np.uint32)
        for i in range(16):
            p |= codes[i::16].astype(np.uint32) << (2 * i)
        return p

    t0 = time.perf_counter()
    pack_host()
    print(f"[h2d] host pack cost: {(time.perf_counter()-t0)*1e3:.0f} ms",
          flush=True)

    @jax.jit
    def unpack_sum(p):
        parts = [((p >> (2 * i)) & 3).astype(jnp.uint8) for i in range(16)]
        c = jnp.stack(parts, axis=1).reshape(-1)
        return c.astype(jnp.uint32).sum()

    d = jnp.asarray(packed)
    timed("device unpack+sum (resident)", lambda: int(unpack_sum(d)))

    timed("u8 upload + sum (end to end)",
          lambda: int(jnp.asarray(codes).astype(jnp.uint32).sum()))
    timed("packed upload + unpack + sum (end to end)",
          lambda: int(unpack_sum(jnp.asarray(pack_host()))))


if __name__ == "__main__":
    main()
