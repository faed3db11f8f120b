#!/usr/bin/env python3
"""Probe: merge+LRT kernel throughput vs dispatch size (2^21..2^24 rows).
The product's fused merge now dispatches ~2^24-row chunks; if rows/s
keeps rising with size, bench.py's headline should measure the shipped
shape."""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import functools as ft

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kmdiff_tpu.ops.lrt import LrtParams
    from kmdiff_tpu.ops.merge_dev import (
        build_triples_packed,
        merge_lrt_local,
        pack16_ok,
    )

    S = 20
    for logN in (21, 23, 24):
        N = 1 << logN
        per = N // S
        rng = np.random.default_rng(0)
        kmers = [
            np.sort(rng.integers(0, 2**40, per, dtype=np.uint64))[:, None]
            for _ in range(S)
        ]
        counts = [rng.integers(1, 32, per, dtype=np.uint32) for _ in range(S)]
        assert pack16_ok(counts)
        lanes, count, _n = build_triples_packed(kmers, counts, N, 10,
                                                pack16=True)
        params = LrtParams(10, 10, 10**9, 10**9, 0.05 / 1e5)
        lanes_d = tuple(jnp.asarray(l.copy()) for l in lanes)
        sample_d = jnp.zeros(1, jnp.int32)
        count_d = jnp.asarray(count.copy())
        kw = dict(
            nb_controls=10,
            ratio_c=jnp.float32(params.ratio_c),
            ratio_k=jnp.float32(params.ratio_k),
            lr_min=jnp.float32(params.lr_min),
            pca_threshold_u32=jnp.uint32(0),
            pca_seed=jnp.uint32(0),
            max_hits=1 << 14,
            max_geno=1,
            want_geno=False,
            packed_ctrl=True,
        )
        CHAIN = 4

        @ft.partial(jax.jit)
        def chain4(carry, lanes_d=lanes_d, count_d=count_d):
            acc = carry
            for _ in range(CHAIN):
                o = merge_lrt_local(
                    lanes_d, sample_d,
                    count_d + (acc % 2).astype(jnp.uint16), **kw
                )
                acc = (
                    o["meta"].sum() + o["hit_blob"].astype(jnp.int32).sum()
                ).astype(jnp.int32)
            return acc

        n_distinct = len(np.unique(np.concatenate([k[:, 0] for k in kmers])))
        t0 = time.perf_counter()
        carry = int(chain4(0))
        cold = time.perf_counter() - t0
        iters = max(2, (1 << 23) // N * 3)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = int(chain4(carry))
        dt = (time.perf_counter() - t0) / iters / CHAIN
        print(f"[kprobe] N=2^{logN}: {n_distinct/dt:.3e} distinct/s "
              f"({dt*1e3:.1f} ms/kernel amortized x{CHAIN}, cold {cold:.0f}s,"
              f" {iters} iters)", flush=True)


if __name__ == "__main__":
    main()
