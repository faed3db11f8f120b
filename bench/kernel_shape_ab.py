#!/usr/bin/env python3
"""A/B the merge+LRT kernel rate across chunk shapes (2M/4M/8M triples):
production chunks target 7/8 of the 8M sort ceiling, while bench.py's
headline historically measured 2M. Amortized x4-chained protocol, honest
host reads (see bench.py _timed_chain)."""

import functools
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
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
    params = LrtParams(10, 10, 10**9, 10**9, 0.05 / 1e5)
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
    for logn in (21, 22, 23):
        N = 1 << logn
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
        lanes_d = tuple(jnp.asarray(l.copy()) for l in lanes)
        sample_d = jnp.zeros(1, jnp.int32)
        count_d = jnp.asarray(count.copy())

        @functools.partial(jax.jit, static_argnames=())
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

        carry = int(chain4(0))  # compile + warm
        iters = max(2, (1 << 24) // N // CHAIN)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = int(chain4(carry))
        dt = (time.perf_counter() - t0) / iters / CHAIN
        n_distinct = len(np.unique(np.concatenate([k[:, 0] for k in kmers])))
        print(
            f"[ab] N=2^{logn}: {dt*1e3:.1f} ms/kernel, "
            f"{n_distinct/dt:.3e} distinct/s, {N/dt:.3e} rows/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
