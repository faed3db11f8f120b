#!/usr/bin/env python3
"""Records for BASELINE configs #3 and #4 on the live chip:

  * k=64 / k=128 merge+LRT kernel throughput at the shipped 2^23-row
    dispatch shape (multi-word keys: 4 and 8 u32 lanes)
  * popstrat batched-IRLS corrector throughput (alt fits/s) at the
    production chunk shape

Both follow bench.py's honest-read protocol (every iteration folds the
outputs into a host-read scalar)."""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _cpp_baseline_per_width(n: int, S: int) -> dict[int, float]:
    """Measure bench/ref_baseline at each key width the reference compiles
    (Kmer<32/64/128> -> 1/2/4 uint64 words, src/main.cc:29-50), so the
    k=64 and k=128 kernel rates below get their own vs_baseline ratios
    (BASELINE config #4's large-k regime)."""
    import subprocess

    src = os.path.join(HERE, "bench", "ref_baseline.cpp")
    exe = os.path.join(HERE, "bench", "ref_baseline")
    out = {}
    try:
        if (not os.path.exists(exe)
                or os.path.getmtime(exe) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-o", exe, src],
                check=True, capture_output=True, timeout=300,
            )
        for w in (1, 2, 4):
            r = subprocess.run(
                [exe, str(n), str(S), str(w)], check=True,
                capture_output=True, timeout=600, text=True,
            )
            out[w] = float(r.stdout.strip())
            print(f"[cfg] C++ baseline ({w} key words): {out[w]:.3e} "
                  f"kmer/s", flush=True)
    except (subprocess.SubprocessError, OSError, ValueError) as e:
        print(f"[cfg] per-width C++ baseline unavailable ({e})", flush=True)
    return out


def kernel_multiword():
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
    N = 1 << 23
    per = N // S
    baselines = _cpp_baseline_per_width(1 << 20, S)
    for k, nw in ((31, 1), (64, 2), (128, 4)):
        rng = np.random.default_rng(0)
        kmers = [
            np.sort(rng.integers(0, 2**40, per, dtype=np.uint64))[:, None]
            for _ in range(S)
        ]
        if nw > 1:
            kmers = [np.repeat(km, nw, axis=1) for km in kmers]
        counts = [rng.integers(1, 32, per, dtype=np.uint32)
                  for _ in range(S)]
        assert pack16_ok(counts)
        lanes, count, _ = build_triples_packed(kmers, counts, N, 10,
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

        @ft.partial(jax.jit)
        def chain4(carry, lanes_d=lanes_d, count_d=count_d, kw=kw):
            acc = carry
            for _ in range(4):
                o = merge_lrt_local(
                    lanes_d, sample_d,
                    count_d + (acc % 2).astype(jnp.uint16), **kw
                )
                acc = (
                    o["meta"].sum() + o["hit_blob"].astype(jnp.int32).sum()
                ).astype(jnp.int32)
            return acc

        n_distinct = len(np.unique(np.concatenate(
            [km[:, 0] for km in kmers])))
        carry = int(chain4(0))
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = int(chain4(carry))
        dt = (time.perf_counter() - t0) / iters / 4
        vs = (f", vs_baseline {n_distinct/dt/baselines[nw]:.2f}x "
              f"(C++ {nw}-word keys)") if baselines.get(nw) else ""
        print(f"[cfg] k={k} ({2*nw} key lanes) merge kernel: "
              f"{n_distinct/dt:.3e} distinct/s ({dt*1e3:.1f} ms/kernel "
              f"amortized){vs}", flush=True)


def popstrat_irls():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kmdiff_tpu.ops.glm import (
        batched_irls_lastcol,
        default_dtype,
        log_likelihood_lastcol,
    )
    from kmdiff_tpu.pipeline.popstrat import PopStratCorrector

    S, npc = 100, 2
    F = 1 + npc + 1 + 1
    B = PopStratCorrector.BATCH_CHUNK
    rng = np.random.default_rng(0)
    dt_ = default_dtype()
    y = jnp.asarray(
        np.concatenate([np.ones(S // 2), np.zeros(S // 2)]), dt_
    )
    Xb = rng.normal(0, 1, (S, F)).astype(np.float64)
    Xb[:, 0] = 1.0
    Xd = jnp.asarray(Xb, dt_)

    def step(carry):
        last = jnp.asarray(
            rng.uniform(0, 1, (B, S)).astype(np.float64), dt_
        ) + carry * jnp.asarray(0, dt_)
        W, _e, _i = batched_irls_lastcol(Xd, last, y)
        ll = log_likelihood_lastcol(Xd, last, W, y)
        return ll.sum()

    float(step(0))
    iters = 5
    t0 = time.perf_counter()
    c = 0.0
    for _ in range(iters):
        c = float(step(c))
    dt = (time.perf_counter() - t0) / iters
    print(f"[cfg] popstrat batched IRLS (alt fits, B={B}, S={S}, F={F}): "
          f"{B/dt:.3e} fits/s ({dt*1e3:.0f} ms/chunk)", flush=True)


if __name__ == "__main__":
    kernel_multiword()
    popstrat_irls()
