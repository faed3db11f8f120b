#!/usr/bin/env python3
"""Chip probe: where does the fused chunk's device time go?

Times, at the production chunk shape (S x M rows), each chained x4 per
host read:
  (a) merge_lrt_local alone on a PREBUILT [S*M] packed buffer
  (b) the fused assemble+merge program (_fused_chunk_impl)
  (c) the assemble gather alone
and repeats (a) at the 2^23 kernel-bench shape for a same-process shape
comparison. Decides whether to shrink M toward the kernel sweet spot or
optimize the assemble.
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def timed_chain(step, iters=3):
    carry = int(step(0))
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = int(step(carry))
    return (time.perf_counter() - t0) / iters


def main():
    import functools as ft

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kmdiff_tpu.pipeline.fused import _fused_chunk_impl, _get_fused_chunk

    S = 20
    M = 786432
    L = 2
    rng = np.random.default_rng(0)

    # synthetic resident streams: U = 6/8 M so chunks carry real + sentinel
    U = (M * 6) // 8
    P = M * 2
    blobs = []
    counts = []
    for s in range(S):
        keys = np.sort(rng.integers(0, 1 << 62, U, dtype=np.uint64))
        blob = np.full((P, L), 0xFFFFFFFF, np.uint32)
        blob[:U, 0] = (keys >> 32).astype(np.uint32)
        blob[:U, 1] = keys.astype(np.uint32)
        c = np.zeros(P, np.uint32)
        c[:U] = rng.integers(1, 32, U)
        blobs.append(jnp.asarray(blob))
        counts.append(jnp.asarray(c))
    blobs = tuple(blobs)
    counts = tuple(counts)
    starts = jnp.zeros(S, jnp.int32)
    lens = jnp.full(S, U, jnp.int32)
    sc = (jnp.float32(1.0), jnp.float32(1.0), jnp.float32(9.0),
          jnp.uint32(0), jnp.uint32(0))
    kw = dict(M=M, nb_controls=10, mode="p16", max_hits=1 << 14,
              max_geno=1, want_geno=False, nb_samples=S, want_rows=False,
              wide=False, mblob=True)

    fused = _get_fused_chunk()

    def step_fused(carry):
        out = fused(blobs, counts, starts + carry % 2, lens, *sc, **kw)
        return out["hit_blob"].astype(jnp.int32).sum()

    dt_f = timed_chain(step_fused)
    rows = S * M
    print(f"[asm] fused assemble+merge: {dt_f*1e3:.0f} ms "
          f"({rows/dt_f/1e6:.1f}M rows/s)", flush=True)

    # (c) assemble alone
    from kmdiff_tpu.pipeline.fused import _assemble_chunk_impl

    @ft.partial(jax.jit, static_argnames=("M", "nb_controls", "mode"))
    def asm(blobs, counts, starts, lens, M, nb_controls, mode):
        lanes, sample, count = _assemble_chunk_impl(
            blobs, counts, starts, lens, M, nb_controls, mode)
        return sum(l.astype(jnp.int32).sum() for l in lanes) + \
            count.astype(jnp.int32).sum()

    def step_asm(carry):
        return asm(blobs, counts, starts + carry % 2, lens, M=M,
                   nb_controls=10, mode="p16")

    dt_a = timed_chain(step_asm)
    print(f"[asm] assemble alone: {dt_a*1e3:.0f} ms", flush=True)

    # (a) merge kernel alone on a prebuilt buffer of the same shape
    from kmdiff_tpu.ops.merge_dev import merge_lrt_local

    def prebuilt_step_for(n_rows):
        keys = np.sort(rng.integers(0, 1 << 62, n_rows, dtype=np.uint64))
        lanes_np = ((keys >> 32).astype(np.uint32), keys.astype(np.uint32))
        lanes_d = tuple(jnp.asarray(l) for l in lanes_np)
        count_d = jnp.asarray(
            (rng.integers(1, 32, n_rows)).astype(np.uint16)
            | np.uint16(0x8000))
        sample_d = jnp.zeros(1, jnp.int32)

        @jax.jit
        def one(carry):
            out = merge_lrt_local(
                lanes_d, sample_d, count_d + carry.astype(jnp.uint16) % 2,
                10, jnp.float32(1.0), jnp.float32(1.0), jnp.float32(9.0),
                jnp.uint32(0), jnp.uint32(0), 1 << 14, 1, False,
                nb_samples=S, want_rows=False, wide_sums=False,
                packed_ctrl=True, meta_in_blob=True,
            )
            return out["hit_blob"].astype(jnp.int32).sum()

        return one

    for n_rows, label in ((S * M, "S*M=15.7M"), (1 << 23, "2^23")):
        one = prebuilt_step_for(n_rows)

        def step(carry, one=one):
            return one(jnp.int32(carry))

        dt = timed_chain(step)
        print(f"[asm] merge kernel alone @ {label}: {dt*1e3:.0f} ms "
              f"({n_rows/dt/1e6:.1f}M rows/s)", flush=True)


if __name__ == "__main__":
    main()
