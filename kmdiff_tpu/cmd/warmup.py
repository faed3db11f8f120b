"""`kmdiff-tpu warmup`: pre-compile the canonical device kernels.

First-time kernel compilation on remote-compile TPU rigs costs 40-90 s per
shape (and the popstrat IRLS loop several minutes); the persistent XLA
cache (enabled in kmdiff_tpu.__init__) makes that a one-time cost — this
command pays it up front for a given cohort configuration so production
runs start hot.

Shapes warmed per (nb_controls, nb_cases, k):
  * the merge+LRT kernel at the standard pad buckets (tight + full
    compaction budgets),
  * the LRT filter tile (lax + Pallas when on a TPU backend),
  * the counting extraction + fused sort/RLE kernels,
  * the batched-IRLS corrector chunk (when --pop).
"""

from __future__ import annotations

import numpy as np

from kmdiff_tpu.utils.logging import logger
from kmdiff_tpu.utils.timer import Timer


def main_warmup(nb_controls: int, nb_cases: int, kmer_size: int,
                pop: bool = False, npc: int = 2,
                pad_buckets: tuple[int, ...] = (
                    1 << 12, 1 << 16, 1 << 21, 1 << 22, 1 << 23)) -> None:
    import jax
    import jax.numpy as jnp

    timer = Timer()
    S = nb_controls + nb_cases
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    logger.info("Warming kernels on %s:%d for S=%d, k=%d...",
                dev.platform, dev.id, S, kmer_size)

    # counting kernels (generic lanes: any k <= 128): one fused
    # extract+sort+RLE dispatch per quarter-pow2 code bucket
    # (pipeline.count._host_code_chunks) — warm the 4Mi bucket and the
    # 10Mi bucket a typical ~8-10 Mbp sample pads to (the remote-compile
    # service takes ~35-50 s per sort shape, one-time)
    from kmdiff_tpu.pipeline.count import count_sample_device

    for n in (1 << 22, (5 << 21) - 64):
        codes = rng.integers(0, 4, n, dtype=np.uint8)
        count_sample_device([codes], kmer_size, 4)
    logger.info("  counting kernels compiled (%s)", timer.formatted())

    _warmup_fused(S, nb_controls, kmer_size, pop, rng, timer)

    # merge + LRT kernels at the pad buckets
    from kmdiff_tpu.core.model import PoissonLikelihood
    from kmdiff_tpu.io.accumulator import VectorAccumulator
    from kmdiff_tpu.pipeline.merge import PartitionProcessor

    nw = (kmer_size + 31) // 32
    model = PoissonLikelihood(
        nb_controls, nb_cases, [10**6] * nb_controls, [10**6] * nb_cases
    )
    for thr, label in ((0.05 / 1e5, "tight"), (0.5, "full")):
        proc = PartitionProcessor(model, nb_controls, nb_cases, thr,
                                  keep_counts=pop)
        for i, bucket in enumerate(pad_buckets):
            n = max(bucket // 2 + 1, 8)
            per = max(n // S, 2)
            kmers = [
                np.repeat(
                    np.sort(
                        rng.integers(0, 1 << min(2 * kmer_size - 1, 62),
                                     per, dtype=np.uint64)
                    )[:, None],
                    nw, axis=1,
                )
                for _ in range(S)
            ]
            counts = [
                rng.integers(1, 16, per, dtype=np.uint32) for _ in range(S)
            ]
            proc._device_merge_chunk(0, kmers, counts,
                                     VectorAccumulator(), kmer_size)
            if thr != 0.5 and not pop:
                # also compile the i32-packed variant (counts >= 2^15) at
                # every bucket of the production-threshold pass so
                # large-count cohorts start hot too
                counts = [c + np.uint32(1 << 15) for c in counts]
                proc._device_merge_chunk(0, kmers, counts,
                                         VectorAccumulator(), kmer_size)
        logger.info("  merge kernels (%s budgets) compiled (%s)",
                    label, timer.formatted())

    # popstrat batched IRLS: the null fit ([1, n, F] dense form) plus the
    # lastcol alt-fit ladder of pow2 chunk shapes the corrector actually
    # dispatches (pipeline.popstrat.correct_block)
    if pop:
        import jax.numpy as jnp2

        from kmdiff_tpu.ops.glm import (
            batched_irls,
            batched_irls_lastcol,
            default_dtype,
            log_likelihood,
            log_likelihood_lastcol,
        )
        from kmdiff_tpu.pipeline.popstrat import PopStratCorrector

        dt = default_dtype()
        F = 1 + npc + 1 + 1  # intercept + PCs + totals + count ratio
        y = np.concatenate([np.ones(nb_controls), np.zeros(nb_cases)])
        Xn = rng.normal(0, 1, (1, S, F)).astype(np.float64)
        Xn[:, :, 0] = 1.0
        W, _e, _i = batched_irls(jnp2.asarray(Xn, dt), jnp2.asarray(y, dt))
        jax.block_until_ready(
            log_likelihood(jnp2.asarray(Xn, dt), W, jnp2.asarray(y, dt))
        )
        Xb = jnp2.asarray(Xn[0], dt)
        B = 1 << 10
        while B <= PopStratCorrector.BATCH_CHUNK:
            last = jnp2.asarray(rng.uniform(0, 1, (B, S)), dt)
            W, _e, _i = batched_irls_lastcol(Xb, last, jnp2.asarray(y, dt))
            jax.block_until_ready(
                log_likelihood_lastcol(Xb, last, W, jnp2.asarray(y, dt))
            )
            B <<= 1
        logger.info("  popstrat IRLS compiled (%s)", timer.formatted())

    logger.info("Warmup done in %s.", timer.formatted())


def _warmup_fused(S, nb_controls, kmer_size, pop, rng, timer):
    """Pre-compile the fused `run` path's programs, which differ from the
    two-stage shapes: the counting kernel WITH the device histogram
    (with_hist=True is a different XLA program — an extra sort + 258
    searchsorted ride the stats read), and the assemble+merge chunk
    program at this cohort's production M (pipeline.fused). With a mesh
    configured, fused_merge routes through the sharded assemble+merge
    step, so the mesh program warms here too."""
    import jax.numpy as jnp

    from kmdiff_tpu.core.model import PoissonLikelihood
    from kmdiff_tpu.io.accumulator import VectorAccumulator
    from kmdiff_tpu.ops.codec import n_lanes
    from kmdiff_tpu.pipeline.fused import (
        FusedFallback,
        ResidentStream,
        _q4,
        count_sample_resident,
        fused_chunk_rows,
        fused_merge,
    )
    from kmdiff_tpu.pipeline.merge import PartitionProcessor

    try:
        M = fused_chunk_rows(S)
    except FusedFallback:
        return
    # the with_hist counting program at the typical-sample bucket
    codes = rng.integers(0, 4, (5 << 21) - 64, dtype=np.uint8)
    count_sample_resident([codes], kmer_size, 1, slack=M)

    # the assemble+merge chunk program at the production [S*M] shape:
    # synthetic resident streams with a small sorted prefix and full
    # chunk slack (the assemble slices M rows per stream regardless of U)
    L = n_lanes(kmer_size)
    P = _q4((1 << 10) + M)
    streams = []
    for s in range(S):
        rows = np.unique(rng.integers(0, 1 << 31, 1 << 10, dtype=np.uint32))
        U = len(rows)
        blob = np.full((P, L), 0xFFFFFFFF, np.uint32)
        blob[:U, L - 1] = rows
        blob[:U, : L - 1] = 0
        counts = np.zeros(P, np.uint32)
        counts[:U] = 1
        streams.append(ResidentStream(
            jnp.asarray(blob), jnp.asarray(counts), U, 1,
            np.zeros(257, np.int32), U, U,
        ))
    model = PoissonLikelihood(
        nb_controls, S - nb_controls, [10**6] * nb_controls,
        [10**6] * (S - nb_controls),
    )

    class _DummySampler:  # production pop runs sample geno rows in-kernel
        rate = 0.01
        seed = 0

        def add_sampled(self, partition, rows):
            pass

    sampler = _DummySampler() if pop else None
    proc = PartitionProcessor(
        model, nb_controls, S - nb_controls, 0.05 / 1e5, keep_counts=pop,
        sampler=sampler,
    )
    accs = [VectorAccumulator() for _ in range(4)]
    fused_merge(proc, accs, streams, kmer_size, 4, sampler=sampler, M=M)

    # the grouped multi-chunk program (single-device packed mode): the
    # warmup cohort merges in one chunk, so compile the W-chunk group
    # program directly at the same shapes/budgets the dispatch uses
    from kmdiff_tpu.parallel.runtime import get_mesh
    from kmdiff_tpu.pipeline.fused import CHUNK_GROUP, _get_fused_group

    if get_mesh() is None and CHUNK_GROUP > 1 and not pop:
        max_hits, _mg = proc._budgets(S * M, False, 0.0)
        np.asarray(_get_fused_group()(
            tuple(s.blob for s in streams),
            tuple(s.counts for s in streams),
            jnp.zeros((CHUNK_GROUP, S), jnp.int32),
            jnp.zeros((CHUNK_GROUP, S), jnp.int32),
            jnp.float32(proc.params.ratio_c),
            jnp.float32(proc.params.ratio_k),
            jnp.float32(proc.params.lr_min),
            jnp.uint32(0), jnp.uint32(0),
            M=M, nb_controls=nb_controls, mode="p16",
            max_hits=max_hits, W=CHUNK_GROUP, nb_samples=S,
        ))
    logger.info("  fused-run kernels compiled (%s)", timer.formatted())
