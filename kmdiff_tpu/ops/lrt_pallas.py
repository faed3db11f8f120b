"""Pallas TPU kernel for the Poisson-LRT filter.

The lax version (kmdiff_tpu.ops.lrt) already fuses well under XLA; this
hand-written kernel exists to pin the layout and tiling explicitly for the
framework's hottest op:

  * counts arrive TRANSPOSED [S, B]: the huge k-mer axis B rides the
    128-wide lane dimension, the small sample axis S sits on sublanes, so
    the per-group reductions are cheap cross-sublane sums and every
    elementwise op runs full-width on the VPU;
  * the grid tiles B in TILE_B-lane blocks with the scalar cohort
    parameters prefetched to SMEM;
  * output is the same (keep, lr, s_c, s_k) contract as the lax kernel —
    the two implementations are interchangeable and tested equal
    (tests/test_lrt_pallas.py); `use_pallas()` picks per backend.

Reference context: this replaces the per-k-mer scalar
PoissonLikelihood::process call in the merge callback
(reference: merge.hpp:68-103, model.hpp:142-176).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmdiff_tpu.ops.lrt import MARGIN_ABS, MARGIN_PER_COUNT

TILE_B = 1024


def _kernel(scalars_ref, counts_ref, keep_ref, lr_ref, sc_ref, sk_ref, *,
            nb_controls: int):
    ratio_c = scalars_ref[0]
    ratio_k = scalars_ref[1]
    lr_min = scalars_ref[2]

    counts = counts_ref[:]  # [S, TILE_B] int32
    s_c = jnp.sum(counts[:nb_controls, :], axis=0)  # [TILE_B]
    s_k = jnp.sum(counts[nb_controls:, :], axis=0)

    fc = s_c.astype(jnp.float32)
    fk = s_k.astype(jnp.float32)
    tot = fc + fk
    safe_tot = jnp.maximum(tot, 1.0)
    term_c = jnp.where(
        s_c > 0, fc * jnp.log(jnp.maximum(fc, 1.0) / (safe_tot * ratio_c)), 0.0
    )
    term_k = jnp.where(
        s_k > 0, fk * jnp.log(jnp.maximum(fk, 1.0) / (safe_tot * ratio_k)), 0.0
    )
    lr = jnp.maximum(jnp.where(tot > 0, term_c + term_k, 0.0), 0.0)
    keep = lr + MARGIN_PER_COUNT * tot + MARGIN_ABS >= lr_min

    keep_ref[:] = keep.reshape(1, -1)
    lr_ref[:] = lr.reshape(1, -1)
    sc_ref[:] = s_c.reshape(1, -1)
    sk_ref[:] = s_k.reshape(1, -1)


@functools.partial(
    jax.jit, static_argnames=("nb_controls", "interpret")
)
def lrt_filter_block_pallas(counts, nb_controls: int, ratio_c, ratio_k,
                            lr_min, interpret: bool = False):
    """Same contract as ops.lrt.lrt_filter_block: counts [B, S] int32 ->
    (keep [B] bool, lr [B] f32, s_c [B] i32, s_k [B] i32). B must be a
    multiple of TILE_B (the pipeline's fixed BLOCK_ROWS is)."""
    B, S = counts.shape
    assert B % TILE_B == 0, f"B={B} not a multiple of {TILE_B}"
    # Mosaic requires 8-aligned sublane extents: pad each sample group to a
    # multiple of 8 rows of zeros (zero rows are sum-neutral). Controls
    # occupy rows [0, nc8), cases [nc8, nc8+nk8).
    nc8 = -(-nb_controls // 8) * 8
    nk8 = -(-(S - nb_controls) // 8) * 8
    counts_t = jnp.zeros((nc8 + nk8, B), dtype=jnp.int32)
    counts_t = counts_t.at[:nb_controls, :].set(counts[:, :nb_controls].T)
    counts_t = counts_t.at[nc8 : nc8 + (S - nb_controls), :].set(
        counts[:, nb_controls:].T
    )
    S_pad = nc8 + nk8
    n_tiles = B // TILE_B

    scalars = jnp.stack([
        jnp.float32(ratio_c), jnp.float32(ratio_k), jnp.float32(lr_min),
    ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((S_pad, TILE_B), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_B), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    )

    keep, lr, s_c, s_k = pl.pallas_call(
        functools.partial(_kernel, nb_controls=nc8),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, B), jnp.bool_),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, counts_t)
    return keep[0], lr[0], s_c[0], s_k[0]


def use_pallas() -> bool:
    """Opt-in (KMDIFF_PALLAS=1) routing of run_filter through this kernel
    on TPU backends.

    Measured at product shapes ([2M, 20] i32, honest host reads) the
    hand-tiled kernel runs at 0.87x of XLA's fused lax path
    (bench/README.md; bench.py re-measures both every run), so the
    compiler's schedule is the default — don't hand-schedule what XLA
    already fuses. The kernel stays as the pinned-layout reference
    implementation and for backends/shapes where it wins."""
    import os

    if os.environ.get("KMDIFF_PALLAS") != "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except RuntimeError:
        return False
