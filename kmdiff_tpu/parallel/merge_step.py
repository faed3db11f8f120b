"""Mesh-sharded partition merge + LRT: the product pipeline's multi-chip
hot path.

The reference's scaling model is partition parallelism over a thread pool
(reference: include/kmdiff/merge.hpp:237-317). Its TPU translation: each
partition's (kmer, sample, count) triples split at k-mer KEY RANGES — free
on host because every per-sample stream is sorted — and each device runs
the full merge kernel (sort / segment-reduce / LR-filter / compact,
ops.merge_dev.merge_lrt_local) on its own range. Ranges are independent
(a segment never spans two ranges), so the only collective is the psum of
the global counters over ICI; every O(range) intermediate stays on its
device and only survivor-sized outputs leave.

The step is built once per (mesh, shape/static config) and cached, so the
shard_map traces/compiles once and is reused by every partition and chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from jax.sharding import NamedSharding, PartitionSpec as P

from kmdiff_tpu.ops.merge_dev import merge_lrt_local
from kmdiff_tpu.parallel.mesh import ROW_AXIS


@functools.lru_cache(maxsize=64)
def make_sharded_merge_step(
    mesh,
    nb_controls: int,
    nb_samples: int,
    n_lanes: int,
    max_hits: int,
    max_geno: int,
    want_geno: bool,
    want_rows: bool,
    wide_sums: bool,
    packed_ctrl: bool = False,
):
    """Build the jitted sharded merge step for a mesh.

    step(lanes tuple of [D*cap] u32 row-sharded, sample [D*cap] i32,
         count [D*cap] i32, ratio_c, ratio_k, lr_min, pca_thr, pca_seed)
    -> dict:
      totals [3] i32 replicated        psum'd (n_distinct, n_hits, n_geno)
      meta_d [D, 2] i32                per-device (n_hits, n_geno) — one
                                       host read serves slot slicing AND
                                       the overflow check
      hit_blob [D*max_hits, R] u32     per-device slot-compacted survivor
                                       rows (L lanes + group sums; layout
                                       = ops.merge_dev hit_blob)
      hit_rows [D*max_hits, S] i32     (want_rows)
      geno_rows [D*max_geno, S] u8     (want_geno)
    """

    def _local(lanes, sample, count, ratio_c, ratio_k, lr_min,
               pca_thr, pca_seed):
        out = merge_lrt_local(
            lanes, sample, count,
            nb_controls, ratio_c, ratio_k, lr_min, pca_thr, pca_seed,
            max_hits, max_geno, want_geno,
            nb_samples=nb_samples, want_rows=want_rows, wide_sums=wide_sums,
            packed_ctrl=packed_ctrl,
        )
        totals = jax.lax.psum(
            jnp.stack([out["n_distinct"], out["n_hits"], out["n_geno"]]),
            ROW_AXIS,
        )
        res = {
            "totals": totals,
            "meta_d": jnp.stack(
                [out["n_hits"], out["n_geno"]]
            ).reshape(1, 2),
            "hit_blob": out["hit_blob"],
        }
        if want_rows:
            res["hit_rows"] = out["hit_rows"]
        if want_geno:
            res["geno_rows"] = out["geno_rows"]
        return res

    out_specs = {
        "totals": P(),
        "meta_d": P(ROW_AXIS, None),
        "hit_blob": P(ROW_AXIS, None),
    }
    if want_rows:
        out_specs["hit_rows"] = P(ROW_AXIS, None)
    if want_geno:
        out_specs["geno_rows"] = P(ROW_AXIS, None)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            (P(ROW_AXIS),) * n_lanes,  # lanes
            P(ROW_AXIS),               # sample
            P(ROW_AXIS),               # count
            P(), P(), P(), P(), P(),   # scalars
        ),
        out_specs=out_specs,
    )
    return jax.jit(sharded)


def put_row_sharded(mesh, arr):
    """Place a host array row-sharded on the mesh (leading dim divides D)."""
    spec = P(ROW_AXIS, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def gather_row_sharded(arr, D: int, budget: int, counts_per_dev):
    """Fetch per-device survivor slots of a [D*budget, ...] row-sharded
    output in ascending device (= ascending key-range) order, moving only
    survivor-sized (pow2-bucketed) bytes per shard — no cross-device
    gather, no full-pad D2H."""
    import numpy as np

    from kmdiff_tpu.utils.transfer import device_fetch, fetch_prefix

    # only genuinely row-sharded layouts qualify for the per-shard fast
    # path: a replicated array also has D addressable shards, but each
    # with index start=None and FULL length — taking its prefix would
    # silently return the wrong rows
    shards = sorted(
        (s for s in arr.addressable_shards
         if s.index[0].start is not None),
        key=lambda s: s.index[0].start,
    )
    if len(shards) == D:
        parts = [
            fetch_prefix(shards[d].data, int(counts_per_dev[d]))
            for d in range(D)
        ]
    else:  # unexpected layout (e.g. replicated): plain fetch
        full = device_fetch(arr)
        parts = [
            full[d * budget : d * budget + int(counts_per_dev[d])]
            for d in range(D)
        ]
    return np.concatenate(parts, axis=0)
