"""Sharded counting shuffle: sample-sharded extraction -> partition-sharded
counts via all_to_all over ICI.

The reference counts every sample inside one kmtricks process and hands
partitions over through the filesystem (SURVEY.md §2.3). Multi-host
TPU-native counting shards SAMPLES across devices/hosts during extraction;
the count matrices must then regroup by PARTITION (a pure function of the
k-mer). That regroup is the one real collective of the counting phase:

  each device buckets its local (kmer, count) stream by target device
  (partition % n_devices) into equal-capacity lanes -> lax.all_to_all
  rides the ICI torus -> every device sorts its received stream and
  run-length-encodes counts for the partitions it owns.

Buckets are fixed-capacity (static shapes); overflowed rows are counted
and reported so the caller can rerun with a larger capacity — the host
pipeline sizes capacity from the known per-sample stream lengths, so
overflow only fires on pathological skew (the avalanche-hash partitioner
keeps buckets balanced).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from kmdiff_tpu.parallel.mesh import ROW_AXIS


def make_sharded_count_regroup(mesh, nb_partitions: int, bucket_cap: int):
    """Build the jitted shuffle step.

    step(hi, lo, sample, count) with [D*L] row-sharded inputs (L rows per
    device; padding rows use kmer sentinel 0xFFFFFFFF/0xFFFFFFFF, count 0)
    -> (hi_r, lo_r, sample_r, count_r) [D * (D*bucket_cap)] row-sharded —
    each device's received stream sorted by (k-mer, sample), sentinel-
    padded — plus n_dropped [1] (total overflowed rows, replicated).
    """
    D = mesh.devices.size

    def _local(hi, lo, sample, count):
        # hi/lo/sample/count: [L] local rows
        L = hi.shape[0]
        from kmdiff_tpu.ops.codec import partition_ids

        part = partition_ids(hi, lo, nb_partitions)
        valid = ~((hi == jnp.uint32(0xFFFFFFFF)) & (lo == jnp.uint32(0xFFFFFFFF)))
        target = jnp.where(valid, (part % D).astype(jnp.int32), D)

        # all-keys sort by target device packs each bucket contiguously
        # (payload-carrying sorts hit pathological schedules at some
        # shapes, ops.merge_dev; the within-bucket order is rebuilt by the
        # receiver's sort anyway, and all-keys is deterministic)
        t_s, hi_s, lo_s, sm_s, c_s = jax.lax.sort(
            (target, hi, lo, sample, count), num_keys=5
        )
        # position of each row within its bucket
        idx = jnp.arange(L, dtype=jnp.int32)
        bucket_first = jnp.where(
            jnp.concatenate([jnp.ones(1, bool), t_s[1:] != t_s[:-1]]), idx, -1
        )
        first = jax.lax.cummax(bucket_first)
        within = idx - first
        keep = (within < bucket_cap) & (t_s < D)
        n_dropped = jnp.sum((~keep) & (t_s < D), dtype=jnp.int32)

        # scatter rows into [D, bucket_cap] lanes (sentinel-padded)
        slot = jnp.where(keep, t_s * bucket_cap + within, D * bucket_cap)
        buk_hi = jnp.full(D * bucket_cap + 1, 0xFFFFFFFF, jnp.uint32)
        buk_lo = jnp.full(D * bucket_cap + 1, 0xFFFFFFFF, jnp.uint32)
        buk_sm = jnp.zeros(D * bucket_cap + 1, jnp.int32)
        buk_c = jnp.zeros(D * bucket_cap + 1, jnp.int32)
        buk_hi = buk_hi.at[slot].set(hi_s)[:-1].reshape(D, bucket_cap)
        buk_lo = buk_lo.at[slot].set(lo_s)[:-1].reshape(D, bucket_cap)
        buk_sm = buk_sm.at[slot].set(sm_s)[:-1].reshape(D, bucket_cap)
        buk_c = buk_c.at[slot].set(c_s)[:-1].reshape(D, bucket_cap)

        # the shuffle: lane d of every device lands on device d
        r_hi = jax.lax.all_to_all(buk_hi, ROW_AXIS, 0, 0, tiled=True)
        r_lo = jax.lax.all_to_all(buk_lo, ROW_AXIS, 0, 0, tiled=True)
        r_sm = jax.lax.all_to_all(buk_sm, ROW_AXIS, 0, 0, tiled=True)
        r_c = jax.lax.all_to_all(buk_c, ROW_AXIS, 0, 0, tiled=True)

        # local sort of the received stream by (k-mer, sample); sentinels
        # sink to the end
        s_hi, s_lo, s_sm, s_c = jax.lax.sort(
            (r_hi.ravel(), r_lo.ravel(), r_sm.ravel(), r_c.ravel()),
            num_keys=4,
        )
        n_dropped = jax.lax.psum(n_dropped, ROW_AXIS)
        return s_hi, s_lo, s_sm, s_c, n_dropped.reshape(1)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(ROW_AXIS),) * 4,
        out_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P()),
    )
    return jax.jit(sharded)


def shard_triples(mesh, *arrays: np.ndarray):
    spec = NamedSharding(mesh, P(ROW_AXIS))
    return tuple(jax.device_put(a, spec) for a in arrays)


@functools.lru_cache(maxsize=64)
def make_sharded_count_kernel(
    mesh, k: int, nb_partitions: int, bucket_cap: int, max_distinct: int
):
    """Fully fused multi-device counting: every device extracts canonical
    k-mers from its code chunk, buckets them by owner device
    (partition % D), all_to_all rides the ICI torus, and each device
    sorts + run-length-encodes the partitions it owns — ONE dispatch per
    sample, O(distinct) outputs per device (the mesh version of
    ops.codec.count_sort_rle_lanes; reference equivalent: kmtricks'
    per-partition counting, SURVEY.md §2.2 row 1).

    step(codes [D*cap_codes] u8 row-sharded; chunks carry k-1 overlap so
    no window is lost at chunk joins, INVALID-padded)
    -> (stats [D, 3] i32 = per-device (n_distinct, max_count, n_valid),
        n_dropped [1] i32 psum'd,
        lane_blob [D*max_distinct, L] u32, counts [D*max_distinct] u32)
    — all row-sharded except n_dropped. Partition ids are recomputed on
    host from the gathered k-mers (pipeline.count._regroup_by_partition).
    """
    from kmdiff_tpu.ops.codec import (
        extract_canonical_lanes,
        n_lanes,
        partition_ids_lanes,
        sort_rle_core,
    )

    D = mesh.devices.size
    L = n_lanes(k)
    SENT = jnp.uint32(0xFFFFFFFF)

    def _local(codes):
        lanes, ok = extract_canonical_lanes(codes, k)
        lanes = tuple(jnp.where(ok, l, SENT) for l in lanes)
        W = lanes[0].shape[0]

        part = partition_ids_lanes(lanes, nb_partitions)
        target = jnp.where(ok, (part % jnp.uint32(D)).astype(jnp.int32), D)

        # pack each destination's rows contiguously, then scatter into
        # fixed [D, bucket_cap] send lanes
        # all keys (see ops.merge_dev on payload-carrying sort schedules);
        # the receiver re-sorts its bucket, so within-bucket order is free
        sorted_all = jax.lax.sort((target, *lanes), num_keys=1 + L)
        t_s, lanes_s = sorted_all[0], sorted_all[1:]
        idx = jnp.arange(W, dtype=jnp.int32)
        bucket_first = jnp.where(
            jnp.concatenate([jnp.ones(1, bool), t_s[1:] != t_s[:-1]]), idx, -1
        )
        within = idx - jax.lax.cummax(bucket_first)
        keep = (within < bucket_cap) & (t_s < D)
        n_dropped = jnp.sum((~keep) & (t_s < D), dtype=jnp.int32)
        slot = jnp.where(keep, t_s * bucket_cap + within, D * bucket_cap)

        recv = []
        for l in lanes_s:
            buk = jnp.full(D * bucket_cap + 1, SENT, jnp.uint32)
            buk = buk.at[slot].set(l)[:-1].reshape(D, bucket_cap)
            r = jax.lax.all_to_all(buk, ROW_AXIS, 0, 0, tiled=True)
            recv.append(r.ravel())
        recv = tuple(recv)

        # sort by lanes only — the partition id would be an extra u32 sort
        # lane; the host recomputes it from the gathered k-mers and stable-
        # sorts (pipeline.count.count_sample_device_mesh), preserving the
        # per-partition k-mer order
        stats, lane_blob, counts = sort_rle_core(recv, max_distinct)
        n_dropped = jax.lax.psum(n_dropped, ROW_AXIS)
        return (
            stats.reshape(1, 3),
            n_dropped.reshape(1),
            lane_blob,
            counts,
        )

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(ROW_AXIS),),
        out_specs=(
            P(ROW_AXIS, None),
            P(),
            P(ROW_AXIS, None),
            P(ROW_AXIS),
        ),
    )
    return jax.jit(sharded)
