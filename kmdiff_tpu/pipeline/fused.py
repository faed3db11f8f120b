"""Fused count->diff pipeline: count streams stay resident in HBM and the
merge consumes them in place — nothing O(N) ever crosses the host link.

The reference flow is file-mediated by construction: `kmdiff count` forks
kmtricks to build a run directory of per-partition per-sample count files,
and `kmdiff diff` reads them back through a k-way merge
(/root/reference/src/cmd.cpp:27-48, include/kmdiff/merge.hpp:237-317).
Faithfully reproducing that two-command flow (pipeline.count +
pipeline.merge) costs a full device->host->device round trip of every
(k-mer, count) record: at bench-cohort scale ~850 MB of distinct streams
down and ~1.3 GB of merge triples back up. Both directions are pure
overhead on an accelerator whose counting kernel ALREADY leaves each
sample's distinct stream sorted in device memory.

This module is the TPU-native alternative, a single-process
FASTA -> significant-k-mers path:

  per sample   extract -> sort -> RLE             (ops.codec, as today)
               [device dedup-sum of chunk streams + hard-min,
                ops.codec.dedup_sum_lanes — replaces the host k-way
                merge + host hard-min filter]
  handoff      per-sample sorted streams REMAIN device arrays
  merge        global key-range chunks assembled ON DEVICE from stream
               slices (one jitted gather per chunk) -> the standard
               merge+LRT kernel (ops.merge_dev.merge_lrt_local)
  D2H          survivors, counters, and per-sample histograms only

Outputs are identical to the two-stage flow: survivors route to the same
per-partition accumulators by the same k-mer hash, in the same ascending
k-mer order per partition, and are rescored by the same exact host f64
model — so FASTA/KFF outputs (and popstrat-corrected outputs) match
byte-for-byte. The kmtricks-format run dir can still be written, but OFF
the critical path (background spill threads overlap the merge); the
histogram files are always written (totals come from them, exactly like
the file path: src/kmtricks_utils.cpp:78-139). The only artifact that
differs is the Eigenstrat .geno/.snp row ORDER (global k-mer order
instead of partition-major) — the PCs are bit-identical regardless
because the PCA Gram is an order-free exact integer decomposition
(ops.pca).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time

import numpy as np

from kmdiff_tpu.utils.logging import logger

#: per-stream per-chunk row budget for the fused merge: chunks carry
#: S * CHUNK_ROWS rows into the kernel. 0 (the default) sizes it
#: adaptively from the cohort width so each chunk's sort approaches the
#: ~8M-row compile ceiling (fused_chunk_rows); set the env (or patch the
#: module attribute) to force a fixed value.
CHUNK_ROWS = int(os.environ.get("KMDIFF_FUSED_CHUNK_ROWS", 0))

#: the largest sort this rig's remote-compile service handles without
#: stalling (see pipeline.count.SORT_ROWS); chunk shapes target 7/8 of
#: it. Warm sort time is dispatch-latency-bound up to at least 2^24 rows
#: (bench/sort_shape_probe.py), so coarser chunks directly cut merge wall
#: time.
SORT_CEILING = 1 << 24


def _q4_floor(n: int) -> int:
    """Largest quarter-pow2 ({4,5,6,7} << b) <= max(n, 4)."""
    n = max(int(n), 4)
    b = n.bit_length() - 1
    step = 1 << max(b - 2, 0)
    return (n // step) * step


def fused_chunk_rows(S: int) -> int:
    """Per-stream chunk slice M for an S-sample cohort: as large as keeps
    the assembled S*M chunk under the sort compile ceiling (bigger chunks
    amortize the per-dispatch tunnel round trip AND raise the fill ratio
    the 7/8 chunk targeting can reach), quarter-pow2 so the compiled
    shape set stays bounded.

    Cohorts so wide that even the 2^14-row floor would push S*M past the
    ceiling (S > SORT_CEILING / 2^14 = 1024 samples) cannot be served
    without either oversized sort shapes (compile stalls) or sub-floor
    slices (dispatch storms) — they raise FusedFallback and run the
    two-stage flow instead."""
    if CHUNK_ROWS:
        return CHUNK_ROWS
    fit = _q4_floor(SORT_CEILING // max(S, 1))
    if fit < 1 << 14:
        raise FusedFallback(
            f"{S} samples leave only {fit} chunk rows per stream under "
            f"the {SORT_CEILING}-row sort ceiling"
        )
    return min(1 << 22, fit)

#: resident-stream device-memory budget; cohorts whose streams exceed it
#: fall back to the two-stage flow
HBM_BUDGET = int(float(os.environ.get("KMDIFF_FUSED_BYTES", 6e9)))


class FusedFallback(Exception):
    """The fused path cannot serve this cohort (device memory, degenerate
    key space, ...); the caller runs the standard count+diff flow."""


@dataclasses.dataclass
class ResidentStream:
    """One sample's distinct counted k-mer stream, resident on device.

    blob: [P, L] u32 lane blob, rows sorted ascending by lane tuple with
    an all-0xFFFFFFFF sentinel tail past U — P >= U + the merge's
    per-stream chunk slice so the assemble kernel's dynamic_slice can
    never clamp. counts: [P] u32, zeros past U. Rows are post hard-min;
    hist_uvec/n_distinct_pre/total_mass back the abundance histogram,
    which the reference derives BEFORE hard-min
    (pipeline.count.run_count) — computed ON DEVICE
    (ops.codec.sort_rle_core with_hist) so no O(distinct) counts array
    ever crosses to host."""

    blob: object
    counts: object
    U: int
    max_count: int
    hist_uvec: np.ndarray  # [257] i32, bins 1..255 + oversize at 256
    n_distinct_pre: int    # distinct k-mers before hard-min
    total_mass: int        # exact counted k-mer occurrences (pre hard-min)


def _q4(n: int, lo: int = 1 << 12) -> int:
    """Smallest quarter-pow2 >= max(n, lo) — delegates to the single
    ladder implementation (pipeline.count._q4_ceil) so the count
    chunking and the resident-stream shaping can never drift apart."""
    from kmdiff_tpu.pipeline.count import _q4_ceil

    return _q4_ceil(n, lo)


def count_sample_resident(
    all_codes: list[np.ndarray], k: int, hard_min: int,
    slack: int | None = None,
) -> ResidentStream:
    """Count one sample's distinct canonical k-mers, keeping the result on
    device (single-device twin of pipeline.count.count_sample_device,
    which fetches to host for the run-dir files). The abundance histogram
    rides the kernels' stats read (with_hist) — nothing O(distinct)
    reaches the host here."""
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import dedup_sum_lanes, n_lanes
    from kmdiff_tpu.pipeline.count import (
        SORT_ROWS,
        _dispatch_count_chunk,
        _host_code_chunks,
    )

    if slack is None:
        slack = CHUNK_ROWS or (1 << 18)
    L = n_lanes(k)
    streams: list[tuple[int, object, object]] = []  # (U, blob, counts)
    total_mass = 0  # exact counted windows (sum of per-chunk n_valid)
    uvec = None

    # ONE upload + ONE dispatch per sort chunk (extraction + sort + RLE
    # fused; _dispatch_count_chunk picks the upload encoding), same
    # chunking as the file path
    chunks = _host_code_chunks(all_codes, k, SORT_ROWS)
    one_chunk = len(chunks) == 1  # then its hist IS the sample hist
    for chunk in chunks:
        stats, lane_blob, counts = _dispatch_count_chunk(
            chunk, k, with_hist=one_chunk
        )
        stats_h = np.asarray(stats)
        U = int(stats_h[0])
        total_mass += int(stats_h[2])
        if one_chunk:
            uvec = stats_h[3:]
        streams.append((U, lane_blob, counts))

    if not streams:
        blob = jnp.full((_q4(slack), L), 0xFFFFFFFF, jnp.uint32)
        return ResidentStream(
            blob, jnp.zeros(_q4(slack), jnp.uint32), 0, 0,
            np.zeros(257, np.int32), 0, 0,
        )

    if len(streams) == 1:
        U, blob, counts = streams[0]
        # stats_h/uvec survive from whichever kernel produced the stream
    else:
        # device k-way dedup: chunk streams may share k-mers with PARTIAL
        # counts (a chunk boundary splits a sample's occurrences);
        # dedup_sum_lanes sums them exactly (host twin: native
        # merge_counted_streams). Blobs slice to quarter-pow2(U) first —
        # their pow2 caps can be ~50% sentinel pad, which would double the
        # dedup sort's bytes (slices are shape-bucketed, compile-cheap);
        # the dedup input itself pads at quarter-pow2 for the same reason
        cuts = [min(_q4(s[0]), s[1].shape[0]) for s in streams]
        cat_lanes = tuple(
            jnp.concatenate([s[1][:c, i] for s, c in zip(streams, cuts)])
            for i in range(L)
        )
        cat_w = jnp.concatenate(
            [s[2][:c] for s, c in zip(streams, cuts)]
        )
        N = cat_lanes[0].shape[0]
        P = _q4(N, lo=1 << 14)
        if P > N:
            padl = jnp.full(P - N, 0xFFFFFFFF, jnp.uint32)
            cat_lanes = tuple(jnp.concatenate([l, padl]) for l in cat_lanes)
            cat_w = jnp.concatenate([cat_w, jnp.zeros(P - N, jnp.uint32)])
        stats, blob, counts = dedup_sum_lanes(
            cat_lanes, cat_w, P, with_hist=True
        )
        stats_h = np.asarray(stats)
        U = int(stats_h[0])
        uvec = stats_h[3:]
    return _finalize_resident(
        stats_h, blob, counts, uvec, total_mass, hard_min, slack, L
    )


def _finalize_resident(stats_h, blob, counts, uvec, total_mass, hard_min,
                       slack, L) -> ResidentStream:
    """Post-kernel shaping shared by the per-sample and batched counting
    paths: optional hard-min compaction pass, then the resident capacity
    rule."""
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import dedup_sum_lanes

    U = int(stats_h[0])
    mx = int(stats_h[1])
    n_pre = U

    if hard_min > 1 and U:
        # second pass over the (already distinct) stream: dedup is a no-op,
        # the hard-min filter compacts sub-threshold runs away (the
        # histogram above is pre-filter, like the reference's)
        cols = tuple(blob[:, i] for i in range(L))
        stats2, blob, counts = dedup_sum_lanes(
            cols, counts, blob.shape[0], hard_min=hard_min
        )
        st2 = np.asarray(stats2)
        U, mx = int(st2[0]), int(st2[1])

    # final resident shape: capacity >= U + slack so chunk dynamic_slices
    # never clamp (sentinel rows keep the blob sorted). The kernel's
    # window-count-sized blob usually has that slack already — keep it
    # as-is then: every slice/pad here is an extra dispatch, i.e. a full
    # round trip on sync-dispatch rigs. Slice down only when the blob
    # wastes >2x the needed rows (high-duplication samples), where the
    # HBM recovered outweighs the round trip.
    P_final = _q4(U + slack)
    if blob.shape[0] < P_final:
        padl = jnp.full((P_final - blob.shape[0], L), 0xFFFFFFFF, jnp.uint32)
        blob = jnp.concatenate([blob, padl], axis=0)
        counts = jnp.concatenate(
            [counts, jnp.zeros(P_final - counts.shape[0], jnp.uint32)]
        )
    elif blob.shape[0] > 2 * P_final:
        blob = blob[:P_final]
        counts = counts[:P_final]
    return ResidentStream(
        blob, counts, U, int(mx),
        np.asarray(uvec, dtype=np.int32), n_pre, total_mass,
    )


#: samples per batched upload+read group in the fused counting phase
#: (0/1 disables batching); groups share one H2D transfer and one stats
#: read, amortizing a tunnel's fixed per-transfer and per-read costs.
#: Default OFF: an interleaved same-process A/B on the bench rig
#: (bench/batch_ab.py, pairs 22.1/21.9, 22.2/19.9, 14.4/12.5 s) showed
#: the grouped flow 1-15% SLOWER than per-sample dispatches. Those pairs
#: were measured against the round-3 pool-per-sample counting flow; the
#: shipped flow is now cmd/run.py's WAVE loop (FASTA decode on the
#: thread pool, uploads/dispatches/stats reads serial on the wave
#: thread). A round-5 re-run of bench/batch_ab.py — which drives
#: main_run, i.e. the wave flow — measured grouped counts at
#: 9.1/7.6/10.1 s vs per-sample 9.4/10.7/12.0 s across three pairs, but
#: inside a monotonically degrading rig window that favors the
#: first-run side: parity-to-slightly-faster, not an established win.
#: Default stays off; re-evaluate per deployment where per-transfer
#: cost dominates.
BATCH = int(os.environ.get("KMDIFF_FUSED_BATCH", 1))


def count_samples_resident_batched(
    per_sample_codes: list[list[np.ndarray]],
    k: int,
    hard_mins: list[int],
    slack: int,
    on_ready=None,
) -> list[ResidentStream]:
    """Count MANY samples to resident streams with batched device traffic.

    Single-chunk samples (the common case) group by code-bucket size into
    batches of up to BATCH: each group ships ONE concatenated upload and
    dispatches one fused kernel per member at a traced offset
    (ops.codec.fused_count_at), then ONE stacked stats read answers every
    member — the per-sample flow paid a separate H2D transfer (fixed
    ~125 ms on the tunnel) and a separate stats round trip each.
    Multi-chunk samples fall back to count_sample_resident.

    on_ready(i, stream): optional callback fired as each sample's stream
    materializes (histogram write + spill hook for the caller)."""
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import fused_count_at, n_lanes
    from kmdiff_tpu.pipeline.count import SORT_ROWS, _host_code_chunks

    n = len(per_sample_codes)
    L = n_lanes(k)
    out: list[ResidentStream | None] = [None] * n
    chunked = [
        _host_code_chunks(codes, k, SORT_ROWS) for codes in per_sample_codes
    ]

    def finish(i, st):
        out[i] = st
        if on_ready is not None:
            on_ready(i, st)

    # group single-chunk samples by their padded code-bucket length
    groups: dict[int, list[int]] = {}
    for i, chunks in enumerate(chunked):
        if len(chunks) == 1 and BATCH > 1:
            groups.setdefault(len(chunks[0]), []).append(i)

    stack_stats = _get_stack_stats()
    for nlen, members in sorted(groups.items()):
        W = nlen - k + 1
        # the traced slice offset j*nlen is int32: cap the group size so
        # the last member's offset stays < 2^31 (past it the offset wraps
        # negative, dynamic_slice clamps to 0, and later members would
        # silently count the first member's data)
        batch = min(BATCH, max(1, (2**31 - 1) // max(nlen, 1)))
        for g in range(0, len(members), batch):
            grp = members[g : g + batch]
            B = len(grp)
            buf = np.concatenate([chunked[i][0] for i in grp])
            buf_d = jnp.asarray(buf)
            outs = [
                fused_count_at(
                    buf_d, jnp.int32(j * nlen), k, nlen, W, with_hist=True
                )
                for j in range(B)
            ]
            stats_all = np.asarray(
                stack_stats(tuple(o[0] for o in outs))
            )
            for j, i in enumerate(grp):
                st = _finalize_resident(
                    stats_all[j], outs[j][1], outs[j][2],
                    stats_all[j][3:], int(stats_all[j][2]),
                    hard_mins[i], slack, L,
                )
                finish(i, st)

    for i, chunks in enumerate(chunked):
        if out[i] is None:
            finish(i, count_sample_resident(
                per_sample_codes[i], k, hard_mins[i], slack=slack
            ))
    return out


_stack_stats = None


def _get_stack_stats():
    global _stack_stats
    if _stack_stats is None:
        import jax
        import jax.numpy as jnp

        _stack_stats = jax.jit(lambda ts: jnp.stack(ts))
    return _stack_stats


# ---------------------------------------------------------------------------
# fused merge: key-range chunks assembled on device from resident streams
# ---------------------------------------------------------------------------

def _assemble_chunk_impl(blobs, counts, starts, lens, M, nb_controls, mode):
    import jax
    import jax.numpy as jnp

    S = len(blobs)
    L = blobs[0].shape[1]
    iota = jnp.arange(M, dtype=jnp.int32)
    sent = jnp.uint32(0xFFFFFFFF)
    lane_parts, cnt_parts, smp_parts = [], [], []
    for s in range(S):
        st = starts[s].astype(jnp.int32)
        bl = jax.lax.dynamic_slice(blobs[s], (st, jnp.int32(0)), (M, L))
        c = jax.lax.dynamic_slice(counts[s], (st,), (M,))
        v = iota < lens[s]
        bl = jnp.where(v[:, None], bl, sent)
        if mode == "p16":
            cp = c.astype(jnp.uint16)
            if s < nb_controls:
                cp = cp | jnp.uint16(0x8000)
            cp = jnp.where(v, cp, jnp.uint16(0))
        elif mode == "p32":
            ci = jax.lax.bitcast_convert_type(c, jnp.int32)
            if s < nb_controls:
                ci = ci | jnp.int32(-0x80000000)
            cp = jnp.where(v, ci, jnp.int32(0))
        elif mode == "dedup":  # group pre-aggregation: raw u32 weights
            cp = jnp.where(v, c, jnp.uint32(0))
        else:  # full: sample ids + raw counts (geno/rows/wide paths)
            cp = jnp.where(
                v, jax.lax.bitcast_convert_type(c, jnp.int32), jnp.int32(0)
            )
            smp_parts.append(
                jnp.where(v, jnp.int32(s), jnp.int32(0))
            )
        lane_parts.append(bl)
        cnt_parts.append(cp)
    lanes_cat = jnp.concatenate(lane_parts, axis=0)  # [S*M, L]
    count_cat = jnp.concatenate(cnt_parts)
    sample_cat = (
        jnp.concatenate(smp_parts) if mode == "full"
        else jnp.zeros(1, jnp.int32)
    )
    return (
        tuple(lanes_cat[:, i] for i in range(L)),
        sample_cat,
        count_cat,
    )


def _fused_chunk_impl(
    blobs, counts, starts, lens, ratio_c, ratio_k, lr_min, pca_thr,
    pca_seed, M, nb_controls, mode, max_hits, max_geno, want_geno,
    nb_samples, want_rows, wide, mblob,
):
    """Assemble + merge+LRT in ONE jitted program: the chunk gather feeds
    the kernel without an intermediate dispatch (each extra dispatch costs
    a full round trip on sync-dispatch rigs)."""
    from kmdiff_tpu.ops.merge_dev import merge_lrt_local

    lanes, sample, count = _assemble_chunk_impl(
        blobs, counts, starts, lens, M, nb_controls, mode
    )
    return merge_lrt_local(
        lanes, sample, count, nb_controls, ratio_c, ratio_k, lr_min,
        pca_thr, pca_seed, max_hits, max_geno, want_geno,
        nb_samples=nb_samples, want_rows=want_rows, wide_sums=wide,
        packed_ctrl=(mode != "full"), meta_in_blob=mblob,
    )


_fused_chunk = None


def _get_fused_chunk():
    global _fused_chunk
    if _fused_chunk is None:
        import jax

        _fused_chunk = jax.jit(
            _fused_chunk_impl,
            static_argnames=(
                "M", "nb_controls", "mode", "max_hits", "max_geno",
                "want_geno", "nb_samples", "want_rows", "wide", "mblob",
            ),
        )
    return _fused_chunk


@functools.lru_cache(maxsize=64)
def _make_sharded_fused_step(
    mesh, S: int, M: int, nb_controls: int, mode: str, max_hits: int,
    max_geno: int, want_geno: bool, want_rows: bool, wide: bool,
):
    """Mesh-sharded fused assemble+merge: D key-range chunks per program,
    one per device. The resident stream blobs are REPLICATED over the mesh
    (one ICI broadcast before the chunk loop — they never return to host),
    each device dynamic-slices its own chunk's per-stream ranges and runs
    the full merge+LRT kernel on them; ranges are independent (a k-mer
    group never spans a chunk bound), so nothing is communicated between
    devices — only survivor-sized row-sharded outputs leave. This is the
    fused-flow twin of parallel.merge_step.make_sharded_merge_step (the
    reference's partition parallelism, merge.hpp:237-317, applied to the
    flagship path).

    step(blobs (S x [P_s, L] u32 replicated), counts (S x [P_s] u32),
         starts [D, S] i32 row-sharded, lens [D, S] i32, scalars...)
    -> {"meta_d": [D, 3] i32 (n_distinct, n_hits, n_geno) per device —
        ONE host read answers sync + overflow + totals;
        "hit_blob": [D*max_hits, R] u32 row-sharded; "hit_rows"/
        "geno_rows" row-sharded when requested}
    """
    import jax
    import jax.numpy as jnp

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from kmdiff_tpu.parallel.mesh import ROW_AXIS

    def _local(blobs, counts, starts_d, lens_d, ratio_c, ratio_k, lr_min,
               pca_thr, pca_seed):
        out = _fused_chunk_impl(
            blobs, counts, starts_d[0], lens_d[0], ratio_c, ratio_k,
            lr_min, pca_thr, pca_seed, M, nb_controls, mode, max_hits,
            max_geno, want_geno, S, want_rows, wide, False,
        )
        res = {
            "meta_d": jnp.stack(
                [out["n_distinct"], out["n_hits"], out["n_geno"]]
            ).reshape(1, 3),
            "hit_blob": out["hit_blob"],
        }
        if want_rows:
            res["hit_rows"] = out["hit_rows"]
        if want_geno:
            res["geno_rows"] = out["geno_rows"]
        return res

    in_specs = (
        (P(None, None),) * S,   # blobs: replicated
        (P(None),) * S,         # counts: replicated
        P(ROW_AXIS, None),      # starts: one chunk row per device
        P(ROW_AXIS, None),      # lens
        P(), P(), P(), P(), P(),
    )
    out_specs = {
        "meta_d": P(ROW_AXIS, None),
        "hit_blob": P(ROW_AXIS, None),
    }
    if want_rows:
        out_specs["hit_rows"] = P(ROW_AXIS, None)
    if want_geno:
        out_specs["geno_rows"] = P(ROW_AXIS, None)
    return jax.jit(shard_map(
        _local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
    ))


#: key-range chunks fused into ONE single-device dispatch + ONE host read
#: in the fused merge (packed mode). Each chunk embeds its meta as blob
#: row 0 (meta_in_blob), so one contiguous [W*(1+max_hits), R] read
#: answers sync + overflow + survivors for the whole group. Default OFF:
#: an interleaved same-process A/B on the bench rig (bench/group_ab.py,
#: three pairs: 2.04/2.08, 2.03/2.15, 2.01/2.14 s) measured W=4 at
#: 0.94-0.98x of per-chunk dispatches — the per-chunk round trip is
#: already amortized by the meta-in-blob single read, and the 4-sort
#: program compiles 20x slower (79 s vs 4 s cold) with a slightly worse
#: XLA schedule. Kept opt-in for rigs with >100 ms dispatch latency.
CHUNK_GROUP = int(os.environ.get("KMDIFF_FUSED_CHUNK_GROUP", 1))


def _fused_group_impl(
    blobs, counts, starts_g, lens_g, ratio_c, ratio_k, lr_min, pca_thr,
    pca_seed, M, nb_controls, mode, max_hits, W, nb_samples,
):
    """W assemble+merge chunks in ONE jitted program (packed mode only:
    no geno/rows/wide outputs); chunk w's meta-in-blob hit blob lands at
    rows [w*(1+max_hits), (w+1)*(1+max_hits))."""
    import jax.numpy as jnp

    parts = []
    for w in range(W):
        out = _fused_chunk_impl(
            blobs, counts, starts_g[w], lens_g[w], ratio_c, ratio_k,
            lr_min, pca_thr, pca_seed, M, nb_controls, mode, max_hits,
            1, False, nb_samples, False, False, True,
        )
        parts.append(out["hit_blob"])
    return jnp.concatenate(parts, axis=0)


_fused_group = None


def _get_fused_group():
    global _fused_group
    if _fused_group is None:
        import jax

        _fused_group = jax.jit(
            _fused_group_impl,
            static_argnames=(
                "M", "nb_controls", "mode", "max_hits", "W", "nb_samples",
            ),
        )
    return _fused_group


def _fused_group_dispatch(
    proc, blobs, counts_t, st_g, ln_g, ratio_c, ratio_k, lr_min, pca_thr,
    pca_seed, M, mode, S, L, W, nbc,
):
    """Dispatch one group of W key-range chunks in a single program and
    read ONE blob; returns the standard disp tuple (survivors across the
    group concatenate in ascending chunk = ascending k-mer order).
    Overflow retries re-dispatch the whole group at the needed pow2."""
    max_hits, _mg = proc._budgets(S * M, False, 0.0)
    kern = _get_fused_group()
    t0 = time.perf_counter()
    while True:
        blob_all = np.asarray(kern(
            blobs, counts_t, st_g, ln_g, ratio_c, ratio_k, lr_min,
            pca_thr, pca_seed, M=M, nb_controls=nbc,
            mode=mode, max_hits=max_hits, W=W, nb_samples=S,
        ))
        stride = 1 + max_hits
        metas = blob_all[0::stride][:W, :3]
        n_hits_w = metas[:, 1].astype(np.int64)
        if int(n_hits_w.max()) <= max_hits:
            break
        max_hits = min(
            S * M, 1 << max(int(n_hits_w.max()) - 1, 1).bit_length()
        )
    n_distinct = int(metas[:, 0].sum())
    proc.phases.add("device", time.perf_counter() - t0)
    t0 = time.perf_counter()
    blob = np.concatenate([
        blob_all[w * stride + 1 : w * stride + 1 + int(n_hits_w[w])]
        for w in range(W)
    ])
    hit_lanes, s_c, s_k = proc._unpack_blob(blob, L, False)
    proc.phases.add("fetch", time.perf_counter() - t0)
    return n_distinct, s_c, s_k, hit_lanes, None, None


def _fused_mesh_dispatch(
    proc, mesh, blobs, counts_t, st_g, ln_g, ratio_c, ratio_k, lr_min,
    pca_thr, pca_seed, M, mode, want_geno, want_rows, wide, S, L, sampler,
    nbc,
):
    """Dispatch one group of D key-range chunks over the mesh and fetch the
    survivors in ascending device (= ascending k-mer range) order; returns
    the same disp tuple as PartitionProcessor._dispatch_single so the
    shared post-processing (exact f64 rescore, routing, sampler) is
    identical. Overflow retries re-parameterize the per-device compaction
    budgets exactly like the single-device path."""
    from kmdiff_tpu.parallel.merge_step import gather_row_sharded

    D = mesh.devices.size
    geno_rate = getattr(sampler, "rate", 0.0) if want_geno else 0.0
    max_hits, max_geno = proc._budgets(S * M, want_geno, geno_rate)
    cap = S * M
    t0 = time.perf_counter()
    while True:
        step = _make_sharded_fused_step(
            mesh, S, M, nbc, mode, max_hits, max_geno,
            want_geno, want_rows, wide,
        )
        out = step(
            blobs, counts_t, st_g, ln_g,
            ratio_c, ratio_k, lr_min, pca_thr, pca_seed,
        )
        meta_d = np.asarray(out["meta_d"])  # [D, 3]: ONE read per group
        n_hits_d = meta_d[:, 1]
        n_geno_d = meta_d[:, 2] if want_geno else None
        if int(n_hits_d.max()) <= max_hits and (
            not want_geno or int(n_geno_d.max()) <= max_geno
        ):
            break
        # grow ONLY the overflowed budget: shrinking the other to its
        # current count would change the compiled shape for nothing (a
        # 40-90 s remote recompile per shape)
        max_hits = max(
            max_hits,
            min(cap, 1 << max(int(n_hits_d.max()) - 1, 1).bit_length()),
        )
        if want_geno:
            max_geno = max(
                max_geno,
                min(cap, 1 << max(int(n_geno_d.max()) - 1, 1).bit_length()),
            )
    n_distinct = int(meta_d[:, 0].sum())
    proc.phases.add("device", time.perf_counter() - t0)
    t0 = time.perf_counter()
    blob = gather_row_sharded(out["hit_blob"], D, max_hits, n_hits_d)
    hit_lanes, s_c, s_k = proc._unpack_blob(blob, L, wide)
    rows_all = (
        gather_row_sharded(out["hit_rows"], D, max_hits, n_hits_d)
        if want_rows else None
    )
    geno_rows = (
        gather_row_sharded(out["geno_rows"], D, max_geno, n_geno_d)
        if want_geno else None
    )
    proc.phases.add("fetch", time.perf_counter() - t0)
    return n_distinct, s_c, s_k, hit_lanes, rows_all, geno_rows


class _RoutingAccumulator:
    """Fans survivor blocks out to the per-partition accumulators by the
    same k-mer hash the counting repartition uses — chunks arrive in
    ascending global k-mer order, so every partition's accumulator
    receives its survivors in the same ascending order as the two-stage
    flow (content-identical spills, byte-identical final outputs)."""

    def __init__(self, accs, nb_partitions: int):
        self.accs = accs
        self.n = nb_partitions

    def push_block(self, block) -> None:
        from kmdiff_tpu.io.accumulator import KmerSignBlock
        from kmdiff_tpu.pipeline.count import host_partition_ids

        if not len(block):
            return
        parts = host_partition_ids(block.kmers, self.n)
        for p in range(self.n):
            m = parts == p
            if not m.any():
                continue
            self.accs[p].push_block(KmerSignBlock(
                block.kmers[m],
                block.pvalues[m],
                block.signs[m],
                block.mean_control[m],
                block.mean_case[m],
                None if block.counts_ratio is None else block.counts_ratio[m],
            ))

    def finish(self) -> None:
        for a in self.accs:
            a.finish()


def _lane_minmax_all_impl(blobs):
    import jax.numpy as jnp

    rows = []
    for blob in blobs:
        cols = tuple(blob[:, i] for i in range(blob.shape[1]))
        valid = cols[0] != jnp.uint32(0xFFFFFFFF)
        for c in cols[1:]:
            valid = valid | (c != jnp.uint32(0xFFFFFFFF))
        row = []
        for c in cols:
            row.append(jnp.min(jnp.where(valid, c, jnp.uint32(0xFFFFFFFF))))
            row.append(jnp.max(jnp.where(valid, c, jnp.uint32(0))))
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def _bounds_pos_impl(blobs, bd, split):
    """searchsorted positions of every bound in every stream's split-lane
    column — ALL streams in one dispatch/read (per-stream calls each pay
    a sync round trip). Returns [B, S] i32; sentinel tails sort past every
    real bound and the host clamps to U anyway."""
    import jax.numpy as jnp

    return jnp.stack(
        [
            jnp.searchsorted(b[:, split], bd, side="left").astype(jnp.int32)
            for b in blobs
        ],
        axis=1,
    )


def _subsample_split_impl(blobs, split):
    """Every stream's [::1024] subsample of the split-lane column, stacked
    to [S, K] in ONE dispatch + ONE read (a per-stream np.asarray each
    paid a slice dispatch + a transfer round trip). Shorter streams pad
    with the sentinel, which the host filters anyway."""
    import jax.numpy as jnp

    cols = [b[::1024, split] for b in blobs]
    K = max(c.shape[0] for c in cols)
    out = []
    for c in cols:
        if c.shape[0] < K:
            c = jnp.concatenate(
                [c, jnp.full(K - c.shape[0], 0xFFFFFFFF, jnp.uint32)]
            )
        out.append(c)
    return jnp.stack(out)


_lane_minmax_all = None
_bounds_pos = None
_subsample_split = None


def _get_batched_helpers():
    global _lane_minmax_all, _bounds_pos, _subsample_split
    if _lane_minmax_all is None:
        import jax

        _lane_minmax_all = jax.jit(_lane_minmax_all_impl)
        _bounds_pos = jax.jit(
            _bounds_pos_impl, static_argnames=("split",)
        )
        _subsample_split = jax.jit(
            _subsample_split_impl, static_argnames=("split",)
        )
    return _lane_minmax_all, _bounds_pos, _subsample_split


def _pick_split_lane(streams, L: int) -> int:
    """First lane with >1 value over the valid rows (k <= 16 leaves the
    high lane constant-zero); verified EXACTLY on device, not just on a
    subsample — and for EVERY stream in one dispatch + one host read."""
    minmax_all, _, _ = _get_batched_helpers()
    mm = np.asarray(minmax_all(tuple(s.blob for s in streams)))
    for lane in range(L):
        lo = int(mm[:, 2 * lane].min())
        hi = int(mm[:, 2 * lane + 1].max())
        if hi > lo:
            return lane
    return L  # a single distinct k-mer cohort: no split lane needed


def plan_key_chunks(streams, M: int, D: int = 1):
    """Split the streams' shared key space into ascending ranges whose
    per-stream extents all fit M rows: pooled subsampled keys -> quantile
    bounds on the split lane -> exact per-stream positions via ONE
    batched device searchsorted. Chunks target 7/8-full S*M buffers (the
    kernel sorts the whole buffer including sentinel fill, so fill ratio
    IS sort efficiency); the per-stream-extent seed term covers skewed
    cohorts in the first attempt. With D > 1, the chunk count rounds to
    device-count multiples so every sharded dispatch keeps the mesh busy.

    Returns (starts [C, S] i32, lens [C, S] i32); raises FusedFallback
    when no split serves the budget."""
    import jax.numpy as jnp

    S = len(streams)
    L = streams[0].blob.shape[1]
    split = _pick_split_lane(streams, L)
    total_rows = sum(s.U for s in streams)
    max_U = max(s.U for s in streams)
    Us = np.array([s.U for s in streams], np.int64)
    blobs = tuple(s.blob for s in streams)
    if split >= L:
        starts = np.zeros((1, S), np.int32)
        lens = np.array([[s.U for s in streams]], np.int32)
        if max_U > M:
            raise FusedFallback("degenerate key space exceeds chunk budget")
        return starts, lens
    _, bounds_pos, subsample_split = _get_batched_helpers()
    sub_all = np.asarray(subsample_split(blobs, split=split))
    pool = sub_all[sub_all != 0xFFFFFFFF]
    if pool.size == 0:
        pool = np.zeros(1, np.uint32)
    target = max(1, (S * M * 7) // 8)
    n_chunks = max(
        1,
        -(-total_rows // target),
        -(-(max_U * 8) // max(7 * M, 1)),
    )
    if D > 1:
        n_chunks = -(-n_chunks // D) * D
    for _attempt in range(6):
        if n_chunks == 1:
            starts = np.zeros((1, S), np.int32)
            lens = np.array([[s.U for s in streams]], np.int32)
            if int(lens.max()) <= M:
                return starts, lens
            n_chunks = 2
            continue
        qs = np.quantile(pool, np.linspace(0, 1, n_chunks + 1)[1:-1])
        bounds = np.unique(qs.astype(np.uint64).astype(np.uint32))
        # pad the query to a pow2 bucket (bounded compiled-shape set);
        # sentinel queries land past every real key and are sliced off
        B = len(bounds)
        Bp = 1 << max(4, (max(B, 1) - 1).bit_length())
        bd = np.full(Bp, 0xFFFFFFFF, np.uint32)
        bd[:B] = bounds
        pos_all = np.asarray(
            bounds_pos(blobs, jnp.asarray(bd), split=split)
        )[:B]
        pos = np.minimum(pos_all.astype(np.int64), Us[None, :])
        ends = np.concatenate([pos, Us[None, :]], axis=0)
        starts = np.concatenate(
            [np.zeros((1, S), np.int64), pos], axis=0
        ).astype(np.int32)
        lens = (ends - starts).astype(np.int32)
        if int(lens.max()) <= M:
            return starts, lens
        n_chunks *= 2
    raise FusedFallback(
        f"key-range split failed (max extent {int(lens.max())} > "
        f"chunk budget {M})"
    )


# ---------------------------------------------------------------------------
# group pre-aggregation: controls/cases dedup-sum to ONE stream per group
# ---------------------------------------------------------------------------

def _dedup_append_impl(group_blob, group_counts, blobs, counts, starts,
                       lens, off, M):
    """One chunked group-dedup step in ONE program: assemble the chunk's
    per-stream slices (raw u32 weights), dedup-sum identical lane tuples,
    and append the compacted result into the group blob at traced offset
    `off` (donated buffers — in-place on TPU). The write spans the full
    padded chunk; its sentinel overhang is overwritten by the next
    chunk's append (ascending offsets), and the final overhang is
    sentinel rows, which IS the group blob's pad contract."""
    import jax
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import dedup_sum_lanes

    lanes, _smp, w = _assemble_chunk_impl(
        blobs, counts, starts, lens, M, 0, "dedup"
    )
    stats, blob, cnt = dedup_sum_lanes(lanes, w, lanes[0].shape[0])
    gb = jax.lax.dynamic_update_slice(group_blob, blob, (off, jnp.int32(0)))
    gc = jax.lax.dynamic_update_slice(group_counts, cnt, (off,))
    return stats, gb, gc


_dedup_append = None


def _get_dedup_append():
    global _dedup_append
    if _dedup_append is None:
        import jax

        _dedup_append = jax.jit(
            _dedup_append_impl, static_argnames=("M",),
            donate_argnums=(0, 1),
        )
    return _dedup_append


def _reduce_streams_once(streams: list[ResidentStream]) -> ResidentStream:
    """Dedup-sum a list of sorted counted streams into ONE stream (exact
    u32 integer sums — byte-identical group sums at any reduction order).
    Single dispatch when the concatenated rows fit the sort ceiling;
    key-range chunked with in-place appends otherwise. Histogram fields
    of the result are dummies (group streams only feed the merge)."""
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import dedup_sum_lanes

    L = streams[0].blob.shape[1]
    # quarter-pow2 cuts keep the concat SHAPE on the bucket ladder (the
    # deterministic bracket pairing then makes every reduction's shape a
    # pure function of the cohort's size buckets, so the persistent XLA
    # cache serves them; arrival-order pairing produced fresh shapes —
    # and 30-90 s recompiles — every run). Sentinel rows past U carry
    # weight 0 and sort last: bounded fill, never wrong.
    cuts = [min(_q4(s.U), s.blob.shape[0]) for s in streams]
    N = sum(cuts)
    if N <= SORT_CEILING:
        cat_lanes = tuple(
            jnp.concatenate([s.blob[:c, i] for s, c in zip(streams, cuts)])
            for i in range(L)
        )
        cat_w = jnp.concatenate(
            [s.counts[:c] for s, c in zip(streams, cuts)]
        )
        # output capacity: bucket-shaped, with slack past U guaranteed
        # even for fully-disjoint inputs (U = N) — later rounds and the
        # final merge dynamic-slice [st : st+M) windows from it
        P = _q4(N + max(256, N // 8), lo=1 << 14)
        padl = jnp.full(P - N, 0xFFFFFFFF, jnp.uint32)
        cat_lanes = tuple(jnp.concatenate([l, padl]) for l in cat_lanes)
        cat_w = jnp.concatenate([cat_w, jnp.zeros(P - N, jnp.uint32)])
        stats, blob, cnt = dedup_sum_lanes(cat_lanes, cat_w, P)
        st = np.asarray(stats)
        return ResidentStream(
            blob, cnt, int(st[0]), int(st[1]),
            np.zeros(257, np.int32), 0, 0,
        )

    # chunked: ascending key ranges appended in place
    S = len(streams)
    Md = min(1 << 22, _q4_floor(SORT_CEILING // S))
    cap_slack = min(s.blob.shape[0] - s.U for s in streams)
    if cap_slack < Md:
        Md = _q4_floor(cap_slack)
        if Md < 1 << 9:
            raise FusedFallback("group streams leave no chunk slack")
    starts, lens = plan_key_chunks(streams, Md)
    chunk_rows = S * Md
    cap = _q4(sum(s.U for s in streams) + chunk_rows)
    group_blob = jnp.full((cap, L), 0xFFFFFFFF, jnp.uint32)
    group_counts = jnp.zeros(cap, jnp.uint32)
    blobs = tuple(s.blob for s in streams)
    counts_t = tuple(s.counts for s in streams)
    append = _get_dedup_append()
    U = 0
    mx = 0
    for c in range(starts.shape[0]):
        stats, group_blob, group_counts = append(
            group_blob, group_counts, blobs, counts_t,
            jnp.asarray(starts[c]), jnp.asarray(lens[c]),
            jnp.int32(U), M=Md,
        )
        st = np.asarray(stats)
        U += int(st[0])
        mx = max(mx, int(st[1]))
    return ResidentStream(
        group_blob, group_counts, U, mx, np.zeros(257, np.int32), 0, 0,
    )


class GroupReducer:
    """Incrementally folds per-sample resident streams into one summed
    stream per cohort group (controls / cases) — the packed merge's LRT
    consumes only per-group sums (model.hpp:145-146), so pre-aggregating
    S streams to 2 cuts the final merge's sorted rows by the cohort's
    duplication factor (measured 1.88 s -> 0.53 s merge phase on the
    bench cohort, bench/groupmerge_ab.py).

    The reduction runs on a BACKGROUND thread concurrently with the
    counting loop: the count phase on tunnel rigs is upload/dispatch-
    latency-bound with the device ~70% idle, and dedup dispatches from a
    second thread fill that idle time (a synchronous between-waves drain
    measured as pure serial addition — bench/groupmerge_ab.py round-5
    A/B). Pairing is a DETERMINISTIC index bracket (see __init__), which
    keeps every reduction's concat shape a pure function of the cohort's
    size buckets so the persistent XLA cache serves them, and keeps pair
    sizes under the sort ceiling's single-dispatch path (no planning
    dispatches, no appends) for typical cohorts.

    Exactness: group sums are u32 integer additions — associative, so
    any reduction order yields byte-identical sums (and the final merge's
    survivor set/order matches the per-sample path's: same union, same
    per-group sums, same ascending key order)."""

    def __init__(self, nb_controls: int, nb_cases: int):
        import threading

        self.nb_controls = nb_controls
        # deterministic bracket: leaf p pairs with its index sibling at
        # every level ((l, 2p) + (l, 2p+1) -> (l+1, p); odd tails promote
        # as byes). Pairing by ARRIVAL order instead made the reduction
        # tree — and with it every concat shape — depend on thread
        # timing, defeating the persistent XLA cache (measured 30-90 s
        # recompiles per run, bench/groupmerge_ab.py round-5 notes).
        self._sizes: dict[bool, list[int]] = {}
        for g, n in ((True, nb_controls), (False, nb_cases)):
            sizes = [n]
            while sizes[-1] > 1:
                sizes.append((sizes[-1] + 1) // 2)
            self._sizes[g] = sizes
        self._ready: dict[bool, dict[tuple[int, int], ResidentStream]] = {
            True: {}, False: {},
        }
        self._done = False
        self._stop = False
        self.failed: str | None = None
        self._cv = threading.Condition()
        self._worker = threading.Thread(
            target=self._run, name="kmdiff-group-reduce", daemon=True
        )
        self._worker.start()

    def _settle(self, g: bool, node: tuple[int, int]) -> None:
        """Promote byes: a node whose sibling slot does not exist at its
        level moves up unchanged (holds the lock)."""
        sizes = self._sizes[g]
        lvl, p = node
        while lvl + 1 < len(sizes) and p == sizes[lvl] - 1 and p % 2 == 0:
            st = self._ready[g].pop((lvl, p))
            lvl, p = lvl + 1, p // 2
            self._ready[g][(lvl, p)] = st

    def add(self, i: int, stream: ResidentStream) -> None:
        with self._cv:
            if self.failed:
                return
            g = i < self.nb_controls
            p = i if g else i - self.nb_controls
            self._ready[g][(0, p)] = stream
            self._settle(g, (0, p))
            self._cv.notify()

    def _pop_pair(self):
        """A deterministic-bracket pair whose two siblings are ready."""
        for g in (True, False):
            ready = self._ready[g]
            for (lvl, p) in sorted(ready):
                if p % 2 == 0 and (lvl, p + 1) in ready:
                    return g, (lvl, p), ready.pop((lvl, p)), \
                        ready.pop((lvl, p + 1))
        return None

    def _run(self) -> None:
        while True:
            with self._cv:
                while True:
                    if self.failed or self._stop:
                        self._cv.notify_all()
                        return
                    pair = self._pop_pair()
                    if pair is not None:
                        break
                    if self._done:
                        self._cv.notify_all()
                        return
                    self._cv.wait()
            g, (lvl, p), a, b = pair
            try:
                merged = _reduce_streams_once([a, b])
            except FusedFallback as e:
                with self._cv:
                    self.failed = str(e)
                    self._ready = {True: {}, False: {}}
                    self._cv.notify_all()
                return
            except Exception as e:  # pragma: no cover - defensive
                with self._cv:
                    self.failed = f"{type(e).__name__}: {e}"
                    self._ready = {True: {}, False: {}}
                    self._cv.notify_all()
                return
            with self._cv:
                node = (lvl + 1, p // 2)
                self._ready[g][node] = merged
                self._settle(g, node)
                self._cv.notify_all()

    def resident_bytes(self) -> int:
        with self._cv:
            return sum(
                s.blob.shape[0] * (4 * s.blob.shape[1] + 4)
                for g in (True, False) for s in self._ready[g].values()
            )

    def result(self) -> tuple[list, list] | None:
        """SNAPSHOT of the reduction: stop the worker after its in-flight
        merge and return the current per-group stream lists
        (controls, cases). The merge handles any stream count per group
        (nb_ctrl_streams), so waiting for the full fold would only
        serialize the reduction's log(S)-level tail — gated on the LAST
        counted samples — into the merge phase (measured ~2 s of the
        3.3 s merge window, bench/groupmerge_ab.py). None if reduction
        failed or either group is empty."""
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._worker.join()
        with self._cv:
            if self.failed:
                return None
            ctrl = [s for _n, s in sorted(self._ready[True].items())]
            case = [s for _n, s in sorted(self._ready[False].items())]
            if not ctrl or not case:
                return None
            return ctrl, case

    def close(self) -> None:
        """Stop the worker without consuming the result (fallback paths)."""
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._worker.join()


def fused_merge(
    processor,
    accumulators,
    streams: list[ResidentStream],
    ksize: int,
    nb_partitions: int,
    sampler=None,
    save_matrix_dir=None,
    M: int | None = None,
    nb_ctrl_streams: int | None = None,
):
    """Run the merge+LRT over resident streams in global key-range chunks.

    nb_ctrl_streams: how many leading streams carry CONTROL counts for
    the packed ctrl-bit (defaults to the processor's control count; the
    group-merge path passes 1 — its stream 0 is the control-group sum).

    Returns (total_kmers, nb_sign, sign_controls, sign_cases)."""
    S = len(streams)
    if M is None:
        M = fused_chunk_rows(S)  # call-time: tests patch CHUNK_ROWS
    import jax.numpy as jnp

    from kmdiff_tpu.ops.merge_dev import pca_threshold_u32
    from kmdiff_tpu.parallel.runtime import get_mesh
    from kmdiff_tpu.pipeline.merge import _ChunkSamplerShim

    mesh = get_mesh()
    D = mesh.devices.size if mesh is not None else 1
    nbc = processor.nb_controls if nb_ctrl_streams is None else nb_ctrl_streams

    # clamp-free dynamic_slice needs blob capacity >= U + M per stream;
    # streams counted with a smaller slack cap M down to what they allow
    cap = min(s.blob.shape[0] - s.U for s in streams)
    if cap < M:
        M = _q4_floor(cap)
        if M < 1 << 9:
            raise FusedFallback(
                f"resident streams leave only {cap} rows of chunk slack"
            )
    L = streams[0].blob.shape[1]
    want_geno = sampler is not None
    want_rows = processor.keep_counts or save_matrix_dir is not None
    wide = processor.params.wide_sums
    packed = not (want_rows or want_geno or wide)
    if packed:
        mode = "p16" if max(s.max_count for s in streams) < 0x8000 else "p32"
    else:
        mode = "full"
    if nb_ctrl_streams is not None and not packed:
        raise ValueError("group streams require the packed path")

    blobs = tuple(s.blob for s in streams)
    counts_t = tuple(s.counts for s in streams)
    starts, lens = plan_key_chunks(streams, M, D)

    shim = None
    geno_parts: list[np.ndarray] = []
    if want_geno:
        shim = _ChunkSamplerShim(sampler, geno_parts)
    matrix_sink: list | None = [] if save_matrix_dir is not None else None

    fused_kernel = _get_fused_chunk()
    eff_sampler = shim if shim is not None else sampler
    geno_rate = getattr(eff_sampler, "rate", 0.0) if want_geno else 0.0
    pca_thr = jnp.uint32(pca_threshold_u32(geno_rate))
    pca_seed = jnp.uint32(getattr(eff_sampler, "seed", 0) if want_geno else 0)
    ratio_c = jnp.float32(processor.params.ratio_c)
    ratio_k = jnp.float32(processor.params.ratio_k)
    lr_min = jnp.float32(processor.params.lr_min)

    total = nsign = n_ctrl = n_case = 0
    t0 = time.perf_counter()
    racc = _RoutingAccumulator(accumulators, nb_partitions)
    group = 1
    if mesh is not None:
        # replicate the resident streams over the mesh ONCE (device-side
        # broadcast; nothing returns to host) and pad the chunk table to a
        # device-count multiple with empty chunks (lens 0 -> all-sentinel
        # buffers, zero distinct rows)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as JP

        rep = NamedSharding(mesh, JP())
        blobs = tuple(jax.device_put(b, rep) for b in blobs)
        counts_t = tuple(jax.device_put(c, rep) for c in counts_t)
        if starts.shape[0] % D:
            padn = D - starts.shape[0] % D
            starts = np.concatenate(
                [starts, np.zeros((padn, S), starts.dtype)]
            )
            lens = np.concatenate([lens, np.zeros((padn, S), lens.dtype)])
    elif packed and CHUNK_GROUP > 1 and starts.shape[0] > 1:
        # single-device packed mode: fuse CHUNK_GROUP chunks per dispatch
        # (one program, one host read — the per-chunk sync round trip was
        # most of the merge phase on tunnel rigs). Tail pads with empty
        # chunks so exactly one program shape compiles.
        group = min(CHUNK_GROUP, starts.shape[0])
        if starts.shape[0] % group:
            padn = group - starts.shape[0] % group
            starts = np.concatenate(
                [starts, np.zeros((padn, S), starts.dtype)]
            )
            lens = np.concatenate([lens, np.zeros((padn, S), lens.dtype)])
    step_n = D if mesh is not None else group
    for c in range(0, starts.shape[0], step_n):
        if mesh is not None:
            st_g = starts[c : c + D].astype(np.int32)
            ln_g = lens[c : c + D].astype(np.int32)

            def mesh_dispatch(proc, sampler_, st_g=st_g, ln_g=ln_g):
                return _fused_mesh_dispatch(
                    proc, mesh, blobs, counts_t, st_g, ln_g,
                    ratio_c, ratio_k, lr_min, pca_thr, pca_seed,
                    M, mode, want_geno, want_rows, wide, S, L, sampler_,
                    nbc,
                )

            pre = {
                "dispatch_override": mesh_dispatch,
                "n_lanes": L,
                "pad_to": S * M,
                "packed": packed,
                "range_rows": 0,
                "build_s": 0.0,
            }
        elif group > 1:
            st_g = jnp.asarray(starts[c : c + group])
            ln_g = jnp.asarray(lens[c : c + group])

            def group_dispatch(proc, sampler_, st_g=st_g, ln_g=ln_g):
                return _fused_group_dispatch(
                    proc, blobs, counts_t, st_g, ln_g,
                    ratio_c, ratio_k, lr_min, pca_thr, pca_seed,
                    M, mode, S, L, group, nbc,
                )

            pre = {
                "dispatch_override": group_dispatch,
                "n_lanes": L,
                "pad_to": S * M,
                "packed": packed,
                "range_rows": 0,
                "build_s": 0.0,
            }
        else:
            st_d = jnp.asarray(starts[c])
            ln_d = jnp.asarray(lens[c])

            def dispatch(max_hits, max_geno, mblob=False,
                         st_d=st_d, ln_d=ln_d):
                return fused_kernel(
                    blobs, counts_t, st_d, ln_d,
                    ratio_c, ratio_k, lr_min, pca_thr, pca_seed,
                    M=M, nb_controls=nbc, mode=mode,
                    max_hits=max_hits, max_geno=max_geno,
                    want_geno=want_geno, nb_samples=S, want_rows=want_rows,
                    wide=wide, mblob=mblob,
                )

            pre = {
                "dispatch_fn": dispatch,
                "n_lanes": L,
                "pad_to": S * M,
                "packed": packed,
                "range_rows": 0,
                "build_s": 0.0,
            }
        res = processor._device_merge_chunk(
            0, [None] * S, [None] * S, racc, ksize, finish=False,
            sampler_override=shim, matrix_sink=matrix_sink, prebuilt=pre,
        )
        total += res.total_kmers
        nsign += res.nb_sign
        n_ctrl += res.sign_controls
        n_case += res.sign_cases
    racc.finish()

    if want_geno:
        rows = (
            np.concatenate(geno_parts)
            if geno_parts
            else np.zeros((0, S), np.uint8)
        )
        # single partition-0 add: geno rows arrive in global k-mer order
        # (the .geno artifact row order differs from the two-stage flow's
        # partition-major order; the PCs are bit-identical either way —
        # module docstring)
        sampler.add_sampled(0, rows)
    if matrix_sink is not None:
        _write_routed_matrices(
            processor, matrix_sink, ksize, nb_partitions, S
        )
    logger.debug(
        "fused merge: %d chunks of %d x %d rows in %.2fs",
        starts.shape[0], S, M, time.perf_counter() - t0,
    )
    return total, nsign, n_ctrl, n_case


def _write_routed_matrices(processor, sink, ksize, nb_partitions, S):
    from kmdiff_tpu.core.kmer import n_words
    from kmdiff_tpu.pipeline.count import host_partition_ids

    nw = n_words(ksize)
    km = (
        np.concatenate([m[0] for m in sink])
        if sink
        else np.zeros((0, nw), np.uint64)
    )
    ct = (
        np.concatenate([m[1] for m in sink])
        if sink
        else np.zeros((0, S), np.int32)
    )
    parts = host_partition_ids(km, nb_partitions)
    for p in range(nb_partitions):
        m = parts == p
        processor._write_matrix(p, km[m], ct[m], ksize)
