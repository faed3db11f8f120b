"""Device-side partition merge + LRT: sort / segment-reduce / compact.

The host union-merge (pipeline.merge.merge_sorted_streams) materializes a
dense [U, S] matrix and ships it to the device — 4·S bytes per distinct
k-mer of H2D. This kernel moves the merge itself on-device: the S sorted
per-sample streams are shipped ONCE as raw (kmer, sample, count) triples
(14 bytes per record), and everything else happens in HBM:

  lax.sort by (hi, lo)                      — the S-way merge
  run-boundary flags -> segment ids         — distinct k-mer grouping
  segment_sum of control/case counts        — the only statistics the
                                              Poisson LRT needs
  LR threshold + fixed-size compaction      — survivors only (plus the
                                              Bernoulli PCA sample rows)
  D2H: survivor k-mers/sums + [4] counters  — thousands, not billions

Compaction capacities are static (jit); the kernel reports true survivor
counts so the host can detect overflow and retry with a larger budget
(pipeline.merge handles that; thresholds of alpha/cutoff ~ 5e-7 keep
survivor fractions tiny in practice, cli.cpp:197-204).
"""

from __future__ import annotations

import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np

from kmdiff_tpu.ops.codec import lanes_to_words  # noqa: F401  (re-export:
# host lane<->word conversion shared with the counting codec)
from kmdiff_tpu.ops.lrt import MARGIN_ABS, MARGIN_PER_COUNT, _lr_from_sums

_SAMPLE_SEED = np.uint32(0x51ED2700)


def _avalanche(h):
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h



def _compact_indices(mask, size: int, fill: int):
    """Ascending indices of the first `size` True rows of [N] mask, `fill`
    past the count — jnp.nonzero's contract, via a SINGLE-OPERAND i32
    sort: measured 58 ms vs nonzero's 166 ms at 15.7M rows on the bench
    rig (nonzero's variadic lowering cost more than the kernel's whole
    3-operand merge sort). Requires N < 2^30 (every caller's row counts
    are bounded by the 2^24 sort ceiling; enforced because the row
    budgets are env-tunable and index bit 30 is the discard flag)."""
    n = mask.shape[0]
    if n >= 1 << 30:
        raise ValueError(
            f"_compact_indices supports < 2^30 rows, got {n} "
            f"(lower KMDIFF_MAX_DEVICE_ROWS / chunk-rows overrides)"
        )
    i = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(mask, i, i | jnp.int32(0x40000000))
    s = jax.lax.sort(key)
    if size > n:  # budgets never exceed the row count in the kernels,
        # but honor nonzero's full contract (pad slots -> fill)
        s = jnp.concatenate(
            [s, jnp.full(size - n, 0x40000000, jnp.int32)]
        )
    s = s[:size]
    return jnp.where(s < jnp.int32(0x40000000), s, jnp.int32(fill))


def merge_lrt_local(
    lanes, sample, count,
    nb_controls: int,
    ratio_c, ratio_k, lr_min,
    pca_threshold_u32, pca_seed,
    max_hits: int,
    max_geno: int,
    want_geno: bool,
    nb_samples: int = 0,
    want_rows: bool = False,
    wide_sums: bool = False,
    packed_ctrl: bool = False,
    range_rows: int = 0,
    meta_in_blob: bool = False,
):
    """One partition's merged test, fully on device.

    lanes: tuple of [N] u32 k-mer lanes, most-significant first (2 per
    uint64 word, up to 8 for k <= 128; padding rows = all-0xFFFFFFFF)
    sample: [N] i32; count: [N] i32 (uint32 bit patterns viewed as i32),
    or [N] u16 on the packed_ctrl path when counts fit 15 bits
    (build_triples_packed pack16). Pad-row sample/count values are
    irrelevant: pad rows carry sentinel lanes, sort last, and every
    consumer masks them

    Returns dict with:
      meta [3] i32                        (n_distinct, n_hits, n_geno) —
                                          ONE host read syncs the dispatch
                                          and answers the overflow check
                                          (3 scalar reads cost 3 round
                                          trips on sync-dispatch rigs)
      n_distinct, n_hits, n_geno          scalars (i32; the mesh step
                                          psums these)
      hit_blob [max_hits, R] u32          survivor rows, ONE fetch:
                                          columns = L k-mer lanes then the
                                          group sums (R = L+2 narrow
                                          [sc, sk]; R = L+4 wide
                                          [sc_hi, sc_lo, sk_hi, sk_lo]);
                                          sums are non-negative i32 stored
                                          as u32 bit patterns
      hit_rows [max_hits, S] i32          survivor per-sample count rows
                                          (want_rows; popstrat / save-sk)
      geno_rows [max_geno, S] u8          sampled presence rows (want_geno)

    wide_sums: set when the cohort's total k-mer mass reaches 2^31, where
    a group sum can overflow int32. TPUs have no native int64, so the
    wide path cumsums the 16-bit halves of each count separately — exact
    because a segment holds at most one entry per sample, bounding each
    half-sum by S * 0xFFFF — and the host recombines hi*2^16 + lo into
    int64 (reference equivalent: the uint64 sums of model.hpp:145-146).

    packed_ctrl: the fast narrow path needs only the control/case BIT of
    each row, not the sample id — the host packs it into the count lane
    (i32 sign bit, or u16 bit 15 when counts < 2^15) and `sample` becomes
    a [1] dummy, dropping a whole sort operand. Incompatible with
    want_rows/want_geno (those need sample identity) and wide_sums
    (counts may use bit 31).

    Every output is survivor-sized: nothing O(N) leaves the device (the
    remote-tunnel D2H path runs at ~200 MB/s and would dominate the
    kernel otherwise).
    """
    N = lanes[0].shape[0]
    L = len(lanes)

    def _sort(arrs):
        """All-keys sort; with range_rows set, the operands arrive
        pre-grouped into N/range_rows key-DISJOINT ranges (host quantile
        split, ops.merge_dev.build_triples_* ranged layout, each range
        sentinel-padded to range_rows) and sort as a batch of independent
        [R, range_rows] sub-sorts — fewer comparator passes than one
        N-row sort for the same bytes. Flattening back preserves global
        ascending key order because ranges are ascending and disjoint;
        mid-array sentinel pads are masked exactly like tail pads (they
        contribute zero to segment sums and are excluded from is_start)."""
        if range_rows and N > range_rows:
            R = N // range_rows
            resh = tuple(a.reshape(R, range_rows) for a in arrs)
            s = jax.lax.sort(resh, dimension=1, num_keys=len(arrs))
            return tuple(x.reshape(N) for x in s)
        return jax.lax.sort(arrs, num_keys=len(arrs))

    # every operand is a sort KEY: within a segment (equal lanes) the row
    # order is irrelevant to all downstream uses (segment sums, run-start
    # gathers, the at-most-one-row-per-sample scatter), and XLA's TPU sort
    # schedules payload-carrying sorts catastrophically at some shapes
    # (measured: (u32,u32 keys)+u32 payload = 156 ms per 2M rows vs 28 ms
    # for the identical operands as 3 keys — bench/README.md)
    if packed_ctrl:
        if want_rows or want_geno or wide_sums:
            raise ValueError("packed_ctrl excludes rows/geno/wide paths")
        sorted_all = _sort((*lanes, count))
        lanes_s = sorted_all[:L]
        packed_s = sorted_all[L]
        sample_s = None
        if packed_s.dtype == jnp.uint16:
            # u16 packing (counts < 2^15, the common cbytes<=1 case):
            # ctrl bit 15, count below — 2 bytes less sort traffic per row
            # than the i32 sign-bit packing (1.34x kernel, measured)
            count_s = (packed_s & jnp.uint16(0x7FFF)).astype(jnp.int32)
        else:
            count_s = packed_s & jnp.int32(0x7FFFFFFF)
    else:
        sorted_all = _sort((*lanes, sample, count))
        lanes_s = sorted_all[:L]
        sample_s, count_s = sorted_all[L], sorted_all[L + 1]

    first = jnp.ones((1,), dtype=bool)
    change = lanes_s[0][1:] != lanes_s[0][:-1]
    for l in lanes_s[1:]:
        change = change | (l[1:] != l[:-1])
    is_start = jnp.concatenate([first, change])
    # padding (sentinel kmer) contributes exactly one run at the end when
    # present; mask it out via the sentinel value
    is_pad = lanes_s[0] == jnp.uint32(0xFFFFFFFF)
    for l in lanes_s[1:]:
        is_pad = is_pad & (l == jnp.uint32(0xFFFFFFFF))
    is_start = is_start & ~is_pad
    valid = ~is_pad

    n_distinct = jnp.sum(is_start, dtype=jnp.int32)

    # Segments are contiguous runs of the SORTED stream, so every
    # per-segment reduction is a cumsum difference at run boundaries —
    # scans + gathers only, no scatters (TPU scatters serialize).
    idx = jnp.arange(N, dtype=jnp.int32)
    if packed_ctrl:
        is_ctrl = (
            (packed_s & jnp.uint16(0x8000)) != 0
            if packed_s.dtype == jnp.uint16
            else packed_s < 0
        )
    else:
        is_ctrl = sample_s < nb_controls

    def seg_sum_cols(cols):
        """Per-segment sums of pre-masked columns, valid at run START rows
        (where the segment's first row is the row itself, so cs[start-1]
        = cs[start] - vals[start] needs no extra scan or gather). All
        groups stack into ONE [N, C] cumsum, and the run-end prefix
        propagates back to every row by a reverse cummin over end-masked
        cs — cs is column-monotone (non-negative vals, total < 2^31 on
        every path that reaches here), so the nearest end's value is the
        column minimum to the right and NO gather is needed.
        Start-anchoring + column fusion + gather elimination measured
        ~2.4x combined over the per-row seg_start/seg_end per-group
        formulation (bench/README.md)."""
        is_end = jnp.concatenate([is_start[1:], jnp.ones(1, bool)])
        vals = jnp.stack(cols, axis=1)
        cs = jnp.cumsum(vals, axis=0)
        big = jnp.int32(2**31 - 1)
        end_cs = jnp.where(is_end[:, None], cs, big)
        seg = jax.lax.cummin(end_cs, axis=0, reverse=True) - cs + vals
        return tuple(seg[:, j] for j in range(len(cols)))

    def seg_sum_cols_wrapping(cols):
        """Wide-path variant: the 16-bit-half prefix sums may WRAP int32
        over the whole array (total mass >= 2^31 is why the wide path
        exists). Wrapped differences of prefix sums are still exact (the
        per-segment sum fits i32), but wrapping breaks the monotonicity
        the cummin trick needs — so this path keeps the run-end gather."""
        nxt = jnp.where(is_start, idx, N)
        nxt_shift = jnp.concatenate([nxt[1:], jnp.full((1,), N, jnp.int32)])
        se = jnp.clip(jax.lax.cummin(nxt_shift, reverse=True) - 1, 0, N - 1)
        vals = jnp.stack(cols, axis=1)
        cs = jnp.cumsum(vals, axis=0)
        seg = cs[se] - cs + vals
        return tuple(seg[:, j] for j in range(len(cols)))

    if wide_sums:
        cu = count_s.astype(jnp.uint32)
        c_hi = (cu >> 16).astype(jnp.int32)
        c_lo = (cu & jnp.uint32(0xFFFF)).astype(jnp.int32)
        s_c_hi, s_c_lo, s_k_hi, s_k_lo = seg_sum_cols_wrapping((
            jnp.where(is_ctrl & valid, c_hi, 0),
            jnp.where(is_ctrl & valid, c_lo, 0),
            jnp.where(~is_ctrl & valid, c_hi, 0),
            jnp.where(~is_ctrl & valid, c_lo, 0),
        ))
        # f32 recombination only feeds the margin-backed LR filter; the
        # exact int64 sums are recombined on host from the split halves
        f_c = s_c_hi.astype(jnp.float32) * 65536.0 + s_c_lo.astype(jnp.float32)
        f_k = s_k_hi.astype(jnp.float32) * 65536.0 + s_k_lo.astype(jnp.float32)
    else:
        s_c, s_k = seg_sum_cols((
            jnp.where(is_ctrl & valid, count_s, 0),
            jnp.where(~is_ctrl & valid, count_s, 0),
        ))
        f_c, f_k = s_c, s_k

    tot = f_c.astype(jnp.float32) + f_k.astype(jnp.float32)
    lr = _lr_from_sums(f_c, f_k, ratio_c, ratio_k)
    keep = is_start & (lr + MARGIN_PER_COUNT * tot + MARGIN_ABS >= lr_min)
    n_hits = jnp.sum(keep, dtype=jnp.int32)
    hit_start = _compact_indices(keep, max_hits, N - 1)
    # lanes + sums stack into one [max_hits, R] u32 blob: a single fetch
    # (and a single device-side slice) moves every survivor column off the
    # device — per-column fetches each paid a slice + astype + transfer
    # round trip on sync-dispatch rigs
    blob_cols = [l[hit_start] for l in lanes_s]
    if wide_sums:
        blob_cols += [
            s_c_hi[hit_start].astype(jnp.uint32),
            s_c_lo[hit_start].astype(jnp.uint32),
            s_k_hi[hit_start].astype(jnp.uint32),
            s_k_lo[hit_start].astype(jnp.uint32),
        ]
    else:
        blob_cols += [
            s_c[hit_start].astype(jnp.uint32),
            s_k[hit_start].astype(jnp.uint32),
        ]
    out = {
        "n_distinct": n_distinct,
        "n_hits": n_hits,
        "hit_blob": jnp.stack(blob_cols, axis=1),
        "n_geno": jnp.int32(0),
    }

    # per-row run-start map, needed only by the dense-row windows below
    # (the hot packed path never pays this scan)
    seg_start = (
        jax.lax.cummax(jnp.where(is_start, idx, -1))
        if (want_rows or want_geno)
        else None
    )

    def dense_rows(start_rows, n_slots):
        """Per-sample count rows for segments beginning at start_rows.
        A segment holds at most one entry per sample, so an S-wide window
        from the start covers it; rows from neighbouring segments and
        padding are masked, then scattered into [n_slots, S]."""
        win = jnp.clip(
            start_rows[:, None] + jnp.arange(nb_samples)[None, :], 0, N - 1
        )
        # seg_start maps every row to its run's start row
        ok = (seg_start[win] == start_rows[:, None]) & ~is_pad[win]
        samp = jnp.where(ok, sample_s[win], nb_samples)
        rows = jnp.zeros((n_slots, nb_samples + 1), jnp.int32)
        slot = jnp.broadcast_to(
            jnp.arange(n_slots)[:, None], (n_slots, nb_samples)
        )
        rows = rows.at[slot, samp].set(jnp.where(ok, count_s[win], 0))
        return rows[:, :nb_samples]

    if want_rows:
        out["hit_rows"] = dense_rows(hit_start, max_hits)

    if want_geno:
        # deterministic Bernoulli(kmer_pca) sample keyed on the k-mer value
        # (matches pipeline.popstrat.sample_mask's per-lane chain)
        h = _SAMPLE_SEED ^ pca_seed
        for l in lanes_s:
            h = _avalanche(l ^ h)
        sampled = is_start & (h < pca_threshold_u32)
        out["n_geno"] = jnp.sum(sampled, dtype=jnp.int32)
        geno_start = _compact_indices(sampled, max_geno, N - 1)
        out["geno_rows"] = (dense_rows(geno_start, max_geno) > 0).astype(
            jnp.uint8
        )
    out["meta"] = jnp.stack([n_distinct, n_hits, out["n_geno"]])
    if meta_in_blob:
        # meta rides ROW 0 of the hit blob, so small-budget dispatches
        # answer sync + overflow check + survivor fetch in ONE host read
        # (meta-read + prefix-fetch cost two round trips each on
        # sync-dispatch rigs; pipeline.merge fetches the whole
        # [1+max_hits, R] blob when max_hits is small enough for the pad
        # transfer to be cheaper than a round trip)
        R = len(blob_cols)
        meta_row = jnp.concatenate(
            [out["meta"].astype(jnp.uint32), jnp.zeros(R - 3, jnp.uint32)]
        ).reshape(1, R)
        out["hit_blob"] = jnp.concatenate([meta_row, out["hit_blob"]])
    return out


#: the single-device jitted entry; parallel.merge_step shard_maps the same
#: merge_lrt_local body over the mesh (one key range per device)
merge_lrt_kernel = functools.partial(
    jax.jit,
    static_argnames=(
        "nb_controls", "nb_samples", "max_hits", "max_geno", "want_geno",
        "want_rows", "wide_sums", "packed_ctrl", "range_rows",
        "meta_in_blob",
    ),
)(merge_lrt_local)


def pca_threshold_u32(rate: float) -> np.uint32:
    return np.uint32(min(rate, 1.0) * 4294967295.0)


class _Staging(threading.local):
    """Per-thread reusable host staging buffers for the triple builders.

    Freshly mmap'd pages make the tunnel H2D ~4x slower than stable pages
    (measured: 2.0 s vs 0.6 s per 2M-row chunk), and glibc returns large
    frees to the OS so per-chunk allocation refaults every time. Reuse is
    safe: within a thread, the next chunk is built only after the previous
    chunk's results were READ on host, which transitively completes its
    H2D."""

    def get(self, name, size, dtype):
        bufs = getattr(self, "bufs", None)
        if bufs is None:
            bufs = self.bufs = {}
        key = (name, int(size), np.dtype(dtype).str)
        arr = bufs.get(key)
        if arr is None:
            arr = np.empty(size, dtype)
            bufs[key] = arr
        return arr


_staging = _Staging()


def _staged_lanes(n_lanes: int, pad_to: int, slot: int = 0):
    lanes = []
    for i in range(n_lanes):
        a = _staging.get(f"lane{i}@{slot}", pad_to, np.uint32)
        a.fill(0xFFFFFFFF)
        lanes.append(a)
    return lanes


def pack16_ok(counts_list: list[np.ndarray]) -> bool:
    """True when every count fits the u16 packing (value < 2^15)."""
    return all(
        int(c.max(initial=0)) < (1 << 15) for c in counts_list
    )


def build_triples_packed(
    kmers_list: list[np.ndarray],
    counts_list: list[np.ndarray],
    pad_to: int,
    nb_controls: int,
    pack16: bool = False,
    slot: int = 0,
):
    """build_triples for the packed_ctrl fast path: the control/case bit
    rides count's sign bit (i32) or bit 15 (u16 when pack16 — counts must
    be < 2^15, see pack16_ok; 2 bytes less sort traffic per row), no
    sample array is built or shipped.

    Returns (lanes tuple, count_packed [pad_to], N). Arrays are
    thread-local staging buffers — consume (ship to device and read the
    results) before building the next chunk on the same thread WITH THE
    SAME SLOT. A double-buffered producer alternates slot 0/1: slot c%2
    is only rewritten after chunk c's results were read on host, which
    transitively completes its H2D (pipeline.merge chunk prefetch)."""
    sizes = [len(k) for k in kmers_list]
    N = int(np.sum(sizes))
    nw = kmers_list[0].shape[1] if kmers_list else 1
    lanes = _staged_lanes(2 * nw, pad_to, slot)
    if pack16:
        count = _staging.get(f"count16@{slot}", pad_to, np.uint16)
    else:
        count = _staging.get(f"count@{slot}", pad_to, np.int32)
    # pad-row counts are masked everywhere, but zero them so the shipped
    # bytes (and the device sort's tie order among pad rows) are
    # deterministic rather than stale staging memory
    count[N:] = 0
    pos = 0
    for s, (k, c) in enumerate(zip(kmers_list, counts_list)):
        pos += _pack_rows(
            lanes, count, pos, k, c, 0, len(k), s, nb_controls, pack16, nw
        )
    return tuple(lanes), count, N


def _split_lanes(lanes, pos: int, k: np.ndarray, a: int, b: int, nw: int):
    """Split k[a:b]'s u64 words into hi/lo u32 lanes at lanes[*][pos:]."""
    n = b - a
    for w in range(nw):
        v = k[a:b, w]
        lanes[2 * w][pos : pos + n] = (v >> np.uint64(32)).astype(np.uint32)
        lanes[2 * w + 1][pos : pos + n] = (
            v & np.uint64(0xFFFFFFFF)
        ).astype(np.uint32)


def _pack_rows(lanes, count, pos: int, k, c, a: int, b: int, s: int,
               nb_controls: int, pack16: bool, nw: int) -> int:
    """Pack sample s's rows [a, b) at `pos`: hi/lo key lanes + the count
    lane with the control flag in the sign/0x8000 bit. The single source
    of the packed-count convention (both triple builders call this)."""
    n = b - a
    if n == 0:
        return 0
    _split_lanes(lanes, pos, k, a, b, nw)
    cs = c[a:b]
    if pack16:
        cu = cs.astype(np.uint16)
        if s < nb_controls:
            cu |= np.uint16(0x8000)
        count[pos : pos + n] = cu
    else:
        ci = cs.view(np.int32) if cs.dtype == np.uint32 else cs.astype(np.int32)
        if s < nb_controls:
            count[pos : pos + n] = ci | np.int32(-0x80000000)
        else:
            count[pos : pos + n] = ci
    return n


def quantile_key_split(kmers_list, n_ranges: int, budget_fn, *,
                       grow: bool, attempts: int, best_effort: bool = False):
    """Split per-sample SORTED streams into key-disjoint ranges at
    first-word quantile boundaries (free on sorted streams — the same
    trick as the chunk and mesh splits).

    budget_fn(R) gives the per-range row budget at R ranges; quantiles
    are approximate (first-word ties cap the resolution), so sizes are
    validated and R doubles (grow=True: chunking wants more, smaller
    chunks) or halves (grow=False: a ranged layout has fixed total rows)
    on overshoot, up to `attempts` tries.

    Returns (bounds u64 [R_eff-1], slices: per range a list of per-sample
    (a, b) index pairs, R: the accepted attempt's requested range count —
    budget_fn's argument). On failure returns None — unless best_effort,
    which returns the LAST attempt's (possibly over-budget) split: the
    chunking caller prefers oversized chunks (the kernel's overflow retry
    absorbs them) over refusing to run when ties defeat the quantiles."""
    keys = np.concatenate([k[:, 0] for k in kmers_list if len(k)])
    if keys.size == 0:
        return None
    R = n_ranges
    last = None
    for _attempt in range(attempts):
        if R < 2:
            return None
        budget = budget_fn(R)
        qs = np.quantile(keys, np.linspace(0, 1, R + 1)[1:-1])
        bounds = np.unique(qs.astype(np.uint64))
        slices = []
        ok = True
        for r in range(len(bounds) + 1):
            lo_b = bounds[r - 1] if r > 0 else None
            hi_b = bounds[r] if r < len(bounds) else None
            per = []
            n = 0
            for km in kmers_list:
                a = np.searchsorted(km[:, 0], lo_b) if lo_b is not None else 0
                b = (np.searchsorted(km[:, 0], hi_b)
                     if hi_b is not None else len(km))
                per.append((a, b))
                n += b - a
            if n > budget:
                ok = False
            slices.append(per)
        if ok:
            return bounds, slices, R
        last = (bounds, slices, R)
        R = R * 2 if grow else R // 2
    return last if best_effort else None


def build_triples_packed_ranged(
    kmers_list: list[np.ndarray],
    counts_list: list[np.ndarray],
    pad_to: int,
    nb_controls: int,
    pack16: bool = False,
    slot: int = 0,
    target_range: int = 1 << 17,
):
    """build_triples_packed laid out as R key-disjoint quantile ranges of
    M = pad_to/R rows each (range r at [r*M, (r+1)*M), sentinel-padded),
    for the kernel's batched [R, M] sub-sorts (merge_lrt_local
    range_rows=M). Key-range splitting is free on sorted streams — the
    same trick as the chunk and mesh splits, one level finer.

    Returns (lanes, count, N, M) with M=0 when a ranged layout is not
    worth it or quantile skew leaves some range over its row budget
    (caller falls back to the flat build)."""
    sizes = [len(k) for k in kmers_list]
    N = int(np.sum(sizes))
    if N == 0 or pad_to < 2 * target_range:
        return None
    split = quantile_key_split(
        kmers_list, pad_to // target_range, lambda R: pad_to // R,
        grow=False, attempts=3,
    )
    if split is None:
        return None
    _bounds, slices, R = split
    M = pad_to // R

    nw = kmers_list[0].shape[1] if kmers_list else 1
    lanes = _staged_lanes(2 * nw, pad_to, slot)
    if pack16:
        count = _staging.get(f"count16@{slot}", pad_to, np.uint16)
    else:
        count = _staging.get(f"count@{slot}", pad_to, np.int32)
    count.fill(0)
    for r, per in enumerate(slices):
        pos = r * M
        for s, ((a, b), k, c) in enumerate(zip(per, kmers_list, counts_list)):
            pos += _pack_rows(
                lanes, count, pos, k, c, a, b, s, nb_controls, pack16, nw
            )
    return tuple(lanes), count, N, M


def build_triples(
    kmers_list: list[np.ndarray], counts_list: list[np.ndarray], pad_to: int,
    slot: int = 0,
):
    """Host: per-sample sorted streams -> padded lane/sample/count arrays.

    Returns (lanes tuple of 2*nw u32 arrays [pad_to], sample i32, count
    i32, N). Lane order is (w0_hi, w0_lo, w1_hi, w1_lo, ...): the most
    significant lane first, so lexicographic lane sort == word order.
    Arrays are thread-local staging buffers (see _Staging; slot semantics
    as in build_triples_packed).
    """
    sizes = [len(k) for k in kmers_list]
    N = int(np.sum(sizes))
    nw = kmers_list[0].shape[1] if kmers_list else 1
    lanes = _staged_lanes(2 * nw, pad_to, slot)
    sample = _staging.get(f"sample@{slot}", pad_to, np.int32)
    sample[N:] = 0
    count = _staging.get(f"count@{slot}", pad_to, np.int32)
    count[N:] = 0
    pos = 0
    for s, (k, c) in enumerate(zip(kmers_list, counts_list)):
        n = len(k)
        for w in range(nw):
            v = k[:, w]
            lanes[2 * w][pos : pos + n] = (v >> np.uint64(32)).astype(np.uint32)
            lanes[2 * w + 1][pos : pos + n] = (
                v & np.uint64(0xFFFFFFFF)
            ).astype(np.uint32)
        sample[pos : pos + n] = s
        count[pos : pos + n] = c.view(np.int32) if c.dtype == np.uint32 else c
        pos += n
    return tuple(lanes), sample, count, N




