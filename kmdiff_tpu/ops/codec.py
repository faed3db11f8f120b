"""Device (JAX) k-mer extraction kernels: the counting engine's compute path.

Replaces the reference's kmtricks counting internals (FASTA parse ->
super-k-mers -> minimizer repartition -> per-partition count; reference:
SURVEY.md §2.2, invoked at src/cmd.cpp:34-44) with a TPU-shaped dataflow:

  host: ascii reads -> 2-bit codes (+invalid marks), reads joined with one
        invalid separator byte so no window spans two reads
  device (this module, all fixed-shape jit):
        codes[BLOCK] -> rolling 2k-bit k-mer values in u32 lanes
                     -> reverse-complement + canonical select (bit ops)
                     -> partition id via an avalanche hash
        sorted count: lax.sort over (hi, lo) u32 key pairs + run-length
        boundary flags
  host: mask-compact survivors, run-length encode, spill per-partition
        sorted count files

Design notes (TPU-first):
  * k-mers live as TWO u32 lanes (hi, lo) for k <= 32 — native TPU int
    width; value hi*2^32+lo equals the host codec's packed u64
    (kmdiff_tpu.core.kmer), so numeric order == lexicographic order and
    host interop is a shift-or.
  * windows are computed as k shifted vector adds (VPU) rather than a
    sequential rolling scan — O(k·N) elementwise work, fully parallel,
    fused by XLA into a few passes over the block.
  * partitioning uses a murmur3-style avalanche of the canonical value
    modulo P instead of kmtricks' minimizer repartition: same contract
    (deterministic k-mer -> partition across samples), better balance, no
    repartition pre-pass. Minimizer locality only matters for super-k-mer
    compression, which the dense-array pipeline does not need.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: sentinel code for invalid bases / read separators (valid codes are 0..3)
INVALID = np.uint8(0xFF)


def n_lanes(k: int) -> int:
    """u32 lanes per k-mer: two per uint64 word (word count = ceil(k/32))."""
    return 2 * ((k + 31) // 32)


def encode_ascii_block(seq_bytes: np.ndarray) -> np.ndarray:
    """Host helper: ascii -> codes with INVALID for non-ACGT."""
    from kmdiff_tpu.core.kmer import encode_bases

    codes, valid = encode_bases(seq_bytes)
    return np.where(valid, codes, INVALID)


def _lane_shift(k: int, i: int) -> tuple[int, int]:
    """(lane, in-lane bit shift) of base index i in the host word layout
    (core.kmer.pack_codes: word w holds bases [32w, min(k, 32w+32)), first
    base of the word highest, last word right-aligned). Word w maps to
    lanes 2w (bits 32..63) and 2w+1 (bits 0..31), so a lexicographic lane
    sort equals the host word ordering."""
    w = i // 32
    hi_b = min(k, 32 * (w + 1))
    shift = 2 * (hi_b - 1 - i)
    if shift >= 32:
        return 2 * w, shift - 32
    return 2 * w + 1, shift


@functools.partial(jax.jit, static_argnames=("k", "mask_invalid"))
def extract_canonical_lanes(codes: jax.Array, k: int,
                            mask_invalid: bool = False):
    """All k-windows of a code block as canonical u32 lane tuples — the one
    extraction kernel for every supported k (reference equivalent: the
    KMER_LIST template instantiations Kmer<32/64/96/128>,
    /root/reference/CMakeLists.txt:72-74, src/main.cc:29-50; here the lane
    count is a trace-time shape parameter instead of a compile-time
    template).

    codes: [N] uint8 with INVALID marking non-ACGT bases and read breaks.
    Returns (lanes tuple of n_lanes(k) [W] u32 arrays, ok [W] bool) with
    W = N - k + 1; a window is ok iff it contains no INVALID byte.
    mask_invalid=True additionally writes the all-ones sentinel into bad
    windows' lanes inside this same dispatch (saves L elementwise
    dispatches per block on sync-dispatch rigs).

    The k-mer value is built as k shifted vector ORs (VPU-parallel, XLA
    fuses the ladder into a few passes); canonical = lexicographic min of
    forward and reverse-complement over the lane tuple.
    """
    if not (1 <= k <= 128):
        raise ValueError("extract_canonical_lanes supports 1 <= k <= 128")
    N = codes.shape[0]
    W = N - k + 1
    L = n_lanes(k)
    bad = (codes == INVALID).astype(jnp.int32)
    cum = jnp.cumsum(bad)
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32), cum])
    ok = (cum[k:] - cum[:-k]) == 0

    base = jnp.where(codes == INVALID, 0, codes.astype(jnp.uint32))

    fwd = [jnp.zeros(W, jnp.uint32) for _ in range(L)]
    rc = [jnp.zeros(W, jnp.uint32) for _ in range(L)]
    for j in range(k):
        cj = jax.lax.slice(base, (j,), (j + W,))
        lane, sh = _lane_shift(k, j)
        fwd[lane] = fwd[lane] | (cj << sh)
        # reverse complement: complement of base j lands at index k-1-j
        rj = cj ^ 2
        lane, sh = _lane_shift(k, k - 1 - j)
        rc[lane] = rc[lane] | (rj << sh)

    # lexicographic min(fwd, rc) over the lanes
    take_rc = jnp.zeros(W, bool)
    undecided = jnp.ones(W, bool)
    for l in range(L):
        lt = rc[l] < fwd[l]
        gt = rc[l] > fwd[l]
        take_rc = take_rc | (undecided & lt)
        undecided = undecided & ~(lt | gt)
    out = tuple(jnp.where(take_rc, rc[l], fwd[l]) for l in range(L))
    if mask_invalid:
        sent = jnp.uint32(0xFFFFFFFF)
        out = tuple(jnp.where(ok, l, sent) for l in out)
    return out, ok


def extract_canonical_kmers(codes: jax.Array, k: int):
    """k <= 32 convenience wrapper over extract_canonical_lanes.

    Returns (hi [W] u32, lo [W] u32, ok [W] bool).
    """
    if k > 32:
        raise ValueError("extract_canonical_kmers covers k <= 32; use "
                         "extract_canonical_lanes")
    (hi, lo), ok = extract_canonical_lanes(codes, k)
    return hi, lo, ok


def lanes_to_words(lanes: tuple[np.ndarray, ...]) -> np.ndarray:
    """Host: u32 lane tuple -> [n, nw] u64 words (core.kmer layout)."""
    nw = len(lanes) // 2
    words = [
        (np.asarray(lanes[2 * w]).astype(np.uint64) << np.uint64(32))
        | np.asarray(lanes[2 * w + 1]).astype(np.uint64)
        for w in range(nw)
    ]
    return np.stack(words, axis=1)


def words_to_lanes(kmers: np.ndarray) -> tuple[np.ndarray, ...]:
    """Host: [n, nw] u64 words -> u32 lane tuple (inverse of
    lanes_to_words)."""
    lanes = []
    for w in range(kmers.shape[1]):
        col = kmers[:, w]
        lanes.append((col >> np.uint64(32)).astype(np.uint32))
        lanes.append((col & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    return tuple(lanes)


def _avalanche(h: jax.Array) -> jax.Array:
    """murmur3 fmix32 finalizer — full-avalanche u32 mixer."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def partition_ids_lanes(lanes, nb_partitions: int) -> jax.Array:
    """Deterministic k-mer -> partition mapping over a u32 lane tuple
    (replaces kmtricks minimizer repartition; same cross-sample-consistency
    contract). Chains the avalanche over lanes most-significant first —
    identical to the host chain (pipeline.count.host_partition_ids) for any
    word count."""
    h = jnp.uint32(0x9E3779B9)
    for l in lanes:
        h = _avalanche(l ^ h)
    return (h % jnp.uint32(nb_partitions)).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("nb_partitions",))
def partition_ids(hi: jax.Array, lo: jax.Array, nb_partitions: int) -> jax.Array:
    """Two-lane (k <= 32) wrapper over partition_ids_lanes."""
    return partition_ids_lanes((hi, lo), nb_partitions)


def _lane_sentinel_mask(lanes):
    m = lanes[0] == jnp.uint32(0xFFFFFFFF)
    for l in lanes[1:]:
        m = m & (l == jnp.uint32(0xFFFFFFFF))
    return m


@functools.partial(jax.jit, static_argnames=("max_distinct", "with_hist"))
def count_sort_rle_lanes(lanes, max_distinct: int, with_hist: bool = False):
    """Fused per-sample counting for any k: sort + run-length encode on
    device (the TPU replacement for kmtricks' per-partition count loop,
    SURVEY.md §2.2 row 1).

    lanes: tuple of [N] u32 canonical lanes with all-0xFFFFFFFF sentinels
    for invalid windows and padding (no canonical k-mer is all-ones: only
    an all-G k-mer with k % 32 == 0 packs to all-ones, and its reverse
    complement all-C is lexicographically smaller, so the canonical form
    is never the sentinel). Sorts by lanes, finds run boundaries, and
    compacts to distinct-sized outputs — the only D2H is O(distinct), not
    O(N) (see the axon D2H cost note in ops.merge_dev).

    The partition id is deliberately NOT part of the device work: sorting
    by k-mer alone cuts a full u32 lane out of the sort traffic (a third
    of it at k <= 32), and the host recomputes partition ids from the
    fetched k-mers and stable-sorts by them — which preserves the
    per-partition k-mer order (pipeline.count._fetch_counted).

    Returns (stats i32, lane_blob [max_distinct, L] u32,
    counts [max_distinct] u32); host slices by n_distinct (retry with a
    larger cap on overflow; max_distinct = N removes the retry entirely —
    the cap only sizes the output blob, never the sort). stats rides the
    same dispatch AS ONE ARRAY — [3] = (n_distinct, max_count, n_valid),
    or [3 + 257] with with_hist (see sort_rle_core) — so overflow check +
    narrow-fetch dtype choice + histogram cost a single host read, and
    the lanes leave in a single blob fetch (per-array reads each pay a
    dispatch round trip on sync-dispatch rigs —
    pipeline.count._fetch_stream).
    """
    return sort_rle_core(lanes, max_distinct, with_hist=with_hist)


@functools.partial(
    jax.jit, static_argnames=("max_distinct", "hard_min", "with_hist")
)
def dedup_sum_lanes(lanes, weights, max_distinct: int, hard_min: int = 1,
                    with_hist: bool = False):
    """Device k-way merge of already-counted sorted streams: sum the
    weights of identical lane tuples, optionally drop sums below
    hard_min, and compact (sentinel tails keep the blob globally sorted).
    The fused count->diff pipeline combines a sample's per-chunk partial
    counts with this instead of the host's native merge_counted_streams
    (pipeline.fused)."""
    return sort_rle_core(lanes, max_distinct, weights=weights,
                         hard_min=hard_min, with_hist=with_hist)


@functools.partial(
    jax.jit, static_argnames=("k", "max_distinct", "with_hist")
)
def fused_count_kernel(codes, k: int, max_distinct: int,
                       with_hist: bool = False):
    """Whole-sample counting in ONE dispatch: extraction -> canonical ->
    sort -> run-length encode (the single-device twin of
    parallel.count_step.make_sharded_count_kernel). Minimizes dispatch
    count on sync-dispatch rigs and lets XLA fuse the extraction ladder
    straight into the sort's operand."""
    lanes, _ok = extract_canonical_lanes(codes, k, mask_invalid=True)
    return count_sort_rle_lanes(lanes, max_distinct, with_hist=with_hist)


@functools.partial(
    jax.jit, static_argnames=("k", "n", "max_distinct", "with_hist")
)
def fused_count_at(buf, off, k: int, n: int, max_distinct: int,
                   with_hist: bool = False):
    """fused_count_kernel over an [n]-code slice of a larger uploaded
    buffer at traced offset `off`: several samples' chunks concatenate
    into ONE host->device transfer (amortizing the tunnel's ~125 ms
    fixed per-transfer cost) and each member dispatches this kernel at
    its offset — one compile per (buffer, chunk) shape pair, any number
    of offsets (pipeline.fused.count_samples_resident_batched)."""
    codes = jax.lax.dynamic_slice(buf, (off,), (n,))
    lanes, _ok = extract_canonical_lanes(codes, k, mask_invalid=True)
    return count_sort_rle_lanes(lanes, max_distinct, with_hist=with_hist)


def pack_codes_host(codes: np.ndarray) -> np.ndarray:
    """Host: u8 code array (INVALID marks) -> one u32 buffer of
    [ceil(N/16) words of 2-bit codes | ceil(N/32) words of validity bits]
    — 2.25 bits/base instead of 8, one upload. The tunnel H2D path runs
    at ~52 MB/s with a ~125 ms fixed cost per transfer (bench/
    h2d_probe.py), so shrinking the counting upload 3.6x takes ~75 ms
    off every sample."""
    N = len(codes)
    valid = codes != INVALID
    c2 = np.where(valid, codes, 0).astype(np.uint32)
    n16 = -(-N // 16)
    pad16 = n16 * 16 - N
    if pad16:
        c2 = np.concatenate([c2, np.zeros(pad16, np.uint32)])
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, :]
    words_c = (c2.reshape(n16, 16) << shifts).astype(np.uint32)
    words_c = np.bitwise_or.reduce(words_c, axis=1)
    n32 = -(-N // 32)
    pad32 = n32 * 32 - N
    vb = valid.astype(np.uint32)
    if pad32:
        vb = np.concatenate([vb, np.zeros(pad32, np.uint32)])
    words_v = vb.reshape(n32, 32) << np.arange(32, dtype=np.uint32)[None, :]
    words_v = np.bitwise_or.reduce(words_v, axis=1)
    return np.concatenate([words_c, words_v])


def unpack_codes(buf, n: int):
    """Device inverse of pack_codes_host: [n] u8 codes with INVALID where
    the validity bit is clear. Pure shifts + a transposed reshape — no
    gather."""
    n16 = -(-n // 16)
    n32 = -(-n // 32)
    wc = buf[:n16]
    wv = buf[n16 : n16 + n32]
    sh = 2 * jnp.arange(16, dtype=jnp.uint32)
    codes = ((wc[:, None] >> sh[None, :]) & jnp.uint32(3)).astype(jnp.uint8)
    codes = codes.reshape(n16 * 16)[:n]
    shv = jnp.arange(32, dtype=jnp.uint32)
    valid = ((wv[:, None] >> shv[None, :]) & jnp.uint32(1)).astype(bool)
    valid = valid.reshape(n32 * 32)[:n]
    return jnp.where(valid, codes, jnp.uint8(INVALID))


@functools.partial(
    jax.jit, static_argnames=("k", "n", "max_distinct", "with_hist")
)
def fused_count_packed(buf, k: int, n: int, max_distinct: int,
                       with_hist: bool = False):
    """fused_count_kernel over a pack_codes_host buffer: unpack + extract
    + sort + RLE in the same single dispatch.

    The optimization barrier after the unpack is load-bearing: without
    it XLA fuses the unpack into each of the extraction ladder's k
    shifted consumers and RECOMPUTES it per slice — measured 1853 ms vs
    259 ms for the identical 10.5M-code chunk (bench/pack_ab.py). The
    barrier forces one materialized [n] u8 codes array."""
    codes = jax.lax.optimization_barrier(unpack_codes(buf, n))
    lanes, _ok = extract_canonical_lanes(codes, k, mask_invalid=True)
    return count_sort_rle_lanes(lanes, max_distinct, with_hist=with_hist)


def sort_rle_core(lanes, max_distinct: int, weights=None, hard_min: int = 1,
                  with_hist: bool = False):
    """Sort by lanes, run-length encode, compact — the shared body of the
    single-device kernel and the sharded per-device count
    (parallel.count_step). All-0xFFFFFFFF lane tuples mark padding rows
    (they sort last, being the lexicographic maximum).

    weights: optional [N] u32 per-row counts to SUM per run instead of
    run-length counting — the k-way "dedup" merge of already-counted
    streams (partial per-chunk counts of the same k-mer combine exactly;
    u32 prefix sums may wrap but wrapped differences of a < 2^32 segment
    sum are exact). hard_min > 1 drops runs whose summed count falls
    below it IN the compaction sort (dropped runs get sentinel lanes and
    sink past n_distinct) — the fused pipeline's on-device counterpart of
    run_count's host hard-min filter.

    Compaction is a SECOND all-keys sort that carries the lane values and
    run lengths into position (run starts keep their ascending row index
    as the leading key; every other row shares key N and sinks): 2x the
    nonzero + fancy-gather formulation at 8M rows on TPU, where gathers
    are the dominant cost (bench/README.md). Slots past n_distinct carry
    zero counts (_fetch_counts_narrow's dtype ladder relies on that) and
    all-sentinel lanes, so the output lane blob is globally sorted — the
    fused merge searchsorts chunk bounds over the full column."""
    N = lanes[0].shape[0]
    L = len(lanes)
    if weights is None:
        lanes_s = jax.lax.sort(lanes, num_keys=L)
        w_s = None
    else:
        # weights ride the sort as an extra KEY (within a run the order is
        # irrelevant — only the run sum is read; payload-carrying sorts
        # hit pathological TPU schedules, ops.merge_dev)
        r0 = jax.lax.sort((*lanes, weights.astype(jnp.uint32)),
                          num_keys=L + 1)
        lanes_s, w_s = r0[:L], r0[L]
    valid = ~_lane_sentinel_mask(lanes_s)
    n_valid = jnp.sum(valid, dtype=jnp.int32)

    first = jnp.ones(1, dtype=bool)
    change = lanes_s[0][1:] != lanes_s[0][:-1]
    for l in lanes_s[1:]:
        change = change | (l[1:] != l[:-1])
    is_start = jnp.concatenate([first, change]) & valid

    idx = jnp.arange(N, dtype=jnp.int32)
    nxt = jnp.where(is_start, idx, N)
    nxt_shift = jnp.concatenate([nxt[1:], jnp.full(1, N, jnp.int32)])
    if weights is None:
        # next run start after each row (clipped to the valid prefix): the
        # run length at a START row is next_start - row
        se = jnp.minimum(jax.lax.cummin(nxt_shift, reverse=True), n_valid)
        counts_row = jnp.where(
            is_start, (se - jnp.minimum(idx, n_valid)).astype(jnp.uint32), 0
        )
    else:
        # weighted runs: per-segment sums as wrapped-u32 prefix-sum
        # differences at run boundaries (cs[last_of_run] - cs[row] + w):
        # exact because each true segment sum fits u32
        se = jnp.clip(
            jax.lax.cummin(nxt_shift, reverse=True) - 1, 0, N - 1
        )
        wv = jnp.where(valid, w_s, jnp.uint32(0))
        cs = jnp.cumsum(wv, dtype=jnp.uint32)
        counts_row = jnp.where(is_start, cs[se] - cs + wv, jnp.uint32(0))
    if hard_min > 1:
        is_start = is_start & (counts_row >= jnp.uint32(hard_min))
        counts_row = jnp.where(is_start, counts_row, jnp.uint32(0))
    n_distinct = jnp.sum(is_start, dtype=jnp.int32)
    # max count + valid-row count in the SAME dispatch, stacked with
    # n_distinct into ONE host-readable stats array: overflow check,
    # narrow count-fetch dtype choice, and exact total-mass accounting
    # (the fused pipeline's histogram totals: n_valid = counted windows
    # for weight-free runs) cost a single read instead of separate scalar
    # round-trips (~25-30 ms each on sync-dispatch rigs)
    max_count = jnp.max(counts_row)
    stats = jnp.stack([n_distinct, max_count.astype(jnp.int32), n_valid])
    if with_hist:
        # abundance histogram (pre any downstream filtering) in the same
        # read: distinct counts clipped to 256 sort as a single cheap u32
        # lane, then per-value cardinalities fall out of 258 binary
        # searches — uvec[0] = pads/dups (junk), uvec[1..255] = unique per
        # abundance, uvec[256] = oversize (> 255). No scatter (TPU
        # scatters serialize) and no O(distinct) counts D2H: the fused
        # pipeline derives the kmtricks .hist files from this
        # (io.kmtricks.hist_from_device).
        clipped = jnp.minimum(counts_row, jnp.uint32(256))
        cs_sorted = jax.lax.sort((clipped,), num_keys=1)[0]
        edges = jnp.arange(258, dtype=jnp.uint32)
        pos = jnp.searchsorted(cs_sorted, edges, side="left").astype(
            jnp.int32
        )
        uvec = pos[1:] - pos[:-1]
        stats = jnp.concatenate([stats, uvec])
    key = jnp.where(is_start, idx, jnp.int32(N))
    # sunk rows (duplicates, filtered runs, pads) carry SENTINEL lanes so
    # the compacted blob stays globally sorted past n_distinct
    sent = jnp.uint32(0xFFFFFFFF)
    lanes_out = tuple(jnp.where(is_start, l, sent) for l in lanes_s)
    r = jax.lax.sort((key, *lanes_out, counts_row), num_keys=L + 2)
    # output shape contract is exactly [max_distinct] rows (the mesh
    # gather addresses per-device slot regions by it); pad when the input
    # is smaller
    pad = max(max_distinct - N, 0)
    def out(x, fill):
        x = x[:max_distinct]
        if pad:
            x = jnp.concatenate([x, jnp.full(pad, fill, x.dtype)])
        return x
    # lanes leave as one [max_distinct, L] blob: a single device-side
    # slice + a single fetch per chunk instead of L of each
    lane_blob = jnp.stack([out(r[1 + i], 0xFFFFFFFF) for i in range(L)],
                          axis=1)
    return (stats, lane_blob, out(r[L + 1], 0))


