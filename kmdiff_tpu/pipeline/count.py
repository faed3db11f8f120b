"""TPU-native k-mer counting: reads -> kmtricks-compatible run directory.

Replaces the `kmtricks pipeline` subprocess (reference: src/cmd.cpp:27-48,
SURVEY.md §2.2 row 1) in-process. Per sample:

  FASTA/FASTQ(.gz) -> 2-bit codes (reads joined by one INVALID separator)
  -> quarter-pow2 sort chunks with k-1 overlap (ONE upload + ONE fused
  extract/sort/RLE dispatch each, kmdiff_tpu.ops.codec) ->
  O(distinct) D2H -> host partition-id recompute + stable regroup ->
  per-sample abundance histogram (pre hard-min, so histogram-derived
  totals reproduce the reference's src/kmtricks_utils.cpp:100-109
  accounting) -> hard-min filter -> sorted per-partition count files
  (counts/partition_P/<id>.kmer.lz4).

The run dir layout matches kmtricks v1.1.1 (what our diff AND the
reference's diff consume): counts/partition_*/, histograms/*.hist,
kmtricks.fof, kmdiff-count.opt.

Every supported k (up to 128, the reference's KMER_LIST ceiling —
CMakeLists.txt:72-74) rides the same fused device path: the k-mer width
only changes the number of u32 lanes the trace carries
(ops.codec.extract_canonical_lanes / count_sort_rle_lanes), so extraction,
sort, and run-length encoding stay a single dispatch with O(distinct) D2H.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import shutil

import numpy as np

from kmdiff_tpu.cmd.options import CountOptions
from kmdiff_tpu.core.kmer import n_words
from kmdiff_tpu.io.kmtricks import (
    Fof,
    count_dtype_for,
    hist_from_counts,
    write_hist,
    write_kmer_file,
)
from kmdiff_tpu.utils.exceptions import InputError
from kmdiff_tpu.utils.logging import logger

#: extraction block length (codes) for the NON-fused helper kernels
#: (_device_kmer_blocks / count_codes_device, kept for tests and
#: cross-checks); the counting pipeline itself chunks whole code streams
#: at SORT_ROWS windows instead (_host_code_chunks).
BLOCK = int(os.environ.get("KMDIFF_COUNT_BLOCK", 1 << 22))

#: per-dispatch window cap for the count sort. Warm sort wall time on the
#: tunnel rig is DISPATCH-latency-bound, not size-bound (8Mi and 16Mi-row
#: 2-lane sorts both run in ~250-340 ms — bench/sort_shape_probe.py), so
#: the cap sits at the largest shape the remote-compile service handles
#: (one-time ~50 s at 2^24; the 2^23 ceiling documented in round 2 was a
#: compile-service artifact that no longer reproduces). A typical 8.4 Mbp
#: sample then counts in ONE upload + ONE fused dispatch with no
#: cross-chunk dedup pass at all; samples past the cap still chunk here
#: and dedup-merge (host k-way merge on the file path, device
#: dedup_sum_lanes on the fused path).
SORT_ROWS = int(os.environ.get("KMDIFF_COUNT_SORT_ROWS", (1 << 24) - 128))

_HASH_SEED = np.uint32(0x9E3779B9)


def _avalanche_np(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> np.uint32(16))
    return h


def host_partition_ids(kmers: np.ndarray, nb_partitions: int) -> np.ndarray:
    """Host mirror of ops.codec.partition_ids generalized to multi-word
    k-mers (identical result for 1-word k-mers)."""
    with np.errstate(over="ignore"):
        h = np.full(len(kmers), _HASH_SEED, dtype=np.uint32)
        for w in range(kmers.shape[1]):
            hi = (kmers[:, w] >> np.uint64(32)).astype(np.uint32)
            lo = (kmers[:, w] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            h = _avalanche_np(hi ^ h)
            h = _avalanche_np(lo ^ h)
    return h % np.uint32(nb_partitions)


def _flat_codes(seqs: list[bytes]) -> np.ndarray:
    """Join reads with a single invalid separator byte: no k-window can
    span two reads."""
    from kmdiff_tpu.ops.codec import encode_ascii_block

    joined = b"\xff".join(bytes(s) for s in seqs)
    return encode_ascii_block(np.frombuffer(joined, dtype=np.uint8))


def _device_kmer_blocks(codes: np.ndarray, k: int):
    """Extract canonical k-mers block-wise; results STAY on device as
    sentinel-masked u32 lane tuples (O(N) D2H is expensive on tunneled
    devices — see ops.merge_dev). Works for any k <= 128."""
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import INVALID, extract_canonical_lanes

    out = []
    stride = BLOCK - (k - 1)
    L = len(codes)
    for s in range(0, max(L - k + 1, 1), stride):
        chunk = codes[s : s + BLOCK]
        if len(chunk) < BLOCK:
            # pad to a power of two (floor 2^14) instead of the full block:
            # small inputs compile/execute small shapes, and the shape set
            # stays bounded (one per power of two) for the jit cache
            pad_to = min(BLOCK, 1 << max(14, (len(chunk) - 1).bit_length()))
            chunk = np.concatenate(
                [chunk, np.full(pad_to - len(chunk), INVALID, dtype=np.uint8)]
            )
        lanes, _ok = extract_canonical_lanes(
            jnp.asarray(chunk), k, mask_invalid=True
        )
        out.append(lanes)
    return out


def _dispatch_count_chunk(chunk: np.ndarray, k: int,
                          with_hist: bool = False):
    """One code chunk -> one fused extract/sort/RLE dispatch.

    KMDIFF_PACKED_CODES=1 opts into shipping 2-bit-packed codes + a
    validity bitmask (3.6x fewer H2D bytes; the kernel unpacks in the
    same dispatch). Measured on the tunnel rig it LOSES to the raw u8
    upload in the real pipeline (warm count phase 12.1 s vs 8.3-9.4 s
    same rig state): per-sample uploads from the thread pool overlap
    device compute anyway, so the smaller transfer buys nothing while
    the unpack+barrier adds a real device pass — and the packed
    program's remote compile once stalled 34 min. Kept opt-in for
    deployments where H2D is the measured bottleneck."""
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import (
        fused_count_kernel,
        fused_count_packed,
        pack_codes_host,
    )

    W = len(chunk) - k + 1
    if os.environ.get("KMDIFF_PACKED_CODES") == "1":
        buf = pack_codes_host(chunk)
        return fused_count_packed(
            jnp.asarray(buf), k, len(chunk), W, with_hist=with_hist
        )
    return fused_count_kernel(
        jnp.asarray(chunk), k, W, with_hist=with_hist
    )


def _q4_ceil(n: int, lo: int = 1 << 14) -> int:
    """Smallest quarter-pow2 ({4,5,6,7} << b) >= max(n, lo): four compiled
    shapes per octave (same ladder as utils.transfer.fetch_prefix)."""
    n = max(int(n), lo)
    b = max(n - 1, 1).bit_length()
    step = 1 << max(b - 3, 0)
    return -(-n // step) * step


def _host_code_chunks(
    all_codes: list[np.ndarray], k: int, sort_rows: int
) -> list[np.ndarray]:
    """Join per-file code arrays with one INVALID separator (no k-window
    spans two files) and slice into sort chunks of <= sort_rows windows
    with k-1 codes of overlap, each padded with INVALID to a quarter-pow2
    bucket (floor 2^14) so the compiled-shape set stays bounded.

    One chunk = ONE host->device upload = ONE fused extract+sort+RLE
    dispatch (ops.codec.fused_count_kernel). Dispatch round trips, not
    device time, bound the counting phase on tunneled rigs
    (bench/sort_shape_probe.py: 8-16Mi-row sorts all run ~250-340 ms
    warm), so the chunk is as coarse as the compile service allows."""
    from kmdiff_tpu.ops.codec import INVALID

    sep = np.full(1, INVALID, dtype=np.uint8)
    parts = []
    for c in all_codes:
        if parts:
            parts.append(sep)
        parts.append(c)
    if not parts:
        return []
    # single-file fast path: np.concatenate of one array still copies the
    # whole code stream (~10 MB for a typical sample)
    codes = parts[0] if len(parts) == 1 else np.concatenate(parts)
    if len(codes) < k:
        return []
    chunks = []
    for s in range(0, len(codes) - k + 1, sort_rows):
        chunk = codes[s : s + sort_rows + k - 1]
        pad_to = _q4_ceil(len(chunk))
        if pad_to > len(chunk):
            chunk = np.concatenate(
                [chunk, np.full(pad_to - len(chunk), INVALID, np.uint8)]
            )
        chunks.append(chunk)
    return chunks


def count_codes_device(codes: np.ndarray, k: int, nb_partitions: int):
    """Canonical k-mers + partition ids, compacted to host (any k <= 128).

    Returns (kmers [n, nw] u64, parts [n] u32) — unsorted, with
    duplicates. Kept for tests/cross-checks; the counting pipeline uses
    the fused count_sample_device path.
    """
    from kmdiff_tpu.ops.codec import lanes_to_words, partition_ids_lanes

    out_k, out_p = [], []
    for lanes in _device_kmer_blocks(codes, k):
        part = partition_ids_lanes(lanes, nb_partitions)
        lanes_h = [np.asarray(l) for l in lanes]
        ok = lanes_h[0] == 0xFFFFFFFF
        for l in lanes_h[1:]:
            ok &= l == 0xFFFFFFFF
        idx = np.nonzero(~ok)[0]
        if len(idx):
            out_k.append(lanes_to_words(tuple(l[idx] for l in lanes_h)))
            out_p.append(np.asarray(part)[idx])
    if not out_k:
        return np.zeros((0, n_words(k)), np.uint64), np.zeros(0, np.uint32)
    return np.concatenate(out_k), np.concatenate(out_p)


def count_sample_device(all_codes: list[np.ndarray], k: int, nb_partitions: int):
    """Fused device counting (any k <= 128): extraction, sort, and
    run-length encoding all on device; only distinct-sized results
    transfer to host.

    Returns (kmers [U, nw] u64 sorted by (part, kmer), parts [U],
    counts [U]).
    """
    # ONE upload + ONE dispatch per sort chunk: the sample's whole code
    # stream (files joined with INVALID separators) slices into
    # <= SORT_ROWS-window chunks, and each chunk's extraction ladder,
    # sort, and RLE fuse into a single program (_dispatch_count_chunk) —
    # per-extraction-block uploads each paid a full round trip on
    # sync-dispatch rigs. max_distinct = the chunk's window count: the
    # cap only sizes the output blob (compaction is a second sort, cost
    # independent of it), while an undersized guess forces a full kernel
    # re-run — genomic dup ratios (~1.3-2x) overflowed the old quarter
    # guess nearly always.
    chunks = _host_code_chunks(all_codes, k, SORT_ROWS)
    if not chunks:
        return (
            np.zeros((0, n_words(k)), np.uint64),
            np.zeros(0, np.uint32),
            np.zeros(0, np.uint32),
        )

    streams = []
    for chunk in chunks:
        stats, lane_blob, counts = _dispatch_count_chunk(chunk, k)
        stats_h = np.asarray(stats)  # one read: (n_distinct, max_count, _)
        U = int(stats_h[0])
        streams.append(_fetch_stream(U, lane_blob, counts, int(stats_h[1])))

    if len(streams) == 1:
        kmers, counts_h = streams[0]
    else:
        kmers, counts_h = _merge_streams(streams)
    return _regroup_by_partition(kmers, counts_h, nb_partitions)


def _fetch_stream(U, lane_blob, counts, max_count=None):
    """D2H discipline for slow uplinks: slice device-side at quarter-pow2
    granularity (bounded compiled-shape set), then fetch chunk-parallel
    (utils.transfer). The lanes arrive as ONE [U, L] blob fetch (per-lane
    fetches each pay a slice + transfer round trip). Returns the
    k-mer-sorted distinct stream (kmers [U, nw] u64, counts [U] u32)."""
    from kmdiff_tpu.ops.codec import lanes_to_words
    from kmdiff_tpu.utils.transfer import fetch_prefix

    blob = fetch_prefix(lane_blob, U)
    L = blob.shape[1]
    kmers = lanes_to_words(
        tuple(np.ascontiguousarray(blob[:, i]) for i in range(L))
    )
    return kmers, _fetch_counts_narrow(counts, U, max_count)


def _merge_streams(streams):
    """Merge k-mer-sorted (kmers, counts) chunk streams, summing counts of
    k-mers that appear in several chunks (native k-way merge; numpy
    sort-reduce fallback). Stream counts beyond the native 64-way cap
    reduce hierarchically (64 chunks = half a billion rows per level, so
    a second level is already colossal input)."""
    try:
        from kmdiff_tpu.native import merge_counted_streams
    except ImportError:
        merge_counted_streams = None
    if merge_counted_streams is not None:
        while len(streams) > 64:
            streams = [
                merge_counted_streams(
                    [s[0] for s in streams[i : i + 64]],
                    [s[1] for s in streams[i : i + 64]],
                )
                for i in range(0, len(streams), 64)
            ]
        return merge_counted_streams(
            [s[0] for s in streams], [s[1] for s in streams]
        )
    kmers_list = [s[0] for s in streams]
    counts_list = [s[1] for s in streams]
    kmers = np.concatenate(kmers_list)
    counts = np.concatenate(counts_list)
    order = np.lexsort(tuple(kmers[:, w] for w in range(kmers.shape[1] - 1, -1, -1)))
    kmers, counts = kmers[order], counts[order]
    is_start = np.ones(len(kmers), dtype=bool)
    is_start[1:] = np.any(kmers[1:] != kmers[:-1], axis=1)
    starts = np.flatnonzero(is_start)
    summed = np.add.reduceat(counts.astype(np.uint64), starts).astype(np.uint32)
    return kmers[starts], summed


def _regroup_by_partition(kmers, counts, nb_partitions):
    """The device sorts by k-mer only (the partition id would be a whole
    extra u32 sort lane); partition ids are RECOMPUTED here from the
    fetched k-mers (identical hash chain) and the rows regrouped by a
    STABLE argsort on the id — stability preserves the k-mer order inside
    every partition, so the output contract (sorted by (part, kmer)) is
    unchanged."""
    parts = host_partition_ids(kmers, nb_partitions)
    try:
        from kmdiff_tpu.native import partition_regroup

        return partition_regroup(parts, kmers, counts, nb_partitions)
    except ImportError:
        pass
    order = np.argsort(parts, kind="stable")
    return kmers[order], parts[order], counts[order]


def _fetch_counted(U, lane_blob, counts, nb_partitions, max_count=None):
    kmers, counts_h = _fetch_stream(U, lane_blob, counts, max_count)
    return _regroup_by_partition(kmers, counts_h, nb_partitions)


def _fetch_counts_narrow(counts_d, U, max_count=None) -> np.ndarray:
    """Fetch distinct-k-mer counts at the narrowest dtype their max fits
    (the same u8/u16/u32 ladder the count files use, io.kmtricks.
    count_dtype_for) — counts are the second-largest slice of counting
    D2H and almost always fit a byte. Pad slots are zero, so the device
    max is the true max; the width check precedes the cast, so no value
    can wrap. Host widens back to the uint32 contract.

    max_count: the kernel's fused max (ops.codec.sort_rle_core) — reading
    it is a plain scalar D2H; computing .max() here would be a separate
    dispatch (~25-30 ms round-trip on sync-dispatch rigs, per chunk)."""
    import jax.numpy as jnp

    from kmdiff_tpu.utils.transfer import fetch_prefix

    if not U:
        mx = 0
    elif max_count is not None:
        mx = int(max_count)
    else:
        mx = int(counts_d.max())
    if mx < (1 << 8):
        narrow = jnp.uint8
    elif mx < (1 << 16):
        narrow = jnp.uint16
    else:
        narrow = None
    if narrow is not None:
        return fetch_prefix(counts_d.astype(narrow), U).astype(np.uint32)
    return fetch_prefix(counts_d, U).astype(np.uint32, copy=False)


def count_sample_device_mesh(
    all_codes: list[np.ndarray], k: int, nb_partitions: int, mesh
):
    """Mesh counting: the code stream splits into D overlapping chunks
    (k-1 codes of overlap, so every window lands in exactly one chunk) and
    ONE sharded dispatch per sample runs extraction -> all_to_all
    partition regroup -> per-device sort+RLE
    (parallel.count_step.make_sharded_count_kernel). Output contract
    matches count_sample_device.
    """
    from kmdiff_tpu.parallel.count_step import make_sharded_count_kernel
    from kmdiff_tpu.parallel.merge_step import put_row_sharded
    from kmdiff_tpu.ops.codec import INVALID, lanes_to_words, n_lanes

    D = mesh.devices.size
    sep = np.full(1, INVALID, dtype=np.uint8)
    parts = []
    for c in all_codes:
        if parts:
            parts.append(sep)
        parts.append(c)
    codes = (
        np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    )
    N = len(codes)
    if N < k:
        return (
            np.zeros((0, n_words(k)), np.uint64),
            np.zeros(0, np.uint32),
            np.zeros(0, np.uint32),
        )

    # D chunks with k-1 overlap; shared pow2 cap keeps one compiled shape
    step = -(-N // D)
    cap = 1 << max(14, (step + k - 2).bit_length())
    buf = np.full(D * cap, INVALID, dtype=np.uint8)
    for d in range(D):
        lo = d * step
        hi = min(N, lo + step + k - 1)
        if lo < N:
            buf[d * cap : d * cap + (hi - lo)] = codes[lo:hi]
    codes_dev = put_row_sharded(mesh, buf)

    W_local = cap - k + 1
    bucket_cap = 1 << max(10, (2 * (W_local // D) + 1024 - 1).bit_length())
    max_distinct = max(1 << 14, (D * bucket_cap) >> 2)
    while True:
        kern = make_sharded_count_kernel(
            mesh, k, nb_partitions, bucket_cap, max_distinct
        )
        stats_d, n_drop, blob_d, counts_d = kern(codes_dev)
        stats_h = np.asarray(stats_d)  # [D, 3]: one read per retry
        n_dist = stats_h[:, 0]
        if int(np.asarray(n_drop)[0]) > 0:
            bucket_cap *= 2
            continue
        if int(n_dist.max()) > max_distinct:
            max_distinct = 1 << (int(n_dist.max()) - 1).bit_length()
            continue
        break

    # gather per-device compacted results, then group by partition: the
    # id is recomputed on host from the gathered k-mers (not transferred,
    # not device-sorted) and a stable sort on it alone preserves each
    # partition's k-mer order — partitions are wholly owned by one device
    # and each device's distinct stream arrives k-mer-sorted.
    # Per-shard prefix fetches (the slot region [d*max_distinct, ...) IS
    # device d's shard) move only distinct-sized bytes off each device.
    from kmdiff_tpu.utils.transfer import device_fetch, fetch_prefix

    L = n_lanes(k)

    def gather(arr):
        # replicated layouts also expose D addressable shards but with
        # index start=None and full-array data; only keyed row shards may
        # take the per-shard prefix fast path
        shards = sorted(
            (s for s in arr.addressable_shards
             if s.index[0].start is not None),
            key=lambda s: s.index[0].start,
        )
        if len(shards) == D:
            return np.concatenate(
                [fetch_prefix(shards[d].data, int(n_dist[d]))
                 for d in range(D)]
            )
        full = device_fetch(arr)
        return np.concatenate(
            [full[d * max_distinct : d * max_distinct + int(n_dist[d])]
             for d in range(D)]
        )

    counts_all = gather(counts_d)
    blob_all = gather(blob_d)  # [sum(n_dist), L] — one gather, not L
    kmers = lanes_to_words(
        tuple(np.ascontiguousarray(blob_all[:, i]) for i in range(L))
    )
    return _regroup_by_partition(kmers, counts_all, nb_partitions)


def count_sample(
    paths: list[str], k: int, nb_partitions: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Count one sample's distinct canonical k-mers across its read files.

    Returns (kmers sorted by (part, kmer), parts, counts) pre hard-min.
    Every k rides the fused device path (the reference's k ceiling is 128,
    src/main.cc:29-50; the CLI enforces the same range); with a mesh
    active the sample's stream shards over the devices with an all_to_all
    partition regroup.
    """
    from kmdiff_tpu.io.fasta import flat_codes
    from kmdiff_tpu.parallel.runtime import get_mesh

    if k > 128:
        raise InputError(f"k={k} exceeds the supported maximum of 128")
    all_codes = [c for c in (flat_codes(p) for p in paths) if len(c)]
    mesh = get_mesh()
    if mesh is not None:
        return count_sample_device_mesh(all_codes, k, nb_partitions, mesh)
    return count_sample_device(all_codes, k, nb_partitions)


def write_sample_count_files(
    run_dir: str, entry_id: str, sample_idx: int, kmer_size: int,
    nb_partitions: int, kmers: np.ndarray, parts: np.ndarray,
    counts: np.ndarray,
) -> None:
    """Write one sample's per-partition .kmer.lz4 count files (post
    hard-min, sorted by (part, kmer)). Shared by run_count and the fused
    pipeline's background run-dir spill (pipeline.fused)."""
    cbytes = count_dtype_for(int(counts.max()) if len(counts) else 1)().itemsize
    bounds = np.searchsorted(parts, np.arange(nb_partitions + 1))
    for p in range(nb_partitions):
        lo_i, hi_i = bounds[p], bounds[p + 1]
        write_kmer_file(
            os.path.join(
                run_dir, "counts", f"partition_{p}", f"{entry_id}.kmer.lz4"
            ),
            kmers[lo_i:hi_i],
            counts[lo_i:hi_i],
            kmer_size,
            sample_idx=sample_idx,
            partition=p,
            count_bytes=cbytes,
        )


def run_count(opt: CountOptions, recurrence_min: int = 1) -> None:
    """Build the full run directory (reference: kmtricks pipeline ... --until
    count --hist). recurrence_min is recorded but — like the reference with
    --until count — not applied at this stage (the diff merge sees the
    per-sample files directly).

    Under a multi-process runtime (jax.distributed), samples round-robin
    across processes into the SHARED run dir, with a barrier before
    return — the multi-host axis of SURVEY.md §2.3."""
    from kmdiff_tpu.parallel.distributed import (
        barrier,
        is_distributed,
        is_primary,
        owned_samples,
    )

    fof = Fof.parse(opt.fof)
    if not fof.entries:
        raise InputError(f"{opt.fof}: empty fof")
    fof_dir = os.path.dirname(os.path.abspath(opt.fof))

    nb_partitions = opt.nb_partitions or 4
    run_dir = opt.directory
    os.makedirs(run_dir, exist_ok=True)
    os.makedirs(os.path.join(run_dir, "histograms"), exist_ok=True)
    for p in range(nb_partitions):
        os.makedirs(
            os.path.join(run_dir, "counts", f"partition_{p}"), exist_ok=True
        )
    if is_primary():
        shutil.copyfile(opt.fof, os.path.join(run_dir, "kmtricks.fof"))

    def one_sample(i: int):
        import time as _time

        entry = fof.entries[i]
        paths = [
            p if os.path.isabs(p) else os.path.join(fof_dir, p)
            for p in entry.paths
        ]
        t0 = _time.perf_counter()
        kmers, parts, counts = count_sample(paths, opt.kmer_size, nb_partitions)
        t_count = _time.perf_counter() - t0
        t0 = _time.perf_counter()

        # histogram BEFORE hard-min: totals subtract low-abundance mass
        # downstream exactly like the reference
        hist = hist_from_counts(counts, i, opt.kmer_size)
        write_hist(
            os.path.join(run_dir, "histograms", f"{entry.id}.hist"), hist
        )

        hard_min = entry.ab_min or opt.hard_min
        if hard_min > 1:
            keep = counts >= hard_min
            kmers_f, parts_f, counts_f = kmers[keep], parts[keep], counts[keep]
        else:
            kmers_f, parts_f, counts_f = kmers, parts, counts

        write_sample_count_files(
            run_dir, entry.id, i, opt.kmer_size, nb_partitions,
            kmers_f, parts_f, counts_f,
        )
        logger.info(
            "[%s] %d distinct k-mers (%d after hard-min=%d; count+fetch "
            "%.1fs, hist+spill %.1fs).",
            entry.id, len(counts), len(counts_f), hard_min,
            t_count, _time.perf_counter() - t0,
        )
        return len(counts_f)

    # samples in parallel on host threads; device work serializes naturally.
    # Multi-process: each process takes its round-robin sample share.
    my_samples = (
        owned_samples(len(fof.entries))
        if is_distributed()
        else list(range(len(fof.entries)))
    )
    with cf.ThreadPoolExecutor(max(1, opt.nb_threads)) as pool:
        totals = list(pool.map(one_sample, my_samples))

    barrier("count_done")
    logger.info(
        "Counted %d/%d samples, %d partitions, k=%d.",
        len(my_samples), len(fof.entries), nb_partitions, opt.kmer_size,
    )
    return None
