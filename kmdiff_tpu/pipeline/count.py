"""TPU-native k-mer counting: reads -> kmtricks-compatible run directory.

Replaces the `kmtricks pipeline` subprocess (reference: src/cmd.cpp:27-48,
SURVEY.md §2.2 row 1) in-process. Per sample:

  FASTA/FASTQ(.gz) -> 2-bit codes (reads joined by one INVALID separator)
  -> fixed-size blocks with k-1 overlap -> device canonical-k-mer kernel +
  partition hash (kmdiff_tpu.ops.codec) -> device sort by (part, hi, lo)
  -> host run-length encode -> per-sample abundance histogram (pre
  hard-min, so histogram-derived totals reproduce the reference's
  src/kmtricks_utils.cpp:100-109 accounting) -> hard-min filter -> sorted
  per-partition count files (counts/partition_P/<id>.kmer.lz4).

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
from kmdiff_tpu.io.fasta import read_sequences
from kmdiff_tpu.io.kmtricks import (
    Fof,
    count_dtype_for,
    hist_from_counts,
    write_hist,
    write_kmer_file,
)
from kmdiff_tpu.utils.exceptions import InputError
from kmdiff_tpu.utils.logging import logger

#: device block length (codes); windows per block = BLOCK - k + 1.
#: Samples whose whole code stream fits one block ride the single fused
#: extraction+sort+RLE dispatch. Tunable via KMDIFF_COUNT_BLOCK: raising
#: it saves a handful of dispatch round trips per sample but was measured
#: warm-neutral on the tunnel rig (103 s vs 107 s for a 20x8.4 Mbp
#: cohort at 1<<24) while the one-time compile of the bigger fused-sort
#: shape stalled the remote-compile service ~18 min — the per-sample D2H
#: of distinct k-mers, not dispatch count, is the counting floor there.
BLOCK = int(os.environ.get("KMDIFF_COUNT_BLOCK", 1 << 22))

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
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import (
        count_sort_rle_lanes,
        fused_count_kernel,
        lanes_to_words,
        n_lanes,
    )

    # samples fitting one code block run extraction+sort+RLE as a SINGLE
    # dispatch (fused_count_kernel); larger samples extract block-wise and
    # count the concatenated lane stream
    total_codes = sum(len(c) for c in all_codes) + max(len(all_codes) - 1, 0)
    if 0 < total_codes <= BLOCK and total_codes >= k:
        sep = np.full(1, 0xFF, dtype=np.uint8)
        parts = []
        for c in all_codes:
            if parts:
                parts.append(sep)
            parts.append(c)
        codes = np.concatenate(parts)
        pad_to = min(BLOCK, 1 << max(14, (len(codes) - 1).bit_length()))
        if pad_to > len(codes):
            codes = np.concatenate(
                [codes, np.full(pad_to - len(codes), 0xFF, np.uint8)]
            )
        W = pad_to - k + 1
        max_distinct = max(1 << 14, W >> 2)
        while True:
            n_distinct, part_d, lanes_d, counts = fused_count_kernel(
                jnp.asarray(codes), k, nb_partitions, max_distinct
            )
            U = int(n_distinct)
            if U <= max_distinct:
                break
            max_distinct = 1 << max(U - 1, 1).bit_length()
        return _fetch_counted(U, max_distinct, part_d, lanes_d, counts,
                              nb_partitions=nb_partitions)

    blocks = []
    for codes in all_codes:
        blocks.extend(_device_kmer_blocks(codes, k))
    if not blocks:
        return (
            np.zeros((0, n_words(k)), np.uint64),
            np.zeros(0, np.uint32),
            np.zeros(0, np.uint32),
        )
    L = n_lanes(k)
    lanes = [jnp.concatenate([b[i] for b in blocks]) for i in range(L)]
    N = lanes[0].shape[0]
    P = 1 << max(12, (N - 1).bit_length())
    if P > N:
        pad = jnp.full(P - N, 0xFFFFFFFF, jnp.uint32)
        lanes = [jnp.concatenate([l, pad]) for l in lanes]

    # distinct-count cap: start assuming >=4x duplication, retry exact
    max_distinct = min(P, max(1 << 14, P >> 2))
    while True:
        n_distinct, part_d, lanes_d, counts = count_sort_rle_lanes(
            tuple(lanes), nb_partitions, max_distinct
        )
        U = int(n_distinct)
        if U <= max_distinct:
            break
        max_distinct = min(P, 1 << max(U - 1, 1).bit_length())

    return _fetch_counted(U, max_distinct, part_d, lanes_d, counts,
                              nb_partitions=nb_partitions)


def _fetch_counted(U, max_distinct, part_d, lanes_d, counts,
                   nb_partitions=None):
    """D2H discipline for slow uplinks: slice device-side at pow2
    granularity (bounded compiled-shape set) so at most 2U rows leave,
    then fetch chunk-parallel (utils.transfer). When nb_partitions is
    given, partition ids are RECOMPUTED on host from the fetched k-mers
    (identical hash chain) instead of transferred — 25% less D2H for
    one-word k-mers."""
    from kmdiff_tpu.ops.codec import lanes_to_words
    from kmdiff_tpu.utils.transfer import fetch_prefix

    def fetch(a):
        return fetch_prefix(a, U)

    kmers = lanes_to_words(tuple(fetch(l) for l in lanes_d))
    if nb_partitions is not None:
        parts = host_partition_ids(kmers, nb_partitions)
    else:
        parts = fetch(part_d)
    return kmers, parts, _fetch_counts_narrow(counts, U)


def _fetch_counts_narrow(counts_d, U) -> np.ndarray:
    """Fetch distinct-k-mer counts at the narrowest dtype their max fits
    (the same u8/u16/u32 ladder the count files use, io.kmtricks.
    count_dtype_for) — counts are the second-largest slice of counting
    D2H and almost always fit a byte. Pad slots are zero, so the device
    max is the true max; the width check precedes the cast, so no value
    can wrap. Host widens back to the uint32 contract."""
    import jax.numpy as jnp

    from kmdiff_tpu.utils.transfer import fetch_prefix

    mx = int(counts_d.max()) if U else 0
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
        n_dist, n_drop, part_d, lanes_d, counts_d = kern(codes_dev)
        n_dist = np.asarray(n_dist)
        if int(np.asarray(n_drop)[0]) > 0:
            bucket_cap *= 2
            continue
        if int(n_dist.max()) > max_distinct:
            max_distinct = 1 << (int(n_dist.max()) - 1).bit_length()
            continue
        break

    # gather per-device compacted results, then group by partition: each
    # partition is wholly owned by one device, so a stable sort on the
    # partition id alone preserves the per-device (part, kmer) order.
    # Per-shard prefix fetches (the slot region [d*max_distinct, ...) IS
    # device d's shard) move only distinct-sized bytes off each device.
    from kmdiff_tpu.utils.transfer import device_fetch, fetch_prefix

    L = n_lanes(k)

    def gather(arr):
        shards = sorted(
            arr.addressable_shards, key=lambda s: s.index[0].start or 0
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

    part_all = gather(part_d)
    counts_all = gather(counts_d)
    lanes_all = tuple(gather(ln) for ln in lanes_d)
    order = np.argsort(part_all, kind="stable")
    kmers = lanes_to_words(tuple(ln[order] for ln in lanes_all))
    return kmers, part_all[order], counts_all[order]


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

        cbytes = count_dtype_for(int(counts_f.max()) if len(counts_f) else 1)().itemsize
        bounds = np.searchsorted(parts_f, np.arange(nb_partitions + 1))
        for p in range(nb_partitions):
            lo_i, hi_i = bounds[p], bounds[p + 1]
            write_kmer_file(
                os.path.join(
                    run_dir, "counts", f"partition_{p}", f"{entry.id}.kmer.lz4"
                ),
                kmers_f[lo_i:hi_i],
                counts_f[lo_i:hi_i],
                opt.kmer_size,
                sample_idx=i,
                partition=p,
                count_bytes=cbytes,
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
