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

k <= 32 uses the device fast path; larger k falls back to the host codec
(kmdiff_tpu.core.kmer) with the same partition hash — correct, slower;
the multiword device path is the planned upgrade.
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

#: device block length (codes); windows per block = BLOCK - k + 1
BLOCK = 1 << 22

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
    sentinel-masked (hi, lo) lane pairs (O(N) D2H is expensive on
    tunneled devices — see ops.merge_dev)."""
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import INVALID, extract_canonical_kmers

    out = []
    stride = BLOCK - (k - 1)
    L = len(codes)
    for s in range(0, max(L - k + 1, 1), stride):
        chunk = codes[s : s + BLOCK]
        if len(chunk) < BLOCK:
            chunk = np.concatenate(
                [chunk, np.full(BLOCK - len(chunk), INVALID, dtype=np.uint8)]
            )
        hi, lo, ok = extract_canonical_kmers(jnp.asarray(chunk), k)
        sent = jnp.uint32(0xFFFFFFFF)
        out.append((jnp.where(ok, hi, sent), jnp.where(ok, lo, sent)))
    return out


def count_codes_device(codes: np.ndarray, k: int, nb_partitions: int):
    """Device path (k <= 32): canonical k-mers + partition ids, compacted.

    Returns (kmers [n,1] u64, parts [n] u32) — unsorted, with duplicates.
    Kept for tests/cross-checks; the counting pipeline uses the fused
    count_sample_device path.
    """
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import hi_lo_to_u64, partition_ids

    out_k, out_p = [], []
    for hi, lo in _device_kmer_blocks(codes, k):
        part = partition_ids(hi, lo, nb_partitions)
        hih = np.asarray(hi)
        loh = np.asarray(lo)
        ok = ~((hih == 0xFFFFFFFF) & (loh == 0xFFFFFFFF))
        idx = np.nonzero(ok)[0]
        if len(idx):
            out_k.append(hi_lo_to_u64(hih[idx], loh[idx]))
            out_p.append(np.asarray(part)[idx])
    if not out_k:
        return np.zeros((0, 1), np.uint64), np.zeros(0, np.uint32)
    return np.concatenate(out_k), np.concatenate(out_p)


def count_sample_device(all_codes: list[np.ndarray], k: int, nb_partitions: int):
    """Fused device counting for k <= 32: extraction, sort, and run-length
    encoding all on device; only distinct-sized results transfer to host.

    Returns (kmers [U, 1] u64 sorted by (part, kmer), parts [U], counts [U]).
    """
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import count_sort_rle_kernel, hi_lo_to_u64

    blocks = []
    for codes in all_codes:
        blocks.extend(_device_kmer_blocks(codes, k))
    if not blocks:
        return (
            np.zeros((0, 1), np.uint64),
            np.zeros(0, np.uint32),
            np.zeros(0, np.uint32),
        )
    his = jnp.concatenate([b[0] for b in blocks])
    los = jnp.concatenate([b[1] for b in blocks])
    N = his.shape[0]
    P = 1 << max(12, (N - 1).bit_length())
    if P > N:
        pad = jnp.full(P - N, 0xFFFFFFFF, jnp.uint32)
        his = jnp.concatenate([his, pad])
        los = jnp.concatenate([los, pad])

    # distinct-count cap: start assuming >=4x duplication, retry exact
    max_distinct = min(P, max(1 << 14, P >> 2))
    while True:
        n_distinct, part_d, hi_d, lo_d, counts = count_sort_rle_kernel(
            his, los, nb_partitions, max_distinct
        )
        U = int(n_distinct)
        if U <= max_distinct:
            break
        max_distinct = min(P, 1 << max(U - 1, 1).bit_length())

    kmers = hi_lo_to_u64(np.asarray(hi_d)[:U], np.asarray(lo_d)[:U])
    return kmers, np.asarray(part_d)[:U], np.asarray(counts)[:U]


def count_codes_device_multi(codes: np.ndarray, k: int, nb_partitions: int):
    """Device path for 32 < k <= 64: 4 u32 lanes per k-mer."""
    import jax.numpy as jnp

    from kmdiff_tpu.ops.codec import (
        INVALID,
        extract_canonical_kmers_multi,
        lanes_to_u64_words,
        partition_ids4,
    )

    out_k, out_p = [], []
    stride = BLOCK - (k - 1)
    L = len(codes)
    for s in range(0, max(L - k + 1, 1), stride):
        chunk = codes[s : s + BLOCK]
        if len(chunk) < BLOCK:
            chunk = np.concatenate(
                [chunk, np.full(BLOCK - len(chunk), INVALID, dtype=np.uint8)]
            )
        l0, l1, l2, l3, ok = extract_canonical_kmers_multi(jnp.asarray(chunk), k)
        part = partition_ids4(l0, l1, l2, l3, nb_partitions)
        idx = np.nonzero(np.asarray(ok))[0]
        if len(idx):
            out_k.append(
                lanes_to_u64_words(
                    np.asarray(l0)[idx], np.asarray(l1)[idx],
                    np.asarray(l2)[idx], np.asarray(l3)[idx],
                )
            )
            out_p.append(np.asarray(part)[idx])
    if not out_k:
        return np.zeros((0, 2), np.uint64), np.zeros(0, np.uint32)
    return np.concatenate(out_k), np.concatenate(out_p)


def count_codes_host(codes: np.ndarray, k: int, nb_partitions: int):
    """Host fallback for k > 64 (wider multi-word k-mers)."""
    from kmdiff_tpu.core.kmer import canonical_packed, kmers_from_codes

    valid = codes != 0xFF
    packed = kmers_from_codes(codes, valid, k)
    canon = canonical_packed(packed, k)
    return canon, host_partition_ids(canon, nb_partitions)


def _sort_and_rle(kmers: np.ndarray, parts: np.ndarray):
    """Sort by (part, kmer) and run-length encode.

    Single-word path sorts on device (lax.sort over u32 key triples,
    padded to a power of two so the jit caches a few shapes); multi-word
    sorts on host.
    Returns (kmers [U, nw] sorted, parts [U], counts [U]).
    """
    N = len(kmers)
    if N == 0:
        return kmers, parts, np.zeros(0, np.uint32)
    nw = kmers.shape[1]
    if nw == 1:
        import jax.numpy as jnp

        from kmdiff_tpu.ops.codec import sort_kmers_with_parts, u64_to_hi_lo

        P = 1 << max(10, (N - 1).bit_length())
        hi, lo = u64_to_hi_lo(kmers)
        pad = P - N
        part_in = np.concatenate(
            [parts, np.full(pad, 0xFFFFFFFF, np.uint32)]
        )
        hi_in = np.concatenate([hi, np.zeros(pad, np.uint32)])
        lo_in = np.concatenate([lo, np.zeros(pad, np.uint32)])
        part_s, hi_s, lo_s, is_start = sort_kmers_with_parts(
            jnp.asarray(part_in), jnp.asarray(hi_in), jnp.asarray(lo_in)
        )
        part_s = np.asarray(part_s)[:N]
        from kmdiff_tpu.ops.codec import hi_lo_to_u64

        kmers_s = hi_lo_to_u64(np.asarray(hi_s)[:N], np.asarray(lo_s)[:N])
        starts = np.nonzero(np.asarray(is_start)[:N])[0]
    elif nw == 2:
        import jax.numpy as jnp

        from kmdiff_tpu.ops.codec import lanes_to_u64_words, sort_kmers4_with_parts

        P = 1 << max(10, (N - 1).bit_length())
        pad = P - N
        part_in = np.concatenate([parts, np.full(pad, 0xFFFFFFFF, np.uint32)])
        lanes = []
        for w in (0, 1):
            col = kmers[:, w]
            for shift in (32, 0):
                lanes.append(
                    np.concatenate([
                        ((col >> np.uint64(shift)) & np.uint64(0xFFFFFFFF))
                        .astype(np.uint32),
                        np.zeros(pad, np.uint32),
                    ])
                )
        p_s, a, b, c, d, is_start = sort_kmers4_with_parts(
            jnp.asarray(part_in), *(jnp.asarray(x) for x in lanes)
        )
        part_s = np.asarray(p_s)[:N]
        kmers_s = lanes_to_u64_words(
            np.asarray(a)[:N], np.asarray(b)[:N],
            np.asarray(c)[:N], np.asarray(d)[:N],
        )
        starts = np.nonzero(np.asarray(is_start)[:N])[0]
    else:
        order = np.lexsort(
            tuple(kmers[:, w] for w in range(nw - 1, -1, -1)) + (parts,)
        )
        kmers_s = kmers[order]
        part_s = parts[order]
        new = np.empty(N, dtype=bool)
        new[0] = True
        np.any(kmers_s[1:] != kmers_s[:-1], axis=1, out=new[1:])
        new[1:] |= part_s[1:] != part_s[:-1]
        starts = np.nonzero(new)[0]

    counts = np.diff(np.append(starts, N)).astype(np.uint32)
    return kmers_s[starts], part_s[starts], counts


def count_sample(
    paths: list[str], k: int, nb_partitions: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Count one sample's distinct canonical k-mers across its read files.

    Returns (kmers sorted by (part, kmer), parts, counts) pre hard-min.
    """
    from kmdiff_tpu.io.fasta import flat_codes

    if k <= 32:
        all_codes = [c for c in (flat_codes(p) for p in paths) if len(c)]
        return count_sample_device(all_codes, k, nb_partitions)

    all_k, all_p = [], []
    for path in paths:
        codes = flat_codes(path)
        if not len(codes):
            continue
        if k <= 64:
            km, pt = count_codes_device_multi(codes, k, nb_partitions)
        else:
            km, pt = count_codes_host(codes, k, nb_partitions)
        all_k.append(km)
        all_p.append(pt)
    if not all_k:
        nw = n_words(k)
        return (
            np.zeros((0, nw), np.uint64),
            np.zeros(0, np.uint32),
            np.zeros(0, np.uint32),
        )
    return _sort_and_rle(np.concatenate(all_k), np.concatenate(all_p))


def run_count(opt: CountOptions, recurrence_min: int = 1) -> None:
    """Build the full run directory (reference: kmtricks pipeline ... --until
    count --hist). recurrence_min is recorded but — like the reference with
    --until count — not applied at this stage (the diff merge sees the
    per-sample files directly)."""
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
    shutil.copyfile(opt.fof, os.path.join(run_dir, "kmtricks.fof"))

    def one_sample(i: int):
        entry = fof.entries[i]
        paths = [
            p if os.path.isabs(p) else os.path.join(fof_dir, p)
            for p in entry.paths
        ]
        kmers, parts, counts = count_sample(paths, opt.kmer_size, nb_partitions)

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
            "[%s] %d distinct k-mers (%d after hard-min=%d).",
            entry.id, len(counts), len(counts_f), hard_min,
        )
        return len(counts_f)

    # samples in parallel on host threads; device work serializes naturally
    with cf.ThreadPoolExecutor(max(1, opt.nb_threads)) as pool:
        totals = list(pool.map(one_sample, range(len(fof.entries))))

    logger.info(
        "Counted %d samples, %d partitions, k=%d.",
        len(fof.entries), nb_partitions, opt.kmer_size,
    )
    return None
