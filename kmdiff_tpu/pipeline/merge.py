"""Partition merge + differential test: the framework's hot path.

The reference merges S sorted per-sample count files per partition with a
k-way heap merge, invoking the Poisson LRT once per distinct k-mer inside
the merge callback (reference: include/kmdiff/merge.hpp:44-432,
kmtricks KmerMerger). That design is a scalar pointer-chasing loop — the
exact shape TPUs are worst at.

Re-design (TPU-first). Two paths share the exact-f64 rescore contract:

* DEVICE path (default, Poisson model, any k <= 128): raw per-sample
  (kmer, sample, count) triples ship to HBM once; ops.merge_dev sorts,
  segment-reduces, LR-filters and compacts survivors on device — only
  survivor-sized outputs return. Oversized partitions stream through in
  key-range chunks (each chunk is segment-complete because sample streams
  are sorted).
* HOST path (custom models, matrix streaming): a vectorized
  sort-unique-scatter builds the dense [U, S] matrix and the blocked
  ops.lrt filter (Pallas on TPU backends) scans it.

Either way the small survivor set is re-scored in exact f64
(kmdiff_tpu.core.model), reproducing kmdiff's p-values bit-for-bit.

Partitions are embarrassingly parallel (reference: merge.hpp:259-309); here
they stream through a thread pool that overlaps file IO with device
dispatches, and across hosts they shard over the jax process mesh
(kmdiff_tpu.parallel).
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import threading
import time

import numpy as np

from kmdiff_tpu.core.model import IModel, PoissonLikelihood, Significance
from kmdiff_tpu.io.accumulator import IAccumulator, KmerSignBlock
from kmdiff_tpu.io.kmtricks import read_kmer_file
from kmdiff_tpu.ops.lrt import LrtParams, run_filter

#: device tile height; fixed so the jitted kernel compiles once
BLOCK_ROWS = 1 << 17

#: max triples per device-merge dispatch; larger partitions stream through
#: in k-mer key-range chunks (each chunk is segment-complete because every
#: sample stream is sorted, so no cross-chunk stitching is needed).
#: Sizing: uniform pow2 chunks hit a handful of compiled shapes and bound
#: the host allocation high-water; fewer, larger chunks amortize the
#: per-dispatch sync round trip (measured on the tunnel rig: warm diff
#: 70 s at 2^22, 39 s at 2^23, flat at 2^24 — dispatch-overhead-bound
#: below 8M rows, bandwidth-bound above). Tunable per deployment via
#: KMDIFF_MAX_DEVICE_ROWS.
MAX_DEVICE_ROWS = int(__import__("os").environ.get(
    "KMDIFF_MAX_DEVICE_ROWS", 1 << 23))

#: hit budgets at or below this ride the meta-in-blob single-read path
#: (ops.merge_dev meta_in_blob): the whole [1+max_hits, R] blob transfers
#: in one round trip instead of meta-read + prefix-fetch (two). 2^16 rows
#: x 8 u32 columns = 2 MB — cheaper than a second ~100 ms round trip at
#: the tunnel's ~30-50 MB/s; budgets past it fall back to prefix fetches.
META_BLOB_ROWS = 1 << 16


def merge_sorted_streams(
    kmers_list: list[np.ndarray],
    counts_list: list[np.ndarray],
) -> tuple[np.ndarray, np.ndarray]:
    """Union-merge S sorted (kmers, counts) streams into a dense count matrix.

    Replaces the kmtricks KmerMerger heap walk (reference: merge.hpp:265-266
    with ab_mins=1, recurrence_min=1 — i.e. the plain union) with one
    vectorized pass:

      concat -> lexsort by packed words -> run-boundary flags -> row ids ->
      scatter counts into [U, S]

    Returns (kmers [U, n_words] uint64 ascending, counts [U, S] uint32).
    """
    S = len(kmers_list)
    nw = kmers_list[0].shape[1] if kmers_list else 1
    sizes = [len(k) for k in kmers_list]
    N = int(np.sum(sizes))
    if N == 0:
        return np.zeros((0, nw), dtype=np.uint64), np.zeros((0, S), dtype=np.uint32)

    all_kmers = np.concatenate(kmers_list, axis=0)
    all_counts = np.concatenate(counts_list, axis=0)
    sample_idx = np.repeat(np.arange(S, dtype=np.int32), sizes)

    # lexicographic order over words (word 0 major). Views the row bytes as
    # big-endian so a single void-dtype argsort handles any word count.
    if all_kmers.shape[1] == 1:
        order = np.argsort(all_kmers[:, 0], kind="stable")
    else:
        keys = np.ascontiguousarray(all_kmers.astype(">u8"))
        order = np.argsort(keys.view(f"V{nw * 8}").ravel(), kind="stable")

    sk = all_kmers[order]
    new_row = np.empty(N, dtype=bool)
    new_row[0] = True
    np.any(sk[1:] != sk[:-1], axis=1, out=new_row[1:])
    row_id = np.cumsum(new_row) - 1
    U = int(row_id[-1]) + 1

    counts = np.zeros((U, S), dtype=np.uint32)
    counts[row_id, sample_idx[order]] = all_counts[order]
    return sk[new_row], counts


@dataclasses.dataclass
class PartitionResult:
    partition: int
    total_kmers: int
    nb_sign: int
    sign_controls: int
    sign_cases: int


class _Phases(threading.local):
    """Per-thread stage-time accumulator; read back at partition end for
    debug-level phase logs (decode / build / device / fetch seconds).
    Device time includes dispatch + the honest result read."""

    def __init__(self):
        self.t = {}

    def add(self, key, dt):
        self.t[key] = self.t.get(key, 0.0) + dt

    def drain(self):
        out, self.t = self.t, {}
        return out


class PartitionProcessor:
    """Runs one partition: load -> union merge -> device filter -> exact
    rescore -> accumulate (reference observer: merge.hpp:68-103)."""

    def __init__(
        self,
        model: IModel,
        nb_controls: int,
        nb_cases: int,
        threshold: float,
        keep_counts: bool = False,
        sampler=None,
        save_matrix_path: str | None = None,
    ):
        self.model = model
        self.nb_controls = nb_controls
        self.nb_cases = nb_cases
        self.threshold = threshold
        self.keep_counts = keep_counts  # store survivor count rows (popstrat)
        self.sampler = sampler
        self.save_matrix_path = save_matrix_path
        self.phases = _Phases()
        # persistent per-worker-thread chunk-prefetch executors: the
        # _Staging buffers are thread-local, so a fresh prefetch thread per
        # chunked partition would repay the page-fault warmup (~3x H2D) on
        # every partition; these live for the processor's lifetime and are
        # shut down by shutdown_prefetchers()
        self._prefetchers: dict[int, cf.ThreadPoolExecutor] = {}
        self._prefetchers_lock = threading.Lock()
        self._fast = isinstance(model, PoissonLikelihood)
        if self._fast:
            self.params = LrtParams(
                nb_controls,
                nb_cases,
                model.sum_controls,
                model.sum_cases,
                threshold,
            )

    def _chunk_prefetcher(self) -> cf.ThreadPoolExecutor:
        """The calling worker thread's persistent prefetch executor.

        Safe to reuse across chunked partitions: a partition's loop only
        returns after its last chunk's survivors were read on host, so the
        next partition's build(0) can never rewrite an in-flight staging
        slot."""
        tid = threading.get_ident()
        ex = self._prefetchers.get(tid)
        if ex is None:
            ex = cf.ThreadPoolExecutor(
                1, thread_name_prefix="kmdiff-prefetch"
            )
            with self._prefetchers_lock:
                self._prefetchers[tid] = ex
        return ex

    def shutdown_prefetchers(self) -> None:
        with self._prefetchers_lock:
            pools, self._prefetchers = dict(self._prefetchers), {}
        for ex in pools.values():
            ex.shutdown(wait=True)

    # -- block scoring -------------------------------------------------------

    def _score_block(self, kmers: np.ndarray, counts: np.ndarray):
        """Score [B, S] rows; returns (survivor KmerSignBlock, survivor row
        indices, sign tallies)."""
        B = counts.shape[0]
        if self._fast and self.params.wide_sums:
            # cohorts whose total mass reaches 2^31 can overflow the int32
            # device sums; this (rare, host-merge-only) path computes exact
            # int64 sums and f64 p-values directly in numpy
            s_c = counts[:, : self.nb_controls].sum(axis=1, dtype=np.int64)
            s_k = counts[:, self.nb_controls :].sum(axis=1, dtype=np.int64)
            p, sg, mc, mk = self.model.process_sums(s_c, s_k)
            final = p <= self.threshold
            idx = np.nonzero(final)[0]
            p, sg, mc, mk = p[final], sg[final], mc[final], mk[final]
        elif self._fast:
            # device bulk filter in fixed tiles; host exact rescore of hits.
            # counts are uint32 but far below 2^31 (count_bytes <= 4,
            # per-sample sums bounded by total coverage), so an int32 view
            # is free and skips a device-side convert.
            counts_i32 = counts.view(np.int32)
            keep = np.zeros(B, dtype=bool)
            s_c = np.zeros(B, dtype=np.int64)
            s_k = np.zeros(B, dtype=np.int64)
            pad_tile = np.zeros((BLOCK_ROWS, counts.shape[1]), dtype=np.int32)
            for lo in range(0, B, BLOCK_ROWS):
                hi = min(B, lo + BLOCK_ROWS)
                if hi - lo < BLOCK_ROWS:
                    pad_tile[: hi - lo] = counts_i32[lo:hi]
                    pad_tile[hi - lo :] = 0
                    tile = pad_tile
                else:
                    tile = counts_i32[lo:hi]
                k, _lr, sc, sk_ = run_filter(self.params, tile)
                keep[lo:hi] = k[: hi - lo]
                s_c[lo:hi] = sc[: hi - lo]
                s_k[lo:hi] = sk_[: hi - lo]
            idx = np.nonzero(keep)[0]
            p, sg, mc, mk = self.model.process_sums(s_c[idx], s_k[idx])
            final = p <= self.threshold
            idx = idx[final]
            p, sg, mc, mk = p[final], sg[final], mc[final], mk[final]
        elif hasattr(self.model, "process_block_jax"):
            # device-vectorized plugin ABI: the model scores [B, S] count
            # tiles as a jittable jnp function; same fixed-tile dispatch
            # discipline as the builtin filter, so custom models scale to
            # billion-row cohorts instead of host-looping
            import jax.numpy as jnp

            if not hasattr(self, "_block_jax_stacked"):
                import functools

                import jax

                model = self.model

                # fold the plugin's 4 outputs into ONE device array so a
                # tile costs one host read, not four (each read is a full
                # dispatch round trip on sync-dispatch rigs)
                @functools.partial(jax.jit, static_argnames=("nb_controls",))
                def _stacked(tile, nb_controls):
                    tp, tsg, tmc, tmk = model.process_block_jax(
                        tile, nb_controls
                    )
                    dt = jnp.result_type(tp, tmc, tmk, jnp.float32)
                    return jnp.stack([
                        tp.astype(dt), tsg.astype(dt),
                        tmc.astype(dt), tmk.astype(dt),
                    ])

                self._block_jax_stacked = _stacked

            p = np.empty(B)
            sg = np.empty(B, dtype=np.int8)
            mc = np.empty(B)
            mk = np.empty(B)
            pad_tile = np.zeros((BLOCK_ROWS, counts.shape[1]), dtype=np.int32)
            counts_i32 = counts.view(np.int32)
            for lo in range(0, B, BLOCK_ROWS):
                hi = min(B, lo + BLOCK_ROWS)
                if hi - lo < BLOCK_ROWS:
                    pad_tile[: hi - lo] = counts_i32[lo:hi]
                    pad_tile[hi - lo :] = 0
                    tile = pad_tile
                else:
                    tile = counts_i32[lo:hi]
                out = np.asarray(self._block_jax_stacked(
                    jnp.asarray(tile), self.nb_controls
                ))
                n = hi - lo
                p[lo:hi] = out[0, :n]
                sg[lo:hi] = out[1, :n].astype(np.int8)
                mc[lo:hi] = out[2, :n]
                mk[lo:hi] = out[3, :n]
            keep = p <= self.threshold
            idx = np.nonzero(keep)[0]
            p, sg, mc, mk = p[idx], sg[idx], mc[idx], mk[idx]
        else:
            # custom models score every row on host (plugin path,
            # reference: model_manager.hpp). Vectorized process_block
            # overrides run at numpy speed; scalar-only plugins fall back
            # to the base class's per-row loop (warned once — implement
            # process_block or process_block_jax for large cohorts).
            if (
                B > 1_000_000
                and type(self.model).process_block is IModel.process_block
                and not getattr(self, "_warned_scalar_plugin", False)
            ):
                from kmdiff_tpu.utils.logging import logger

                logger.warning(
                    "custom model %s only implements the scalar process() "
                    "ABI; scoring %d rows via the per-row loop. Implement "
                    "process_block (numpy) or process_block_jax (device) "
                    "for large cohorts.", type(self.model).__name__, B,
                )
                self._warned_scalar_plugin = True
            p, sg, mc, mk = self.model.process_block(counts, self.nb_controls)
            keep = p <= self.threshold
            idx = np.nonzero(keep)[0]
            p, sg, mc, mk = p[idx], sg[idx], mc[idx], mk[idx]

        block = KmerSignBlock(
            kmers[idx],
            np.asarray(p, dtype=np.float64),
            np.asarray(sg, dtype=np.int8),
            np.asarray(mc, dtype=np.float64),
            np.asarray(mk, dtype=np.float64),
            counts[idx].astype(np.float64) if self.keep_counts else None,
        )
        n_ctrl = int(np.sum(block.signs == int(Significance.CONTROL)))
        return block, idx, n_ctrl, len(block) - n_ctrl

    def _write_matrix(self, partition, kmers, counts, kmer_size):
        """--save-sk: dump the SURVIVOR rows' count matrix (the reference
        writes only k-mers passing the merge threshold,
        merge.hpp:83-87)."""
        from kmdiff_tpu.io.kmtricks import write_matrix_file

        write_matrix_file(
            f"{self.save_matrix_path}/matrix_{partition}.count.lz4",
            kmers,
            counts.astype(np.uint32),
            kmer_size,
            partition,
        )

    # -- partition entry points ----------------------------------------------

    def process_arrays(
        self,
        partition: int,
        kmers: np.ndarray,
        counts: np.ndarray,
        acc: IAccumulator,
        kmer_size: int = 0,
    ) -> PartitionResult:
        if self.sampler is not None:
            self.sampler.sample_block(partition, kmers, counts, self.nb_controls)
        block, idx, n_ctrl, n_case = self._score_block(kmers, counts)
        if self.save_matrix_path is not None and kmer_size:
            self._write_matrix(partition, kmers[idx], counts[idx], kmer_size)
        acc.push_block(block)
        acc.finish()
        return PartitionResult(partition, len(counts), len(block), n_ctrl, n_case)

    def process_files(
        self, partition: int, paths: list[str], acc: IAccumulator
    ) -> PartitionResult:
        t0 = time.perf_counter()
        kmers_list, counts_list, ksize = [], [], 0
        for path in paths:
            info, kmers, counts = read_kmer_file(path)
            ksize = info.kmer_size
            kmers_list.append(kmers)
            counts_list.append(counts)
        self.phases.add("decode", time.perf_counter() - t0)
        if self._fast and ksize <= 128:
            res = self._process_device_merge(
                partition, kmers_list, counts_list, acc, ksize
            )
            self._log_phases(partition)
            return res
        kmers, counts = merge_sorted_streams(kmers_list, counts_list)
        return self.process_arrays(partition, kmers, counts, acc, ksize)

    def process_matrix(
        self, partition: int, path: str, acc: IAccumulator
    ) -> PartitionResult:
        """Stream a prebuilt count matrix in bounded row blocks (the
        reference streams via km::MatrixReader, matrix_proxy
        merge.hpp:319-432): memory stays O(block), not O(file). Rows are
        already merged (one distinct k-mer per row), so each block goes
        straight to scoring; sampled geno rows and --save-sk survivors
        accumulate across blocks (both are small sub-streams)."""
        from kmdiff_tpu.io.kmtricks import open_matrix_stream

        info, blocks = open_matrix_stream(path)
        total = nsign = n_ctrl = n_case = 0
        sink = [] if self.save_matrix_path is not None else None
        geno_parts: list[np.ndarray] = []
        for kmers, counts in blocks:
            if self.sampler is not None:
                from kmdiff_tpu.pipeline.popstrat import sample_mask

                mask = sample_mask(kmers, self.sampler.rate, self.sampler.seed)
                geno_parts.append((counts[mask] > 0).astype(np.uint8))
            block, idx, nc, nk = self._score_block(kmers, counts)
            if sink is not None:
                sink.append((kmers[idx], counts[idx].astype(np.uint32)))
            acc.push_block(block)
            total += len(counts)
            nsign += len(block)
            n_ctrl += nc
            n_case += nk
        if self.sampler is not None:
            rows = (
                np.concatenate(geno_parts)
                if geno_parts
                else np.zeros((0, info.count_slots), np.uint8)
            )
            self.sampler.add_sampled(partition, rows)
        if sink is not None and info.kmer_size:
            from kmdiff_tpu.core.kmer import n_words

            km = (
                np.concatenate([s[0] for s in sink])
                if sink
                else np.zeros((0, n_words(info.kmer_size)), np.uint64)
            )
            ct = (
                np.concatenate([s[1] for s in sink])
                if sink
                else np.zeros((0, info.count_slots), np.uint32)
            )
            self._write_matrix(partition, km, ct, info.kmer_size)
        acc.finish()
        return PartitionResult(partition, total, nsign, n_ctrl, n_case)

    def _process_device_merge(
        self, partition, kmers_list, counts_list, acc, ksize
    ) -> PartitionResult:
        """Device-side merge path: sort/segment-sum/compact on device; only
        survivors (and PCA sample rows) return to host
        (kmdiff_tpu.ops.merge_dev). Partitions above the per-dispatch row
        budget (MAX_DEVICE_ROWS per device; a mesh multiplies it by the
        device count) stream through in key-range chunks."""
        from kmdiff_tpu.parallel.runtime import get_mesh

        mesh = get_mesh()
        budget = MAX_DEVICE_ROWS * (mesh.devices.size if mesh is not None else 1)
        nbc = None
        want_geno = self.sampler is not None
        want_rows = self.keep_counts or self.save_matrix_path is not None
        if (not (want_geno or want_rows or self.params.wide_sums)
                and 1 <= self.nb_controls < len(kmers_list)
                and len(kmers_list) > 2
                and __import__("os").environ.get(
                    "KMDIFF_GROUP_SUM", "1") != "0"):
            # the packed kernel consumes only per-GROUP sums
            # (model.hpp:145-146), so controls and cases pre-sum on host
            # through the native k-way counted-stream merge before
            # anything ships: upload rows shrink by the cohort's
            # duplication factor, and the device sorts ~2 rows per
            # distinct k-mer instead of one per carrying sample. Exact
            # integer sums -> byte-identical survivors.
            t0 = time.perf_counter()
            from kmdiff_tpu.pipeline.count import _merge_streams

            nc = self.nb_controls
            ctrl = _merge_streams(list(zip(kmers_list[:nc], counts_list[:nc])))
            case = _merge_streams(list(zip(kmers_list[nc:], counts_list[nc:])))
            kmers_list = [ctrl[0], case[0]]
            counts_list = [ctrl[1], case[1]]
            nbc = 1
            self.phases.add("groupsum", time.perf_counter() - t0)
        N_real = int(sum(len(k) for k in kmers_list))
        if N_real > budget:
            return self._process_device_merge_chunked(
                partition, kmers_list, counts_list, acc, ksize, budget,
                nbc=nbc,
            )
        return self._device_merge_chunk(
            partition, kmers_list, counts_list, acc, ksize, finish=True,
            nbc=nbc,
        )

    def _process_device_merge_chunked(
        self, partition, kmers_list, counts_list, acc, ksize,
        budget=MAX_DEVICE_ROWS, nbc=None,
    ) -> PartitionResult:
        """Split the partition at common k-mer boundaries so every chunk
        is an independent sub-partition of bounded size.

        Chunks target 7/8 of the budget, not half: the kernel pads each
        chunk to the next pow2, so half-budget chunks sorted DOUBLE their
        rows as padding (budget-sized pow2 pad) — near-full chunks cut
        both the padded sort work and the per-chunk dispatch round trips
        ~2x. Quantile splitters are approximate, so chunk sizes are
        validated and the chunk count doubles on overshoot (ties on the
        first k-mer word cap how finely keys can split; bounded retries)."""
        from kmdiff_tpu.ops.merge_dev import quantile_key_split

        N_real = sum(len(k) for k in kmers_list)
        n_chunks = max(2, -(-N_real // max(1, (budget * 7) // 8)))
        # best_effort: after the retries an over-budget chunk is still
        # preferable to refusing (the kernel's overflow retry absorbs it)
        bounds, chunk_index_slices, _R = quantile_key_split(
            kmers_list, n_chunks, lambda _r: budget,
            grow=True, attempts=4, best_effort=True,
        )

        results = []
        geno_parts = []
        shim = (
            _ChunkSamplerShim(self.sampler, geno_parts)
            if self.sampler is not None
            else None
        )
        matrix_sink = [] if self.save_matrix_path is not None else None

        def chunk_slices(c):
            sub_k, sub_c = [], []
            for (a, b), km, ct in zip(
                chunk_index_slices[c], kmers_list, counts_list
            ):
                sub_k.append(km[a:b])
                sub_c.append(ct[a:b])
            return sub_k, sub_c

        from kmdiff_tpu.parallel.runtime import get_mesh

        total = len(bounds) + 1
        if get_mesh() is not None:
            for c in range(total):
                sub_k, sub_c = chunk_slices(c)
                results.append(
                    self._device_merge_chunk(
                        partition, sub_k, sub_c, acc, ksize, finish=False,
                        sampler_override=shim, matrix_sink=matrix_sink,
                        nbc=nbc,
                    )
                )
        else:
            # double-buffer: a single prefetch worker builds chunk c+1's
            # triples and ships them (host build + H2D) while chunk c's
            # kernel runs and its survivors stream back. Staging slots
            # alternate c%2 so a buffer is only rewritten after the chunk
            # that used it was fully read (ops.merge_dev._Staging).
            want_geno = shim is not None
            want_rows = self.keep_counts or self.save_matrix_path is not None
            wide = self.params.wide_sums

            def build(c):
                sub_k, sub_c = chunk_slices(c)
                pre = self._build_single_operands(
                    sub_k, sub_c, want_geno, want_rows, wide, slot=c % 2,
                    nbc=nbc,
                )
                return sub_k, sub_c, pre

            prefetch = self._chunk_prefetcher()
            fut = prefetch.submit(build, 0)
            for c in range(total):
                sub_k, sub_c, pre = fut.result()
                if c + 1 < total:
                    fut = prefetch.submit(build, c + 1)
                self.phases.add("build", pre["build_s"])
                results.append(
                    self._device_merge_chunk(
                        partition, sub_k, sub_c, acc, ksize, finish=False,
                        sampler_override=shim, matrix_sink=matrix_sink,
                        prebuilt=pre, nbc=nbc,
                    )
                )
        if self.sampler is not None:
            rows = (
                np.concatenate(geno_parts)
                if geno_parts
                else np.zeros((0, len(kmers_list)), np.uint8)
            )
            self.sampler.add_sampled(partition, rows)
        if matrix_sink is not None:
            from kmdiff_tpu.core.kmer import n_words

            S = len(kmers_list)
            nw = n_words(ksize)
            km = (
                np.concatenate([m[0] for m in matrix_sink])
                if matrix_sink
                else np.zeros((0, nw), np.uint64)
            )
            ct = (
                np.concatenate([m[1] for m in matrix_sink])
                if matrix_sink
                else np.zeros((0, S), np.int32)
            )
            self._write_matrix(partition, km, ct, ksize)
        acc.finish()
        return PartitionResult(
            partition,
            sum(r.total_kmers for r in results),
            sum(r.nb_sign for r in results),
            sum(r.sign_controls for r in results),
            sum(r.sign_cases for r in results),
        )

    def _device_merge_chunk(
        self, partition, kmers_list, counts_list, acc, ksize, finish=True,
        sampler_override=None, matrix_sink=None, prebuilt=None, nbc=None,
    ) -> PartitionResult:
        from kmdiff_tpu.ops.merge_dev import lanes_to_words
        from kmdiff_tpu.parallel.runtime import get_mesh

        sampler = sampler_override if sampler_override is not None else self.sampler
        want_geno = sampler is not None
        save_matrix = self.save_matrix_path is not None
        want_rows = self.keep_counts or save_matrix
        wide = self.params.wide_sums

        mesh = get_mesh()
        if prebuilt is not None and "dispatch_override" in prebuilt:
            # the fused pipeline's sharded assemble+merge dispatch
            # (pipeline.fused): D key-range chunks per program, one per
            # device; returns the same disp tuple as the paths below
            disp = prebuilt["dispatch_override"](self, sampler)
        elif mesh is not None:
            disp = self._dispatch_mesh(
                mesh, kmers_list, counts_list, sampler, want_geno, want_rows,
                wide, nbc=nbc,
            )
        else:
            disp = self._dispatch_single(
                kmers_list, counts_list, sampler, want_geno, want_rows, wide,
                prebuilt=prebuilt, nbc=nbc,
            )
        n_distinct, s_c, s_k, hit_lanes, rows_all, geno_rows = disp
        n_hits = len(s_c)

        p, sg, mc, mk = self.model.process_sums(s_c, s_k)
        final = p <= self.threshold
        kmers_u64 = lanes_to_words(hit_lanes)[final]
        p, sg, mc, mk = p[final], sg[final], mc[final], mk[final]

        counts_rows = None
        if want_rows:
            # rows carry uint32 bit patterns in i32 slots; view back before
            # widening so counts >= 2^31 stay positive
            rows_i32 = rows_all[final]
            if self.keep_counts:
                counts_rows = rows_i32.view(np.uint32).astype(np.float64)
            if save_matrix:
                if matrix_sink is not None:
                    matrix_sink.append((kmers_u64, rows_i32))
                else:
                    self._write_matrix(partition, kmers_u64, rows_i32, ksize)
        if want_geno:
            sampler.add_sampled(partition, geno_rows)

        block = KmerSignBlock(
            kmers_u64,
            np.asarray(p, dtype=np.float64),
            np.asarray(sg, dtype=np.int8),
            np.asarray(mc, dtype=np.float64),
            np.asarray(mk, dtype=np.float64),
            counts_rows,
        )
        acc.push_block(block)
        if finish:
            acc.finish()
        n_ctrl = int(np.sum(block.signs == int(Significance.CONTROL)))
        return PartitionResult(
            partition, n_distinct, len(block), n_ctrl, len(block) - n_ctrl
        )

    def _log_phases(self, partition: int) -> None:
        from kmdiff_tpu.utils.logging import logger

        t = self.phases.drain()
        if t:
            logger.debug(
                "partition %d phases: %s", partition,
                " ".join(f"{k}={v:.2f}s" for k, v in sorted(t.items())),
            )

    # -- kernel dispatch (single device / mesh) ------------------------------

    def _budgets(self, pad_to, want_geno, geno_rate):
        """Initial compaction capacities: nonzero(size=s) cost grows
        superlinearly in s on TPU, so start tight (real runs keep ~1e-6 of
        rows at alpha/cutoff) and retry at the needed pow2 on overflow.

        KMDIFF_MERGE_MAX_HITS (env, read per call) caps the STARTING
        budgets so the overflow-retry path can be exercised through the
        product entry points (dryrun/test stress harness); retries still
        grow past the cap to whatever the data needs."""
        import os

        tight = self.params.p_threshold <= 1e-3
        max_hits = min(pad_to, 1 << 14) if tight else pad_to
        max_geno = (
            min(pad_to, 1 << max(14, int(3 * geno_rate * pad_to).bit_length()))
            if want_geno
            else 1
        )
        cap = os.environ.get("KMDIFF_MERGE_MAX_HITS")
        if cap:
            max_hits = max(1, min(max_hits, int(cap)))
            if want_geno:
                max_geno = max(1, min(max_geno, int(cap)))
        return max_hits, max_geno

    @staticmethod
    def _unpack_blob(blob: np.ndarray, n_lanes: int, wide: bool):
        """hit_blob [U, R] u32 (fetched in ONE transfer) -> (hit_lanes
        tuple, s_c, s_k exact int64). Column layout: L k-mer lanes then
        the group sums — [sc, sk] narrow, [sc_hi, sc_lo, sk_hi, sk_lo]
        16-bit-split wide (ops.merge_dev.merge_lrt_local)."""
        L = n_lanes
        lanes = tuple(np.ascontiguousarray(blob[:, i]) for i in range(L))
        if wide:
            s_c = blob[:, L].astype(np.int64) * 65536 + blob[:, L + 1]
            s_k = blob[:, L + 2].astype(np.int64) * 65536 + blob[:, L + 3]
        else:
            s_c = blob[:, L].astype(np.int64)
            s_k = blob[:, L + 1].astype(np.int64)
        return lanes, s_c, s_k

    def _build_single_operands(
        self, kmers_list, counts_list, want_geno, want_rows, wide, slot=0,
        nbc=None,
    ):
        """Build one chunk's triples and ship them to the device. Runs on
        the caller's thread — a chunk-prefetch thread overlaps this (host
        build + H2D) with the previous chunk's kernel + fetch, alternating
        staging slots (ops.merge_dev._Staging slot discipline)."""
        import os

        import jax.numpy as jnp

        from kmdiff_tpu.ops.merge_dev import (
            build_triples,
            build_triples_packed,
            build_triples_packed_ranged,
            pack16_ok,
        )

        t0 = time.perf_counter()
        if nbc is None:
            nbc = self.nb_controls
        N_real = int(sum(len(k) for k in kmers_list))
        pad_to = 1 << max(12, (max(N_real, 1) - 1).bit_length())
        # fast narrow path: control bit packed into the count lane, no
        # sample operand in the sort; u16 packing when counts < 2^15
        packed = not (want_rows or want_geno or wide)
        range_rows = 0
        if packed:
            pack16 = pack16_ok(counts_list)
            lanes = count = None
            if os.environ.get("KMDIFF_RANGED_SORT") == "1":
                # opt-in: quantile-ranged layout -> batched [R, M]
                # sub-sorts in the kernel (A/B'd in bench.py; falls back
                # to the flat build on quantile skew or small chunks)
                res = build_triples_packed_ranged(
                    kmers_list, counts_list, pad_to, nbc,
                    pack16=pack16, slot=slot,
                )
                if res is not None:
                    lanes, count, _, range_rows = res
            if lanes is None:
                lanes, count, _ = build_triples_packed(
                    kmers_list, counts_list, pad_to, nbc,
                    pack16=pack16, slot=slot,
                )
            sample = np.zeros(1, np.int32)
        else:
            lanes, sample, count, _ = build_triples(
                kmers_list, counts_list, pad_to, slot=slot
            )
        return {
            "lanes_dev": tuple(jnp.asarray(l) for l in lanes),
            "sample_dev": jnp.asarray(sample),
            "count_dev": jnp.asarray(count),
            "pad_to": pad_to,
            "packed": packed,
            "range_rows": range_rows,
            "build_s": time.perf_counter() - t0,
        }

    def _dispatch_single(
        self, kmers_list, counts_list, sampler, want_geno, want_rows, wide,
        prebuilt=None, nbc=None,
    ):
        """One-device merge kernel dispatch with overflow retry."""
        import jax.numpy as jnp

        from kmdiff_tpu.ops.merge_dev import pca_threshold_u32

        if prebuilt is None:
            prebuilt = self._build_single_operands(
                kmers_list, counts_list, want_geno, want_rows, wide,
                nbc=nbc,
            )
            self.phases.add("build", prebuilt["build_s"])
        # a prebuilt dispatch_fn (the fused pipeline's assemble+merge
        # single-dispatch kernel) replaces the operand-based dispatch; the
        # retry loop only re-parameterizes the compaction budgets
        dispatch_fn = prebuilt.get("dispatch_fn")
        if dispatch_fn is None:
            lanes_dev = prebuilt["lanes_dev"]
            sample_dev = prebuilt["sample_dev"]
            count_dev = prebuilt["count_dev"]
            n_lanes = len(lanes_dev)
        else:
            n_lanes = prebuilt["n_lanes"]
        pad_to = prebuilt["pad_to"]
        packed = prebuilt["packed"]
        geno_rate = getattr(sampler, "rate", 0.0)
        max_hits, max_geno = self._budgets(pad_to, want_geno, geno_rate)

        from kmdiff_tpu.ops.merge_dev import merge_lrt_kernel

        t0 = time.perf_counter()
        S = len(kmers_list)
        blob_all = None
        while True:
            # small-budget dispatches embed meta as hit_blob row 0 and the
            # host reads the WHOLE [1+max_hits, R] blob once — sync +
            # overflow check + survivor fetch in a single round trip (the
            # pad transfer at <=2^16 rows is far cheaper than the extra
            # round trip a separate meta read costs on sync-dispatch rigs)
            mblob = max_hits <= META_BLOB_ROWS
            if dispatch_fn is not None:
                out = dispatch_fn(max_hits, max_geno, mblob)
            else:
                out = merge_lrt_kernel(
                    lanes_dev,
                    sample_dev,
                    count_dev,
                    self.nb_controls,
                    jnp.float32(self.params.ratio_c),
                    jnp.float32(self.params.ratio_k),
                    jnp.float32(self.params.lr_min),
                    jnp.uint32(pca_threshold_u32(geno_rate)),
                    jnp.uint32(getattr(sampler, "seed", 0)),
                    max_hits,
                    max_geno,
                    want_geno,
                    nb_samples=S,
                    want_rows=want_rows,
                    wide_sums=wide,
                    packed_ctrl=packed,
                    range_rows=prebuilt.get("range_rows", 0),
                    meta_in_blob=mblob,
                )
            if mblob:
                blob_all = np.asarray(out["hit_blob"])
                meta = blob_all[0, :3]
            else:
                blob_all = None
                # ONE host read answers sync + overflow (3 scalar reads =
                # 3 round trips on this rig's sync-dispatch mode)
                meta = np.asarray(out["meta"])
            n_distinct, n_hits, n_geno = int(meta[0]), int(meta[1]), int(meta[2])
            if n_hits <= max_hits and (not want_geno or n_geno <= max_geno):
                break
            # grow ONLY the overflowed budget (shrinking the other
            # recompiles for nothing)
            max_hits = max(
                max_hits, min(pad_to, 1 << max(n_hits - 1, 1).bit_length())
            )
            if want_geno:
                max_geno = max(
                    max_geno,
                    min(pad_to, 1 << max(n_geno - 1, 1).bit_length()),
                )

        from kmdiff_tpu.utils.transfer import fetch_prefix

        self.phases.add("device", time.perf_counter() - t0)
        t0 = time.perf_counter()
        blob = (
            blob_all[1 : 1 + n_hits]
            if blob_all is not None
            else fetch_prefix(out["hit_blob"], n_hits)
        )
        hit_lanes, s_c, s_k = self._unpack_blob(blob, n_lanes, wide)
        # small auxiliary outputs fetch WHOLE (one round trip; the pad
        # transfer is cheaper than fetch_prefix's slice dispatch + fetch
        # pair at these sizes). Gate on BYTES, not rows: hit_rows/geno
        # are S columns wide, so a row cap alone would let a wide cohort
        # move tens of MB of pad over the ~30-50 MB/s tunnel.
        def _aux(arr, n):
            total = 1
            for d in arr.shape:
                total *= d
            if total * arr.dtype.itemsize <= (1 << 22):
                return np.asarray(arr)[:n]
            return fetch_prefix(arr, n)

        rows_all = _aux(out["hit_rows"], n_hits) if want_rows else None
        geno_rows = _aux(out["geno_rows"], n_geno) if want_geno else None
        self.phases.add("fetch", time.perf_counter() - t0)
        return n_distinct, s_c, s_k, hit_lanes, rows_all, geno_rows

    def _dispatch_mesh(
        self, mesh, kmers_list, counts_list, sampler, want_geno, want_rows,
        wide, nbc=None,
    ):
        """Mesh-sharded merge: split this chunk's triples at k-mer key
        ranges (free — sample streams are sorted), one range per device;
        every device runs the full merge kernel on its range and only the
        psum'd counters plus survivor-sized outputs leave
        (parallel.merge_step). Range order is ascending, so concatenating
        per-device survivors reproduces the single-device output order
        byte-for-byte."""
        import jax.numpy as jnp

        from kmdiff_tpu.ops.merge_dev import build_triples, pca_threshold_u32
        from kmdiff_tpu.parallel.merge_step import (
            make_sharded_merge_step,
            put_row_sharded,
        )

        D = mesh.devices.size
        S = len(kmers_list)
        if nbc is None:
            nbc = self.nb_controls

        t0 = time.perf_counter()
        # D ascending key ranges over the concatenated first-word keys
        nonempty = [k[:, 0] for k in kmers_list if len(k)]
        if not nonempty:
            bounds = np.zeros(0, np.uint64)
        else:
            keys = np.concatenate(nonempty)
            qs = np.quantile(keys, np.linspace(0, 1, D + 1)[1:-1])
            bounds = qs.astype(np.uint64)
        range_slices = []  # per device: [(a, b) per sample]
        for c in range(D):
            lo_b = bounds[c - 1] if c > 0 else None
            hi_b = bounds[c] if c < len(bounds) else None
            per_sample = []
            for km in kmers_list:
                a = np.searchsorted(km[:, 0], lo_b) if lo_b is not None else 0
                b = np.searchsorted(km[:, 0], hi_b) if hi_b is not None else len(km)
                per_sample.append((a, b))
            range_slices.append(per_sample)

        range_n = [
            sum(b - a for a, b in per_sample) for per_sample in range_slices
        ]
        cap = 1 << max(12, (max(int(max(range_n)), 1) - 1).bit_length())

        # per-device triple arrays, concatenated into [D*cap] host buffers
        from kmdiff_tpu.ops.merge_dev import build_triples_packed, pack16_ok

        packed = not (want_rows or want_geno or wide)
        pack16 = packed and pack16_ok(counts_list)
        n_lanes = 2 * kmers_list[0].shape[1] if kmers_list else 2
        lane_bufs = [np.empty(D * cap, np.uint32) for _ in range(n_lanes)]
        sample_buf = (
            np.zeros(D, np.int32) if packed else np.empty(D * cap, np.int32)
        )
        count_buf = np.empty(D * cap, np.uint16 if pack16 else np.int32)
        for d, per_sample in enumerate(range_slices):
            sub_k = [km[a:b] for km, (a, b) in zip(kmers_list, per_sample)]
            sub_c = [ct[a:b] for ct, (a, b) in zip(counts_list, per_sample)]
            if packed:
                lanes_d, count_d, _ = build_triples_packed(
                    sub_k, sub_c, cap, nbc, pack16=pack16
                )
            else:
                lanes_d, sample_d, count_d, _ = build_triples(sub_k, sub_c, cap)
                sample_buf[d * cap : (d + 1) * cap] = sample_d
            for i in range(n_lanes):
                lane_bufs[i][d * cap : (d + 1) * cap] = lanes_d[i]
            count_buf[d * cap : (d + 1) * cap] = count_d

        geno_rate = getattr(sampler, "rate", 0.0)
        max_hits, max_geno = self._budgets(cap, want_geno, geno_rate)
        self.phases.add("build", time.perf_counter() - t0)

        t0 = time.perf_counter()
        lanes_dev = tuple(put_row_sharded(mesh, b) for b in lane_bufs)
        sample_dev = put_row_sharded(mesh, sample_buf)
        count_dev = put_row_sharded(mesh, count_buf)
        while True:
            step = make_sharded_merge_step(
                mesh, self.nb_controls, S, n_lanes, max_hits, max_geno,
                want_geno, want_rows, wide, packed,
            )
            out = step(
                lanes_dev,
                sample_dev,
                count_dev,
                jnp.float32(self.params.ratio_c),
                jnp.float32(self.params.ratio_k),
                jnp.float32(self.params.lr_min),
                jnp.uint32(pca_threshold_u32(geno_rate)),
                jnp.uint32(getattr(sampler, "seed", 0)),
            )
            meta_d = np.asarray(out["meta_d"])  # [D, 2]: one read, not 2
            n_hits_d = meta_d[:, 0]
            n_geno_d = meta_d[:, 1] if want_geno else None
            if int(n_hits_d.max()) <= max_hits and (
                not want_geno or int(n_geno_d.max()) <= max_geno
            ):
                break
            max_hits = max(
                max_hits,
                min(cap, 1 << max(int(n_hits_d.max()) - 1, 1).bit_length()),
            )
            if want_geno:
                max_geno = max(
                    max_geno,
                    min(cap, 1 << max(int(n_geno_d.max()) - 1, 1).bit_length()),
                )

        n_distinct = int(np.asarray(out["totals"])[0])
        self.phases.add("device", time.perf_counter() - t0)
        t0 = time.perf_counter()

        # gather per-device survivor slots in ascending range order
        # (parallel.merge_step.gather_row_sharded: per-shard prefix
        # fetches, survivor-sized bytes only)
        from kmdiff_tpu.parallel.merge_step import gather_row_sharded

        blob = gather_row_sharded(out["hit_blob"], D, max_hits, n_hits_d)
        hit_lanes, s_c, s_k = self._unpack_blob(blob, n_lanes, wide)
        rows_all = (
            gather_row_sharded(out["hit_rows"], D, max_hits, n_hits_d)
            if want_rows else None
        )
        geno_rows = (
            gather_row_sharded(out["geno_rows"], D, max_geno, n_geno_d)
            if want_geno else None
        )
        self.phases.add("fetch", time.perf_counter() - t0)
        return n_distinct, s_c, s_k, hit_lanes, rows_all, geno_rows


class _ChunkSamplerShim:
    """Collects per-chunk geno rows so the real sampler receives one
    partition-complete matrix (chunks arrive in ascending k-mer order)."""

    def __init__(self, real, sink: list):
        self.rate = real.rate
        self.seed = real.seed
        self._sink = sink

    def add_sampled(self, partition: int, presence: np.ndarray) -> None:
        self._sink.append(presence)


class GlobalMerge:
    """All-partition merge orchestration (reference: merge.hpp:209-432
    global_merge). Partitions run on a host thread pool: numpy merges and
    file IO overlap while device tiles queue behind a single TPU stream."""

    def __init__(
        self,
        processor: PartitionProcessor,
        accumulators: list[IAccumulator],
        nb_threads: int = 4,
        progress=None,
    ):
        self.processor = processor
        self.accs = accumulators
        self.nb_threads = max(1, nb_threads)
        self.progress = progress
        self.results: list[PartitionResult] = []

    def _run(self, jobs) -> list[PartitionResult]:
        results: list[PartitionResult | None] = [None] * len(jobs)
        lock = threading.Lock()

        def task(i, fn):
            r = fn()
            with lock:
                results[i] = r
                if self.progress is not None:
                    self.progress.tick()
            return r

        try:
            if self.nb_threads == 1:
                for i, fn in enumerate(jobs):
                    task(i, fn)
            else:
                with cf.ThreadPoolExecutor(self.nb_threads) as pool:
                    futs = [
                        pool.submit(task, i, fn) for i, fn in enumerate(jobs)
                    ]
                    for f in futs:
                        f.result()  # re-raise worker exceptions
        finally:
            self.processor.shutdown_prefetchers()
        self.results = results  # type: ignore[assignment]
        return self.results

    def merge_partitions(
        self, partition_paths: list[list[str]], only: list[int] | None = None
    ) -> int:
        """Merge all partitions, or the `only` subset (multi-process runs
        round-robin partitions across processes over the shared FS)."""
        sel = range(len(partition_paths)) if only is None else only
        jobs = [
            (lambda p=p: self.processor.process_files(
                p, partition_paths[p], self.accs[p]))
            for p in sel
        ]
        self._run(jobs)
        return self.total_kmers()

    def merge_matrices(
        self, matrix_paths: list[str], only: list[int] | None = None
    ) -> int:
        sel = range(len(matrix_paths)) if only is None else only
        jobs = [
            (lambda p=p: self.processor.process_matrix(
                p, matrix_paths[p], self.accs[p]))
            for p in sel
        ]
        self._run(jobs)
        return self.total_kmers()

    def total_kmers(self) -> int:
        return sum(r.total_kmers for r in self.results)

    def nb_sign(self) -> int:
        return sum(r.nb_sign for r in self.results)

    def signs(self) -> tuple[int, int]:
        return (
            sum(r.sign_controls for r in self.results),
            sum(r.sign_cases for r in self.results),
        )
