"""`kmdiff-tpu run`: FASTA -> significant k-mers in one process.

The reference ships count and diff as separate commands mediated by the
run directory (src/cmd.cpp:27-48 forks kmtricks; diff.hpp:262-377 reads
the files back). `run` is the TPU-native single-shot equivalent: when a
single local device serves a fresh run, the counting kernels' per-sample
distinct streams stay RESIDENT on device and the merge consumes them in
place (pipeline.fused) — the count-file D2H and the merge-triple H2D
both disappear from the critical path. The kmtricks-format run dir is
still produced for resume/interop: histogram files synchronously (the
model's totals come from them), count files from background spill
threads overlapping the merge — or not at all with --no-count-files.

Outputs are byte-identical to `count` + `diff` (tests/test_fused.py).
With a multi-device mesh the merge phase key-range-shards over the
devices (pipeline.fused._make_sharded_fused_step: resident streams
replicate over ICI, each device merges its own ascending key range —
byte-identical to single-device). Any configuration the fused path
cannot serve (multi-process --distributed, custom model plugins,
resumed runs, device-memory pressure, degenerate key spaces) falls back
to the standard two-stage flow automatically — `run` is always correct,
fused when eligible.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import shutil

from kmdiff_tpu.cmd.options import CountOptions, DiffOptions, dump_options
from kmdiff_tpu.utils.logging import logger
from kmdiff_tpu.utils.timer import Timer


def _run_dir_complete(run_dir: str) -> bool:
    """True when every fof sample has its count file in every partition."""
    from kmdiff_tpu.io.kmtricks import read_fof

    fof_path = os.path.join(run_dir, "kmtricks.fof")
    counts = os.path.join(run_dir, "counts")
    if not (os.path.exists(fof_path) and os.path.isdir(counts)):
        return False
    fof = read_fof(run_dir)
    for pdir in sorted(os.listdir(counts)):
        for e in fof.entries:
            if not os.path.exists(
                os.path.join(counts, pdir, f"{e.id}.kmer.lz4")
            ):
                return False
    return True


def _standard_flow(copt: CountOptions, dopt: DiffOptions,
                   recurrence_min: int) -> dict:
    from kmdiff_tpu.cmd.count import main_count
    from kmdiff_tpu.cmd.diff import main_diff

    if not _run_dir_complete(copt.directory):
        main_count(copt, recurrence_min=recurrence_min)
    return main_diff(dopt)


def main_run(copt: CountOptions, dopt: DiffOptions,
             recurrence_min: int = 1, count_files: bool = True,
             timings: dict | None = None) -> dict:
    """timings: optional dict filled with per-phase wall seconds
    ("count", "merge", "total") when the fused path serves the run —
    bench/profiling hook; the RESULT dict stays comparable to
    main_diff's."""
    from kmdiff_tpu.parallel import runtime
    from kmdiff_tpu.parallel.distributed import is_distributed

    runtime.configure(dopt.n_devices)

    manifest = os.path.join(dopt.output_directory, "options.json")
    fused_ok = (
        not is_distributed()
        and not dopt.model_lib_path
        and os.environ.get("KMDIFF_NO_FUSED") != "1"
        and not os.path.exists(manifest)  # resumes take the standard flow
        and not _run_dir_complete(copt.directory)
    )
    if not fused_ok:
        logger.info("run: using the standard count+diff flow.")
        return _standard_flow(copt, dopt, recurrence_min)
    try:
        return _main_run_fused(copt, dopt, count_files, timings)
    except Exception as e:
        from kmdiff_tpu.pipeline.fused import FusedFallback

        # a device allocation failure (e.g. concurrent dispatch threads'
        # transient sort buffers on a near-budget cohort) is recoverable
        # exactly like a FusedFallback: the two-stage flow streams through
        # host memory instead
        oom = (type(e).__name__ == "XlaRuntimeError"
               and "RESOURCE_EXHAUSTED" in str(e))
        if not isinstance(e, FusedFallback) and not oom:
            raise
        logger.warning(
            "fused pipeline unavailable (%s); running the standard "
            "count+diff flow.", e,
        )
        return _standard_flow(copt, dopt, recurrence_min)


def _main_run_fused(copt: CountOptions, dopt: DiffOptions,
                    count_files: bool, timings: dict | None = None) -> dict:
    from kmdiff_tpu.io.fasta import flat_codes
    from kmdiff_tpu.io.kmtricks import (
        Fof,
        KmtricksConfig,
        get_total_kmer,
        hist_from_device,
        write_hist,
    )
    from kmdiff_tpu.pipeline.fused import (
        HBM_BUDGET,
        FusedFallback,
        GroupReducer,
        count_samples_resident_batched,
        fused_chunk_rows,
        fused_merge,
    )
    from kmdiff_tpu.utils.exceptions import InputError

    whole = Timer()
    fof = Fof.parse(copt.fof)
    if not fof.entries:
        raise InputError(f"{copt.fof}: empty fof")
    if dopt.nb_controls + dopt.nb_cases != len(fof.entries):
        raise InputError(
            f"cohort size mismatch: -1 {dopt.nb_controls} + -2 "
            f"{dopt.nb_cases} != fof's {len(fof.entries)} samples"
        )
    fof_dir = os.path.dirname(os.path.abspath(copt.fof))
    nb_partitions = copt.nb_partitions or 4
    run_dir = copt.directory

    # run-dir skeleton: fof, config, histograms land synchronously (totals
    # and any later resume read them); count files are the only bulk
    os.makedirs(os.path.join(run_dir, "histograms"), exist_ok=True)
    for p in range(nb_partitions):
        os.makedirs(
            os.path.join(run_dir, "counts", f"partition_{p}"), exist_ok=True
        )
    shutil.copyfile(copt.fof, os.path.join(run_dir, "kmtricks.fof"))
    with open(os.path.join(run_dir, "kmdiff-count.opt"), "w") as f:
        f.write(
            f"kmer_size={copt.kmer_size}, abundance_min={copt.hard_min}\n"
        )

    logger.info(
        "Fused pipeline: counting %d samples (k=%d) to device-resident "
        "streams.", len(fof.entries), copt.kmer_size,
    )
    count_timer = Timer()
    chunk_rows = fused_chunk_rows(len(fof.entries))
    streams: list = [None] * len(fof.entries)
    spill_pool = (
        cf.ThreadPoolExecutor(2, thread_name_prefix="kmdiff-spill")
        if count_files
        else None
    )
    spill_futs = []
    # when to run the background count-file spill relative to counting:
    #   after-count (default) — queue spills during counting, submit them
    #     once the wave loop finishes; they overlap the merge + correction
    #     phases and the post-merge tail instead of the counting phase.
    #     On sync-dispatch rigs a spill thread's D2H stream serializes
    #     against the wave loop's uploads/dispatches on the same tunnel —
    #     measured 216 s vs ~20 s counting phase in the round-4 driver
    #     capture (bench/README.md round-5 A/B).
    #   overlap — submit as each sample lands (round-3/4 behavior; right
    #     for hosts whose D2H does not contend with dispatch).
    spill_mode = os.environ.get("KMDIFF_SPILL_MODE", "after-count")
    if spill_mode not in ("overlap", "after-count"):
        logger.warning(
            "unknown KMDIFF_SPILL_MODE=%r; using 'after-count'.", spill_mode
        )
        spill_mode = "after-count"
    deferred_spills: list[tuple] = []
    hard_mins = [e.ab_min or copt.hard_min for e in fof.entries]

    # group pre-aggregation (pipeline.fused.GroupReducer): when the merge
    # will take the packed path (no popstrat/save-sk), controls and cases
    # dedup-sum toward ONE stream each on a background thread DURING
    # counting; the merge then sorts ~2 rows per distinct k-mer instead
    # of one per carrying sample. Exact integer sums: outputs
    # byte-identical (tests/test_fused.py). Default OFF on this rig: the
    # reduction is ~1.8x the flat merge's device rows, and with
    # synchronous dispatch its overlap with the upload-bound count loop
    # is capped — interleaved A/Bs (bench/groupmerge_ab.py) measured the
    # fully-reduced merge at 0.53 s vs 1.9 s flat but e2e a wash or
    # worse (12.5-20.0 s vs 12.8-22.2 s totals) once the reduction tail
    # and dispatch contention are paid. Opt-in for hosts with async
    # dispatch, where the reduction genuinely rides idle device time.
    reducer = (
        GroupReducer(dopt.nb_controls, dopt.nb_cases)
        if (os.environ.get("KMDIFF_GROUP_MERGE", "0") == "1"
            and not dopt.pop_correction
            and not dopt.save_sk
            and dopt.nb_controls >= 1 and dopt.nb_cases >= 1)
        else None
    )

    def load_codes(i: int):
        entry = fof.entries[i]
        paths = [
            p if os.path.isabs(p) else os.path.join(fof_dir, p)
            for p in entry.paths
        ]
        return [c for c in (flat_codes(p) for p in paths) if len(c)]

    def on_ready(i: int, st):
        entry = fof.entries[i]
        streams[i] = st
        # histogram fields come off the kernels' stats read (device
        # abundance cardinalities + exact window totals) — no O(distinct)
        # counts transfer; bytes match hist_from_counts on the same stream
        hist = hist_from_device(
            st.hist_uvec, st.total_mass, st.n_distinct_pre, i,
            copt.kmer_size,
        )
        write_hist(
            os.path.join(run_dir, "histograms", f"{entry.id}.hist"), hist
        )
        logger.info(
            "[%s] %d distinct k-mers (%d after hard-min=%d), resident.",
            entry.id, st.n_distinct_pre, st.U, hard_mins[i],
        )
        if spill_pool is not None:
            job = (run_dir, entry.id, i, copt.kmer_size, nb_partitions, st)
            if spill_mode == "overlap":
                spill_futs.append(spill_pool.submit(_spill_sample, *job))
            else:
                deferred_spills.append(job)
        if reducer is not None:
            reducer.add(i, st)

    # waves bound the host-resident decoded codes (a whole cohort's raw
    # streams would be GBs at scale); device traffic batches WITHIN a
    # wave (count_samples_resident_batched: grouped uploads + one stats
    # read per group), FASTA decode parallelizes across the thread pool
    WAVE = 16
    # dispatch threads WITHIN a wave: each sample's count costs an upload
    # (~290 ms fixed+bytes on the tunnel) + dispatch + stats read run
    # serially per thread; a few threads pipeline those fixed costs while
    # the wave still bounds decoded-code memory. Interleaved A/B pairs on
    # the bench rig (bench/README.md round-5): counting phase
    # 10.1/9.1/9.1 s at 1 thread vs 8.2/6.1/5.4 s at 3.
    dispatch_threads = int(os.environ.get("KMDIFF_COUNT_DISPATCH", 3))
    from kmdiff_tpu.pipeline import fused as fmod
    from kmdiff_tpu.pipeline.fused import count_sample_resident

    waves = [
        list(range(w, min(w + WAVE, len(fof.entries))))
        for w in range(0, len(fof.entries), WAVE)
    ]
    with cf.ThreadPoolExecutor(max(1, copt.nb_threads)) as pool:
        # wave N+1's FASTA decode runs on the pool while wave N counts on
        # the device — the load would otherwise serialize ahead of the
        # device phase it used to overlap in the per-thread flow
        futs = [pool.submit(load_codes, i) for i in waves[0]] if waves else []
        for w, idx in enumerate(waves):
            codes_list = [f.result() for f in futs]
            if w + 1 < len(waves):
                futs = [pool.submit(load_codes, i) for i in waves[w + 1]]
            if dispatch_threads > 1 and fmod.BATCH <= 1:

                def one(j, idx=idx, codes_list=codes_list):
                    st = count_sample_resident(
                        codes_list[j], copt.kmer_size,
                        hard_mins[idx[j]], slack=chunk_rows,
                    )
                    on_ready(idx[j], st)

                with cf.ThreadPoolExecutor(
                    dispatch_threads, thread_name_prefix="kmdiff-count"
                ) as dpool:
                    list(dpool.map(one, range(len(idx))))
            else:
                count_samples_resident_batched(
                    codes_list, copt.kmer_size,
                    [hard_mins[i] for i in idx], chunk_rows,
                    on_ready=lambda j, st, idx=idx: on_ready(idx[j], st),
                )
    resident = sum(
        st.blob.shape[0] * (4 * st.blob.shape[1] + 4) for st in streams
    )
    if reducer is not None:
        resident += reducer.resident_bytes()
    if timings is not None:
        timings["count"] = count_timer.elapsed()
    logger.info(
        "Counted %d samples in %s (%.2f GB resident).",
        len(fof.entries), count_timer.formatted(), resident / 1e9,
    )
    if resident > HBM_BUDGET:
        # streams already live; past-budget cohorts are served by the
        # two-stage flow instead of risking device OOM mid-merge. Deferred
        # spills flush first so the standard flow resumes from the
        # complete run dir instead of recounting.
        if reducer is not None:
            reducer.close()
        if spill_pool is not None:
            while deferred_spills:
                spill_futs.append(
                    spill_pool.submit(_spill_sample, *deferred_spills.pop())
                )
            for f in spill_futs:
                f.result()
            spill_pool.shutdown(wait=True)
        raise FusedFallback(
            f"resident streams {resident / 1e9:.1f} GB exceed "
            f"KMDIFF_FUSED_BYTES={HBM_BUDGET / 1e9:.1f} GB"
        )
    if spill_pool is not None and deferred_spills:
        # counting is off the tunnel now — start the background spill; it
        # overlaps the merge + correction phases and is joined at the end.
        # The queue is consumed (drained) so later cleanup paths can never
        # double-submit a sample's spill.
        while deferred_spills:
            spill_futs.append(
                spill_pool.submit(_spill_sample, *deferred_spills.pop())
            )

    # ---- diff over resident streams ---------------------------------------
    from kmdiff_tpu.cmd.diff import _make_accumulators, do_correction
    from kmdiff_tpu.core.model import PoissonLikelihood
    from kmdiff_tpu.pipeline.merge import PartitionProcessor

    config = KmtricksConfig(
        kmer_size=copt.kmer_size,
        abundance_min=copt.hard_min,
        nb_partitions=nb_partitions,
    )
    os.makedirs(dopt.output_directory, exist_ok=True)
    part_dir = os.path.join(dopt.output_directory, "partitions")
    os.makedirs(part_dir, exist_ok=True)

    total_controls, total_cases = get_total_kmer(
        run_dir, dopt.nb_controls, dopt.nb_cases, config.abundance_min
    )
    model = PoissonLikelihood(
        dopt.nb_controls, dopt.nb_cases, total_controls, total_cases,
        dopt.log_size,
    )

    sampler = None
    pop_dir = ""
    if dopt.pop_correction:
        from kmdiff_tpu.pipeline.popstrat import GenoSampler

        pop_dir = os.path.join(dopt.output_directory, "popstrat")
        os.makedirs(pop_dir, exist_ok=True)
        sampler = GenoSampler(
            pop_dir, dopt.kmer_pca, dopt.seed,
            dopt.nb_controls + dopt.nb_cases,
        )
    nb_samples = (
        (dopt.nb_controls + dopt.nb_cases) if dopt.pop_correction else 0
    )
    save_dir = None
    if dopt.save_sk:
        save_dir = os.path.join(
            dopt.output_directory, "positive_kmer_matrix", "matrices"
        )
        os.makedirs(save_dir, exist_ok=True)

    processor = PartitionProcessor(
        model,
        dopt.nb_controls,
        dopt.nb_cases,
        threshold=dopt.threshold / dopt.cutoff,
        keep_counts=dopt.pop_correction,
        sampler=sampler,
        save_matrix_path=save_dir,
    )
    accumulators = _make_accumulators(
        dopt, nb_partitions, copt.kmer_size, part_dir,
        read=False, nb_samples=nb_samples,
    )

    def _abort_cleanup():
        """A post-count FusedFallback hands control to the standard
        flow, which re-reads (or rebuilds) the run dir — in-flight spill
        threads and the reducer worker must be fully drained first or
        main_count would race the spill writers over the same count
        files."""
        if reducer is not None:
            reducer.close()
        if spill_pool is not None:
            while deferred_spills:
                spill_futs.append(
                    spill_pool.submit(_spill_sample, *deferred_spills.pop())
                )
            for f in spill_futs:
                f.result()
            spill_pool.shutdown(wait=True)

    merge_timer = Timer()
    logger.info("Process resident streams")
    # pick the merge input: the reducer's 2 group streams when available
    # (u32 group sums stay exact only while cohort mass fits — the same
    # wide-sums bound the packed kernel has), else the per-sample streams
    merge_streams, merge_M, nb_ctrl_streams = streams, chunk_rows, None
    if reducer is not None and processor.params.wide_sums:
        reducer.close()
        reducer = None
    if reducer is not None:
        group_streams = reducer.result()
        if group_streams is not None:
            ctrl_list, case_list = group_streams
            merge_streams = ctrl_list + case_list
            merge_M = None  # sized for the reduced stream count
            nb_ctrl_streams = len(ctrl_list)
            logger.info(
                "Group-reduced streams: %d control + %d case "
                "(%d distinct rows).",
                len(ctrl_list), len(case_list),
                sum(s.U for s in merge_streams),
            )
        elif reducer.failed:
            logger.info(
                "group pre-aggregation unavailable (%s); merging "
                "per-sample streams.", reducer.failed,
            )
    try:
        total_kmers, nb_sign, sign_controls, sign_cases = fused_merge(
            processor, accumulators, merge_streams, copt.kmer_size,
            nb_partitions, sampler=sampler, save_matrix_dir=save_dir,
            M=merge_M, nb_ctrl_streams=nb_ctrl_streams,
        )
    except FusedFallback:
        _abort_cleanup()
        raise
    del merge_streams
    if sampler is not None:
        sampler.close()
    del streams  # release device memory before popstrat kernels
    reducer = None  # and the group partials
    dopt.total_kmers = total_kmers
    if timings is not None:
        timings["merge"] = merge_timer.elapsed()
    logger.info("Partitions processed (%s)", merge_timer.formatted())
    logger.info("%d/%d significant k-mers.", nb_sign, total_kmers)
    logger.info(
        "Before correction: %d (control), %d (case).",
        sign_controls, sign_cases,
    )

    dump_options(dopt, os.path.join(dopt.output_directory, "options.json"))

    if dopt.pop_correction:
        from kmdiff_tpu.pipeline.popstrat import do_pop

        accumulators = do_pop(dopt, config, accumulators, pop_dir, part_dir)

    counts = do_correction(dopt, config, accumulators, total_kmers)
    for acc in accumulators:
        acc.destroy()

    if spill_pool is not None:
        for f in spill_futs:
            f.result()  # surface spill errors; usually long done
        spill_pool.shutdown(wait=True)

    from kmdiff_tpu.utils.rss import get_peak_rss_mb

    if timings is not None:
        timings["total"] = whole.elapsed()
    logger.info(
        "Done in %s, Peak RSS -> %d MB.", whole.formatted(),
        get_peak_rss_mb(),
    )
    return {
        "total_kmers": total_kmers,
        "control": counts[0],
        "case": counts[1],
    }


def _spill_sample(run_dir, entry_id, i, kmer_size, nb_partitions, st):
    """Background run-dir spill: fetch one resident stream and write its
    per-partition count files (off the merge's critical path)."""
    from kmdiff_tpu.pipeline.count import (
        _fetch_counted,
        write_sample_count_files,
    )

    kmers, parts, counts = _fetch_counted(
        st.U, st.blob, st.counts, nb_partitions, st.max_count
    )
    write_sample_count_files(
        run_dir, entry_id, i, kmer_size, nb_partitions, kmers, parts, counts
    )
