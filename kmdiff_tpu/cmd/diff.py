"""`kmdiff-tpu diff`: the full differential analysis pipeline.

Reference: include/kmdiff/cmd/diff.hpp:52-377 (do_diff / do_pop /
do_correction / main_diff). Stages:

  1. load run-dir config + per-sample totals (histograms)
  2. resume detection against the options manifest + spilled partitions
  3. per-partition merge + vectorized Poisson LRT filter (pipeline.merge)
  4. optional population-stratification correction (pipeline.popstrat)
  5. multiple-testing correction + control/case FASTA|KFF (pipeline.aggregate)
"""

from __future__ import annotations

import os

from kmdiff_tpu.cmd.options import (
    REDO_MERGE,
    REDO_POP,
    DiffOptions,
    compare_options,
    dump_options,
    load_options,
)
from kmdiff_tpu.core.corrector import make_corrector
from kmdiff_tpu.core.model import PoissonLikelihood
from kmdiff_tpu.io.accumulator import FileAccumulator, partitions_exist
from kmdiff_tpu.io.kmtricks import (
    get_matrix_paths,
    get_partition_paths,
    get_total_kmer,
    read_config,
)
from kmdiff_tpu.pipeline.aggregate import Aggregator
from kmdiff_tpu.pipeline.merge import GlobalMerge, PartitionProcessor
from kmdiff_tpu.utils.logging import logger
from kmdiff_tpu.utils.timer import Timer


def _make_accumulators(opt: DiffOptions, nb_partitions: int, kmer_size: int,
                       part_dir: str, read: bool, nb_samples: int = 0):
    if opt.in_memory and not read:
        # -m/--in-memory: keep significant k-mers in RAM, no spill files.
        # The reference PARSES this flag but never acts on it (diff.hpp
        # creates FileAccumulators unconditionally); here it works as
        # documented. Resume needs spills, so it is unavailable in this
        # mode (nothing to probe on rerun).
        from kmdiff_tpu.io.accumulator import VectorAccumulator

        return [VectorAccumulator() for _ in range(nb_partitions)]
    return [
        FileAccumulator(
            os.path.join(part_dir, f"p{i}_uncorrected"),
            kmer_size,
            read=read,
            delete_on_destroy=not opt.keep_tmp,
            nb_samples=nb_samples,
        )
        for i in range(nb_partitions)
    ]


def do_diff(opt: DiffOptions, config, part_dir: str, accumulators, sampler=None,
            owned: list[int] | None = None) -> int:
    """Merge + test stage (reference: diff.hpp:66-164). `owned` restricts
    this process to its round-robin partition share under multi-process
    runs; counters reduce globally."""
    timer = Timer()
    logger.info("Process partitions")

    matrix_paths = get_matrix_paths(opt.kmtricks_dir)
    total_controls, total_cases = get_total_kmer(
        opt.kmtricks_dir, opt.nb_controls, opt.nb_cases, config.abundance_min
    )
    logger.debug("Nb k-mers controls: %s", total_controls)
    logger.debug("Nb k-mers cases: %s", total_cases)

    if opt.model_lib_path:
        from kmdiff_tpu.plugins import load_model_plugin

        if opt.pop_correction:
            logger.warning(
                "population stratification correction disabled with custom models."
            )
            opt.pop_correction = False
        model = load_model_plugin(opt.model_lib_path, opt.model_config)
    else:
        model = PoissonLikelihood(
            opt.nb_controls, opt.nb_cases, total_controls, total_cases, opt.log_size
        )

    save_dir = None
    if opt.save_sk:
        save_dir = os.path.join(opt.output_directory, "positive_kmer_matrix", "matrices")
        os.makedirs(save_dir, exist_ok=True)

    processor = PartitionProcessor(
        model,
        opt.nb_controls,
        opt.nb_cases,
        threshold=opt.threshold / opt.cutoff,
        keep_counts=opt.pop_correction,
        sampler=sampler,
        save_matrix_path=save_dir,
    )
    from kmdiff_tpu.utils.progress import get_progress_bar

    n_jobs = config.nb_partitions if owned is None else len(owned)
    merger = GlobalMerge(
        processor, accumulators, nb_threads=opt.nb_threads,
        progress=get_progress_bar("progress", n_jobs),
    )

    if matrix_paths:
        total_kmers = merger.merge_matrices(matrix_paths, only=owned)
    else:
        part_paths = get_partition_paths(opt.kmtricks_dir, config.nb_partitions)
        total_kmers = merger.merge_partitions(part_paths, only=owned)

    sign_controls, sign_cases = merger.signs()
    nb_sign = merger.nb_sign()
    if owned is not None:
        from kmdiff_tpu.parallel.distributed import global_sum

        total_kmers, nb_sign, sign_controls, sign_cases = global_sum(
            [total_kmers, nb_sign, sign_controls, sign_cases]
        )
    logger.info("Partitions processed (%s)", timer.formatted())
    logger.info("%d/%d significant k-mers.", nb_sign, total_kmers)
    logger.info(
        "Before correction: %d (control), %d (case).", sign_controls, sign_cases
    )
    return total_kmers


def do_correction(opt: DiffOptions, config, accumulators, total_kmers: int) -> tuple[int, int]:
    """Correction + output stage (reference: diff.hpp:227-260)."""
    timer = Timer()
    if opt.correction.name == "NOTHING":
        logger.info("Aggregate partitions...")
    else:
        logger.info("Aggregate partitions and apply significance correction...")

    from kmdiff_tpu.utils.progress import get_progress_bar

    corrector = make_corrector(opt.correction, opt.threshold, total_kmers)
    agg = Aggregator(
        accumulators,
        corrector,
        config.kmer_size,
        opt.output_directory,
        kff=opt.kff,
        threshold=opt.threshold,
        total_kmers=total_kmers,
        progress=get_progress_bar("progress", config.nb_partitions),
    )
    agg.run()
    c_controls, c_cases = agg.counts()
    logger.info("Partitions aggregated (%s)", timer.formatted())
    logger.info("Significant k-mers: %d (control), %d (case).", c_controls, c_cases)
    return c_controls, c_cases


def main_diff(opt: DiffOptions) -> dict:
    """Orchestrator with resume (reference: diff.hpp:262-377)."""
    from kmdiff_tpu.io.kmtricks import read_fof
    from kmdiff_tpu.utils.exceptions import InputError

    from kmdiff_tpu.parallel import runtime
    from kmdiff_tpu.parallel.distributed import is_distributed

    runtime.configure(opt.n_devices)
    whole = Timer()
    config = read_config(opt.kmtricks_dir)

    n_fof = len(read_fof(opt.kmtricks_dir))
    if opt.nb_controls + opt.nb_cases != n_fof:
        raise InputError(
            f"cohort size mismatch: -1 {opt.nb_controls} + -2 {opt.nb_cases} "
            f"= {opt.nb_controls + opt.nb_cases}, but the run dir's fof has "
            f"{n_fof} samples"
        )

    if is_distributed():
        return _main_diff_distributed(opt, config, whole)

    os.makedirs(opt.output_directory, exist_ok=True)
    part_dir = os.path.join(opt.output_directory, "partitions")
    os.makedirs(part_dir, exist_ok=True)
    manifest = os.path.join(opt.output_directory, "options.json")

    action = 0
    prev_1 = prev_2 = prev_f = False
    prev_opt = None
    if os.path.exists(manifest):
        prev_opt = load_options(manifest)
        action = compare_options(opt, prev_opt)
        prev_1 = partitions_exist("{}/p{}_uncorrected", config.nb_partitions, part_dir)
        prev_2 = partitions_exist(
            "{}/p{}_popstrat_uncorrected", config.nb_partitions, part_dir
        )
        ext = "kff" if opt.kff else "fasta"
        prev_f = os.path.exists(
            os.path.join(opt.output_directory, f"control_kmers.{ext}")
        ) and os.path.exists(os.path.join(opt.output_directory, f"case_kmers.{ext}"))
        logger.debug("resume: prev1=%s prev2=%s prevf=%s action=%d",
                     prev_1, prev_2, prev_f, action)

    sampler = None
    pop_dir = ""
    if opt.pop_correction:
        pop_dir = os.path.join(opt.output_directory, "popstrat")
        os.makedirs(pop_dir, exist_ok=True)

    nb_samples = (opt.nb_controls + opt.nb_cases) if opt.pop_correction else 0

    redo_c = False
    if not prev_1 or (action & REDO_MERGE):
        if opt.pop_correction:
            from kmdiff_tpu.pipeline.popstrat import GenoSampler

            sampler = GenoSampler(
                pop_dir, opt.kmer_pca, opt.seed, opt.nb_controls + opt.nb_cases
            )
        accumulators = _make_accumulators(
            opt, config.nb_partitions, config.kmer_size, part_dir,
            read=False, nb_samples=nb_samples,
        )
        opt.total_kmers = do_diff(opt, config, part_dir, accumulators, sampler)
        redo_c = True
        if sampler is not None:
            sampler.close()
    else:
        opt.total_kmers = prev_opt.total_kmers
        accumulators = _make_accumulators(
            opt, config.nb_partitions, config.kmer_size, part_dir,
            read=True, nb_samples=nb_samples,
        )

    dump_options(opt, manifest)

    if opt.pop_correction and (
        (not prev_2 or (action & REDO_POP)) or ((action & REDO_MERGE) or not prev_1)
    ):
        from kmdiff_tpu.pipeline.popstrat import do_pop

        accumulators = do_pop(opt, config, accumulators, pop_dir, part_dir)
        redo_c = True
    elif opt.pop_correction and prev_2:
        # resume with intact popstrat spills: aggregate the CORRECTED hits
        # (the reference keeps aggregating the uncorrected accumulators
        # here — diff.hpp:355-364 never re-points them — which silently
        # drops the correction; fixed)
        for acc in accumulators:
            acc.destroy()
        accumulators = [
            FileAccumulator(
                os.path.join(part_dir, f"p{i}_popstrat_uncorrected"),
                config.kmer_size,
                read=True,
                delete_on_destroy=not opt.keep_tmp,
                nb_samples=nb_samples,
            )
            for i in range(config.nb_partitions)
        ]

    counts = (0, 0)
    if (not prev_f or action > 0) or redo_c:
        counts = do_correction(opt, config, accumulators, opt.total_kmers)

    for acc in accumulators:
        acc.destroy()

    from kmdiff_tpu.utils.rss import get_peak_rss_mb

    logger.info("Done in %s, Peak RSS -> %d MB.", whole.formatted(), get_peak_rss_mb())
    return {
        "total_kmers": opt.total_kmers,
        "control": counts[0],
        "case": counts[1],
    }


def _main_diff_distributed(opt: DiffOptions, config, whole: Timer) -> dict:
    """Multi-process diff over a shared filesystem: partitions round-robin
    across processes for BOTH heavy stages — the merge and the popstrat
    correction — with barriers at the filesystem handoffs; the primary
    fits the shared null model (PCA + null logistic fit, once) and runs
    the final aggregation/output. Resume follows the same manifest/spill
    probing as single-process runs (each process derives the identical
    redo decision from the shared filesystem state).

    This is the multi-host translation of the reference's single-node
    thread pool over partitions (merge.hpp:237-317, popstrat.hpp:212-238):
    DCN only carries the barriers and the psum'd counters; every bulk byte
    moves through the shared filesystem exactly like the reference's run
    dirs."""
    import jax

    from kmdiff_tpu.parallel.distributed import (
        barrier,
        is_primary,
        owned_partitions,
    )

    pid = jax.process_index()
    os.makedirs(opt.output_directory, exist_ok=True)
    part_dir = os.path.join(opt.output_directory, "partitions")
    os.makedirs(part_dir, exist_ok=True)
    manifest = os.path.join(opt.output_directory, "options.json")
    owned = owned_partitions(config.nb_partitions)
    nb_samples = (opt.nb_controls + opt.nb_cases) if opt.pop_correction else 0
    logger.info("distributed diff: process %d owns partitions %s", pid, owned)

    # resume detection: identical inputs (shared manifest + spill probes)
    # on every process -> identical redo decision, no coordination needed
    action = 0
    prev_1 = prev_2 = prev_f = False
    prev_opt = None
    if os.path.exists(manifest):
        prev_opt = load_options(manifest)
        action = compare_options(opt, prev_opt)
        prev_1 = partitions_exist("{}/p{}_uncorrected", config.nb_partitions, part_dir)
        prev_2 = partitions_exist(
            "{}/p{}_popstrat_uncorrected", config.nb_partitions, part_dir
        )
        ext = "kff" if opt.kff else "fasta"
        prev_f = os.path.exists(
            os.path.join(opt.output_directory, f"control_kmers.{ext}")
        ) and os.path.exists(os.path.join(opt.output_directory, f"case_kmers.{ext}"))
        logger.debug("resume: prev1=%s prev2=%s prevf=%s action=%d",
                     prev_1, prev_2, prev_f, action)

    pop_dir = ""
    if opt.pop_correction:
        pop_dir = os.path.join(opt.output_directory, "popstrat")
        os.makedirs(pop_dir, exist_ok=True)

    redo_merge = (not prev_1) or bool(action & REDO_MERGE)
    if redo_merge:
        sampler = None
        if opt.pop_correction:
            from kmdiff_tpu.pipeline.popstrat import GenoSampler

            sampler = GenoSampler(
                pop_dir, opt.kmer_pca, opt.seed, opt.nb_controls + opt.nb_cases
            )
        accumulators: list = [None] * config.nb_partitions
        for p in owned:
            accumulators[p] = FileAccumulator(
                os.path.join(part_dir, f"p{p}_uncorrected"),
                config.kmer_size,
                read=False,
                delete_on_destroy=False,
                nb_samples=nb_samples,
            )
        opt.total_kmers = do_diff(
            opt, config, part_dir, accumulators, sampler, owned=owned
        )
        if sampler is not None:
            sampler.close_parts()
        for p in owned:
            accumulators[p].destroy()  # close; spills stay on the shared fs
    else:
        opt.total_kmers = prev_opt.total_kmers
        logger.info("process %d: merge stage resumed from spills.", pid)

    barrier("merge_done")
    if is_primary():
        dump_options(opt, manifest)

    redo_pop = opt.pop_correction and (
        (not prev_2) or bool(action & REDO_POP) or redo_merge
    )
    if redo_pop:
        from kmdiff_tpu.pipeline.popstrat import (
            GenoSampler,
            correct_partitions_pipelined,
            fit_corrector,
            load_corrector,
        )

        corr = None
        if is_primary():
            # assemble whenever the assembled geno matrix is absent — not
            # only when this run redid the merge: a crash between the
            # merge_done barrier and assembly would otherwise resume with
            # redo_merge=False and fail on the missing file
            geno_file = os.path.join(pop_dir, "gwas_eigenstratX.geno")
            if redo_merge or not os.path.exists(geno_file):
                GenoSampler.assemble_parts(
                    pop_dir, config.nb_partitions, opt.nb_controls + opt.nb_cases
                )
            corr = fit_corrector(opt, config, pop_dir)
        barrier("pop_null_ready")
        if corr is None:
            corr = load_corrector(opt, config, pop_dir)
        pairs = []
        for p in owned:
            acc = FileAccumulator(
                os.path.join(part_dir, f"p{p}_uncorrected"),
                config.kmer_size,
                read=True,
                delete_on_destroy=False,
                nb_samples=nb_samples,
            )
            pacc = FileAccumulator(
                os.path.join(part_dir, f"p{p}_popstrat_uncorrected"),
                config.kmer_size,
                read=False,
                delete_on_destroy=False,
                nb_samples=nb_samples,
            )
            pairs.append((acc, pacc))
        correct_partitions_pipelined(corr, pairs)
        logger.info("process %d: popstrat corrected partitions %s.", pid, owned)
        barrier("popstrat_done")

    if not is_primary():
        logger.info("process %d done in %s.", pid, whole.formatted())
        return {"total_kmers": opt.total_kmers, "control": 0, "case": 0,
                "primary": False}

    spill_fmt = (
        "p{}_popstrat_uncorrected" if opt.pop_correction else "p{}_uncorrected"
    )
    accumulators = [
        FileAccumulator(
            os.path.join(part_dir, spill_fmt.format(p)),
            config.kmer_size,
            read=True,
            delete_on_destroy=False,
            nb_samples=nb_samples,
        )
        for p in range(config.nb_partitions)
    ]

    counts = (0, 0)
    if (not prev_f or action > 0) or redo_merge or redo_pop:
        counts = do_correction(opt, config, accumulators, opt.total_kmers)
    for acc in accumulators:
        acc.destroy()
    if not opt.keep_tmp:
        for p in range(config.nb_partitions):
            for name in (f"p{p}_uncorrected", f"p{p}_popstrat_uncorrected"):
                path = os.path.join(part_dir, name)
                if os.path.exists(path):
                    os.remove(path)

    from kmdiff_tpu.utils.rss import get_peak_rss_mb

    logger.info("Done in %s, Peak RSS -> %d MB.", whole.formatted(),
                get_peak_rss_mb())
    return {
        "total_kmers": opt.total_kmers,
        "control": counts[0],
        "case": counts[1],
        "primary": True,
    }
