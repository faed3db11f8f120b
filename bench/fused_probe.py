#!/usr/bin/env python3
"""Quick fused-pipeline probe on the live device: popsim cohort ->
`kmdiff-tpu run` cold + warm with per-phase timings. Supplementary dev
tool behind bench.py (which reports the official JSON line).

Usage: python bench/fused_probe.py [--quick] [--count-files] [--two-stage]
"""

import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

QUICK = "--quick" in sys.argv


def main():
    from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
    from kmdiff_tpu.cmd.run import main_run
    from kmdiff_tpu.core.corrector import CorrectionType
    from kmdiff_tpu.pipeline.simulate import SimOptions, simulate

    work = tempfile.mkdtemp(prefix="kmdiff_fprobe_")
    try:
        genome = 1 << (17 if QUICK else 23)
        n_ctrl = n_case = 4 if QUICK else 10
        t0 = time.perf_counter()
        simulate(SimOptions(
            output_directory=os.path.join(work, "sim"),
            genome_len=genome, nb_controls=n_ctrl, nb_cases=n_case,
            read_size=150, coverage=1, error_rate=0.001, kmer_size=31,
            seed=7,
        ))
        print(f"[probe] cohort gen {time.perf_counter()-t0:.1f}s", flush=True)

        if "--two-stage" in sys.argv:
            from kmdiff_tpu.cmd.count import main_count
            from kmdiff_tpu.cmd.diff import main_diff

            for attempt in ("cold", "warm"):
                rd = os.path.join(work, f"ts_{attempt}")
                t0 = time.perf_counter()
                main_count(CountOptions(
                    fof=os.path.join(work, "sim", "fof.txt"), directory=rd,
                    kmer_size=31, hard_min=1, nb_partitions=4, nb_threads=4,
                ))
                t1 = time.perf_counter()
                res = main_diff(DiffOptions(
                    kmtricks_dir=rd,
                    output_directory=os.path.join(work, f"tso_{attempt}"),
                    nb_controls=n_ctrl, nb_cases=n_case, threshold=0.05,
                    correction=CorrectionType.BONFERRONI, nb_threads=4,
                ))
                print(
                    f"[probe] two-stage {attempt}: count {t1-t0:.1f}s diff "
                    f"{time.perf_counter()-t1:.1f}s "
                    f"tested {res['total_kmers']:.3e}",
                    flush=True,
                )
                shutil.rmtree(rd, ignore_errors=True)
            return

        count_files = "--count-files" in sys.argv
        for attempt in ("cold", "warm", "warm2"):
            rd = os.path.join(work, f"fused_{attempt}")
            tm = {}
            t0 = time.perf_counter()
            res = main_run(
                CountOptions(
                    fof=os.path.join(work, "sim", "fof.txt"), directory=rd,
                    kmer_size=31, hard_min=1, nb_partitions=4, nb_threads=4,
                    n_devices=1,
                ),
                DiffOptions(
                    kmtricks_dir=rd,
                    output_directory=os.path.join(work, f"fout_{attempt}"),
                    nb_controls=n_ctrl, nb_cases=n_case, threshold=0.05,
                    correction=CorrectionType.BONFERRONI, nb_threads=4,
                    n_devices=1,
                ),
                count_files=count_files,
                timings=tm,
            )
            dt = time.perf_counter() - t0
            print(
                f"[probe] fused {attempt}: total {dt:.1f}s "
                f"(count {tm.get('count', 0):.1f}s merge "
                f"{tm.get('merge', 0):.1f}s) tested "
                f"{res['total_kmers']:.3e} -> "
                f"{res['total_kmers']/dt:.3e} kmers/s, counting "
                f"{(n_ctrl+n_case)*genome/max(tm.get('count', 1e-9),1e-9):.3e}"
                f" bases/s",
                flush=True,
            )
            shutil.rmtree(rd, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
