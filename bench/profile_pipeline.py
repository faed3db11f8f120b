#!/usr/bin/env python3
"""Per-phase wall-time profile of the end-to-end pipeline on the chip.

Produces the phase table that explains the kernel->pipeline gap: per
partition decode/build/device/fetch (pipeline.merge PartitionProcessor
phase timers, DEBUG level) plus the count/diff stage splits. Same cohort
and flow as bench.py's measure_pipeline.

Usage: python bench/profile_pipeline.py [--quick]
"""

from __future__ import annotations

import os
import re
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

QUICK = "--quick" in sys.argv


def main() -> None:
    import logging
    import shutil
    import tempfile
    from collections import defaultdict

    from kmdiff_tpu.cmd.count import main_count
    from kmdiff_tpu.cmd.diff import main_diff
    from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
    from kmdiff_tpu.core.corrector import CorrectionType
    from kmdiff_tpu.pipeline.simulate import SimOptions, simulate
    from kmdiff_tpu.utils.logging import logger

    logger.setLevel(logging.DEBUG)
    for h in logger.handlers:
        h.setLevel(logging.DEBUG)

    # capture the per-partition phase lines
    phases = defaultdict(float)

    class PhaseGrab(logging.Handler):
        def emit(self, record):
            m = record.getMessage()
            if "phases:" in m:
                for k, v in re.findall(r"(\w+)=([0-9.]+)s", m):
                    phases[k] += float(v)

    logger.addHandler(PhaseGrab())

    work = tempfile.mkdtemp(prefix="kmdiff_prof_")
    try:
        genome = 1 << (17 if QUICK else 23)
        n = 4 if QUICK else 10
        simulate(SimOptions(
            output_directory=os.path.join(work, "sim"),
            genome_len=genome, nb_controls=n, nb_cases=n,
            read_size=150, coverage=1, error_rate=0.001, kmer_size=31,
            seed=7,
        ))
        for attempt in ("cold", "warm"):
            phases.clear()
            run_dir = os.path.join(work, f"run_{attempt}")
            t0 = time.perf_counter()
            main_count(CountOptions(
                fof=os.path.join(work, "sim", "fof.txt"), directory=run_dir,
                kmer_size=31, hard_min=1, nb_partitions=4, nb_threads=4,
            ))
            t1 = time.perf_counter()
            res = main_diff(DiffOptions(
                kmtricks_dir=run_dir,
                output_directory=os.path.join(work, f"out_{attempt}"),
                nb_controls=n, nb_cases=n, threshold=0.05,
                correction=CorrectionType.BONFERRONI, nb_threads=4,
            ))
            t2 = time.perf_counter()
            print(f"== {attempt}: count {t1 - t0:.1f}s diff {t2 - t1:.1f}s "
                  f"tested {res['total_kmers']:.3e}", flush=True)
            tot = sum(phases.values())
            print(f"   merge phases (thread-seconds, sum {tot:.1f}s): "
                  + " ".join(f"{k}={v:.1f}s" for k, v in
                             sorted(phases.items(), key=lambda x: -x[1])),
                  flush=True)
            print(f"   diff rate: {res['total_kmers'] / (t2 - t1):.3e} "
                  f"kmers tested/s", flush=True)
            shutil.rmtree(run_dir, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
