#!/usr/bin/env python3
"""Interleaved same-process A/B: two-stage diff with host group pre-sum
(KMDIFF_GROUP_SUM=1: controls/cases k-way-summed on host before upload,
~dup-factor fewer H2D bytes + device rows) vs the per-sample upload (=0).

Usage: python bench/groupsum_ab.py [n_samples] [genome_log2]
"""

import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    glog = int(sys.argv[2]) if len(sys.argv) > 2 else 23

    from kmdiff_tpu.cmd.count import main_count
    from kmdiff_tpu.cmd.diff import main_diff
    from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
    from kmdiff_tpu.core.corrector import CorrectionType
    from kmdiff_tpu.pipeline.simulate import SimOptions, simulate

    work = tempfile.mkdtemp(prefix="kmdiff_gsab_")
    try:
        simulate(SimOptions(
            output_directory=os.path.join(work, "sim"),
            genome_len=1 << glog, nb_controls=n, nb_cases=n,
            read_size=150, coverage=1, error_rate=0.001, kmer_size=31,
            seed=7,
        ))
        fof = os.path.join(work, "sim", "fof.txt")
        run_dir = os.path.join(work, "run")
        t0 = time.perf_counter()
        main_count(CountOptions(
            fof=fof, directory=run_dir, kmer_size=31, hard_min=1,
            nb_partitions=4, nb_threads=4, n_devices=1,
        ))
        print(f"[gs] counted in {time.perf_counter()-t0:.1f}s", flush=True)
        it = [0]
        results = {}

        def one(mode):
            os.environ["KMDIFF_GROUP_SUM"] = mode
            od = os.path.join(work, f"out{it[0]}")
            it[0] += 1
            t0 = time.perf_counter()
            res = main_diff(DiffOptions(
                kmtricks_dir=run_dir, output_directory=od,
                nb_controls=n, nb_cases=n, threshold=0.05,
                correction=CorrectionType.BONFERRONI, nb_threads=4,
                n_devices=1,
            ))
            dt = time.perf_counter() - t0
            results.setdefault(mode, res)
            assert results[mode] == res
            shutil.rmtree(od, ignore_errors=True)
            return dt

        for tag in ("1", "0"):
            print(f"[gs] cold group-sum={tag}: {one(tag):.1f}s", flush=True)
        assert results["1"] == results["0"]
        for i in range(3):
            tg = one("1")
            tp = one("0")
            print(f"[gs] pair {i}: group-sum {tg:.1f}s vs per-sample "
                  f"{tp:.1f}s ({tp/tg:.2f}x)", flush=True)
        print(f"[gs] results identical: {results['1']}", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        os.environ.pop("KMDIFF_GROUP_SUM", None)


if __name__ == "__main__":
    main()
