#!/usr/bin/env python3
"""Interleaved same-process A/B: fused run WITH group pre-aggregation
(controls/cases dedup-summed to one stream each between counting waves,
KMDIFF_GROUP_MERGE=1) vs the per-sample merge (=0). --no-count-files so
the merge effect is unconfounded by spill traffic.

Usage: python bench/groupmerge_ab.py [n_samples] [genome_log2]
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

    from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
    from kmdiff_tpu.cmd.run import main_run
    from kmdiff_tpu.core.corrector import CorrectionType
    from kmdiff_tpu.pipeline.simulate import SimOptions, simulate

    work = tempfile.mkdtemp(prefix="kmdiff_gmab_")
    try:
        simulate(SimOptions(
            output_directory=os.path.join(work, "sim"),
            genome_len=1 << glog, nb_controls=n, nb_cases=n,
            read_size=150, coverage=1, error_rate=0.001, kmer_size=31,
            seed=7,
        ))
        fof = os.path.join(work, "sim", "fof.txt")
        it = [0]
        results = {}

        def one(mode):
            os.environ["KMDIFF_GROUP_MERGE"] = mode
            rd = os.path.join(work, f"run{it[0]}")
            od = os.path.join(work, f"out{it[0]}")
            it[0] += 1
            tm = {}
            t0 = time.perf_counter()
            res = main_run(
                CountOptions(fof=fof, directory=rd, kmer_size=31,
                             hard_min=1, nb_partitions=4, nb_threads=4,
                             n_devices=1),
                DiffOptions(kmtricks_dir=rd, output_directory=od,
                            nb_controls=n, nb_cases=n, threshold=0.05,
                            correction=CorrectionType.BONFERRONI,
                            nb_threads=4, n_devices=1),
                count_files=False, timings=tm,
            )
            total = time.perf_counter() - t0
            results.setdefault(mode, res)
            assert results[mode] == res
            shutil.rmtree(rd, ignore_errors=True)
            shutil.rmtree(od, ignore_errors=True)
            return total, tm.get("count", 0), tm.get("merge", 0)

        for tag in ("1", "0"):
            t, c, m = one(tag)
            print(f"[gm] cold group={tag}: total {t:.1f}s count {c:.1f}s "
                  f"merge {m:.1f}s", flush=True)
        assert results["1"] == results["0"], (results["1"], results["0"])
        for i in range(3):
            tg, cg, mg = one("1")
            tp, cp, mp = one("0")
            print(f"[gm] pair {i}: group total {tg:.1f}s "
                  f"(count {cg:.1f} merge {mg:.2f}) vs per-sample "
                  f"total {tp:.1f}s (count {cp:.1f} merge {mp:.2f})",
                  flush=True)
        print(f"[gm] results identical: {results['1']}", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        os.environ.pop("KMDIFF_GROUP_MERGE", None)


if __name__ == "__main__":
    main()
