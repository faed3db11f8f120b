#!/usr/bin/env python3
"""Interleaved same-process A/B for the fused run's count-file spill
scheduling (KMDIFF_SPILL_MODE): 'overlap' submits each sample's run-dir
spill as it lands (its D2H fetch then shares the tunnel with the wave
loop's uploads/dispatches), 'after-count' defers submission until the
counting phase is off the tunnel.

Context: the round-4 driver capture recorded the with-files fused pass at
216 s (counting 188.9 s) vs 42-61 s in round 3 — 4x beyond rig drift.
Prime suspect is the spill/count tunnel contention; this probe measures
it the only trustworthy way on this rig (interleaved, one process).

Usage: python bench/spill_ab.py [n_samples] [genome_log2]
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

    work = tempfile.mkdtemp(prefix="kmdiff_spillab_")
    try:
        simulate(SimOptions(
            output_directory=os.path.join(work, "sim"),
            genome_len=1 << glog, nb_controls=n, nb_cases=n,
            read_size=150, coverage=1, error_rate=0.001, kmer_size=31,
            seed=7,
        ))
        fof = os.path.join(work, "sim", "fof.txt")
        it = [0]

        def one(mode):
            os.environ["KMDIFF_SPILL_MODE"] = mode
            rd = os.path.join(work, f"run{it[0]}")
            od = os.path.join(work, f"out{it[0]}")
            it[0] += 1
            tm = {}
            t0 = time.perf_counter()
            main_run(
                CountOptions(fof=fof, directory=rd, kmer_size=31,
                             hard_min=1, nb_partitions=4, nb_threads=4,
                             n_devices=1),
                DiffOptions(kmtricks_dir=rd, output_directory=od,
                            nb_controls=n, nb_cases=n, threshold=0.05,
                            correction=CorrectionType.BONFERRONI,
                            nb_threads=4, n_devices=1),
                count_files=True, timings=tm,
            )
            total = time.perf_counter() - t0
            shutil.rmtree(rd, ignore_errors=True)
            shutil.rmtree(od, ignore_errors=True)
            return total, tm.get("count", 0), tm.get("merge", 0)

        print("[spill] cold (compiles)...", flush=True)
        t, c, m = one("after-count")
        print(f"[spill] cold after-count: total {t:.1f}s count {c:.1f}s "
              f"merge {m:.1f}s", flush=True)
        for i in range(3):
            to, co, mo = one("overlap")
            ta, ca, ma = one("after-count")
            print(f"[spill] pair {i}: overlap total {to:.1f}s "
                  f"(count {co:.1f} merge {mo:.1f}) vs after-count "
                  f"total {ta:.1f}s (count {ca:.1f} merge {ma:.1f})",
                  flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        os.environ.pop("KMDIFF_SPILL_MODE", None)


if __name__ == "__main__":
    main()
