#!/usr/bin/env python3
"""Interleaved same-process A/B: fused merge with GROUPED chunk dispatches
(KMDIFF_FUSED_CHUNK_GROUP=W: W key-range chunks per jitted program, one
host read per group) vs per-chunk dispatches (W=1).

The bench-cohort merge phase spends ~1.4 s of ~2.0 s in per-chunk
dispatch+read round trips on the tunnel rig (bench/README.md round-4
roofline); grouping divides that term by W. Counts once, then alternates
merge passes A/B/A/B in one process (the only trustworthy comparison on
this rig — adjacent-process runs drift 2-5x).

Usage: python bench/group_ab.py [W] [n_samples] [genome_log2]
"""

import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    glog = int(sys.argv[3]) if len(sys.argv) > 3 else 23

    from kmdiff_tpu.core.model import PoissonLikelihood
    from kmdiff_tpu.io.accumulator import VectorAccumulator
    from kmdiff_tpu.io.fasta import flat_codes
    from kmdiff_tpu.pipeline import fused as fmod
    from kmdiff_tpu.pipeline.fused import (
        count_sample_resident,
        fused_chunk_rows,
        fused_merge,
    )
    from kmdiff_tpu.pipeline.merge import PartitionProcessor
    from kmdiff_tpu.pipeline.simulate import SimOptions, simulate

    work = tempfile.mkdtemp(prefix="kmdiff_groupab_")
    try:
        simulate(SimOptions(
            output_directory=os.path.join(work, "sim"),
            genome_len=1 << glog, nb_controls=n, nb_cases=n,
            read_size=150, coverage=1, error_rate=0.001, kmer_size=31,
            seed=7,
        ))
        fasta_paths = []
        with open(os.path.join(work, "sim", "fof.txt")) as f:
            for line in f:
                if ":" in line:
                    fasta_paths.append(
                        line.partition(":")[2].partition("!")[0].strip())
        S = len(fasta_paths)
        M = fused_chunk_rows(S)
        print(f"[ab] counting {S} samples ({1 << glog} bp each) to "
              f"resident streams (M={M})...", flush=True)
        t0 = time.perf_counter()
        streams = [
            count_sample_resident([flat_codes(p)], 31, 1, slack=M)
            for p in fasta_paths
        ]
        print(f"[ab] counted in {time.perf_counter()-t0:.1f}s; "
              f"U={[s.U for s in streams[:3]]}...", flush=True)

        totals = [float(s.total_mass) for s in streams]
        model = PoissonLikelihood(n, n, totals[:n], totals[n:])

        def one_merge(group):
            saved = fmod.CHUNK_GROUP
            fmod.CHUNK_GROUP = group
            try:
                proc = PartitionProcessor(
                    model, n, n, threshold=0.05 / 1e5,
                )
                accs = [VectorAccumulator() for _ in range(4)]
                t = time.perf_counter()
                res = fused_merge(proc, accs, streams, 31, 4, M=M)
                dt = time.perf_counter() - t
                return dt, res
            finally:
                fmod.CHUNK_GROUP = saved

        # compile both variants first (cold), then interleave
        print("[ab] compiling...", flush=True)
        dt, res1 = one_merge(1)
        print(f"[ab] cold W=1: {dt:.2f}s {res1}", flush=True)
        dt, resW = one_merge(W)
        print(f"[ab] cold W={W}: {dt:.2f}s {resW}", flush=True)
        assert res1 == resW, f"results diverge: {res1} vs {resW}"

        pairs = []
        for it in range(3):
            dt1, r1 = one_merge(1)
            dtW, rW = one_merge(W)
            assert r1 == rW == res1
            pairs.append((dt1, dtW))
            print(f"[ab] pair {it}: W=1 {dt1:.2f}s vs W={W} {dtW:.2f}s "
                  f"({dt1/dtW:.2f}x)", flush=True)
        import statistics

        m1 = statistics.median(p[0] for p in pairs)
        mW = statistics.median(p[1] for p in pairs)
        print(f"[ab] median: W=1 {m1:.2f}s, W={W} {mW:.2f}s -> "
              f"grouped is {m1/mW:.2f}x faster "
              f"(tested {res1[0]} kmers, {res1[1]} significant)", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
