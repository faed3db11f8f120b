#!/usr/bin/env python3
"""Phase breakdown of the fused merge on the live chip: planning helpers
(split-lane probe, subsample, bounds searchsorted), per-chunk device
dispatch+read, and host post-processing (unpack, f64 rescore, routing).
Decides where the remaining gap to the C++ merge baseline lives."""

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

    work = tempfile.mkdtemp(prefix="kmdiff_phase_")
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
        t0 = time.perf_counter()
        streams = [
            count_sample_resident([flat_codes(p)], 31, 1, slack=M)
            for p in fasta_paths
        ]
        print(f"[phase] counted {S} samples in {time.perf_counter()-t0:.1f}s",
              flush=True)

        totals = [float(s.total_mass) for s in streams]
        model = PoissonLikelihood(n, n, totals[:n], totals[n:])

        # instrument: wrap _device_merge_chunk to time each call, and time
        # the planning window (fused_merge entry to first chunk call)
        marks = {}

        def run_once():
            proc = PartitionProcessor(model, n, n, threshold=0.05 / 1e5)
            accs = [VectorAccumulator() for _ in range(4)]
            real = PartitionProcessor._device_merge_chunk
            chunk_times = []
            t_enter = time.perf_counter()
            first = [None]

            def spy(self, *a, **k):
                if first[0] is None:
                    first[0] = time.perf_counter() - t_enter
                t = time.perf_counter()
                r = real(self, *a, **k)
                chunk_times.append(time.perf_counter() - t)
                return r

            PartitionProcessor._device_merge_chunk = spy
            try:
                t = time.perf_counter()
                res = fused_merge(proc, accs, streams, 31, 4, M=M)
                total = time.perf_counter() - t
            finally:
                PartitionProcessor._device_merge_chunk = real
            ph = proc.phases.drain()
            marks["planning"] = first[0]
            marks["chunks"] = chunk_times
            marks["phases"] = ph
            marks["total"] = total
            return res

        res = run_once()  # cold
        print(f"[phase] cold total {marks['total']:.2f}s", flush=True)
        for it in range(3):
            res = run_once()
            ct = marks["chunks"]
            print(
                f"[phase] warm {it}: total {marks['total']:.2f}s = "
                f"planning {marks['planning']:.2f}s + "
                f"{len(ct)} chunks {sum(ct):.2f}s "
                f"(each: {' '.join(f'{c:.2f}' for c in ct)}); "
                f"processor phases: "
                + " ".join(f"{k}={v:.2f}s"
                           for k, v in sorted(marks['phases'].items())),
                flush=True,
            )
        print(f"[phase] result {res}", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
