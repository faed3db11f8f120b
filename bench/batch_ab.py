#!/usr/bin/env python3
"""Interleaved A/B of the fused counting batch (grouped uploads + stacked
stats reads) vs per-sample dispatches, inside ONE process so rig drift
cannot confound the comparison: warm B, A, B, A after a cold pass."""

import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import kmdiff_tpu.pipeline.fused as fmod
    from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
    from kmdiff_tpu.cmd.run import main_run
    from kmdiff_tpu.core.corrector import CorrectionType
    from kmdiff_tpu.pipeline.simulate import SimOptions, simulate

    work = tempfile.mkdtemp(prefix="kmdiff_bab_")
    try:
        simulate(SimOptions(
            output_directory=os.path.join(work, "sim"),
            genome_len=1 << 23, nb_controls=10, nb_cases=10,
            read_size=150, coverage=1, error_rate=0.001, kmer_size=31,
            seed=7,
        ))

        def one(tag, batch):
            saved = fmod.BATCH
            fmod.BATCH = batch
            try:
                rd = os.path.join(work, f"r_{tag}")
                tm = {}
                main_run(
                    CountOptions(
                        fof=os.path.join(work, "sim", "fof.txt"),
                        directory=rd, kmer_size=31, hard_min=1,
                        nb_partitions=4, nb_threads=4, n_devices=1,
                    ),
                    DiffOptions(
                        kmtricks_dir=rd,
                        output_directory=os.path.join(work, f"o_{tag}"),
                        nb_controls=10, nb_cases=10, threshold=0.05,
                        correction=CorrectionType.BONFERRONI, nb_threads=4,
                        n_devices=1,
                    ),
                    count_files=False, timings=tm,
                )
                print(f"[bab] {tag} (batch={batch}): count "
                      f"{tm['count']:.1f}s merge {tm['merge']:.1f}s",
                      flush=True)
                shutil.rmtree(rd, ignore_errors=True)
                shutil.rmtree(os.path.join(work, f"o_{tag}"),
                              ignore_errors=True)
            finally:
                fmod.BATCH = saved

        one("cold_b", 4)
        one("cold_a", 1)  # per-sample shapes warm too
        for i in range(3):
            one(f"B{i}", 4)
            one(f"A{i}", 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
