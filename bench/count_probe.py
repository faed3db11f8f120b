#!/usr/bin/env python3
"""Fine-grained counting-phase probe: where does one sample's fused count
spend its time on this rig?  Replicates pipeline.fused.count_sample_resident
step by step with wall timers around each host/device interaction:

  read    flat_codes (FASTA -> 2-bit codes, host)
  h2d     jnp.asarray of the code blocks
  kernel  fused_count_kernel dispatch (extract+sort+RLE+hist)
  stats   np.asarray(stats) -- THE sync host read the pipeline pays
  final   resident-shape slice/pad + a forced 1-element read

Dev tool; supplementary to bench.py.  Usage:
  python bench/count_probe.py [--samples N] [--genome LOG2] [--reps R]
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def arg(name, default):
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    import tempfile

    import numpy as np

    from kmdiff_tpu.pipeline.simulate import SimOptions, simulate

    n_samples = arg("--samples", 4)
    genome = 1 << arg("--genome", 23)
    reps = arg("--reps", 2)
    k = 31

    work = tempfile.mkdtemp(prefix="kmdiff_cprobe_")
    simulate(SimOptions(
        output_directory=os.path.join(work, "sim"),
        genome_len=genome, nb_controls=max(n_samples // 2, 1),
        nb_cases=max(n_samples - n_samples // 2, 1),
        read_size=150, coverage=1, error_rate=0.001, kmer_size=k, seed=7,
    ))
    fastas = sorted(
        os.path.join(work, "sim", f) for f in os.listdir(
            os.path.join(work, "sim"))
        if f.endswith(".fasta")
    )[:n_samples]
    print(f"[cprobe] {len(fastas)} samples x {genome} bp", flush=True)

    import jax.numpy as jnp

    from kmdiff_tpu.io.fasta import flat_codes
    from kmdiff_tpu.ops.codec import fused_count_kernel
    from kmdiff_tpu.pipeline.count import SORT_ROWS, _host_code_chunks

    for rep in range(reps):
        tag = "cold" if rep == 0 else f"warm{rep}"
        tot = dict.fromkeys(("read", "blocks", "h2d", "kernel", "stats",
                             "final"), 0.0)
        t_all = time.perf_counter()
        for path in fastas:
            t0 = time.perf_counter()
            codes = flat_codes(path)
            t1 = time.perf_counter()
            chunks = _host_code_chunks([codes], k, SORT_ROWS)
            t2 = time.perf_counter()
            tot["read"] += t1 - t0
            tot["blocks"] += t2 - t1
            for chunk in chunks:
                W = len(chunk) - k + 1
                t3 = time.perf_counter()
                dev = jnp.asarray(chunk)
                dev.block_until_ready()
                t4 = time.perf_counter()
                stats, blob, counts = fused_count_kernel(
                    dev, k, W, with_hist=len(chunks) == 1
                )
                t5 = time.perf_counter()
                stats_h = np.asarray(stats)
                t6 = time.perf_counter()
                U = int(stats_h[0])
                # resident finalize: slice to quarter-pow2(U + slack) and
                # force execution with a 1-element read (the pipeline's
                # next consumer is the merge's searchsorted read)
                P = 1 << max(14, (U + (1 << 18) - 1).bit_length())
                blob2 = blob[:min(P, blob.shape[0])]
                cn2 = counts[:min(P, counts.shape[0])]
                _ = int(blob2[0, 0]) + int(cn2[0])
                t7 = time.perf_counter()
                tot["h2d"] += t4 - t3
                tot["kernel"] += t5 - t4
                tot["stats"] += t6 - t5
                tot["final"] += t7 - t6
        wall = time.perf_counter() - t_all
        per = {p: v / len(fastas) for p, v in tot.items()}
        print(
            f"[cprobe] {tag}: {wall:.2f}s total ({wall/len(fastas):.2f}s"
            f"/sample) | per-sample: " + " ".join(
                f"{p}={per[p]*1e3:.0f}ms" for p in tot)
            + f" | {len(fastas)*genome/wall:.3e} bases/s", flush=True,
        )

    import shutil
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
