#!/usr/bin/env python3
"""BASELINE config #5 scale rehearsal: a ~100-sample cohort through
count + diff + popstrat with every streaming path FORCED on.

The unit suite covers chunked key-range merge streaming, the external
aggregation sort, overflow retries, and wide sums separately; this drives
them TOGETHER through the product entry points at reduced-genome scale,
with peak RSS tracked, on each runtime the rig offers:

  --mode single   one device (the chip when run bare, CPU otherwise)
  --mode mesh     virtual 8-device CPU mesh (sharded merge + count)
  --mode dist     2-process jax.distributed over the shared FS (spawns
                  itself twice with KMDIFF_COORDINATOR/_NUM_PROCESSES/
                  _PROCESS_ID env, the CLI's protocol)

Budgets are shrunk via the product's env knobs so the 50+50-sample cohort
exercises chunked merge streaming (KMDIFF_MAX_DEVICE_ROWS), merge overflow
retries (KMDIFF_MERGE_MAX_HITS), chunked counting sorts
(KMDIFF_COUNT_SORT_ROWS / KMDIFF_COUNT_BLOCK), and the external
aggregation sort (KMDIFF_AGG_SORT_ROWS + Benjamini). Results (phase
timings, RSS) print as one JSON line for STATUS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

STRESS_ENV = {
    # ~1e6-2e6 distinct rows/partition stream through <=2^19-row chunks
    "KMDIFF_MAX_DEVICE_ROWS": str(1 << 19),
    "KMDIFF_MERGE_MAX_HITS": "4096",       # force >=1 overflow retry
    "KMDIFF_COUNT_SORT_ROWS": str(1 << 20),
    "KMDIFF_COUNT_BLOCK": str(1 << 20),
    "KMDIFF_AGG_SORT_ROWS": str(1 << 16),  # external spill-sort runs
}


def build_cohort(work: str, n_per_group: int, genome_len: int, seed: int = 11):
    from kmdiff_tpu.pipeline.simulate import SimOptions, simulate

    sim_dir = os.path.join(work, "sim")
    t0 = time.perf_counter()
    simulate(SimOptions(
        output_directory=sim_dir, genome_len=genome_len,
        nb_controls=n_per_group, nb_cases=n_per_group,
        read_size=150, coverage=1, error_rate=0.001, kmer_size=31,
        seed=seed,
    ))
    return sim_dir, time.perf_counter() - t0


def run_pipeline(work: str, sim_dir: str, n: int, n_devices: int,
                 tag: str) -> dict:
    from kmdiff_tpu.cmd.count import main_count
    from kmdiff_tpu.cmd.diff import main_diff
    from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
    from kmdiff_tpu.core.corrector import CorrectionType
    from kmdiff_tpu.utils.rss import get_peak_rss_mb

    run_dir = os.path.join(work, f"run_{tag}")
    t0 = time.perf_counter()
    main_count(CountOptions(
        fof=os.path.join(sim_dir, "fof.txt"), directory=run_dir,
        kmer_size=31, hard_min=1, nb_partitions=8, nb_threads=4,
        n_devices=n_devices,
    ))
    t1 = time.perf_counter()
    res = main_diff(DiffOptions(
        kmtricks_dir=run_dir,
        output_directory=os.path.join(work, f"out_{tag}"),
        nb_controls=n, nb_cases=n, threshold=0.2,
        correction=CorrectionType.BENJAMINI, nb_threads=4,
        pop_correction=True, kmer_pca=0.001, npc=2,
        n_devices=n_devices,
    ))
    t2 = time.perf_counter()
    return {
        "tag": tag,
        "count_s": round(t1 - t0, 1),
        "diff_s": round(t2 - t1, 1),
        "tested": res["total_kmers"],
        "control": res["control"],
        "case": res["case"],
        "peak_rss_mb": get_peak_rss_mb(),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("single", "mesh", "dist"),
                    default="single")
    ap.add_argument("--n", type=int, default=50, help="samples per group")
    ap.add_argument("--genome", type=int, default=1 << 20)
    ap.add_argument("--work", default="")
    ap.add_argument("--rss-cap-mb", type=int, default=12000)
    ap.add_argument("--force-cpu", action="store_true")
    args = ap.parse_args()

    os.environ.update(STRESS_ENV)

    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    # no-op without KMDIFF_COORDINATOR env (set by --mode dist children)
    from kmdiff_tpu.parallel.distributed import init_distributed

    init_distributed()

    if args.mode == "mesh":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    import tempfile

    if args.mode == "dist":
        # two coordinated processes over the shared FS; partitions and
        # samples round-robin (kmdiff_tpu.parallel.distributed)
        import subprocess

        work = args.work or tempfile.mkdtemp(prefix="kmdiff_scale_")
        sim_dir, sim_s = build_cohort(work, args.n, args.genome)
        procs = []
        import socket

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        for pid in range(2):
            env = dict(os.environ, **STRESS_ENV)
            env.update({
                "KMDIFF_COORDINATOR": f"127.0.0.1:{port}",
                "KMDIFF_NUM_PROCESSES": "2",
                "KMDIFF_PROCESS_ID": str(pid),
                "JAX_PLATFORMS": "cpu",
            })
            env.pop("XLA_FLAGS", None)
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--mode", "single", "--n", str(args.n),
                 "--genome", str(args.genome), "--work", work,
                 "--rss-cap-mb", str(args.rss_cap_mb), "--force-cpu"],
                env=env,
            ))
        rcs = [p.wait() for p in procs]
        print(json.dumps({"mode": "dist", "sim_s": round(sim_s, 1),
                          "rcs": rcs}))
        sys.exit(max(rcs))

    work = args.work or tempfile.mkdtemp(prefix="kmdiff_scale_")
    sim_dir = os.path.join(work, "sim")
    if os.path.exists(os.path.join(sim_dir, "fof.txt")):
        sim_s = 0.0
    else:
        sim_dir, sim_s = build_cohort(work, args.n, args.genome)

    n_devices = 8 if args.mode == "mesh" else 1
    out = run_pipeline(work, sim_dir, args.n, n_devices, args.mode)
    out["sim_s"] = round(sim_s, 1)
    out["mode"] = args.mode
    out["stress_env"] = STRESS_ENV
    ok = out["peak_rss_mb"] <= args.rss_cap_mb
    out["rss_bounded"] = ok
    print(json.dumps(out))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
