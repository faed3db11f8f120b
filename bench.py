#!/usr/bin/env python3
"""kmdiff-tpu benchmark: k-mers tested/sec/chip (the BASELINE.json headline).

Measures the diff hot loop — the vectorized Poisson-LRT filter kernel
(kmdiff_tpu.ops.lrt.lrt_filter_block) — on one chip over device-resident
[B, S] count blocks, and compares against a locally *measured* single-core
C++ baseline (bench/ref_baseline.cpp: clean-room replica of the reference's
k-way heap merge + scalar HAWK LRT, since the reference binary cannot be
built here — its submodules are empty).

Prints exactly ONE JSON line on stdout:
  {"metric": "kmers_tested_per_sec_per_chip", "value": N, "unit": "kmer/s",
   "vs_baseline": N / cpp_single_core}
Supplementary numbers go to stderr.

Usage: python bench.py [--quick]   (--quick: small shapes, CPU-friendly)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

QUICK = "--quick" in sys.argv
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

#: measured on this machine (g++ -O3 -march=native, 2026-08); recomputed
#: live below when the toolchain is available
FALLBACK_CPP_BASELINE = 6.17e6


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_cpp_baseline() -> float:
    src = os.path.join(HERE, "bench", "ref_baseline.cpp")
    exe = os.path.join(HERE, "bench", "ref_baseline")
    try:
        if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-o", exe, src],
                check=True, capture_output=True, timeout=300,
            )
        n = "131072" if QUICK else "1048576"
        out = subprocess.run(
            [exe, n, "20"], check=True, capture_output=True, timeout=600, text=True
        )
        v = float(out.stdout.strip())
        log(f"[bench] C++ single-core baseline (merge+LRT): {v:.3e} kmer/s")
        return v
    except (subprocess.SubprocessError, OSError, ValueError) as e:
        log(f"[bench] C++ baseline unavailable ({e}); using recorded "
            f"{FALLBACK_CPP_BASELINE:.3e} kmer/s")
        return FALLBACK_CPP_BASELINE


def measure_cpp_count_baseline(fasta_paths: list[str], k: int,
                               hard_min: int) -> float:
    """Single-core C++ counting baseline (bench/ref_count_baseline.cpp:
    FASTA -> 2-bit canonical k-mers -> sort -> RLE -> hard-min -> histogram,
    the kmtricks-shaped per-sample loop) over the SAME files the pipeline
    counts. Returns bases/s, or 0 when the toolchain is unavailable."""
    src = os.path.join(HERE, "bench", "ref_count_baseline.cpp")
    exe = os.path.join(HERE, "bench", "ref_count_baseline")
    try:
        if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-o", exe, src],
                check=True, capture_output=True, timeout=300,
            )
        out = subprocess.run(
            [exe, str(k), str(hard_min), *fasta_paths],
            check=True, capture_output=True, timeout=1200, text=True,
        )
        v = float(out.stdout.strip())
        log(f"[bench] C++ single-core counting baseline: {v:.3e} bases/s "
            f"({len(fasta_paths)} files)")
        return v
    except (subprocess.SubprocessError, OSError, ValueError) as e:
        log(f"[bench] C++ counting baseline unavailable ({e})")
        return 0.0


def measure_popstrat() -> dict:
    """Popstrat corrector throughput, device vs the reference's scalar
    hot loop #2 (one glm_irls fit per significant k-mer,
    popstrat.hpp:249-333).

    Baseline: bench/ref_oracle.cpp `popbench` — the verbatim-semantics
    scalar corrector (vendored-alglib chi², Doolittle LU, mse-delta IRLS)
    on a synthetic cohort. Device side: the PRODUCT's correct_block path
    (conditioned batched IRLS + chunked dispatch) on the same design
    shape and count distribution. Both sides fit B=16384 k-mers over
    S=100 samples with npc=2 (F=5 alt features)."""
    import subprocess

    B, S, npc = (2048 if QUICK else 16384), 100, 2
    alglib = "/root/reference/thirdparty/alglib/src"
    src = os.path.join(HERE, "bench", "ref_oracle.cpp")
    exe = os.path.join(HERE, "bench", "ref_oracle")
    cpp = 0.0
    try:
        srcs = [
            src,
            *(os.path.join(alglib, f"{m}.cpp")
              for m in ("specialfunctions", "ap", "alglibinternal",
                        "alglibmisc")),
            os.path.join(HERE, "kmdiff_tpu", "native", "io_codec.cpp"),
            os.path.join(HERE, "kmdiff_tpu", "native", "lz4_codec.cpp"),
        ]
        if os.path.isdir(alglib):
            if (not os.path.exists(exe)
                    or os.path.getmtime(exe)
                    < max(os.path.getmtime(s) for s in srcs)):
                subprocess.run(
                    ["g++", "-O2", f"-I{alglib}", *srcs, "-o", exe],
                    check=True, capture_output=True, timeout=600,
                )
            out = subprocess.run(
                [exe, "popbench", str(B), str(S), str(npc)],
                check=True, capture_output=True, timeout=600, text=True,
            )
            cpp = float(out.stdout.strip())
            log(f"[bench] C++ scalar popstrat baseline: {cpp:.3e} alt "
                f"fits/s (B={B}, S={S}, npc={npc})")
    except (subprocess.SubprocessError, OSError, ValueError) as e:
        log(f"[bench] popstrat C++ baseline unavailable ({e})")

    import numpy as np

    from kmdiff_tpu.io.accumulator import KmerSignBlock
    from kmdiff_tpu.pipeline.popstrat import PopStratCorrector

    rng = np.random.default_rng(42)
    totals = rng.uniform(9e5, 1.1e6, S)
    corr = PopStratCorrector(
        S // 2, S - S // 2, totals[: S // 2], totals[S // 2:], npc
    )
    corr.set_Z(rng.uniform(-1.0, 1.0, (S, 10)))
    corr.init_global_features()

    def one_pass():
        block = KmerSignBlock(
            np.arange(B, dtype=np.uint64)[:, None],
            np.full(B, 1e-9), np.zeros(B, np.int8),
            np.zeros(B), np.zeros(B),
            rng.integers(0, 51, (B, S)).astype(np.float64),
        )
        t0 = time.perf_counter()
        corr.correct_block(block)
        return time.perf_counter() - t0

    one_pass()  # compile
    dts = sorted(one_pass() for _ in range(3))
    dt = dts[1]  # median
    rate = B / dt
    log(f"[bench] device popstrat corrector (product correct_block): "
        f"{rate:.3e} alt fits/s "
        f"(min/med/max {B/dts[2]:.2e}/{B/dts[1]:.2e}/{B/dts[0]:.2e})")
    out = {"popstrat_fits_per_sec": round(rate, 1)}
    if cpp:
        out["popstrat_vs_baseline"] = round(rate / cpp, 3)
        log(f"[bench] popstrat vs scalar C++ baseline: {rate/cpp:.2f}x")
    return out


def _timed_chain(step_fn, n_iters: int):
    """Trustworthy device timing under an async remote runtime.

    step_fn(carry_int) -> device_scalar runs the kernel with its input
    perturbed by the carry and folds EVERY output into the returned
    scalar; the scalar is READ on host (int()) every iteration before the
    next dispatch. The read is the only operation this rig cannot fake:
    per-buffer readiness (and even block_until_ready on a chained carry)
    can signal long before the computation actually ran, which made
    round-1 numbers ~500x optimistic. A 4-byte D2H per iteration costs
    ~10-30 ms here — real, and included, like any consumer of the result
    would pay."""
    carry = int(step_fn(0))  # warmup/compile + enter read mode
    t0 = time.perf_counter()
    for _ in range(n_iters):
        carry = int(step_fn(carry))
    return (time.perf_counter() - t0) / n_iters


def measure_device_merge() -> float:
    """The full merge+test kernel (ops.merge_dev): S sorted per-sample
    streams -> distinct k-mers tested per second. Apples-to-apples with the
    C++ baseline, which also heap-merges sorted streams + runs the scalar
    LRT (no file IO on either side)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kmdiff_tpu.ops.lrt import LrtParams
    from kmdiff_tpu.ops.merge_dev import (
        build_triples_packed,
        merge_lrt_kernel,
        pack16_ok,
    )

    S = 20
    # 2^23 rows: the dispatch size the PRODUCT ships (fused merge chunks
    # target 7/8 x 2^24 rows; two-stage chunks 2^23) — and measured 17%
    # faster per row than 2^21 (bench/kernel_shape_probe.py: 8.7e7 vs
    # 7.4e7 distinct/s; fixed per-dispatch overhead amortizes over 4x
    # the rows)
    N = 1 << (16 if QUICK else 23)
    per = N // S
    rng = np.random.default_rng(0)
    kmers = [
        np.sort(rng.integers(0, 2**40, per, dtype=np.uint64))[:, None]
        for _ in range(S)
    ]
    counts = [rng.integers(1, 32, per, dtype=np.uint32) for _ in range(S)]
    # the product's default dispatch: packed ctrl bit, u16 count lane when
    # counts < 2^15 (pipeline.merge._dispatch_single)
    assert pack16_ok(counts)
    lanes, count, _n = build_triples_packed(kmers, counts, N, 10, pack16=True)
    params = LrtParams(10, 10, 10**9, 10**9, 0.05 / 1e5)
    lanes_d = tuple(jnp.asarray(l) for l in lanes)
    sample_d = jnp.zeros(1, jnp.int32)
    count_d = jnp.asarray(count)
    kw = dict(
        nb_controls=10,
        ratio_c=jnp.float32(params.ratio_c),
        ratio_k=jnp.float32(params.ratio_k),
        lr_min=jnp.float32(params.lr_min),
        pca_threshold_u32=jnp.uint32(0),
        pca_seed=jnp.uint32(0),
        max_hits=1 << 14,
        max_geno=1,
        want_geno=False,
        packed_ctrl=True,
    )
    def step(carry):
        o = merge_lrt_kernel(
            lanes_d, sample_d, count_d + jnp.uint16(carry % 2), **kw
        )
        acc = o["meta"].sum() + o["hit_blob"].astype(jnp.int32).sum()
        return acc.astype(jnp.int32)

    iters = 3 if QUICK else 6
    dt = _timed_chain(step, iters)
    n_distinct = len(np.unique(np.concatenate(
        [k[:, 0] for k in kmers])))
    dev = jax.devices()[0]
    log(f"[bench] device {dev.platform}:{dev.id} merge+LRT kernel: "
        f"{n_distinct/dt:.3e} distinct kmers tested/s ({N} triples x {S} "
        f"samples, {iters} chained iters, {dt*1e3:.1f} ms/iter)")

    # amortized variant: FOUR data-dependent kernels inside one jitted
    # program per host read. Still honest — the final int() cannot resolve
    # until all four ran (each feeds the next via its folded outputs) —
    # but the ~25-30 ms tunnel dispatch+read round-trip divides by 4,
    # exposing the kernel's own time. Production consumers dispatch
    # thousands of chunks per synchronization point, so the amortized
    # number is the deployable one; both are logged.
    import functools as _ft

    from kmdiff_tpu.ops.merge_dev import merge_lrt_local

    CHAIN = 4

    @_ft.partial(jax.jit, static_argnames=())
    def chain4(carry):
        acc = carry
        for _ in range(CHAIN):
            o = merge_lrt_local(
                lanes_d, sample_d,
                count_d + (acc % 2).astype(jnp.uint16), **kw
            )
            acc = (
                o["meta"].sum() + o["hit_blob"].astype(jnp.int32).sum()
            ).astype(jnp.int32)
        return acc

    dt4 = _timed_chain(chain4, max(2, iters // 2)) / CHAIN
    v = n_distinct / dt4
    log(f"[bench] merge+LRT kernel amortized (x{CHAIN} chained per read): "
        f"{v:.3e} distinct kmers tested/s ({dt4*1e3:.1f} ms/kernel; "
        f"single-dispatch mode pays +{(dt-dt4)*1e3:.1f} ms round-trip)")

    # interleaved A/B: quantile-ranged batched sub-sorts vs the flat sort
    # (same bytes, fewer comparator passes; ops.merge_dev range_rows)
    from kmdiff_tpu.ops.merge_dev import build_triples_packed_ranged

    res = build_triples_packed_ranged(
        kmers, counts, N, 10, pack16=True,
        target_range=1 << (14 if QUICK else 17),
    )
    best = v
    try:
        return _ranged_ab(res, v, dt, step, iters, sample_d, kw, n_distinct)
    except Exception as e:
        # the ranged A/B is supplementary; a transient remote-compile
        # failure must not void the headline kernel measurement
        log(f"[bench] ranged-sort A/B failed ({e!r}); keeping flat result")
        return best


def _ranged_ab(res, v, dt, step, iters, sample_d, kw, n_distinct):
    import functools as _ft

    import jax
    import jax.numpy as jnp

    from kmdiff_tpu.ops.merge_dev import merge_lrt_kernel, merge_lrt_local

    CHAIN = 4
    best = v
    if res is not None:
        lanes_r, count_r, _n, M = res
        lanes_rd = tuple(jnp.asarray(l.copy()) for l in lanes_r)
        count_rd = jnp.asarray(count_r.copy())

        def step_r(carry):
            o = merge_lrt_kernel(
                lanes_rd, sample_d, count_rd + jnp.uint16(carry % 2),
                range_rows=M, **kw
            )
            acc = o["meta"].sum() + o["hit_blob"].astype(jnp.int32).sum()
            return acc.astype(jnp.int32)

        dt_r = _timed_chain(step_r, iters)
        dt2 = _timed_chain(step, iters)  # flat again: drift control
        log(f"[bench] ranged-sort A/B: ranged {dt_r*1e3:.1f} ms/iter vs "
            f"flat {dt*1e3:.1f}/{dt2*1e3:.1f} ms/iter "
            f"(ranged/flat = {min(dt, dt2)/dt_r:.2f}x, "
            f"R={len(lanes_r[0])//M})")
        if dt_r < min(dt, dt2):
            @_ft.partial(jax.jit, static_argnames=())
            def chain4_r(carry):
                acc = carry
                for _ in range(CHAIN):
                    o = merge_lrt_local(
                        lanes_rd, sample_d,
                        count_rd + (acc % 2).astype(jnp.uint16),
                        range_rows=M, **kw
                    )
                    acc = (
                        o["meta"].sum()
                        + o["hit_blob"].astype(jnp.int32).sum()
                    ).astype(jnp.int32)
                return acc

            dt4_r = _timed_chain(chain4_r, max(2, iters // 2)) / CHAIN
            v_r = n_distinct / dt4_r
            log(f"[bench] ranged amortized: {v_r:.3e} distinct kmers "
                f"tested/s ({dt4_r*1e3:.1f} ms/kernel)")
            best = max(best, v_r)
    else:
        log("[bench] ranged-sort A/B skipped (build fell back)")
    return best


def measure_device_lrt() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kmdiff_tpu.ops.lrt import LrtParams, lrt_filter_block

    B = 1 << (16 if QUICK else 21)
    S = 20
    nb_controls = 10
    rng = np.random.default_rng(0)
    counts_host = rng.integers(0, 32, size=(B, S), dtype=np.int32)

    params = LrtParams(nb_controls, S - nb_controls,
                       sum_controls=10_000_000, sum_cases=10_000_000,
                       p_threshold=0.05 / 1e5)
    counts = jax.device_put(jnp.asarray(counts_host))
    args = (counts, jnp.float32(params.ratio_c), jnp.float32(params.ratio_k),
            jnp.float32(params.lr_min))

    def step(carry):
        keep, lr, s_c, s_k = lrt_filter_block(
            args[0] + (carry % 2), nb_controls, *args[1:]
        )
        return (
            keep.sum().astype(jnp.int32)
            + s_c.sum() + s_k.sum()
            + lr.sum().astype(jnp.int32)
        )

    iters = 3 if QUICK else 12
    dt = _timed_chain(step, iters)
    v = B / dt
    dev = jax.devices()[0]
    log(f"[bench] device {dev.platform}:{dev.id} LRT filter (lax): "
        f"{v:.3e} kmer/s ({B} rows x {S} samples, {iters} chained iters, "
        f"{dt*1e3:.2f} ms/iter)")

    # same filter through the hand-tiled Pallas kernel (TPU backends): the
    # product's run_filter picks it at these shapes, so record the
    # lax-vs-pallas parity explicitly (bench/README.md)
    from kmdiff_tpu.ops.lrt_pallas import TILE_B, lrt_filter_block_pallas

    # gate on the backend, not use_pallas(): the A/B must run even though
    # the product routes lax by default
    if jax.default_backend() not in ("cpu",) and B % TILE_B == 0:
        def step_p(carry):
            keep, lr, s_c, s_k = lrt_filter_block_pallas(
                args[0] + (carry % 2), nb_controls, *args[1:]
            )
            return (
                keep.sum().astype(jnp.int32)
                + s_c.sum() + s_k.sum()
                + lr.sum().astype(jnp.int32)
            )

        dt_p = _timed_chain(step_p, iters)
        log(f"[bench] device {dev.platform}:{dev.id} LRT filter (pallas): "
            f"{B/dt_p:.3e} kmer/s ({dt_p*1e3:.2f} ms/iter, "
            f"{dt/dt_p:.2f}x vs lax)")
    return v


def measure_pipeline(baseline: float) -> dict:
    """END-TO-END pipeline rates on a popsim cohort: `count` + `diff`
    through the real command entry points, wall-clock inclusive of file
    IO, LZ4, host<->device transfers, and exact f64 rescoring.

    Runs LAST: the pipeline necessarily materializes device data on host,
    which on this rig permanently switches the process into ~130 ms/
    dispatch synchronous mode — the kernel measurements above must finish
    first. The pipeline rate is therefore an honest lower bound that
    includes the tunnel's ~200 MB/s transfer path; on a directly-attached
    TPU host the transfer terms shrink by >an order of magnitude.
    """
    import shutil
    import tempfile

    from kmdiff_tpu.cmd.count import main_count
    from kmdiff_tpu.cmd.diff import main_diff
    from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
    from kmdiff_tpu.core.corrector import CorrectionType
    from kmdiff_tpu.pipeline.simulate import SimOptions, simulate

    work = tempfile.mkdtemp(prefix="kmdiff_bench_")
    try:
        genome = 1 << (17 if QUICK else 23)  # 8.4 Mbp cohort reference
        n_ctrl = n_case = 4 if QUICK else 10
        t_sim = time.perf_counter()
        simulate(SimOptions(
            output_directory=os.path.join(work, "sim"),
            genome_len=genome, nb_controls=n_ctrl, nb_cases=n_case,
            read_size=150, coverage=1, error_rate=0.001, kmer_size=31,
            seed=7,
        ))
        log(f"[bench] popsim cohort: {n_ctrl}+{n_case} samples x "
            f"{genome} bp (gen {time.perf_counter()-t_sim:.1f}s)")

        # two passes: the first pays one-time XLA compiles (~40-90 s/shape
        # over this rig's remote-compile service; amortized by the
        # persistent cache in real deployments), the second measures the
        # steady-state pipeline
        times = {}
        for attempt in ("cold", "warm"):
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
                nb_controls=n_ctrl, nb_cases=n_case, threshold=0.05,
                correction=CorrectionType.BONFERRONI, nb_threads=4,
            ))
            t2 = time.perf_counter()
            times[attempt] = (t1 - t0, t2 - t1)
            log(f"[bench] pipeline ({attempt}): count {t1-t0:.1f}s, "
                f"diff {t2-t1:.1f}s, tested {res['total_kmers']:.3e}")
            shutil.rmtree(run_dir, ignore_errors=True)

        # fused single-shot pipeline (`kmdiff-tpu run`): count streams stay
        # resident on device and the merge consumes them in place — the
        # count-file D2H and merge-triple H2D leave the critical path
        # (pipeline.fused). Three passes: cold compiles the assemble+merge
        # shapes, warm measures with --no-count-files (apples-to-apples
        # with the C++ e2e floor below, which also materializes no
        # intermediate files), warm+files measures the honest default
        # where the kmtricks run-dir spill shares the D2H tunnel with the
        # merge (background threads; joined before the run returns).
        from kmdiff_tpu.cmd.run import main_run

        fused_times = {}
        fused_phases = {}
        fres = None
        # THREE no-files warm passes: the rig's state drifts 2-5x between
        # runs minutes apart (bench/README.md), so the fused headline is
        # the MEDIAN of three warm passes (min/median/max all reported —
        # same robustness standard the kernel headline met with four
        # consecutive >=10x full runs); the +files pass measures the
        # honest default where the run dir is materialized
        for attempt, with_files in (
            ("cold", False), ("warm1", False), ("warm2", False),
            ("warm3", False), ("warm+files", True),
        ):
            rd = os.path.join(work, f"fused_{attempt}")
            tm = {}
            t0 = time.perf_counter()
            fres = main_run(
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
                count_files=with_files,
                timings=tm,
            )
            fused_times[attempt] = time.perf_counter() - t0
            fused_phases[attempt] = tm
            log(f"[bench] fused run ({attempt}): {fused_times[attempt]:.1f}s "
                f"total (FASTA->FASTA; count {tm.get('count', 0):.1f}s merge "
                f"{tm.get('merge', 0):.1f}s), tested {fres['total_kmers']:.3e}")
            shutil.rmtree(rd, ignore_errors=True)
        assert fres["total_kmers"] == res["total_kmers"], (
            "fused and two-stage pipelines disagree on tested k-mers"
        )

        # counting baseline over the same cohort files, measured after the
        # device passes so its CPU burn cannot skew them
        fasta_paths = []
        with open(os.path.join(work, "sim", "fof.txt")) as f:
            for line in f:
                if ":" in line:
                    fasta_paths.append(
                        line.partition(":")[2].partition("!")[0].strip())
        count_baseline = measure_cpp_count_baseline(fasta_paths, 31, 1)

        total_bases = (n_ctrl + n_case) * genome  # coverage 1
        count_rate = total_bases / times["warm"][0]
        pipe_rate = res["total_kmers"] / times["warm"][1]
        log(f"[bench] pipeline count: {count_rate:.3e} bases/s warm"
            + (f" (vs C++ single-core counting {count_rate/count_baseline:.1f}x)"
               if count_baseline else ""))
        log(f"[bench] pipeline diff: {pipe_rate:.3e} kmers tested/s warm "
            f"(IO+transfers included; vs C++ merge-only baseline "
            f"{pipe_rate/baseline:.1f}x)")
        # median of the three warm passes (rig drift; all logged above);
        # the MEDIAN pass's phase split rides along so phase ratios match
        # the headline pass
        warm_keys = ("warm1", "warm2", "warm3")
        med_warm = sorted(warm_keys, key=lambda a: fused_times[a])[1]
        warm_sorted = sorted(fused_times[a] for a in warm_keys)
        fused_times["warm"] = fused_times[med_warm]
        fused_phases["warm"] = fused_phases[med_warm]
        fused_rate = fres["total_kmers"] / fused_times["warm"]
        two_stage_warm = times["warm"][0] + times["warm"][1]
        # vs the two-stage flow: the FAIR comparator is the warm+files
        # pass — both flows then materialize the full kmtricks run dir
        # (the two-stage `count` writes it by construction)
        fused_vs_two_stage = two_stage_warm / fused_times["warm+files"]
        log(f"[bench] fused run: {fused_rate:.3e} kmers tested/s warm "
            f"FASTA->FASTA (no-files warm min/med/max "
            f"{warm_sorted[0]:.1f}/{warm_sorted[1]:.1f}/"
            f"{warm_sorted[2]:.1f}s; with-files "
            f"{fused_times['warm+files']:.1f}s = {fused_vs_two_stage:.2f}x "
            f"the two-stage flow's {two_stage_warm:.1f}s)")
        out = {
            "pipeline_kmers_per_sec": round(pipe_rate, 1),
            "pipeline_vs_baseline": round(pipe_rate / baseline, 3),
            "counting_bases_per_sec": round(count_rate, 1),
            "pipeline_total_tested": res["total_kmers"],
            "fused_run_seconds": round(fused_times["warm"], 1),
            "fused_run_seconds_min": round(warm_sorted[0], 1),
            "fused_run_seconds_max": round(warm_sorted[2], 1),
            "fused_kmers_per_sec": round(fused_rate, 1),
            "fused_vs_baseline": round(fused_rate / baseline, 3),
            "fused_vs_two_stage": round(fused_vs_two_stage, 2),
            "fused_with_files_seconds": round(fused_times["warm+files"], 1),
        }
        if count_baseline:
            out["counting_vs_baseline"] = round(count_rate / count_baseline, 3)
        fc = fused_phases.get("warm", {}).get("count", 0.0)
        fm = fused_phases.get("warm", {}).get("merge", 0.0)
        if fc:
            # apples-to-apples with the C++ counting baseline: BOTH count
            # FASTA to in-memory distinct streams + histogram (the
            # baseline writes no count files; the fused run spills them on
            # background threads off this phase's clock)
            fused_count_rate = total_bases / fc
            out["fused_counting_bases_per_sec"] = round(fused_count_rate, 1)
            if count_baseline:
                out["fused_counting_vs_baseline"] = round(
                    fused_count_rate / count_baseline, 3
                )
            log(f"[bench] fused counting phase: {fused_count_rate:.3e} "
                f"bases/s warm"
                + (f" (vs C++ single-core counting "
                   f"{fused_count_rate/count_baseline:.2f}x)"
                   if count_baseline else ""))
        if fm:
            fused_merge_rate = fres["total_kmers"] / fm
            out["fused_merge_kmers_per_sec"] = round(fused_merge_rate, 1)
            out["fused_merge_vs_baseline"] = round(
                fused_merge_rate / baseline, 3
            )
            log(f"[bench] fused merge phase: {fused_merge_rate:.3e} kmers "
                f"tested/s warm (vs C++ merge-only baseline "
                f"{fused_merge_rate/baseline:.2f}x)")
        if count_baseline:
            # end-to-end FASTA->significant-kmers comparison: the fused run
            # vs the sum of the single-core C++ floors for the same work
            # (count the bases + merge the distinct streams, both fully
            # in-memory, no intermediate files on either side)
            cpp_e2e = (
                total_bases / count_baseline
                + fres["total_kmers"] / baseline
            )
            out["fused_vs_cpp_e2e"] = round(cpp_e2e / fused_times["warm"], 3)
            log(f"[bench] fused FASTA->FASTA vs single-core C++ e2e floor "
                f"({cpp_e2e:.1f}s count+merge): "
                f"{cpp_e2e/fused_times['warm']:.2f}x")
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    baseline = measure_cpp_baseline()
    value = measure_device_merge()
    measure_device_lrt()  # LRT-only upper bound, reported on stderr
    extra = {}
    try:
        extra.update(measure_popstrat())
    except Exception as e:  # supplementary
        log(f"[bench] popstrat measurement failed: {e!r}")
    if "--no-pipeline" not in sys.argv:
        try:
            extra.update(measure_pipeline(baseline))
        except Exception as e:  # pipeline stage is supplementary
            log(f"[bench] pipeline measurement failed: {e!r}")
    print(json.dumps({
        "metric": "kmers_tested_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "kmer/s",
        "vs_baseline": round(value / baseline, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
