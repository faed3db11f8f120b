"""Fused count->diff pipeline (`run`): byte-identity vs the two-stage flow.

The fused path (pipeline.fused + cmd.run) keeps count streams resident on
device and merges them in place; these tests pin that its outputs — FASTA
sets AND the spilled run dir — are byte-identical to `count` + `diff`,
across hard-min filtering, multi-chunk samples, popstrat, save-sk, and
forced tiny merge chunks. No reference equivalent exists (the reference
flow is file-mediated by construction, src/cmd.cpp:27-48).
"""

import os

import numpy as np
import pytest

from kmdiff_tpu.cmd.count import main_count
from kmdiff_tpu.cmd.diff import main_diff
from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
from kmdiff_tpu.cmd.run import main_run
from kmdiff_tpu.core.corrector import CorrectionType


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    """Small synthetic cohort: 4+4 samples, 60bp reads, with case-enriched
    sequences so some k-mers are genuinely significant."""
    out = tmp_path_factory.mktemp("fused_cohort")
    rng = np.random.default_rng(11)
    bases = np.array(list("ACGT"))
    shared = ["".join(rng.choice(bases, 60)) for _ in range(25)]
    case_private = ["".join(rng.choice(bases, 60)) for _ in range(12)]

    fof_lines = []
    nc = nk = 4
    for i in range(nc + nk):
        is_case = i >= nc
        fa = out / f"s{i}.fasta"
        with open(fa, "w") as f:
            j = 0
            for _ in range(50):
                src = (
                    case_private
                    if (is_case and rng.random() < 0.6)
                    else shared
                )
                f.write(f">r{j}\n{src[rng.integers(0, len(src))]}\n")
                j += 1
                # duplicate some reads so counts exceed 1 (hard-min tests)
                if rng.random() < 0.5:
                    f.write(f">r{j}\n{src[rng.integers(0, len(src))]}\n")
                    j += 1
        fof_lines.append(f"s{i} : {fa}")
    fof = out / "fof.txt"
    fof.write_text("\n".join(fof_lines) + "\n")
    return str(fof), nc, nk


def _copts(fof, run_dir, **kw):
    base = dict(fof=fof, directory=str(run_dir), kmer_size=21, hard_min=1,
                nb_partitions=4, nb_threads=2, n_devices=1)
    base.update(kw)
    return CountOptions(**base)


def _dopts(run_dir, out, nc, nk, **kw):
    base = dict(
        kmtricks_dir=str(run_dir), output_directory=str(out),
        nb_controls=nc, nb_cases=nk, threshold=0.05, cutoff=1e5,
        correction=CorrectionType.BONFERRONI, nb_threads=2, n_devices=1,
        keep_tmp=True,
    )
    base.update(kw)
    return DiffOptions(**base)


def _no_fallback(monkeypatch):
    """Fail the test if main_run silently takes the standard flow."""
    import kmdiff_tpu.cmd.run as runmod

    def boom(*a, **k):
        raise AssertionError("fused path fell back to the standard flow")

    monkeypatch.setattr(runmod, "_standard_flow", boom)


def _run_both(cohort, tmp_path, monkeypatch, copt_kw=None, dopt_kw=None,
              count_files=True, expect_fused=True, std_devices=None):
    """std_devices: device count for the comparison two-stage flow (None =
    same opts as the fused run) — the mesh tests pin mesh-fused against
    the SINGLE-device two-stage flow directly."""
    fof, nc, nk = cohort
    if expect_fused:
        _no_fallback(monkeypatch)
    res_f = main_run(
        _copts(fof, tmp_path / "kc_f", **(copt_kw or {})),
        _dopts(tmp_path / "kc_f", tmp_path / "out_f", nc, nk,
               **(dopt_kw or {})),
        count_files=count_files,
    )
    std_c = dict(copt_kw or {})
    std_d = dict(dopt_kw or {})
    if std_devices is not None:
        std_c["n_devices"] = std_devices
        std_d["n_devices"] = std_devices
    main_count(_copts(fof, tmp_path / "kc_s", **std_c))
    res_s = main_diff(
        _dopts(tmp_path / "kc_s", tmp_path / "out_s", nc, nk, **std_d)
    )
    assert res_f == res_s
    for name in ("control_kmers.fasta", "case_kmers.fasta"):
        a = (tmp_path / "out_f" / name).read_bytes()
        b = (tmp_path / "out_s" / name).read_bytes()
        assert a == b, f"{name} differs between fused and two-stage"
    return res_f


def test_fused_matches_two_stage(cohort, tmp_path, monkeypatch):
    res = _run_both(cohort, tmp_path, monkeypatch)
    assert res["total_kmers"] > 0
    assert res["control"] + res["case"] > 0
    # the background spill reproduces run_count's files byte-for-byte
    for p in range(4):
        pdir_f = tmp_path / "kc_f" / "counts" / f"partition_{p}"
        pdir_s = tmp_path / "kc_s" / "counts" / f"partition_{p}"
        names = sorted(os.listdir(pdir_s))
        assert sorted(os.listdir(pdir_f)) == names
        for n in names:
            assert (pdir_f / n).read_bytes() == (pdir_s / n).read_bytes()
    hdir_f = tmp_path / "kc_f" / "histograms"
    hdir_s = tmp_path / "kc_s" / "histograms"
    for n in sorted(os.listdir(hdir_s)):
        assert (hdir_f / n).read_bytes() == (hdir_s / n).read_bytes()


def test_fused_hard_min_multichunk(cohort, tmp_path, monkeypatch):
    """A tiny sort budget forces every sample through the multi-chunk
    path (device dedup-sum of partial counts) with a hard-min filter on
    top — the numerically riskiest fused configuration."""
    import kmdiff_tpu.pipeline.count as cmod

    monkeypatch.setattr(cmod, "SORT_ROWS", 1 << 12)
    res = _run_both(cohort, tmp_path, monkeypatch,
                    copt_kw=dict(hard_min=2))
    assert res["total_kmers"] > 0


@pytest.mark.parametrize("seed", [11, 29])
def test_fused_randomized_identity(tmp_path, monkeypatch, seed):
    """Fuzz-style identity: random (k, partitions, cohort shape, hard-min,
    threshold, merge-chunk budget) per seed — the fused run must remain
    byte-identical to count+diff in regions the fixed-config tests never
    visit."""
    import kmdiff_tpu.pipeline.fused as fmod
    from kmdiff_tpu.pipeline.simulate import SimOptions, simulate

    rng = np.random.default_rng(seed)
    k = int(rng.choice([15, 21, 33, 47]))
    nb_parts = int(rng.choice([1, 3, 4]))
    nc = int(rng.integers(2, 5))
    nk = int(rng.integers(2, 5))
    hard_min = int(rng.choice([1, 2, 3]))
    thr = float(rng.choice([0.05, 0.3]))
    monkeypatch.setattr(
        fmod, "CHUNK_ROWS", int(rng.choice([1 << 9, 1 << 12, 0]))
    )

    sim = tmp_path / "sim"
    simulate(SimOptions(
        output_directory=str(sim), genome_len=3000,
        nb_controls=nc, nb_cases=nk, read_size=80, coverage=2,
        error_rate=0.01, kmer_size=k, seed=seed,
    ))
    fof = str(sim / "fof.txt")
    _no_fallback(monkeypatch)
    res_f = main_run(
        CountOptions(fof=fof, directory=str(tmp_path / "kc_f"),
                     kmer_size=k, hard_min=hard_min,
                     nb_partitions=nb_parts, nb_threads=2, n_devices=1),
        DiffOptions(kmtricks_dir=str(tmp_path / "kc_f"),
                    output_directory=str(tmp_path / "out_f"),
                    nb_controls=nc, nb_cases=nk, threshold=thr,
                    correction=CorrectionType.BENJAMINI, nb_threads=2,
                    n_devices=1),
        count_files=True,
    )
    main_count(CountOptions(
        fof=fof, directory=str(tmp_path / "kc_s"), kmer_size=k,
        hard_min=hard_min, nb_partitions=nb_parts, nb_threads=2,
        n_devices=1,
    ))
    res_s = main_diff(DiffOptions(
        kmtricks_dir=str(tmp_path / "kc_s"),
        output_directory=str(tmp_path / "out_s"),
        nb_controls=nc, nb_cases=nk, threshold=thr,
        correction=CorrectionType.BENJAMINI, nb_threads=2, n_devices=1,
    ))
    assert res_f == res_s
    for name in ("control_kmers.fasta", "case_kmers.fasta"):
        assert (tmp_path / "out_f" / name).read_bytes() == (
            tmp_path / "out_s" / name
        ).read_bytes(), (seed, k, nb_parts, hard_min, thr, name)
    # spilled run dirs byte-identical too
    for p in range(nb_parts):
        pf = tmp_path / "kc_f" / "counts" / f"partition_{p}"
        ps = tmp_path / "kc_s" / "counts" / f"partition_{p}"
        for n in sorted(os.listdir(ps)):
            assert (pf / n).read_bytes() == (ps / n).read_bytes()


def test_batched_counting_identity(monkeypatch):
    """count_samples_resident_batched (grouped uploads, stacked stats
    read) produces streams identical to per-sample count_sample_resident
    across mixed bucket sizes, partial groups, per-sample hard-min, and
    an empty sample."""
    import kmdiff_tpu.pipeline.fused as fmod
    from kmdiff_tpu.pipeline.fused import (
        count_sample_resident,
        count_samples_resident_batched,
    )

    rng = np.random.default_rng(17)
    bases = np.array(list("ACGT"), dtype="U1")

    def codes_for(n_reads, read_len):
        from kmdiff_tpu.pipeline.count import _flat_codes

        seqs = [
            "".join(rng.choice(bases, read_len)).encode()
            for _ in range(n_reads)
        ]
        return [_flat_codes(seqs)]

    # sizes chosen to straddle quarter-pow2 bucket boundaries: two
    # buckets with 3 + 2 members (one full group of BATCH=2 + partials)
    samples = [
        codes_for(40, 60), codes_for(41, 60), codes_for(39, 60),
        codes_for(200, 60), codes_for(201, 60),
        [np.zeros(0, np.uint8)],  # empty sample -> fallback path
    ]
    hard_mins = [1, 2, 1, 1, 2, 1]

    monkeypatch.setattr(fmod, "BATCH", 2)
    batched = count_samples_resident_batched(samples, 21, hard_mins, 1 << 10)
    order = []
    count_samples_resident_batched(
        samples, 21, hard_mins, 1 << 10,
        on_ready=lambda i, st: order.append(i),
    )
    assert sorted(order) == list(range(len(samples)))
    for i, st_b in enumerate(batched):
        st_p = count_sample_resident(samples[i], 21, hard_mins[i],
                                     slack=1 << 10)
        assert (st_b.U, st_b.max_count, st_b.n_distinct_pre,
                st_b.total_mass) == (
            st_p.U, st_p.max_count, st_p.n_distinct_pre, st_p.total_mass)
        assert np.array_equal(st_b.hist_uvec, st_p.hist_uvec)
        assert np.array_equal(
            np.asarray(st_b.blob)[: st_b.U], np.asarray(st_p.blob)[: st_p.U]
        )
        assert np.array_equal(
            np.asarray(st_b.counts)[: st_b.U],
            np.asarray(st_p.counts)[: st_p.U],
        )


def test_fused_tiny_merge_chunks(cohort, tmp_path, monkeypatch):
    """A 1k-row chunk budget forces many key-range chunks through the
    assemble kernel; outputs must not depend on the chunking."""
    import kmdiff_tpu.pipeline.fused as fmod

    monkeypatch.setattr(fmod, "CHUNK_ROWS", 1 << 10)
    _run_both(cohort, tmp_path, monkeypatch)


def test_fused_popstrat_matches(cohort, tmp_path, monkeypatch):
    """Popstrat rides the fused merge's full (sample-id) mode; corrected
    outputs must match the two-stage flow byte-for-byte (the .geno row
    ORDER differs by design; the PCs and corrected p-values do not)."""
    res = _run_both(
        cohort, tmp_path, monkeypatch,
        dopt_kw=dict(pop_correction=True, kmer_pca=0.05, npc=2,
                     threshold=0.2),
    )
    assert res["total_kmers"] > 0
    geno_f = (tmp_path / "out_f" / "popstrat" / "gwas_eigenstratX.geno")
    geno_s = (tmp_path / "out_s" / "popstrat" / "gwas_eigenstratX.geno")
    # same sampled k-mers (deterministic hash sampling) => same multiset
    # of presence rows, in a different order
    assert sorted(geno_f.read_text().splitlines()) == sorted(
        geno_s.read_text().splitlines()
    )
    # bit-identical PCs despite the row-order difference (exact integer
    # Gram decomposition, ops.pca)
    assert (tmp_path / "out_f" / "popstrat" / "pcs.evec").read_bytes() == (
        tmp_path / "out_s" / "popstrat" / "pcs.evec"
    ).read_bytes()


def test_fused_save_sk_matches(cohort, tmp_path, monkeypatch):
    _run_both(cohort, tmp_path, monkeypatch, dopt_kw=dict(save_sk=True))
    mdir_f = tmp_path / "out_f" / "positive_kmer_matrix" / "matrices"
    mdir_s = tmp_path / "out_s" / "positive_kmer_matrix" / "matrices"
    names = sorted(os.listdir(mdir_s))
    assert sorted(os.listdir(mdir_f)) == names and names
    for n in names:
        assert (mdir_f / n).read_bytes() == (mdir_s / n).read_bytes()


def test_fused_no_count_files(cohort, tmp_path, monkeypatch):
    """--no-count-files: outputs identical, histograms present, count
    files absent."""
    res = _run_both(cohort, tmp_path, monkeypatch, count_files=False)
    assert res["total_kmers"] > 0
    for p in range(4):
        assert not os.listdir(
            tmp_path / "kc_f" / "counts" / f"partition_{p}"
        )
    assert os.listdir(tmp_path / "kc_f" / "histograms")


def test_fused_p32_packed_counts(tmp_path, monkeypatch):
    """A sample whose top k-mer count exceeds 2^15 exercises the i32
    sign-bit count packing (mode p32) instead of the u16 fast path."""
    _no_fallback(monkeypatch)
    fof = tmp_path / "fof.txt"
    lines = []
    for i, reps in enumerate((40000, 3)):
        fa = tmp_path / f"s{i}.fasta"
        with open(fa, "w") as f:
            for j in range(reps):
                f.write(f">r{j}\nACGTACGTACGTACGTACGTA\n")
            f.write(">u\nTTTTTGGGGGCCCCCAAAAAT\n")
        lines.append(f"s{i} : {fa}")
    fof.write_text("\n".join(lines) + "\n")
    res_f = main_run(
        _copts(str(fof), tmp_path / "kc_f"),
        _dopts(tmp_path / "kc_f", tmp_path / "out_f", 1, 1, threshold=0.5,
               cutoff=1.0, correction=CorrectionType.NOTHING),
    )
    main_count(_copts(str(fof), tmp_path / "kc_s"))
    res_s = main_diff(
        _dopts(tmp_path / "kc_s", tmp_path / "out_s", 1, 1, threshold=0.5,
               cutoff=1.0, correction=CorrectionType.NOTHING)
    )
    assert res_f == res_s and res_f["total_kmers"] > 0
    for name in ("control_kmers.fasta", "case_kmers.fasta"):
        assert (tmp_path / "out_f" / name).read_bytes() == (
            tmp_path / "out_s" / name
        ).read_bytes()
    # counts of 40000 land in the histogram's OVERSIZE bucket: the fused
    # device histogram (uvec + exact window totals) must reproduce the
    # host hist_from_counts bytes including oversize_unique/oversize_total
    for i in range(2):
        hf = (tmp_path / "kc_f" / "histograms" / f"s{i}.hist").read_bytes()
        hs = (tmp_path / "kc_s" / "histograms" / f"s{i}.hist").read_bytes()
        assert hf == hs, f"s{i}.hist differs (oversize-bucket parity)"


def test_fused_large_k_multiword(cohort, tmp_path, monkeypatch):
    """k=55 (2 u64 words, 4 u32 lanes; reads are 60 bp) drives the
    multi-lane assemble path and split-lane selection over wide keys."""
    res = _run_both(cohort, tmp_path, monkeypatch,
                    copt_kw=dict(kmer_size=55))
    assert res["total_kmers"] > 0


def test_fused_small_k_degenerate_hi_lane(cohort, tmp_path, monkeypatch):
    """k=13 packs into one u64 word whose HIGH u32 lane is constant zero —
    the split-lane picker must skip it and bound on the low lane."""
    import kmdiff_tpu.pipeline.fused as fmod

    # tiny chunks force real multi-chunk splitting on the low lane
    monkeypatch.setattr(fmod, "CHUNK_ROWS", 1 << 9)
    res = _run_both(cohort, tmp_path, monkeypatch,
                    copt_kw=dict(kmer_size=13))
    assert res["total_kmers"] > 0


def test_fused_group_reduction_chunked(cohort, tmp_path, monkeypatch):
    """A tiny sort ceiling forces the group pre-aggregation through the
    chunked in-place-append path (plan_key_chunks + donated
    dynamic_update_slice appends) — byte-identical to the two-stage
    flow."""
    import kmdiff_tpu.pipeline.fused as fmod

    monkeypatch.setenv("KMDIFF_GROUP_MERGE", "1")
    monkeypatch.setattr(fmod, "SORT_CEILING", 1 << 13)
    monkeypatch.setattr(fmod, "CHUNK_ROWS", 1 << 9)
    res = _run_both(cohort, tmp_path, monkeypatch)
    assert res["total_kmers"] > 0
    assert res["control"] + res["case"] > 0


def test_fused_group_merge_on_matches(cohort, tmp_path, monkeypatch):
    """KMDIFF_GROUP_MERGE=1 (opt-in reducer, single-dispatch rounds)
    matches the two-stage flow byte-for-byte."""
    monkeypatch.setenv("KMDIFF_GROUP_MERGE", "1")
    res = _run_both(cohort, tmp_path, monkeypatch)
    assert res["total_kmers"] > 0


def test_run_fused_on_mesh(cohort, tmp_path, monkeypatch):
    """n_devices=0 resolves the 8-device test mesh; the fused path now
    serves it directly (key-range chunks sharded one-per-device over the
    mesh, streams replicated) and the outputs — FASTA sets AND the spilled
    run dir — must be byte-identical to the single-device two-stage flow."""
    res = _run_both(cohort, tmp_path, monkeypatch,
                    copt_kw=dict(n_devices=0), dopt_kw=dict(n_devices=0),
                    std_devices=1)
    assert res["total_kmers"] > 0
    assert res["control"] + res["case"] > 0
    for p in range(4):
        pdir_f = tmp_path / "kc_f" / "counts" / f"partition_{p}"
        pdir_s = tmp_path / "kc_s" / "counts" / f"partition_{p}"
        for n in sorted(os.listdir(pdir_s)):
            assert (pdir_f / n).read_bytes() == (pdir_s / n).read_bytes()


def test_run_fused_on_mesh_popstrat_tiny_chunks(cohort, tmp_path,
                                                monkeypatch):
    """Mesh-fused with popstrat (geno sampling through the sharded kernel)
    AND a forced tiny chunk budget so several sharded dispatches run,
    including a padded final group — byte-identical to the single-device
    two-stage flow."""
    import kmdiff_tpu.pipeline.fused as fmod

    monkeypatch.setattr(fmod, "CHUNK_ROWS", 1 << 9)
    res = _run_both(
        cohort, tmp_path, monkeypatch,
        copt_kw=dict(n_devices=0),
        dopt_kw=dict(n_devices=0, pop_correction=True, kmer_pca=0.05,
                     npc=2, max_iteration=50),
        std_devices=1,
    )
    assert res["total_kmers"] > 0


def test_run_resumes_via_standard_flow(cohort, tmp_path, monkeypatch):
    """A rerun with an existing manifest takes the standard resume path
    (count files exist from the first run's spill)."""
    fof, nc, nk = cohort
    _no_fallback(monkeypatch)
    res1 = main_run(
        _copts(fof, tmp_path / "kc"),
        _dopts(tmp_path / "kc", tmp_path / "out", nc, nk),
    )
    # rerun: manifest + complete run dir -> standard flow (resume)
    import kmdiff_tpu.cmd.run as runmod

    monkeypatch.undo()
    called = {}

    real = runmod._standard_flow

    def spy(copt, dopt, rmin):
        called["yes"] = True
        return real(copt, dopt, rmin)

    monkeypatch.setattr(runmod, "_standard_flow", spy)
    res2 = main_run(
        _copts(fof, tmp_path / "kc"),
        _dopts(tmp_path / "kc", tmp_path / "out", nc, nk),
    )
    assert called.get("yes")
    # a fully-resumed run skips correction (main_diff semantics: outputs
    # already exist) but agrees on the totals and leaves outputs intact
    assert res2["total_kmers"] == res1["total_kmers"]
    assert (tmp_path / "out" / "case_kmers.fasta").exists()


def test_run_cli_entrypoint(cohort, tmp_path):
    from kmdiff_tpu.cli import main

    fof, nc, nk = cohort
    rc = main([
        "run", "--file", fof, "-d", str(tmp_path / "kc"),
        "-k", "21", "-o", str(tmp_path / "out"),
        "-1", str(nc), "-2", str(nk), "--devices", "1",
    ])
    assert rc == 0
    assert (tmp_path / "out" / "control_kmers.fasta").exists()


def test_run_post_count_fallback_drains_spills(cohort, tmp_path,
                                               monkeypatch):
    """A FusedFallback raised AFTER counting (merge planning failures)
    must drain the deferred spill threads before the standard flow takes
    over — otherwise main_count would race live spill writers over the
    same count files. The fallback run's outputs and count files must
    match a plain two-stage run byte-for-byte."""
    import kmdiff_tpu.pipeline.fused as fmod
    from kmdiff_tpu.pipeline.fused import FusedFallback

    fof, nc, nk = cohort

    def boom(*a, **k):
        raise FusedFallback("forced post-count failure")

    monkeypatch.setattr(fmod, "fused_merge", boom)
    monkeypatch.setattr("kmdiff_tpu.cmd.run.fused_merge", boom,
                        raising=False)
    res_f = main_run(
        _copts(fof, tmp_path / "kc_f"),
        _dopts(tmp_path / "kc_f", tmp_path / "out_f", nc, nk),
    )
    main_count(_copts(fof, tmp_path / "kc_s"))
    res_s = main_diff(
        _dopts(tmp_path / "kc_s", tmp_path / "out_s", nc, nk)
    )
    assert res_f == res_s
    for name in ("control_kmers.fasta", "case_kmers.fasta"):
        assert (tmp_path / "out_f" / name).read_bytes() == \
            (tmp_path / "out_s" / name).read_bytes()
    for p in range(4):
        pdir_f = tmp_path / "kc_f" / "counts" / f"partition_{p}"
        pdir_s = tmp_path / "kc_s" / "counts" / f"partition_{p}"
        for n in sorted(os.listdir(pdir_s)):
            assert (pdir_f / n).read_bytes() == (pdir_s / n).read_bytes()


@pytest.mark.parametrize("nc,nk", [(1, 1), (2, 3), (5, 4), (7, 1)])
def test_group_reducer_bracket(nc, nk):
    """GroupReducer unit coverage (the e2e tests pin outputs; this pins
    the bracket itself): any group sizes — including odd tails and
    single-member groups — fold to exact per-group sums regardless of
    arrival order, and the deterministic index bracket never loses or
    double-counts a stream."""
    import jax.numpy as jnp

    from kmdiff_tpu.pipeline.fused import GroupReducer, ResidentStream

    rng = np.random.default_rng(nc * 10 + nk)
    L, P = 2, 1 << 14
    keys_pool = np.sort(
        rng.choice(1 << 40, size=2000, replace=False).astype(np.uint64)
    )

    def mk_stream(seed):
        r = np.random.default_rng(seed)
        sel = np.sort(r.choice(len(keys_pool), size=r.integers(100, 800),
                               replace=False))
        keys = keys_pool[sel]
        U = len(keys)
        blob = np.full((P, L), 0xFFFFFFFF, np.uint32)
        blob[:U, 0] = (keys >> 32).astype(np.uint32)
        blob[:U, 1] = keys.astype(np.uint32)
        counts = np.zeros(P, np.uint32)
        counts[:U] = r.integers(1, 50, U)
        return keys, counts[:U].copy(), ResidentStream(
            jnp.asarray(blob), jnp.asarray(counts), U, int(counts.max()),
            np.zeros(257, np.int32), 0, 0,
        )

    made = [mk_stream(100 + i) for i in range(nc + nk)]
    red = GroupReducer(nc, nk)
    # adversarial arrival order: reversed
    for i in reversed(range(nc + nk)):
        red.add(i, made[i][2])
    # result() snapshots; with all leaves added before the worker races
    # ahead, it may return >1 stream per group — sum whatever comes back
    res = red.result()
    assert res is not None
    ctrl_list, case_list = res

    def collect(streams):
        agg = {}
        for s in streams:
            blob = np.asarray(s.blob)[: s.U]
            cnts = np.asarray(s.counts)[: s.U]
            keys = (blob[:, 0].astype(np.uint64) << 32) | blob[:, 1]
            # within one stream keys must be strictly ascending (sorted,
            # deduped)
            assert (np.diff(keys.astype(np.int64)) > 0).all()
            for k, c in zip(keys, cnts):
                agg[int(k)] = agg.get(int(k), 0) + int(c)
        return agg

    for glist, lo, hi in ((ctrl_list, 0, nc), (case_list, nc, nc + nk)):
        want = {}
        for i in range(lo, hi):
            for k, c in zip(made[i][0], made[i][1]):
                want[int(k)] = want.get(int(k), 0) + int(c)
        assert collect(glist) == want


def test_group_reducer_failure_propagates(monkeypatch):
    """A reduction failure poisons the reducer: result() returns None and
    the caller merges per-sample streams instead."""
    import jax.numpy as jnp

    import kmdiff_tpu.pipeline.fused as fmod
    from kmdiff_tpu.pipeline.fused import (
        FusedFallback,
        GroupReducer,
        ResidentStream,
    )

    def boom(streams):
        raise FusedFallback("forced")

    monkeypatch.setattr(fmod, "_reduce_streams_once", boom)
    red = GroupReducer(2, 1)
    blob = jnp.full((64, 2), 0xFFFFFFFF, jnp.uint32)
    cnt = jnp.zeros(64, jnp.uint32)
    for i in range(3):
        red.add(i, ResidentStream(blob, cnt, 0, 0,
                                  np.zeros(257, np.int32), 0, 0))
    # result() is a snapshot — give the worker time to attempt the pair
    # (it fails immediately via boom) before snapshotting
    import time

    for _ in range(200):
        if red.failed:
            break
        time.sleep(0.01)
    assert red.result() is None
    assert red.failed == "forced"
