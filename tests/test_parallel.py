"""Multi-chip sharding tests (virtual 8-device CPU mesh via conftest)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmdiff_tpu.ops.lrt import LrtParams, lrt_filter_block
from kmdiff_tpu.parallel import make_mesh, make_sharded_diff_step
from kmdiff_tpu.parallel.diff_step import shard_rows


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_step_matches_single_device(mesh):
    nb_controls, nb_cases = 3, 5
    S = nb_controls + nb_cases
    R = 8 * 64
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 50, size=(R, S), dtype=np.int32)
    params = LrtParams(nb_controls, nb_cases, 100_000, 120_000, 0.01)
    args = (
        jnp.float32(params.ratio_c),
        jnp.float32(params.ratio_k),
        jnp.float32(params.lr_min),
    )

    step = make_sharded_diff_step(mesh, nb_controls)
    keep_s, lr_s, sc_s, sk_s, stats = step(shard_rows(mesh, jnp.asarray(counts)), *args)

    keep1, lr1, sc1, sk1 = lrt_filter_block(jnp.asarray(counts), nb_controls, *args)

    np.testing.assert_array_equal(np.asarray(keep_s), np.asarray(keep1))
    np.testing.assert_allclose(np.asarray(lr_s), np.asarray(lr1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(sc_s), np.asarray(sc1))
    stats = np.asarray(stats)
    assert stats[0] == R
    assert stats[1] == int(np.asarray(keep1).sum())
    assert stats[1] == stats[2] + stats[3]


def test_dryrun_entrypoints():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (8192,)

    g.dryrun_multichip(8)


def test_mesh_too_many_devices():
    with pytest.raises(ValueError, match="need 16 devices"):
        make_mesh(16)


def test_sharded_count_regroup(mesh):
    """all_to_all shuffle: partition-grouped per-sample counts match a
    direct host group-by."""
    from kmdiff_tpu.ops.codec import partition_ids as dev_part
    from kmdiff_tpu.parallel.count_step import (
        make_sharded_count_regroup,
        shard_triples,
    )

    D = 8
    nb_partitions = 16
    rng = np.random.default_rng(0)
    L = 256  # rows per device
    N = D * L
    hi = rng.integers(0, 2**31, N, dtype=np.uint32)
    lo = rng.integers(0, 2**32, N, dtype=np.uint32)
    sample = rng.integers(0, 4, N, dtype=np.int32)
    count = rng.integers(1, 9, N, dtype=np.int32)
    # sprinkle padding sentinels
    pad = rng.random(N) < 0.05
    hi[pad] = 0xFFFFFFFF
    lo[pad] = 0xFFFFFFFF
    count[pad] = 0

    step = make_sharded_count_regroup(mesh, nb_partitions, bucket_cap=96)
    r_hi, r_lo, r_sm, r_c, dropped = step(
        *shard_triples(mesh, hi, lo, sample, count)
    )
    assert int(np.asarray(dropped)[0]) == 0

    r_hi = np.asarray(r_hi)
    r_lo = np.asarray(r_lo)
    r_sm = np.asarray(r_sm)
    r_c = np.asarray(r_c)

    parts_all = np.asarray(dev_part(jnp.asarray(hi), jnp.asarray(lo),
                                    nb_partitions))
    per_dev = len(r_hi) // D
    for d in range(D):
        got = {}
        seg = slice(d * per_dev, (d + 1) * per_dev)
        for h, l, s, c in zip(r_hi[seg], r_lo[seg], r_sm[seg], r_c[seg]):
            if h == 0xFFFFFFFF and l == 0xFFFFFFFF:
                continue
            got[(h, l, s)] = got.get((h, l, s), 0) + c
        want = {}
        mask = ~pad & ((parts_all % D) == d)
        for h, l, s, c in zip(hi[mask], lo[mask], sample[mask], count[mask]):
            want[(h, l, s)] = want.get((h, l, s), 0) + c
        assert got == want, f"device {d} rows differ"


# ---------------------------------------------------------------------------
# product-pipeline mesh execution (the shipped path, not the kernel demos)
# ---------------------------------------------------------------------------

@pytest.fixture
def mesh_runtime():
    """Reset the global mesh runtime around a test."""
    from kmdiff_tpu.parallel import runtime

    yield runtime
    runtime.configure(None)


def test_product_merge_mesh_byte_identical(fixture_dir, mesh_runtime):
    """The shipped diff merge over the 8-device mesh produces accumulator
    blocks byte-identical to single-device execution (psum'd counters,
    per-device survivor compaction)."""
    from kmdiff_tpu.core.model import PoissonLikelihood
    from kmdiff_tpu.io.accumulator import KmerSignBlock, VectorAccumulator
    from kmdiff_tpu.io.kmtricks import (
        get_partition_paths,
        get_total_kmer,
        read_config,
    )
    from kmdiff_tpu.pipeline.merge import GlobalMerge, PartitionProcessor

    config = read_config(fixture_dir)
    tc, tk = get_total_kmer(fixture_dir, 1, 1, config.abundance_min)

    def run():
        model = PoissonLikelihood(1, 1, tc, tk)
        proc = PartitionProcessor(model, 1, 1, 0.5, keep_counts=True)
        accs = [VectorAccumulator() for _ in range(config.nb_partitions)]
        merger = GlobalMerge(proc, accs, nb_threads=2)
        total = merger.merge_partitions(
            get_partition_paths(fixture_dir, config.nb_partitions)
        )
        return merger, accs, total

    mesh_runtime.configure(1)
    m1, a1, t1 = run()
    mesh_runtime.configure(8)
    from kmdiff_tpu.parallel.runtime import get_mesh

    assert get_mesh() is not None
    m8, a8, t8 = run()

    assert t1 == t8 == 320
    assert m1.nb_sign() == m8.nb_sign()
    assert m1.signs() == m8.signs()
    for p in range(config.nb_partitions):
        b1 = KmerSignBlock.concat(list(a1[p].blocks()))
        b8 = KmerSignBlock.concat(list(a8[p].blocks()))
        np.testing.assert_array_equal(b1.kmers, b8.kmers)
        np.testing.assert_array_equal(b1.pvalues, b8.pvalues)
        np.testing.assert_array_equal(b1.signs, b8.signs)
        np.testing.assert_array_equal(b1.counts_ratio, b8.counts_ratio)


@pytest.mark.parametrize("k", [21, 40])
def test_product_count_mesh_byte_identical(k, mesh_runtime):
    """Fused mesh counting (extraction -> all_to_all regroup -> per-device
    sort+RLE) equals the single-device fused kernel exactly."""
    from kmdiff_tpu.pipeline.count import (
        _flat_codes,
        count_sample_device,
        count_sample_device_mesh,
    )

    rng = np.random.default_rng(5)
    reads = ["".join(rng.choice(list("ACGT"), 250)) for _ in range(30)] * 2
    codes = _flat_codes([s.encode() for s in reads])

    k1, p1, c1 = count_sample_device([codes], k, 7)
    k8, p8, c8 = count_sample_device_mesh([codes], k, 7, make_mesh(8))
    np.testing.assert_array_equal(k1, k8)
    np.testing.assert_array_equal(p1, p8)
    np.testing.assert_array_equal(c1, c8)


def test_product_cli_e2e_mesh_byte_identical(tmp_path, mesh_runtime):
    """Full count+diff through the command entry points: mesh output files
    == single-device output files byte-for-byte (the dryrun_multichip
    contract, kept under pytest)."""
    import os

    from kmdiff_tpu.cmd.count import main_count
    from kmdiff_tpu.cmd.diff import main_diff
    from kmdiff_tpu.cmd.options import CountOptions, DiffOptions
    from kmdiff_tpu.core.corrector import CorrectionType

    rng = np.random.default_rng(11)
    bases = np.array(list("ACGT"))
    shared_c = ["".join(rng.choice(bases, 120)) for _ in range(4)]
    shared_k = ["".join(rng.choice(bases, 120)) for _ in range(4)]
    fof_lines = []
    for sid in ("C1", "C2", "K1", "K2"):
        fa = tmp_path / f"{sid}.fasta"
        shared = shared_c if sid.startswith("C") else shared_k
        with open(fa, "w") as f:
            for j, s in enumerate(shared):
                for r in range(6):
                    f.write(f">s{j}_{r}\n{s}\n")
            for j in range(4):
                f.write(f">r{j}\n{''.join(rng.choice(bases, 120))}\n")
        fof_lines.append(f"{sid} : {fa}")
    fof = tmp_path / "fof.txt"
    fof.write_text("\n".join(fof_lines) + "\n")

    def run(tag, n_dev):
        run_dir = tmp_path / f"run_{tag}"
        out_dir = tmp_path / f"out_{tag}"
        main_count(CountOptions(
            fof=str(fof), directory=str(run_dir), kmer_size=21, hard_min=1,
            nb_partitions=8, nb_threads=2, n_devices=n_dev,
        ))
        res = main_diff(DiffOptions(
            kmtricks_dir=str(run_dir), output_directory=str(out_dir),
            nb_controls=2, nb_cases=2, threshold=0.8, cutoff=1.0,
            correction=CorrectionType.BONFERRONI, nb_threads=2,
            n_devices=n_dev,
        ))
        blobs = {}
        for name in ("control_kmers.fasta", "case_kmers.fasta"):
            blobs[name] = (out_dir / name).read_bytes()
        return res, blobs

    res1, out1 = run("single", 1)
    res8, out8 = run("mesh", 8)
    assert res1 == res8
    assert res1["control"] + res1["case"] > 0
    assert out1 == out8
