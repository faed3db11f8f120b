"""Multi-chip sharding tests (virtual 8-device CPU mesh via conftest)."""

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

    sys.path.insert(0, "/root/repo")
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
