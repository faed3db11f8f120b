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
