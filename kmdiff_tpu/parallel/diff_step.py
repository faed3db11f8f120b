"""Sharded differential-test step: the multi-chip hot loop.

Row-shards a [R, S] count block over the mesh; every device runs the LRT
filter on its shard (kmdiff_tpu.ops.lrt) and global summary counters
(k-mers tested, significant, control/case split) reduce via psum over ICI.
This is the TPU equivalent of the reference's per-partition thread tasks +
final counter accumulation (merge.hpp:259-317, 402-413).

The step is jit-compiled once per (block shape, mesh) and reused for every
block of every partition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from kmdiff_tpu.ops.lrt import MARGIN_ABS, MARGIN_PER_COUNT, _lr_from_sums
from kmdiff_tpu.parallel.mesh import ROW_AXIS


def make_sharded_diff_step(mesh, nb_controls: int):
    """Build the jitted row-sharded LRT step for a mesh.

    step(counts [R, S] i32 row-sharded, ratio_c, ratio_k, lr_min) ->
      (keep [R] bool row-sharded, lr [R] f32, s_c [R] i32, s_k [R] i32,
       stats [4] i32 replicated: tested, significant, sig_control, sig_case)
    """

    def _local(counts, ratio_c, ratio_k, lr_min):
        s_c = jnp.sum(counts[:, :nb_controls], axis=1, dtype=jnp.int32)
        s_k = jnp.sum(counts[:, nb_controls:], axis=1, dtype=jnp.int32)
        lr = _lr_from_sums(s_c, s_k, ratio_c, ratio_k)
        tot = (s_c + s_k).astype(jnp.float32)
        keep = lr + MARGIN_PER_COUNT * tot + MARGIN_ABS >= lr_min
        # sign rule on-device (exact in integer space, model.hpp:164-173):
        # sC*Tk vs sK*Tc <=> sC*ratio_k vs sK*ratio_c scaled by (Tc+Tk)
        lhs = s_c.astype(jnp.float32) * ratio_k
        rhs = s_k.astype(jnp.float32) * ratio_c
        is_control = keep & (lhs > rhs)
        is_case_or_no = keep & ~(lhs > rhs)
        tested = jnp.int32(counts.shape[0])
        stats = jnp.stack(
            [
                tested,
                jnp.sum(keep, dtype=jnp.int32),
                jnp.sum(is_control, dtype=jnp.int32),
                jnp.sum(is_case_or_no, dtype=jnp.int32),
            ]
        )
        stats = jax.lax.psum(stats, ROW_AXIS)
        return keep, lr, s_c, s_k, stats

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(ROW_AXIS, None), P(), P(), P()),
        out_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P()),
    )
    return jax.jit(sharded)


def shard_rows(mesh, arr):
    """Place a [R, ...] array row-sharded on the mesh (R % n_devices == 0)."""
    spec = P(ROW_AXIS, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
