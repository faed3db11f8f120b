"""Device-vectorized custom model plugin.

Demonstrates the `process_block_jax` plugin ABI: the pipeline feeds
[BLOCK_ROWS, S] int32 count tiles to this jitted function on the
accelerator (same tile discipline as the builtin Poisson-LRT filter), so
a custom model scales to billion-row cohorts — the TPU-native answer to
the reference's per-k-mer C++ plugin calls (reference:
include/kmdiff/model_manager.hpp:19-105, plugins/ex_model.cpp).

Decision-identical to examples/plugins/fold_change_model.py (the host
numpy version): the fold test and the sign are computed by integer
cross-multiplication, which f32 evaluates exactly while every per-row
count sum stays below 2^24 — no jax_enable_x64 needed. (A naive
`astype(jnp.float64)` would silently run in f32 and could flip
borderline decisions vs the host's true f64.) Tests assert the two
plugins produce the same outputs through the full diff pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from kmdiff_tpu.core.model import IModel, Significance

PLUGIN_NAME = "fold-change-device"


class DeviceFoldChangeModel(IModel):
    def __init__(self, fold: float = 2.0):
        self.fold = fold

    @functools.partial(jax.jit, static_argnames=("self", "nb_controls"))
    def process_block_jax(self, counts, nb_controls: int):
        nc = nb_controls
        nk = counts.shape[1] - nb_controls
        # integer row sums, exact in f32 below 2^24
        sum_c = counts[:, :nc].sum(axis=1).astype(jnp.float32)
        sum_k = counts[:, nc:].sum(axis=1).astype(jnp.float32)
        mean_c = sum_c / nc
        mean_k = sum_k / nk
        # (mean_k+1)/(mean_c+1) >= fold  <=>  nc*(sum_k+nk) >= fold*nk*(sum_c+nc)
        # — integer-product form, f32-exact in this example's count domain
        lhs = nc * (sum_k + nk)
        rhs = nk * (sum_c + nc)
        sig = (lhs >= self.fold * rhs) | (self.fold * lhs <= rhs)
        p = jnp.where(sig, 1e-30, 1.0)
        # mean_c > mean_k  <=>  nk*sum_c > nc*sum_k (exact)
        sign = jnp.where(
            nk * sum_c > nc * sum_k,
            jnp.int8(Significance.CONTROL),
            jnp.where(nc * sum_k > nk * sum_c, jnp.int8(Significance.CASE),
                      jnp.int8(Significance.NO)),
        )
        return p, sign, mean_c, mean_k


def create_model(config: str) -> DeviceFoldChangeModel:
    return DeviceFoldChangeModel(float(config) if config else 2.0)
