"""Device-vectorized custom model plugin.

Demonstrates the `process_block_jax` plugin ABI: the pipeline feeds
[BLOCK_ROWS, S] int32 count tiles to this jitted function on the
accelerator (same tile discipline as the builtin Poisson-LRT filter), so
a custom model scales to billion-row cohorts — the TPU-native answer to
the reference's per-k-mer C++ plugin calls (reference:
include/kmdiff/model_manager.hpp:19-105, plugins/ex_model.cpp).

Numerically identical to examples/plugins/fold_change_model.py (the host
numpy version); tests assert the two produce the same outputs through
the full diff pipeline.
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
        counts = counts.astype(jnp.float64)
        mean_c = counts[:, :nb_controls].mean(axis=1)
        mean_k = counts[:, nb_controls:].mean(axis=1)
        ratio = (mean_k + 1.0) / (mean_c + 1.0)
        sig = (ratio >= self.fold) | (ratio <= 1.0 / self.fold)
        p = jnp.where(sig, 1e-30, 1.0)
        sign = jnp.where(
            mean_c > mean_k,
            jnp.int8(Significance.CONTROL),
            jnp.where(mean_k > mean_c, jnp.int8(Significance.CASE),
                      jnp.int8(Significance.NO)),
        )
        return p, sign, mean_c, mean_k


def create_model(config: str) -> DeviceFoldChangeModel:
    return DeviceFoldChangeModel(float(config) if config else 2.0)
