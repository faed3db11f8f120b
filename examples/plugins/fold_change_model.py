"""Example custom statistical model plugin.

The TPU-native analogue of the reference's dlopen plugin ABI
(reference: plugins/ex_model.cpp:1-33, include/kmdiff/model_manager.hpp):
a Python module exposing `create_model(config: str) -> model`. Load with

    kmdiff-tpu diff ... --model examples/plugins/fold_change_model.py \
        --model-config "2.0"

The model flags a k-mer as significant when the coverage-normalized mean
count ratio between groups exceeds a fold-change threshold (taken from the
config string). `process_block` is the vectorized entry the pipeline
calls; scalar `process` is derived from it via the base class.
"""

from __future__ import annotations

import numpy as np

from kmdiff_tpu.core.model import IModel, Significance

PLUGIN_NAME = "fold-change"


class FoldChangeModel(IModel):
    def __init__(self, fold: float = 2.0):
        self.fold = fold

    def process_block(self, counts: np.ndarray, nb_controls: int):
        counts = np.asarray(counts, dtype=np.float64)
        mean_c = counts[:, :nb_controls].mean(axis=1)
        mean_k = counts[:, nb_controls:].mean(axis=1)
        ratio = (mean_k + 1.0) / (mean_c + 1.0)
        sig = (ratio >= self.fold) | (ratio <= 1.0 / self.fold)
        # pseudo p-value: below threshold when significant
        p = np.where(sig, 1e-30, 1.0)
        sign = np.where(
            mean_c > mean_k,
            np.int8(Significance.CONTROL),
            np.where(mean_k > mean_c, np.int8(Significance.CASE),
                     np.int8(Significance.NO)),
        )
        return p, sign, mean_c, mean_k


def create_model(config: str) -> FoldChangeModel:
    return FoldChangeModel(float(config) if config else 2.0)
