"""`kmdiff-tpu count`: build a counting run-dir from read sets.

Reference: src/cmd.cpp:27-48 shells out to `kmtricks pipeline`; here counting
is in-process on TPU (kmdiff_tpu.pipeline.count) producing a
kmtricks-compatible run directory (counts/partition_*/. histograms/.
kmtricks.fof, kmdiff-count.opt) that `diff` — ours or the reference's —
consumes.
"""

from __future__ import annotations

import os

from kmdiff_tpu.cmd.options import CountOptions
from kmdiff_tpu.utils.logging import logger
from kmdiff_tpu.utils.timer import Timer


def main_count(opt: CountOptions, recurrence_min: int = 1) -> None:
    from kmdiff_tpu.parallel import runtime
    from kmdiff_tpu.pipeline.count import run_count

    runtime.configure(opt.n_devices)
    timer = Timer()
    run_count(opt, recurrence_min=recurrence_min)
    # consumed later by read_config (reference: src/cmd.cpp:46-47)
    with open(os.path.join(opt.directory, "kmdiff-count.opt"), "w") as f:
        f.write(f"kmer_size={opt.kmer_size}, abundance_min={opt.hard_min}\n")
    logger.info("Done in %s.", timer.formatted())
