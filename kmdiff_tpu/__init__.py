"""kmdiff-tpu: a TPU-native differential k-mer analysis framework.

A from-scratch reimplementation of the capabilities of tlemane/kmdiff
(differential k-mer analysis between two read-set populations) designed
TPU-first: the per-k-mer scalar hot loops of the reference become vectorized
JAX/XLA/Pallas block kernels, subprocess+file handoffs become in-process
sharded arrays, and multi-host scaling rides jax.sharding meshes instead of
thread pools.

Pipeline (mirrors reference behavior, re-architected):
  count : reads (FASTA/FASTQ[.gz]) -> canonical k-mer counting on device
          (sort + run-length-encode) -> kmtricks-compatible run directory
          [replaces the `kmtricks pipeline` subprocess, src/cmd.cpp:27-48]
  diff  : per-partition multi-sample merge -> vectorized Poisson LRT
          (HAWK model) -> optional population-stratification correction
          (randomized PCA + batched logistic IRLS) -> multiple-testing
          correction -> control/case FASTA or KFF outputs
          [replaces include/kmdiff/cmd/diff.hpp:262-377]
  infos : build/runtime metadata  [include/kmdiff/cmd/infos.hpp:32-64]
"""

__version__ = "0.1.0"

from kmdiff_tpu.utils.exceptions import (  # noqa: F401
    KmdiffError,
    ConfigError,
    IOError_,
    BinaryError,
    EigenStratError,
    InputError,
)
