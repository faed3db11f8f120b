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


def _setup_jax_cache() -> None:
    """Persistent XLA compilation cache: kernel shapes recompile across runs
    otherwise (~40s per shape over a remote-tunnel TPU). Opt out with
    KMDIFF_NO_JAX_CACHE=1."""
    import os

    if os.environ.get("KMDIFF_NO_JAX_CACHE") == "1":
        return
    # CPU compiles are fast and CPU AOT entries are machine-feature
    # sensitive (stale entries risk SIGILL); cache only accelerator runs
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "kmdiff_tpu", "jax"
    )
    try:
        os.makedirs(cache, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never fatal
        pass


_setup_jax_cache()

from kmdiff_tpu.utils.exceptions import (  # noqa: F401
    KmdiffError,
    ConfigError,
    IOError_,
    BinaryError,
    EigenStratError,
    InputError,
)
