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


def _tune_host_allocator() -> None:
    """Keep large numpy buffers on the heap instead of per-allocation mmap.

    glibc serves allocations above M_MMAP_THRESHOLD (<= 32 MB dynamic max)
    straight from mmap and unmaps them on free, so every large temporary
    repays first-touch page faults. On sandboxed/virtualized hosts faults
    can run at ~10-20 MB/s (measured here: a 37 MB astype temp cost 2-5 s
    per call; with the heap serving it, 10 ms after the one-time
    high-water fault-in). Raising the threshold makes the host pipeline's
    big temporaries (decode buffers, triple staging, fetch concatenates)
    reuse heap pages. Opt out with KMDIFF_NO_MALLOC_TUNE=1."""
    import os

    if os.environ.get("KMDIFF_NO_MALLOC_TUNE") == "1":
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:  # glibc-specific tuning, never fatal
        pass


_setup_jax_cache()
_tune_host_allocator()

from kmdiff_tpu.utils.exceptions import (  # noqa: F401
    KmdiffError,
    ConfigError,
    IOError_,
    BinaryError,
    EigenStratError,
    InputError,
)
