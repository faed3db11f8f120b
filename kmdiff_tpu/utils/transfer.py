"""Device->host transfer tuned for slow-uplink rigs.

On tunneled TPU rigs the single-stream D2H path can run at a few MB/s
while several concurrent smaller reads sustain 5-6x that (measured on the
axon tunnel: 16 MB plain np.asarray ~3.2 s vs 4 MB x 4 threads ~0.5 s).
`device_fetch` slices a device array along axis 0 into ~chunk_bytes pieces
and fetches them on a small thread pool. On healthy PCIe hosts the chunks
are large enough that the overhead is noise.
"""

from __future__ import annotations

import concurrent.futures as cf

import numpy as np

#: target bytes per fetch slice (round-5 grid probe, bench/d2h_probe.py:
#: 2 MB slices at 8 streams sustained ~28-34 MB/s vs ~15-34 for the old
#: 4 MB x 4 — noisy rig, but no configuration beat 8 x 2 MB consistently
#: and 16 MB slices were always worst)
_CHUNK_BYTES = int(__import__("os").environ.get(
    "KMDIFF_FETCH_CHUNK_BYTES", 2 << 20))
#: max concurrent fetch streams
_THREADS = int(__import__("os").environ.get("KMDIFF_FETCH_THREADS", 8))


def device_fetch(arr) -> np.ndarray:
    """Materialize a jax array on host, chunk-parallel when large."""
    nbytes = getattr(arr, "nbytes", 0)
    if nbytes <= _CHUNK_BYTES or arr.ndim == 0 or arr.shape[0] < _THREADS:
        return np.asarray(arr)
    n = arr.shape[0]
    row_bytes = max(nbytes // n, 1)
    rows_per = max(_CHUNK_BYTES // row_bytes, 1)
    slices = [arr[i : i + rows_per] for i in range(0, n, rows_per)]
    with cf.ThreadPoolExecutor(min(_THREADS, len(slices))) as pool:
        parts = list(pool.map(np.asarray, slices))
    return np.concatenate(parts, axis=0)


def fetch_prefix(arr, n: int, min_bucket: int = 1 << 10) -> np.ndarray:
    """Fetch the first `n` rows of a (possibly padded) device array.

    The array is sliced DEVICE-side to a quarter-pow2 bucket >= n first
    ({1, 1.25, 1.5, 1.75} x 2^b — a bounded compiled-shape set, slice
    compiles are cheap, and at most 1.25n rows cross the link instead of
    the 2n a plain pow2 ladder allows), then fetched chunk-parallel. This
    is the D2H discipline every padded kernel output must use on slow
    uplinks: fetching the full pad via np.asarray moves pad_size/row-count
    more bytes over a single stream (measured here: ~5 MB/s vs ~30 MB/s
    chunked — the difference between seconds and minutes per partition at
    realistic hit rates)."""
    n = int(n)
    total = arr.shape[0]
    if n <= min_bucket:
        cap = min(total, min_bucket)
    else:
        # smallest (4 + q) << (b - 3) >= n for q in 1..4: four buckets per
        # octave, worst-case 1.25x overfetch
        b = max(n - 1, 1).bit_length()
        step = 1 << max(b - 3, 0)
        cap = min(total, -(-n // step) * step)
    if cap < total:
        arr = arr[:cap]
    return device_fetch(arr)[:n]
