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

#: target bytes per fetch slice
_CHUNK_BYTES = 4 << 20
#: max concurrent fetch streams
_THREADS = 4


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
