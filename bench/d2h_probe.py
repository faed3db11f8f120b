#!/usr/bin/env python3
"""D2H bandwidth vs concurrency + chunk size on the live rig: does the
tunnel's aggregate fetch rate keep scaling past the shipped 4-thread /
4 MB discipline (utils.transfer), and what does a whole count-stream
fetch cost at each setting? Decides whether the two-stage counting flow
(846 MB of per-sample stream fetches) has transfer headroom."""

import concurrent.futures as cf
import itertools
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    # one bench sample's stream fetch: [4.7M, 2] u32 lanes + u8 counts
    rows = 4_700_000
    blob = jnp.asarray(rng.integers(0, 2**32, (rows, 2), dtype=np.uint64)
                       .astype(np.uint32))
    _ = int(blob[0, 0])  # enter sync-dispatch mode like every consumer
    nbytes = rows * 8

    def fresh_slices(rows_per, off):
        # FRESH device slices each rep: jax Arrays cache their host copy
        # after the first np.asarray, so reusing a slice list measures
        # the cache, not the link (first probe version read 20+ GB/s)
        return [blob[i + off: i + off + rows_per]
                for i in range(0, rows - rows_per, rows_per)]

    for threads, chunk_mb in itertools.product((2, 4, 8, 16), (2, 4, 8, 16)):
        rows_per = max((chunk_mb << 20) // 8, 1)
        # warm compile of the slice shapes
        with cf.ThreadPoolExecutor(threads) as pool:
            list(pool.map(np.asarray, fresh_slices(rows_per, 0)))
        t0 = time.perf_counter()
        reps = 2
        for r in range(reps):
            sl = fresh_slices(rows_per, r + 1)
            with cf.ThreadPoolExecutor(min(threads, len(sl))) as pool:
                list(pool.map(np.asarray, sl))
        dt = (time.perf_counter() - t0) / reps
        nb = (rows - rows_per) * 8
        print(f"[d2h] threads={threads:2d} chunk={chunk_mb:2d}MB: "
              f"{nb/dt/1e6:6.1f} MB/s ({dt*1e3:.0f} ms / "
              f"{nb >> 20} MB)", flush=True)


if __name__ == "__main__":
    main()
