"""Device-side partition merge + LRT: sort / segment-reduce / compact.

The host union-merge (pipeline.merge.merge_sorted_streams) materializes a
dense [U, S] matrix and ships it to the device — 4·S bytes per distinct
k-mer of H2D. This kernel moves the merge itself on-device: the S sorted
per-sample streams are shipped ONCE as raw (kmer, sample, count) triples
(14 bytes per record), and everything else happens in HBM:

  lax.sort by (hi, lo)                      — the S-way merge
  run-boundary flags -> segment ids         — distinct k-mer grouping
  segment_sum of control/case counts        — the only statistics the
                                              Poisson LRT needs
  LR threshold + fixed-size compaction      — survivors only (plus the
                                              Bernoulli PCA sample rows)
  D2H: survivor k-mers/sums + [4] counters  — thousands, not billions

Compaction capacities are static (jit); the kernel reports true survivor
counts so the host can detect overflow and retry with a larger budget
(pipeline.merge handles that; thresholds of alpha/cutoff ~ 5e-7 keep
survivor fractions tiny in practice, cli.cpp:197-204).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kmdiff_tpu.ops.lrt import MARGIN_ABS, MARGIN_PER_COUNT, _lr_from_sums

_SAMPLE_SEED = np.uint32(0x51ED2700)


def _avalanche(h):
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


@functools.partial(
    jax.jit,
    static_argnames=("nb_controls", "max_hits", "max_geno", "want_geno"),
)
def merge_lrt_kernel(
    hi, lo, sample, count,
    nb_controls: int,
    ratio_c, ratio_k, lr_min,
    pca_threshold_u32, pca_seed,
    max_hits: int,
    max_geno: int,
    want_geno: bool,
):
    """One partition's merged test, fully on device.

    hi/lo: [N] u32 packed k-mer lanes (padding rows = 0xFFFFFFFF/0xFFFFFFFF)
    sample: [N] i32, count: [N] i32 (padding: sample 0, count 0)

    Returns dict with:
      n_distinct, n_hits, n_geno          scalars (i32)
      hit_hi, hit_lo [max_hits] u32       survivor k-mers (slot-compacted)
      hit_sc, hit_sk [max_hits] i32       survivor group sums
      hit_seg [max_hits] i32              survivor segment ids (for host
                                          count-row reconstruction)
      geno_* (when want_geno)             sampled k-mer ids + presence rows
    """
    N = hi.shape[0]

    hi_s, lo_s, sample_s, count_s = jax.lax.sort(
        (hi, lo, sample, count), num_keys=2
    )

    first = jnp.ones((1,), dtype=bool)
    change = (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])
    is_start = jnp.concatenate([first, change])
    # padding (sentinel kmer) contributes exactly one run at the end when
    # present; mask it out via the sentinel value
    is_pad = (hi_s == jnp.uint32(0xFFFFFFFF)) & (lo_s == jnp.uint32(0xFFFFFFFF))
    is_start = is_start & ~is_pad
    valid = ~is_pad

    n_distinct = jnp.sum(is_start, dtype=jnp.int32)

    # Segments are contiguous runs of the SORTED stream, so every
    # per-segment reduction is a cumsum difference at run boundaries —
    # scans + gathers only, no scatters (TPU scatters serialize).
    idx = jnp.arange(N, dtype=jnp.int32)
    is_ctrl = sample_s < nb_controls
    cc_ctrl = jnp.cumsum(jnp.where(is_ctrl & valid, count_s, 0))
    cc_case = jnp.cumsum(jnp.where(~is_ctrl & valid, count_s, 0))

    seg_start = jax.lax.cummax(jnp.where(is_start, idx, -1))  # run start row
    nxt = jnp.where(is_start, idx, N)
    nxt_shift = jnp.concatenate([nxt[1:], jnp.full((1,), N, jnp.int32)])
    seg_end = jax.lax.cummin(nxt_shift, reverse=True) - 1  # run end row
    ss = jnp.clip(seg_start, 0, N - 1)
    se = jnp.clip(seg_end, 0, N - 1)
    x_c = jnp.where(is_ctrl & valid, count_s, 0)
    s_c = cc_ctrl[se] - cc_ctrl[ss] + x_c[ss]
    x_k = jnp.where(~is_ctrl & valid, count_s, 0)
    s_k = cc_case[se] - cc_case[ss] + x_k[ss]

    lr = _lr_from_sums(s_c, s_k, ratio_c, ratio_k)
    tot = (s_c + s_k).astype(jnp.float32)
    keep = is_start & (lr + MARGIN_PER_COUNT * tot + MARGIN_ABS >= lr_min)

    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # per-row segment id

    n_hits = jnp.sum(keep, dtype=jnp.int32)
    hit_rows = jnp.nonzero(keep, size=max_hits, fill_value=N - 1)[0]
    out = {
        "n_distinct": n_distinct,
        "n_hits": n_hits,
        "hit_hi": hi_s[hit_rows],
        "hit_lo": lo_s[hit_rows],
        "hit_sc": s_c[hit_rows],
        "hit_sk": s_k[hit_rows],
        "hit_seg": seg[hit_rows],
        "n_geno": jnp.int32(0),
    }

    if want_geno:
        # deterministic Bernoulli(kmer_pca) sample keyed on the k-mer value
        # (matches pipeline.popstrat.sample_mask)
        h = _avalanche(hi_s ^ (_SAMPLE_SEED ^ pca_seed))
        h = _avalanche(lo_s ^ h)
        sampled = is_start & (h < pca_threshold_u32)
        n_geno = jnp.sum(sampled, dtype=jnp.int32)
        geno_rows = jnp.nonzero(sampled, size=max_geno, fill_value=N - 1)[0]
        out["n_geno"] = n_geno
        out["geno_seg"] = seg[geno_rows]

    # host needs the sorted stream to rebuild per-sample rows for survivors
    # and geno samples; returned lazily (device arrays) — the host only
    # pulls them when popstrat/save paths are active. Padding rows export
    # segment id N so they never alias a real segment in searchsorted.
    out["sorted_sample"] = sample_s
    out["sorted_count"] = count_s
    out["sorted_seg"] = jnp.where(valid, seg, N)
    return out


def pca_threshold_u32(rate: float) -> np.uint32:
    return np.uint32(min(rate, 1.0) * 4294967295.0)


def build_triples(
    kmers_list: list[np.ndarray], counts_list: list[np.ndarray], pad_to: int
):
    """Host: per-sample sorted streams -> padded u32/i32 triple arrays."""
    sizes = [len(k) for k in kmers_list]
    N = int(np.sum(sizes))
    hi = np.full(pad_to, 0xFFFFFFFF, dtype=np.uint32)
    lo = np.full(pad_to, 0xFFFFFFFF, dtype=np.uint32)
    sample = np.zeros(pad_to, dtype=np.int32)
    count = np.zeros(pad_to, dtype=np.int32)
    pos = 0
    for s, (k, c) in enumerate(zip(kmers_list, counts_list)):
        n = len(k)
        v = k[:, 0]
        hi[pos : pos + n] = (v >> np.uint64(32)).astype(np.uint32)
        lo[pos : pos + n] = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        sample[pos : pos + n] = s
        count[pos : pos + n] = c.view(np.int32) if c.dtype == np.uint32 else c
        pos += n
    return hi, lo, sample, count, N


def rows_for_segments(
    seg_ids: np.ndarray,
    sorted_seg: np.ndarray,
    sorted_sample: np.ndarray,
    sorted_count: np.ndarray,
    nb_samples: int,
) -> np.ndarray:
    """Host: dense [len(seg_ids), S] count rows for chosen segments, from
    the device-sorted stream (segments are contiguous runs)."""
    starts = np.searchsorted(sorted_seg, seg_ids, side="left")
    ends = np.searchsorted(sorted_seg, seg_ids, side="right")
    out = np.zeros((len(seg_ids), nb_samples), dtype=np.uint32)
    for i, (a, b) in enumerate(zip(starts, ends)):
        out[i, sorted_sample[a:b]] = sorted_count[a:b]
    return out
