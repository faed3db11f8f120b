"""Device (JAX) k-mer extraction kernels: the counting engine's compute path.

Replaces the reference's kmtricks counting internals (FASTA parse ->
super-k-mers -> minimizer repartition -> per-partition count; reference:
SURVEY.md §2.2, invoked at src/cmd.cpp:34-44) with a TPU-shaped dataflow:

  host: ascii reads -> 2-bit codes (+invalid marks), reads joined with one
        invalid separator byte so no window spans two reads
  device (this module, all fixed-shape jit):
        codes[BLOCK] -> rolling 2k-bit k-mer values in u32 lanes
                     -> reverse-complement + canonical select (bit ops)
                     -> partition id via an avalanche hash
        sorted count: lax.sort over (hi, lo) u32 key pairs + run-length
        boundary flags
  host: mask-compact survivors, run-length encode, spill per-partition
        sorted count files

Design notes (TPU-first):
  * k-mers live as TWO u32 lanes (hi, lo) for k <= 32 — native TPU int
    width; value hi*2^32+lo equals the host codec's packed u64
    (kmdiff_tpu.core.kmer), so numeric order == lexicographic order and
    host interop is a shift-or.
  * windows are computed as k shifted vector adds (VPU) rather than a
    sequential rolling scan — O(k·N) elementwise work, fully parallel,
    fused by XLA into a few passes over the block.
  * partitioning uses a murmur3-style avalanche of the canonical value
    modulo P instead of kmtricks' minimizer repartition: same contract
    (deterministic k-mer -> partition across samples), better balance, no
    repartition pre-pass. Minimizer locality only matters for super-k-mer
    compression, which the dense-array pipeline does not need.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: sentinel code for invalid bases / read separators (valid codes are 0..3)
INVALID = np.uint8(0xFF)


def encode_ascii_block(seq_bytes: np.ndarray) -> np.ndarray:
    """Host helper: ascii -> codes with INVALID for non-ACGT."""
    from kmdiff_tpu.core.kmer import encode_bases

    codes, valid = encode_bases(seq_bytes)
    return np.where(valid, codes, INVALID)


@functools.partial(jax.jit, static_argnames=("k",))
def extract_canonical_kmers(codes: jax.Array, k: int):
    """All k-windows of a code block as canonical (hi, lo) u32 pairs.

    codes: [N] uint8 with INVALID marking non-ACGT bases and read breaks.
    Returns (hi [W] u32, lo [W] u32, ok [W] bool) with W = N - k + 1.
    A window is ok iff it contains no INVALID byte.

    k <= 32. First base occupies the highest-order bits of the 2k-bit
    value (kmtricks packing; reference kmer ordering relies on this).
    """
    if k > 32:
        raise ValueError("device codec fast path supports k <= 32")
    N = codes.shape[0]
    W = N - k + 1
    c32 = codes.astype(jnp.uint32)
    bad = (codes == INVALID).astype(jnp.int32)

    # window validity via prefix sums of invalid marks
    cum = jnp.cumsum(bad)
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32), cum])
    ok = (cum[k:] - cum[:-k]) == 0

    base = jnp.where(codes == INVALID, 0, c32)

    fwd_hi = jnp.zeros(W, jnp.uint32)
    fwd_lo = jnp.zeros(W, jnp.uint32)
    rc_hi = jnp.zeros(W, jnp.uint32)
    rc_lo = jnp.zeros(W, jnp.uint32)
    for j in range(k):
        cj = jax.lax.slice(base, (j,), (j + W,))
        shift = 2 * (k - 1 - j)  # forward: base j at bits [shift, shift+2)
        if shift >= 32:
            fwd_hi = fwd_hi | (cj << (shift - 32))
        else:
            fwd_lo = fwd_lo | (cj << shift)
        rj = cj ^ 2  # complement: A<->T (0<->2), C<->G (1<->3)
        rshift = 2 * j  # rc places base j at bits [2j, 2j+2)
        if rshift >= 32:
            rc_hi = rc_hi | (rj << (rshift - 32))
        else:
            rc_lo = rc_lo | (rj << rshift)

    take_rc = (rc_hi < fwd_hi) | ((rc_hi == fwd_hi) & (rc_lo < fwd_lo))
    hi = jnp.where(take_rc, rc_hi, fwd_hi)
    lo = jnp.where(take_rc, rc_lo, fwd_lo)
    return hi, lo, ok


@functools.partial(jax.jit, static_argnames=("k",))
def extract_canonical_kmers_multi(codes: jax.Array, k: int):
    """Multi-word variant for 32 < k <= 64: four u32 lanes per k-mer.

    Lane mapping matches the host codec's two-u64-word layout
    (core.kmer.pack_codes: word0 = bases 0..31 full-width, word1 = bases
    32..k-1 right-aligned): lane0 = word0>>32, lane1 = word0&MASK,
    lane2 = word1>>32, lane3 = word1&MASK — so a 4-key lexicographic sort
    equals the host word ordering.

    Returns (l0, l1, l2, l3, ok).
    """
    if not (32 < k <= 64):
        raise ValueError("multi-word fast path covers 32 < k <= 64")
    N = codes.shape[0]
    W = N - k + 1
    bad = (codes == INVALID).astype(jnp.int32)
    cum = jnp.cumsum(bad)
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32), cum])
    ok = (cum[k:] - cum[:-k]) == 0

    base = jnp.where(codes == INVALID, 0, codes.astype(jnp.uint32))

    def lane_shift(pos_bits: int):
        """(lane index, in-lane shift) for a base at word-layout bit
        offset pos_bits; word0 occupies lanes 0-1, word1 lanes 2-3."""
        word, bit = divmod(pos_bits, 64)
        lane = word * 2 + (0 if bit >= 32 else 1)
        return lane, bit - 32 if bit >= 32 else bit

    fwd = [jnp.zeros(W, jnp.uint32) for _ in range(4)]
    rc = [jnp.zeros(W, jnp.uint32) for _ in range(4)]
    k1 = k - 32  # word1 base count
    for j in range(k):
        cj = jax.lax.slice(base, (j,), (j + W,))
        # forward: base j -> word0 bit 2*(31-j) (j<32) else word1 bit
        # 2*(k-1-j)
        if j < 32:
            lane, sh = lane_shift(2 * (31 - j))
        else:
            lane, sh = lane_shift(64 + 2 * (k - 1 - j))
        fwd[lane] = fwd[lane] | (cj << sh)
        # reverse complement: complement base lands at rc index i = k-1-j
        rj = cj ^ 2
        i = k - 1 - j
        if i < 32:
            lane, sh = lane_shift(2 * (31 - i))
        else:
            lane, sh = lane_shift(64 + 2 * (k - 1 - i))
        rc[lane] = rc[lane] | (rj << sh)

    # lexicographic min(fwd, rc) over the 4 lanes
    take_rc = jnp.zeros(W, bool)
    undecided = jnp.ones(W, bool)
    for l in range(4):
        lt = rc[l] < fwd[l]
        gt = rc[l] > fwd[l]
        take_rc = take_rc | (undecided & lt)
        undecided = undecided & ~(lt | gt)
    out = [jnp.where(take_rc, rc[l], fwd[l]) for l in range(4)]
    return out[0], out[1], out[2], out[3], ok


@jax.jit
def sort_kmers4_with_parts(part, l0, l1, l2, l3):
    """Device sort by (partition, 4 k-mer lanes) + run-start flags."""
    p_s, a, b, c, d = jax.lax.sort((part, l0, l1, l2, l3), num_keys=5)
    first = jnp.ones(1, dtype=bool)
    rest = (
        (p_s[1:] != p_s[:-1])
        | (a[1:] != a[:-1])
        | (b[1:] != b[:-1])
        | (c[1:] != c[:-1])
        | (d[1:] != d[:-1])
    )
    return p_s, a, b, c, d, jnp.concatenate([first, rest])


def lanes_to_u64_words(l0, l1, l2, l3) -> np.ndarray:
    """Host: 4 u32 lanes -> [n, 2] u64 words (core.kmer layout)."""
    w0 = (l0.astype(np.uint64) << np.uint64(32)) | l1.astype(np.uint64)
    w1 = (l2.astype(np.uint64) << np.uint64(32)) | l3.astype(np.uint64)
    return np.stack([w0, w1], axis=1)


def _avalanche(h: jax.Array) -> jax.Array:
    """murmur3 fmix32 finalizer — full-avalanche u32 mixer."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


@functools.partial(jax.jit, static_argnames=("nb_partitions",))
def partition_ids(hi: jax.Array, lo: jax.Array, nb_partitions: int) -> jax.Array:
    """Deterministic k-mer -> partition mapping (replaces kmtricks minimizer
    repartition; same cross-sample-consistency contract)."""
    h = _avalanche(lo ^ _avalanche(hi ^ jnp.uint32(0x9E3779B9)))
    return (h % jnp.uint32(nb_partitions)).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("nb_partitions",))
def partition_ids4(l0, l1, l2, l3, nb_partitions: int) -> jax.Array:
    """4-lane variant, identical to the host chain for 2-word k-mers
    (pipeline.count.host_partition_ids)."""
    h = _avalanche(l0 ^ jnp.uint32(0x9E3779B9))
    h = _avalanche(l1 ^ h)
    h = _avalanche(l2 ^ h)
    h = _avalanche(l3 ^ h)
    return (h % jnp.uint32(nb_partitions)).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("nb_partitions", "max_distinct"))
def count_sort_rle_kernel(hi, lo, nb_partitions: int, max_distinct: int):
    """Fused per-sample counting: sort + run-length encode on device.

    hi/lo: [N] u32 canonical lanes with 0xFFFFFFFF/0xFFFFFFFF sentinels for
    invalid windows and padding. Sorts by (partition, kmer), finds run
    boundaries, and compacts to distinct-sized outputs — the only D2H is
    O(distinct), not O(N) (see the axon D2H cost note in ops.merge_dev).

    Returns (n_distinct i32, part_d, hi_d, lo_d, counts [max_distinct]);
    host slices by n_distinct (retry with a larger cap on overflow).
    """
    N = hi.shape[0]
    is_sent = (hi == jnp.uint32(0xFFFFFFFF)) & (lo == jnp.uint32(0xFFFFFFFF))
    part = jnp.where(
        is_sent, jnp.uint32(0xFFFFFFFF), partition_ids(hi, lo, nb_partitions)
    )
    part_s, hi_s, lo_s = jax.lax.sort((part, hi, lo), num_keys=3)
    valid = part_s != jnp.uint32(0xFFFFFFFF)
    n_valid = jnp.sum(valid, dtype=jnp.int32)

    first = jnp.ones(1, dtype=bool)
    change = (
        (part_s[1:] != part_s[:-1])
        | (hi_s[1:] != hi_s[:-1])
        | (lo_s[1:] != lo_s[:-1])
    )
    is_start = jnp.concatenate([first, change]) & valid
    n_distinct = jnp.sum(is_start, dtype=jnp.int32)

    starts = jnp.nonzero(is_start, size=max_distinct, fill_value=N)[0]
    nxt = jnp.concatenate([starts[1:], jnp.full(1, N, starts.dtype)])
    nxt = jnp.minimum(nxt, n_valid)
    counts = (nxt - jnp.minimum(starts, n_valid)).astype(jnp.uint32)
    sidx = jnp.clip(starts, 0, N - 1)
    return n_distinct, part_s[sidx], hi_s[sidx], lo_s[sidx], counts


@jax.jit
def sort_kmers_with_parts(part: jax.Array, hi: jax.Array, lo: jax.Array):
    """Device sort by (partition, hi, lo) + run-start flags.

    Returns (part_s, hi_s, lo_s, is_start [N] bool). Counting is then a
    host run-length over the boundary flags.
    """
    part_s, hi_s, lo_s = jax.lax.sort((part, hi, lo), num_keys=3)
    first = jnp.ones(1, dtype=bool)
    rest = (
        (part_s[1:] != part_s[:-1])
        | (hi_s[1:] != hi_s[:-1])
        | (lo_s[1:] != lo_s[:-1])
    )
    return part_s, hi_s, lo_s, jnp.concatenate([first, rest])


def hi_lo_to_u64(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """Host: (hi, lo) u32 lanes -> packed u64 words (core.kmer layout,
    [n, 1] for k <= 32)."""
    v = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    return v[:, None]


def u64_to_hi_lo(kmers: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = kmers[:, 0]
    return (v >> np.uint64(32)).astype(np.uint32), (
        v & np.uint64(0xFFFFFFFF)
    ).astype(np.uint32)
