"""EIGENSTRAT-style PCA on device — in-process replacement for smartpca.

The reference forks HAWK's smartpca binary over text files
(reference: src/popstrat.cpp:97-134; normalization: smartpca.c:1783-1795
"fancynorm": subtract the row mean, scale by 1/sqrt(p(1-p)) with
p = 1 - sqrt(1 - mean) for diploid data and p = mean for haploid (-V)).

TPU formulation: the sampled geno matrix streams through the device in
[B, S] blocks; each block is row-normalized and accumulated into the
S x S Gram matrix with one MXU matmul; the tiny symmetric eigenproblem
solves on host. Eigenvector signs are fixed deterministically (largest-
magnitude component positive) — smartpca's signs are arbitrary, and the
logistic regression downstream is sign-invariant.

Mesh scaling: with the session mesh active (parallel.runtime), Gram
accumulation row-shards the blocks — each device normalizes and contracts
its own fixed-size block and the host f64-accumulates the per-device
partials *in block order*. Because the f32 units of work (full
[block_rows, S] blocks plus one short tail block) are identical with and
without the mesh, sharded and single-device runs produce bit-identical
Gram matrices, keeping the product pipeline's byte-identity guarantee
across device counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("is_diploid",))
def _gram_block(X: jax.Array, is_diploid: bool) -> jax.Array:
    """Row-normalize a [B, S] presence block and return its [S, S] Gram
    contribution. Rows with p(1-p) == 0 get scale 1 (smartpca behavior);
    all-zero padding rows contribute exactly zero."""
    X = X.astype(jnp.float32)
    mean = jnp.mean(X, axis=1, keepdims=True)
    if is_diploid:
        p = 1.0 - jnp.sqrt(jnp.maximum(1.0 - mean, 0.0))
    else:
        p = mean
    var = p * (1.0 - p)
    scale = jnp.where(var > 0.0, jax.lax.rsqrt(jnp.maximum(var, 1e-30)), 1.0)
    Xn = (X - mean) * scale
    return jnp.dot(Xn.T, Xn, preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=4)
def _sharded_gram_fn(mesh, is_diploid: bool):
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def local(X):  # [block_rows, S] shard -> [1, S, S] partial
        return _gram_block(X, is_diploid)[None]

    return jax.jit(
        shard_map(local, mesh=mesh, in_specs=(P("rows", None),),
                  out_specs=P("rows", None, None))
    )


def eigenstrat_pca(
    geno: np.ndarray, is_diploid: bool = True, n_evec: int = 10,
    block_rows: int = 1 << 16,
) -> tuple[np.ndarray, np.ndarray]:
    """PCA of a [M, S] 0/1 presence matrix (rows = sampled k-mers).

    Returns (Z [S, n] per-sample principal components — the pcs.evec
    columns, unit-norm; evals [n] descending).
    """
    M, S = geno.shape
    n_evec = min(n_evec, S)
    if M == 0:
        return np.zeros((S, n_evec)), np.zeros(n_evec)

    from kmdiff_tpu.parallel.runtime import get_mesh

    mesh = get_mesh()
    n_dev = mesh.size if mesh is not None else 1

    # the f32 unit of work is one [block_rows, S] block (plus one short
    # tail block); the mesh path runs the SAME units, n_dev at a time
    n_full = M // block_rows
    gram = np.zeros((S, S), dtype=np.float64)
    if n_dev > 1 and n_full > 1:
        # n_dev full blocks per dispatch, one per device; per-device
        # partials come back unsummed and accumulate on host in block
        # order; devices past the last live block chew exact-zero filler
        from jax.sharding import NamedSharding, PartitionSpec as P

        fn = _sharded_gram_fn(mesh, is_diploid)
        sharding = NamedSharding(mesh, P("rows", None))
        for g0 in range(0, n_full, n_dev):
            live = min(n_dev, n_full - g0)
            group = geno[g0 * block_rows: (g0 + live) * block_rows]
            if live < n_dev:
                group = np.concatenate([
                    group,
                    np.zeros(((n_dev - live) * block_rows, S), geno.dtype),
                ])
            stacked = jax.device_put(group, sharding)
            partials = np.asarray(fn(stacked), dtype=np.float64)
            for d in range(live):
                gram += partials[d]
    else:
        for lo in range(0, n_full * block_rows, block_rows):
            block = geno[lo: lo + block_rows]
            gram += np.asarray(_gram_block(jnp.asarray(block), is_diploid),
                               dtype=np.float64)
    if M % block_rows:
        tail = geno[n_full * block_rows:]
        gram += np.asarray(_gram_block(jnp.asarray(tail), is_diploid),
                           dtype=np.float64)

    evals, evecs = np.linalg.eigh(gram / M)
    order = np.argsort(evals)[::-1][:n_evec]
    evals = evals[order]
    Z = evecs[:, order]
    # deterministic sign: largest-|component| entry positive
    for j in range(Z.shape[1]):
        k = np.argmax(np.abs(Z[:, j]))
        if Z[k, j] < 0:
            Z[:, j] = -Z[:, j]
    return Z, evals
