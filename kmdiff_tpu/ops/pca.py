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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("is_diploid",))
def _gram_block(X: jax.Array, is_diploid: bool) -> jax.Array:
    """Row-normalize a [B, S] presence block and return its [S, S] Gram
    contribution. Rows with p(1-p) == 0 get scale 1 (smartpca behavior)."""
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
    gram = np.zeros((S, S), dtype=np.float64)
    for lo in range(0, M, block_rows):
        block = geno[lo : lo + block_rows]
        gram += np.asarray(_gram_block(jnp.asarray(block), is_diploid),
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
