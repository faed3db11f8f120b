"""EIGENSTRAT-style PCA on device — in-process replacement for smartpca.

The reference forks HAWK's smartpca binary over text files
(reference: src/popstrat.cpp:97-134; normalization: smartpca.c:1783-1795
"fancynorm": subtract the row mean, scale by 1/sqrt(p(1-p)) with
p = 1 - sqrt(1 - mean) for diploid data and p = mean for haploid (-V)).

Bit-determinism across layouts. The geno matrix is 0/1 and the
normalization mean/scale of a row depend ONLY on its row sum r ∈ {0..S},
so the normalized Gram decomposes exactly over ≤ S+1 row-sum groups:

    Gram = Σ_r s(r)² · [ G_r − m(r)·(C_r·1ᵀ + 1·C_rᵀ) + m(r)²·n_r·J ]

where G_r = Σ_{i: r_i=r} X_i X_iᵀ and C_r = Σ X_i are INTEGER aggregates
of 0/1 rows. Integer matmuls are exact in floating point at any blocking
(f64 always; f32 while partial entries stay < 2²⁴), so G_r/C_r come out
bit-identical no matter how BLAS threads, XLA fuses, or a mesh shards the
work — a plain normalized-f32 matmul did NOT (host-thread-count-dependent
reduction splits shifted PCs by ~1e-6, which the near-degenerate null
logistic fit amplified into diverging corrected p-values). The ≤ S+1
group terms then combine on host in fixed ascending-r order with f64
weights: the whole PCA is bit-reproducible across single-device, mesh,
and multi-process runs.

Scaling: big groups contract on device in [block_rows, S] f32 tiles (one
MXU matmul each; entries ≤ block_rows < 2²⁴ keep them exact), row-sharded
over the session mesh when present; the tiny S×S eigenproblem solves on
host in f64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: groups at or below this row count contract on host (f64 BLAS, exact);
#: larger groups stream through the device in f32-exact tiles
HOST_GRAM_ROWS = 1 << 18

#: device tile height; must stay < 2^24 so f32 integer partials are exact
DEVICE_BLOCK_ROWS = 1 << 16


@jax.jit
def _int_gram_block(X: jax.Array) -> jax.Array:
    """[B, S] 0/1 block -> [S, S] integer Gram, exact in f32 (entries
    ≤ B < 2^24)."""
    Xf = X.astype(jnp.float32)
    return jnp.dot(Xf.T, Xf, preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=4)
def _sharded_int_gram_fn(mesh):
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def local(X):  # [block_rows, S] shard -> [1, S, S] integer partial
        return _int_gram_block(X)[None]

    return jax.jit(
        shard_map(local, mesh=mesh, in_specs=(P("rows", None),),
                  out_specs=P("rows", None, None))
    )


def _int_gram(X01: np.ndarray, block_rows: int = DEVICE_BLOCK_ROWS
              ) -> np.ndarray:
    """Exact integer Gram of a 0/1 matrix, [S, S] f64. Host f64 BLAS for
    small groups; device f32-exact tiles (mesh-sharded when available)
    beyond — every path returns the SAME integers."""
    n, S = X01.shape
    # an explicitly shrunk block_rows (tests) also lowers the host cutoff,
    # forcing the device-tile path; by default host handles <= 2^18 rows
    host_cut = HOST_GRAM_ROWS if block_rows >= DEVICE_BLOCK_ROWS else block_rows
    block_rows = min(block_rows, DEVICE_BLOCK_ROWS)  # keep f32 exactness
    if n <= host_cut:
        Xf = X01.astype(np.float64)
        return Xf.T @ Xf

    from kmdiff_tpu.parallel.runtime import get_mesh

    mesh = get_mesh()
    n_dev = mesh.size if mesh is not None else 1
    gram = np.zeros((S, S), dtype=np.float64)
    n_full = n // block_rows
    if n_dev > 1 and n_full > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        fn = _sharded_int_gram_fn(mesh)
        sharding = NamedSharding(mesh, P("rows", None))
        for g0 in range(0, n_full, n_dev):
            live = min(n_dev, n_full - g0)
            group = X01[g0 * block_rows: (g0 + live) * block_rows]
            if live < n_dev:
                group = np.concatenate([
                    group,
                    np.zeros(((n_dev - live) * block_rows, S), X01.dtype),
                ])
            stacked = jax.device_put(group, sharding)
            partials = np.asarray(fn(stacked), dtype=np.float64)
            for d in range(live):
                gram += partials[d]
    else:
        for lo in range(0, n_full * block_rows, block_rows):
            block = X01[lo: lo + block_rows]
            gram += np.asarray(
                _int_gram_block(jnp.asarray(block)), dtype=np.float64
            )
    if n % block_rows:
        tail = X01[n_full * block_rows:]
        gram += np.asarray(_int_gram_block(jnp.asarray(tail)),
                           dtype=np.float64)
    return gram


def eigenstrat_pca(
    geno: np.ndarray, is_diploid: bool = True, n_evec: int = 10,
    block_rows: int = DEVICE_BLOCK_ROWS,
) -> tuple[np.ndarray, np.ndarray]:
    """PCA of a [M, S] 0/1 presence matrix (rows = sampled k-mers).

    Returns (Z [S, n] per-sample principal components — the pcs.evec
    columns, unit-norm; evals [n] descending). Bit-deterministic across
    device layouts and process counts (see module docstring).
    """
    M, S = geno.shape
    n_evec = min(n_evec, S)
    if M == 0:
        return np.zeros((S, n_evec)), np.zeros(n_evec)

    r = geno.sum(axis=1, dtype=np.int64)  # row sums, 0..S
    order = np.argsort(r, kind="stable")
    r_sorted = r[order]
    uniq, starts = np.unique(r_sorted, return_index=True)
    bounds = np.append(starts, M)

    ones = np.ones(S, dtype=np.float64)
    J = np.outer(ones, ones)
    gram = np.zeros((S, S), dtype=np.float64)
    for gi, rv in enumerate(uniq):
        a, b = int(bounds[gi]), int(bounds[gi + 1])
        idx = order[a:b]
        Xg = np.ascontiguousarray(geno[idx])
        G = _int_gram(Xg, block_rows)                    # exact integers
        C = Xg.sum(axis=0, dtype=np.int64).astype(np.float64)
        n_g = float(b - a)
        m = float(rv) / S
        if is_diploid:
            p = 1.0 - np.sqrt(max(1.0 - m, 0.0))
        else:
            p = m
        var = p * (1.0 - p)
        s2 = 1.0 / max(var, 1e-30) if var > 0.0 else 1.0
        gram += s2 * (G - m * (np.outer(C, ones) + np.outer(ones, C))
                      + (m * m * n_g) * J)

    evals, evecs = np.linalg.eigh(gram / M)
    order_e = np.argsort(evals)[::-1][:n_evec]
    evals = evals[order_e]
    Z = evecs[:, order_e]
    # deterministic sign: largest-|component| entry positive
    for j in range(Z.shape[1]):
        k = np.argmax(np.abs(Z[:, j]))
        if Z[k, j] < 0:
            Z[:, j] = -Z[:, j]
    return Z, evals
