"""Device (JAX) Poisson likelihood-ratio kernels — the framework's hot loop.

The reference executes PoissonLikelihood::process once per distinct k-mer
inside the k-way merge callback (reference: merge.hpp:68-103 ->
model.hpp:142-176), a scalar loop over 1e8..1e10 k-mers. Here the same test
runs as a vectorized block kernel over [B, S] count matrices:

  LR(sC, sK) = sC*log(sC/(mu*Tc)) + sK*log(sK/(mu*Tk)),
  mu = (sC+sK)/(Tc+Tk), 0*log(0) := 0

(the reduced form of the reference's alt-null difference: log-factorial
terms cancel and mu*(Tc+Tk) == sC+sK; see kmdiff_tpu.core.model).

The significance pre-filter p <= t is evaluated WITHOUT transcendentals per
k-mer: p = chi2_sf(2*LR, 1) = erfc(sqrt(LR)) is monotone decreasing in LR,
so p <= t  <=>  LR >= erfcinv(t)^2, a single f32 comparison against a host
precomputed constant. The f32 bulk filter keeps a conservative margin; the
(small) survivor set is re-scored exactly in f64 on host
(core.model.PoissonLikelihood.process_sums), so final sets match kmdiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erfcinv


def lr_threshold_for_pvalue(p_threshold: float) -> float:
    """LR cut such that p <= p_threshold <=> LR >= cut (host, f64)."""
    if p_threshold >= 1.0:
        return 0.0
    if p_threshold <= 0.0:
        return float("inf")
    return float(erfcinv(p_threshold) ** 2)


# Per-row f32 error bound coefficient: LR is a sum of fc*log(ratio) terms
# whose absolute rounding error grows with the row's total count; the margin
# subtracted from the filter cut is MARGIN_PER_COUNT * (sC+sK) + MARGIN_ABS.
# (Empirically the ratio-form error is < 1e-6 per count; 4e-6 gives 4x slack.)
MARGIN_PER_COUNT = 4e-6
MARGIN_ABS = 1e-3


@functools.partial(jax.jit, static_argnames=("nb_controls",))
def lrt_block(counts: jax.Array, nb_controls: int, ratio_c: jax.Array,
              ratio_k: jax.Array):
    """Vectorized LRT over a count block.

    counts: [B, S] int32 (controls first, then cases)
    ratio_c/ratio_k: f32 scalars Tc/(Tc+Tk), Tk/(Tc+Tk)
    returns (lr [B] f32, s_c [B] i32, s_k [B] i32)
    """
    s_c = jnp.sum(counts[:, :nb_controls], axis=1, dtype=jnp.int32)
    s_k = jnp.sum(counts[:, nb_controls:], axis=1, dtype=jnp.int32)
    return _lr_from_sums(s_c, s_k, ratio_c, ratio_k), s_c, s_k


def _lr_from_sums(s_c, s_k, ratio_c, ratio_k):
    """LR = sC*log(sC / (tot*ratio_c)) + sK*log(sK / (tot*ratio_k)).

    Single log of a ratio per term (instead of a 3-log difference): the
    expected count mu*Tc == tot*ratio_c, and the ratio sC/(tot*ratio_c)
    carries ~2 roundings before the log, keeping absolute error near
    1 ulp(log) * count instead of ulp(log Tc) * count."""
    fc = s_c.astype(jnp.float32)
    fk = s_k.astype(jnp.float32)
    tot = fc + fk
    safe_tot = jnp.maximum(tot, 1.0)
    term_c = jnp.where(
        s_c > 0, fc * jnp.log(jnp.maximum(fc, 1.0) / (safe_tot * ratio_c)), 0.0
    )
    term_k = jnp.where(
        s_k > 0, fk * jnp.log(jnp.maximum(fk, 1.0) / (safe_tot * ratio_k)), 0.0
    )
    lr = jnp.where(tot > 0, term_c + term_k, 0.0)
    return jnp.maximum(lr, 0.0)


def pvalues_f32(lr: jax.Array) -> jax.Array:
    """Approximate device p-values: erfc(sqrt(LR)). Only for diagnostics /
    progress metrics; decisions use the LR cut + host f64 re-score."""
    return jax.scipy.special.erfc(jnp.sqrt(lr))


class LrtParams:
    """Host-precomputed scalars binding a cohort to the device kernel."""

    def __init__(self, nb_controls: int, nb_cases: int, sum_controls: int,
                 sum_cases: int, p_threshold: float):
        self.nb_controls = nb_controls
        self.nb_cases = nb_cases
        self.sum_controls = int(sum_controls)
        self.sum_cases = int(sum_cases)
        tsum = self.sum_controls + self.sum_cases
        self.ratio_c = np.float32(self.sum_controls / tsum)
        self.ratio_k = np.float32(self.sum_cases / tsum)
        self.p_threshold = p_threshold
        self.lr_min = lr_threshold_for_pvalue(p_threshold)
        # a k-mer's group sum is bounded by the cohort's total k-mer mass;
        # below 2^31 the int32 device sum path is exact, above it the
        # kernels switch to the 16-bit-split wide path (ops.merge_dev)
        self.wide_sums = tsum >= 2**31


@functools.partial(jax.jit, static_argnames=("nb_controls",))
def lrt_filter_block(counts, nb_controls, ratio_c, ratio_k, lr_min):
    """Full filter step on device: LR + margin-backed keep mask.

    The f32 LR carries absolute error that scales with the row's total
    count, so each row gets its own slack:
        keep <=> lr + MARGIN_PER_COUNT*tot + MARGIN_ABS >= lr_min
    guaranteeing no exact-f64 hit is dropped (false keeps are later removed
    by the host f64 re-score).

    returns (keep [B] bool, lr [B] f32, s_c [B] i32, s_k [B] i32)
    """
    lr, s_c, s_k = lrt_block(counts, nb_controls, ratio_c, ratio_k)
    tot = (s_c + s_k).astype(jnp.float32)
    keep = lr + MARGIN_PER_COUNT * tot + MARGIN_ABS >= lr_min
    return keep, lr, s_c, s_k


def run_filter(params: LrtParams, counts: np.ndarray):
    """Host wrapper: device filter over one block; returns numpy outputs.
    Pass int32 counts to avoid a device-side convert. Routes to the Pallas
    kernel on TPU backends when the block shape allows."""
    from kmdiff_tpu.ops.lrt_pallas import (
        TILE_B,
        lrt_filter_block_pallas,
        use_pallas,
    )

    if use_pallas() and counts.shape[0] % TILE_B == 0:
        keep, lr, s_c, s_k = lrt_filter_block_pallas(
            jnp.asarray(counts) if counts.dtype == np.int32
            else jnp.asarray(counts, dtype=jnp.int32),
            params.nb_controls,
            jnp.float32(params.ratio_c),
            jnp.float32(params.ratio_k),
            jnp.float32(params.lr_min),
        )
        return (np.asarray(keep), np.asarray(lr), np.asarray(s_c),
                np.asarray(s_k))
    keep, lr, s_c, s_k = lrt_filter_block(
        jnp.asarray(counts) if counts.dtype == np.int32
        else jnp.asarray(counts, dtype=jnp.int32),
        params.nb_controls,
        jnp.float32(params.ratio_c),
        jnp.float32(params.ratio_k),
        jnp.float32(params.lr_min),
    )
    return (np.asarray(keep), np.asarray(lr), np.asarray(s_c), np.asarray(s_k))
