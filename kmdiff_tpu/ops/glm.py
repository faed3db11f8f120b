"""Batched logistic-regression IRLS on device.

The reference fits a FULL logistic regression per significant k-mer inside
a thread loop (reference: popstrat.hpp:249-333 + src/linear_model.cpp:
297-410) — the most expensive per-item op in the system. Here the per-k-mer
alt fits run as ONE vmapped IRLS over [B, n, F] feature tensors: batched
[F, F] Hessian solves on the MXU, a vmapped while_loop that freezes
converged items, and vectorized log-likelihoods.

Semantics match the host scalar solver (kmdiff_tpu.core.linear_model),
including the reference's quirks that affect results:
  * convergence on |mse - prev_mse| < 1e-6 computed BEFORE the update,
  * the returned weights lag one iteration behind the last solve (the
    reference assigns weight = w only after the max-iter check),
  * singular/non-finite Hessian solves freeze the item at its previous
    weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

#: TPU MXU f32 "default" precision runs bf16 passes (~8 mantissa bits) —
#: catastrophic for IRLS Hessians and log-likelihoods (observed: corrected
#: popstrat survivor counts 100x off vs the CPU fit on the same inputs).
#: HIGHEST forces full-f32 multiplies; CPU/GPU ignore it.
_PREC = jax.lax.Precision.HIGHEST

_EPS_CONV = 1e-6
_G_FLOOR = 1e-305


def default_dtype():
    """f64 where the backend supports it (CPU always; TPU falls back to
    f32 — the LRT pre-filter and final chi2 run in f64 on host either
    way)."""
    if not jax.config.jax_enable_x64:
        return jnp.float32
    return jnp.float64 if jax.default_backend() == "cpu" else jnp.float32


def _irls_single(Xi, y, max_iters: int, dt, g_floor, eps_conv=_EPS_CONV):
    """One logistic IRLS fit (the reference's glm_irls semantics); the
    batched entry points vmap this body."""
    n, F = Xi.shape
    mu0 = (y + 0.5) / 2.0
    eta0 = jnp.log(mu0 / (1.0 - mu0))
    w0 = jnp.ones(F, dt)
    state = (w0, eta0, mu0, jnp.asarray(1e18, dt), jnp.asarray(1e18, dt),
             jnp.int32(0), jnp.bool_(False))

    def cond(state):
        return ~state[6]

    def body(state):
        w, eta, mu, prev_error, _err, iters, done = state
        g = mu * (1.0 - mu)
        good = g > g_floor
        error = jnp.mean((y - mu) ** 2)
        converged = (jnp.abs(error - prev_error) < eps_conv) | (~good.any())

        gz = jnp.where(good, g * eta + (y - mu), 0.0)  # g*z, masked
        gw = jnp.where(good, g, 0.0)
        H = jnp.matmul((Xi * gw[:, None]).T, Xi, precision=_PREC)
        rhs = jnp.matmul(Xi.T, gz, precision=_PREC)
        new_w = jnp.linalg.solve(H, rhs)
        solve_bad = ~jnp.isfinite(new_w).all()

        new_iters = iters + 1
        hit_max = new_iters >= max_iters
        advance = ~converged & ~solve_bad & ~hit_max

        w_out = jnp.where(advance, new_w, w)
        eta_out = jnp.where(
            advance, jnp.matmul(Xi, new_w, precision=_PREC), eta
        )
        mu_out = jnp.where(advance, jax.nn.sigmoid(eta_out), mu)
        done_out = converged | solve_bad | hit_max
        return (
            w_out,
            eta_out,
            mu_out,
            jnp.where(converged, prev_error, error),
            error,
            jnp.where(converged, iters, new_iters),
            done_out,
        )

    w, _eta, _mu, _prev, err, iters, _done = jax.lax.while_loop(
        cond, body, state
    )
    return w, err, iters


@functools.partial(jax.jit, static_argnames=("max_iters", "eps_conv"))
def batched_irls(X: jax.Array, y: jax.Array, max_iters: int = 500,
                 eps_conv: float = _EPS_CONV):
    """IRLS over a batch of design matrices.

    X: [B, n, F] — per-k-mer features (only the last column differs
       between items in the popstrat use, but no structure is assumed)
    y: [n] — shared 0/1 labels
    Returns (weights [B, F], error [B], iters [B] i32).
    """
    dt = X.dtype
    y = y.astype(dt)
    g_floor = jnp.asarray(_G_FLOOR if dt == jnp.float64 else 1e-30, dt)
    return jax.vmap(
        lambda Xi: _irls_single(Xi, y, max_iters, dt, g_floor, eps_conv)
    )(X)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def batched_irls_lastcol(
    X_base: jax.Array, last: jax.Array, y: jax.Array, max_iters: int = 500
):
    """IRLS where only the LAST feature column differs per item — the
    popstrat alt-fit structure (popstrat.hpp:252-257). Takes the shared
    [n, F] design once plus the [B, n] per-k-mer column and builds each
    item's matrix on device, eliminating the [B, n, F] host broadcast and
    its H2D (F/1 x less transfer, no host copy).

    Returns (weights [B, F], error [B], iters [B] i32).
    """
    dt = X_base.dtype
    y = y.astype(dt)
    g_floor = jnp.asarray(_G_FLOOR if dt == jnp.float64 else 1e-30, dt)

    def single(li):
        Xi = X_base.at[:, -1].set(li.astype(dt))
        return _irls_single(Xi, y, max_iters, dt, g_floor)

    return jax.vmap(single)(last)


@jax.jit
def log_likelihood(X: jax.Array, w: jax.Array, y: jax.Array) -> jax.Array:
    """Per-item Bernoulli log-likelihood sum_i [y log p + (1-y) log(1-p)],
    p = sigmoid(X @ w). X: [B, n, F], w: [B, F], y: [n] -> [B].

    Computed with log-sigmoid identities (no underflow — the reference's
    raw product underflows for large cohorts, popstrat.hpp:267-310)."""
    z = jnp.einsum("bnf,bf->bn", X, w, precision=_PREC)
    return _ll_from_logits(z, y)


def _ll_from_logits(z, y):
    y = y.astype(z.dtype)
    # log p = -softplus(-z), log(1-p) = -softplus(z)
    ll = -(y * jax.nn.softplus(-z) + (1.0 - y) * jax.nn.softplus(z))
    return ll.sum(axis=1)


@jax.jit
def log_likelihood_lastcol(
    X_base: jax.Array, last: jax.Array, w: jax.Array, y: jax.Array
) -> jax.Array:
    """log_likelihood for the shared-design + per-item-last-column form:
    z = X_base[:, :-1] @ w[:-1] + last * w[-1] — no [B, n, F] tensor."""
    zb = jnp.einsum("nf,bf->bn", X_base[:, :-1], w[:, :-1],
                    precision=_PREC)
    z = zb + last.astype(zb.dtype) * w[:, -1][:, None]
    return _ll_from_logits(z, y)
