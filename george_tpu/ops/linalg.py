# -*- coding: utf-8 -*-
"""Jitted dense linear-algebra kernels shared by solvers, GP, and samplers.

These replace the reference's LAPACK calls (scipy cholesky/cho_solve in
/root/reference/src/george/solvers/basic.py) with XLA's blocked TPU
implementations, and fuse the covariance build + noise add + factorization
into single compiled programs keyed on the kernel expression tree.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..dsl import compiler

__all__ = [
    "cholesky_factor", "cho_solve", "cho_logdet", "factor_fn", "solve_fn",
    "dot_solve_fn", "apply_sqrt_fn", "inverse_fn", "loglike_fn",
    "grad_core_fn", "predict_fn",
]


# Route factorizations at or above this size through the blocked algorithm
# on TPU: XLA's native cholesky is column-loop bound there, while the
# blocked form puts ~97% of the N^3/3 FLOPs into full-width MXU matmuls.
# Measured on one v5e chip (in-jit repeated, no host round-trip):
# N=16384 build+factor+logdet 51 ms vs 74 ms native; N=8192 18.4 vs 20.4;
# N=4096 parity — hence the threshold.
BLOCKED_CHOLESKY_MIN_N = 8192
_CHOL_BLOCK = 1024


def _blocked_cholesky_impl(K, block):
    """Left-looking blocked Cholesky, unrolled over static panels.

    Each panel's downdate is accumulated as a sum of MXU matmuls against
    the previously *computed* panels, which live in a Python list — K is
    never updated in place, so XLA never copies the O(N^2) buffer (the
    right-looking ``.at[...]`` formulation spent half its runtime on those
    copies).  The diagonal block goes through XLA's cholesky, the panel
    through one triangular solve; the N^3/3 MAC bulk is plain matmuls.

    Precision HIGH (3-pass bf16 decomposition, ~f32-accurate): the default
    single-pass matmul loses enough of the downdates that ill-conditioned
    kernels (which XLA's native cholesky factors fine) go indefinite.
    """
    n = K.shape[0]
    prec = jax.lax.Precision.HIGH

    def mm(a, b):
        return jnp.matmul(a, b, precision=prec)

    L = jnp.zeros_like(K)
    for j0 in range(0, n, block):
        j1 = min(j0 + block, n)
        D = K[j0:j1, j0:j1]
        A21 = K[j1:, j0:j1]
        if j0:
            # Single downdate matmul against the committed prefix — the
            # MXU hot loop (N^3/3 MACs total across panels).
            Lrow = L[j0:j1, :j0]
            D = D - mm(Lrow, Lrow.T)
            if j1 < n:
                A21 = A21 - mm(L[j1:, :j0], Lrow.T)
        Ld = jnp.linalg.cholesky(D)
        col = [jnp.zeros((j0, j1 - j0), K.dtype), Ld]
        if j1 < n:
            col.append(solve_triangular(Ld, A21.T, lower=True).T)
        L = L.at[:, j0:j1].set(jnp.concatenate(col, axis=0))
    return L


@jax.custom_vjp
def blocked_cholesky(K):
    """Lower Cholesky factor via the blocked right-looking algorithm.

    Equivalent to ``jnp.linalg.cholesky`` (up to fp rounding) but ~an order
    of magnitude faster on TPU at N >= 8k.  The custom VJP applies the
    standard O(N^2)-memory Cholesky adjoint (two triangular solves) instead
    of differentiating through the unrolled panels (which would checkpoint
    a full K snapshot per panel).
    """
    return _blocked_cholesky_impl(K, _CHOL_BLOCK)


def _blocked_cholesky_fwd(K):
    L = _blocked_cholesky_impl(K, _CHOL_BLOCK)
    return L, L


def _blocked_cholesky_bwd(L, Lbar):
    # Murray (2016), "Differentiation of the Cholesky decomposition":
    # Kbar = (1/2) L^{-T} (P + P^T) L^{-1} with P = Phi(L^T Lbar),
    # Phi = tril with halved diagonal.  Matches the cotangent convention
    # of jnp.linalg.cholesky (verified in tests/test_aux.py).
    P = jnp.tril(L.T @ Lbar)
    P = P - 0.5 * jnp.diag(jnp.diagonal(P))
    S = P + P.T
    tmp = solve_triangular(L, S, lower=True, trans=1)
    Kbar = solve_triangular(L, tmp.T, lower=True, trans=1).T
    return (0.5 * Kbar,)


blocked_cholesky.defvjp(_blocked_cholesky_fwd, _blocked_cholesky_bwd)


def cholesky_factor(K):
    """Lower Cholesky factor and log-determinant of an SPD matrix."""
    n = K.shape[0]
    if n >= BLOCKED_CHOLESKY_MIN_N and jax.default_backend() == "tpu":
        L = blocked_cholesky(K)
    else:
        L = jnp.linalg.cholesky(K)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return L, logdet


def cho_solve(L, y):
    """Solve K x = y given the lower Cholesky factor of K."""
    z = solve_triangular(L, y, lower=True)
    return solve_triangular(L, z, lower=True, trans=1)


def cho_logdet(L):
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def _build_K(node, theta, x, diag_noise):
    K = compiler._value_builder(node)(theta, x, x)
    idx = jnp.arange(x.shape[0])
    return K.at[idx, idx].add(diag_noise)


@lru_cache(maxsize=None)
def factor_fn(node):
    """Jitted ``(theta, x, diag_noise) -> (L, logdet)``: build + factorize."""

    @jax.jit
    def factor(theta, x, diag_noise):
        return cholesky_factor(_build_K(node, theta, x, diag_noise))

    return factor


@jax.jit
def solve_fn(L, y):
    return cho_solve(L, y)


@jax.jit
def dot_solve_fn(L, y):
    return jnp.dot(y.T, cho_solve(L, y))


@jax.jit
def apply_sqrt_fn(L, r):
    # Matches the reference convention r @ U with U the *upper* factor
    # (solvers/basic.py:104-114): rows of r acquire covariance U^T U = K.
    return r @ L.T


@jax.jit
def inverse_fn(L):
    return cho_solve(L, jnp.eye(L.shape[0], dtype=L.dtype))


@lru_cache(maxsize=None)
def loglike_fn(node):
    """Jitted marginal log-likelihood ``(theta, x, r, diag_noise) -> ll``.

    ``r`` is the mean-subtracted target.  This is the single fused program
    the samplers differentiate and vmap over chains.
    """

    @jax.jit
    def loglike(theta, x, r, diag_noise):
        L, logdet = cholesky_factor(_build_K(node, theta, x, diag_noise))
        alpha = cho_solve(L, r)
        n = x.shape[0]
        norm = n * jnp.log(2.0 * jnp.pi).astype(r.dtype)
        return -0.5 * (norm + logdet + jnp.dot(r, alpha))

    return loglike


@lru_cache(maxsize=None)
def grad_core_fn(node):
    """Gradient core for :meth:`GP.grad_log_likelihood`.

    One reverse-mode pass through the Cholesky gives the gradient w.r.t. both
    the kernel hyperparameters and the per-point log-white-noise vector in
    O(N^2) memory — replacing the reference's dense K^{-1} plus (N, N, P)
    gradient tensor path (/root/reference/src/george/gp.py:406-468).

    Returns ``(theta, wn_vec, x, r, yerr2) -> (g_theta, g_wn_vec, alpha)``.
    """
    value = compiler._value_builder(node)

    def negative_half_quadform(theta, wn_vec, x, r, yerr2):
        K = value(theta, x, x)
        idx = jnp.arange(x.shape[0])
        K = K.at[idx, idx].add(yerr2 + jnp.exp(wn_vec))
        L, logdet = cholesky_factor(K)
        alpha = cho_solve(L, r)
        ll = -0.5 * (logdet + jnp.dot(r, alpha))
        return ll, alpha

    grad = jax.grad(negative_half_quadform, argnums=(0, 1), has_aux=True)

    @jax.jit
    def core(theta, wn_vec, x, r, yerr2):
        (g_theta, g_wn), alpha = grad(theta, wn_vec, x, r, yerr2)
        return g_theta, g_wn, alpha

    return core


@lru_cache(maxsize=None)
def predict_fn(node):
    """Jitted conditional prediction core.

    ``(theta, x_train, L, alpha, x_test) -> (Kxs @ alpha, Kxs, KinvKxs)``.
    """
    value = compiler._value_builder(node)

    @jax.jit
    def predict(theta, x_train, L, alpha, x_test):
        Kxs = value(theta, x_test, x_train)
        mu = Kxs @ alpha
        KinvKxs = cho_solve(L, Kxs.T)
        return mu, Kxs, KinvKxs

    return predict
