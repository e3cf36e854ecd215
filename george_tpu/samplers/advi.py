# -*- coding: utf-8 -*-
"""Automatic Differentiation Variational Inference (Gaussian families).

Maximizes the reparameterized ELBO with optax Adam; the per-step Monte Carlo
batch vmaps over draws, so each optimization step is one fused XLA program.
Two variational families:

  * mean-field — ``q = N(mu, diag(sigma^2))`` (``full_rank=False``);
  * full-rank — ``q = N(mu, L L^T)`` with ``L`` a lower-triangular Cholesky
    factor (log-diagonal parameterization keeps it positive definite), which
    captures posterior correlations mean-field provably underestimates.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["run_advi", "ADVIResult"]


class ADVIResult(NamedTuple):
    mean: jnp.ndarray       # (dim,) variational mean
    log_std: jnp.ndarray    # (dim,) marginal log stddev of q
    elbo: jnp.ndarray       # (num_steps,) ELBO trace
    scale_tril: jnp.ndarray = None  # (dim, dim) Cholesky factor (full-rank)

    def sample(self, key, num_samples):
        """Draw from the fitted q."""
        dim = self.mean.shape[0]
        eps = jax.random.normal(key, (num_samples, dim), self.mean.dtype)
        if self.scale_tril is not None:
            return self.mean + eps @ self.scale_tril.T
        return self.mean + eps * jnp.exp(self.log_std)


def _build_tril(diag_log, off, dim):
    """Lower-triangular scale from log-diagonal + strict lower entries."""
    L = jnp.zeros((dim, dim), diag_log.dtype)
    if dim > 1:
        L = L.at[jnp.tril_indices(dim, k=-1)].set(off)
    return L.at[jnp.diag_indices(dim)].set(jnp.exp(diag_log))


def run_advi(log_prob, theta0, key, num_steps=1000, num_mc=8,
             learning_rate=1e-2, init_log_std=-2.0, full_rank=False):
    """Fit a Gaussian q to ``exp(log_prob)`` by stochastic ELBO ascent.

    :param full_rank: fit ``N(mu, L L^T)`` instead of a diagonal Gaussian.
    :returns: :class:`ADVIResult`; draw posterior samples with
        ``result.sample(key, n)``.
    """
    theta0 = jnp.asarray(theta0)
    dim = theta0.shape[0]
    dtype = theta0.dtype
    params = {
        "mean": theta0,
        "diag_log": jnp.full(dim, init_log_std, dtype),
    }
    if full_rank:
        params["off"] = jnp.zeros(dim * (dim - 1) // 2, dtype)
    opt = optax.adam(learning_rate)

    def negative_elbo(params, key):
        eps = jax.random.normal(key, (num_mc, dim), dtype)
        if full_rank:
            L = _build_tril(params["diag_log"], params["off"], dim)
            thetas = params["mean"] + eps @ L.T
        else:
            thetas = params["mean"] + eps * jnp.exp(params["diag_log"])
        logps = jax.vmap(log_prob)(thetas)
        # Out-of-support draws (-inf) would kill the gradient; clamp them to
        # a large negative value so the optimizer is pushed back in-bounds.
        logps = jnp.where(jnp.isfinite(logps), logps, -1e12)
        # Gaussian entropy = sum log diag(L) + const for both families.
        entropy = jnp.sum(params["diag_log"]) \
            + 0.5 * dim * (1.0 + jnp.log(2.0 * jnp.pi))
        return -(jnp.mean(logps) + entropy)

    @jax.jit
    def fit(params, key):
        opt_state = opt.init(params)

        def step(carry, _):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(negative_elbo)(params, sub)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), -loss

        (params, _, _), elbo = jax.lax.scan(
            step, (params, opt_state, key), None, length=num_steps
        )
        return params, elbo

    params, elbo = fit(params, key)
    if full_rank:
        L = _build_tril(params["diag_log"], params["off"], dim)
        marg_log_std = 0.5 * jnp.log(jnp.sum(L * L, axis=1))
        return ADVIResult(params["mean"], marg_log_std, elbo, scale_tril=L)
    return ADVIResult(params["mean"], params["diag_log"], elbo)
