# -*- coding: utf-8 -*-
"""Automatic Differentiation Variational Inference (mean-field Gaussian).

Maximizes the reparameterized ELBO with optax Adam; the per-step Monte Carlo
batch vmaps over draws, so each optimization step is one fused XLA program.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["run_advi", "ADVIResult"]


class ADVIResult(NamedTuple):
    mean: jnp.ndarray       # (dim,) variational mean
    log_std: jnp.ndarray    # (dim,) variational log stddev
    elbo: jnp.ndarray       # (num_steps,) ELBO trace


def run_advi(log_prob, theta0, key, num_steps=1000, num_mc=8,
             learning_rate=1e-2, init_log_std=-2.0):
    """Fit q(theta) = N(mu, diag(sigma^2)) to ``exp(log_prob)``.

    :returns: :class:`ADVIResult`; draw posterior samples with
        ``mean + exp(log_std) * normal(key, (n, dim))``.
    """
    theta0 = jnp.asarray(theta0)
    dim = theta0.shape[0]
    params = {
        "mean": theta0,
        "log_std": jnp.full(dim, init_log_std, theta0.dtype),
    }
    opt = optax.adam(learning_rate)

    def negative_elbo(params, key):
        eps = jax.random.normal(key, (num_mc, dim), theta0.dtype)
        sigma = jnp.exp(params["log_std"])
        thetas = params["mean"] + eps * sigma
        logps = jax.vmap(log_prob)(thetas)
        # Out-of-support draws (-inf) would kill the gradient; clamp them to
        # a large negative value so the optimizer is pushed back in-bounds.
        logps = jnp.where(jnp.isfinite(logps), logps, -1e12)
        entropy = jnp.sum(params["log_std"]) \
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
    return ADVIResult(params["mean"], params["log_std"], elbo)
