# -*- coding: utf-8 -*-
"""Hamiltonian Monte Carlo primitives: kinetic energy, leapfrog, HMC kernel.

Everything is a pure function of (state, key) so that transition kernels
vmap over thousands of chains per chip and shard over device meshes
unchanged.  Mass matrices are diagonal (a vector ``inv_mass``) or dense
(a matrix), dispatched on ndim.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "HMCState", "new_state", "kinetic_energy", "sample_momentum",
    "leapfrog", "hmc_step",
]


class HMCState(NamedTuple):
    """Position, its log-density, and the cached gradient."""

    z: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray


def new_state(log_prob, z):
    logp, grad = jax.value_and_grad(log_prob)(z)
    return HMCState(z, logp, grad)


def kinetic_energy(r, inv_mass):
    """0.5 r^T M^{-1} r for diagonal (vector) or dense inverse mass.

    Batch-polymorphic: ``r`` may be (dim,) or (..., dim); the reduction is
    over the trailing axis (ChEES and the SMC HMC kernel pass full chain
    batches).
    """
    return 0.5 * jnp.sum(r * velocity(r, inv_mass), axis=-1)


def velocity(r, inv_mass):
    """dz/dt = M^{-1} r, for (dim,) or (..., dim) momenta."""
    if inv_mass.ndim == 1:
        return inv_mass * r
    return r @ inv_mass.T


def sample_momentum(key, inv_mass, shape, dtype):
    """r ~ N(0, M).  For diagonal M^{-1}, std = 1/sqrt(inv_mass); for dense,
    draw through the Cholesky factor of M = (M^{-1})^{-1}.  ``shape`` may be
    (dim,) or (batch, dim)."""
    eps = jax.random.normal(key, shape, dtype)
    if inv_mass.ndim == 1:
        return eps / jnp.sqrt(inv_mass)
    # chol(M^{-1}) = R  =>  M = R^{-T} R^{-1};  r = R^{-T} eps has cov M.
    R = jnp.linalg.cholesky(inv_mass)
    return jax.scipy.linalg.solve_triangular(
        R.T, eps.T, lower=False
    ).T if eps.ndim == 2 else jax.scipy.linalg.solve_triangular(
        R.T, eps, lower=False
    )


def leapfrog(value_and_grad, state, r, step_size, inv_mass, n_steps):
    """``n_steps`` velocity-Verlet steps; returns (state', r')."""

    def one(_, carry):
        z, logp, grad, r = carry
        r_half = r + 0.5 * step_size * grad
        z_new = z + step_size * velocity(r_half, inv_mass)
        logp_new, grad_new = value_and_grad(z_new)
        r_new = r_half + 0.5 * step_size * grad_new
        return z_new, logp_new, grad_new, r_new

    z, logp, grad, r = jax.lax.fori_loop(
        0, n_steps, one, (state.z, state.logp, state.grad, r)
    )
    return HMCState(z, logp, grad), r


def leapfrog_one(value_and_grad, z, r, grad, step_size, inv_mass):
    """A single leapfrog step (NUTS building block)."""
    r_half = r + 0.5 * step_size * grad
    z_new = z + step_size * velocity(r_half, inv_mass)
    logp_new, grad_new = value_and_grad(z_new)
    r_new = r_half + 0.5 * step_size * grad_new
    return z_new, r_new, logp_new, grad_new


class HMCInfo(NamedTuple):
    accept_prob: jnp.ndarray
    accepted: jnp.ndarray
    diverging: jnp.ndarray
    energy: jnp.ndarray
    n_leapfrog: jnp.ndarray


def hmc_step(key, state, value_and_grad, step_size, inv_mass, n_steps,
             divergence_threshold=1000.0):
    """One Metropolis-corrected HMC transition."""
    key_r, key_u = jax.random.split(key)
    r0 = sample_momentum(key_r, inv_mass, state.z.shape, state.z.dtype)
    energy0 = -state.logp + kinetic_energy(r0, inv_mass)

    proposal, r1 = leapfrog(
        value_and_grad, state, r0, step_size, inv_mass, n_steps
    )
    energy1 = -proposal.logp + kinetic_energy(r1, inv_mass)
    delta = energy0 - energy1
    delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)

    accept_prob = jnp.minimum(1.0, jnp.exp(delta))
    diverging = -delta > divergence_threshold
    accept = jax.random.uniform(key_u, dtype=state.z.dtype) < accept_prob
    new = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), proposal, state
    )
    info = HMCInfo(accept_prob, accept, diverging, energy1,
                   jnp.asarray(n_steps))
    return new, info
