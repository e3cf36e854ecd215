# -*- coding: utf-8 -*-
"""Vectorized MCMC driver: warmup adaptation + sampling for NUTS and HMC.

Chains are a batch dimension handled by ``vmap`` — hundreds to thousands per
chip.  Adaptation statistics (mean accept prob, Welford moments) pool across
the chain batch, and across the device mesh when ``axis_name`` is set (the
driver then runs inside ``shard_map``; see george_tpu.parallel).  The whole
warmup and sampling loops are ``lax.scan``s inside one jit.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import adaptation as adapt
from .hmc import HMCState, hmc_step
from .nuts import nuts_step

__all__ = ["run_mcmc", "make_mcmc_core", "MCMCResult"]


class MCMCResult(NamedTuple):
    samples: jnp.ndarray        # (chains, num_samples, dim)
    log_prob: jnp.ndarray       # (chains, num_samples)
    accept_prob: jnp.ndarray    # (chains, num_samples)
    diverging: jnp.ndarray      # (chains, num_samples) bool
    n_leapfrog: jnp.ndarray     # (chains, num_samples)
    step_size: jnp.ndarray      # scalar (adapted)
    inv_mass: jnp.ndarray       # (dim,) or (dim, dim)


def _cross_mean(x, axis_name):
    m = jnp.mean(x)
    if axis_name is not None:
        m = jax.lax.pmean(m, axis_name)
    return m


def make_mcmc_core(log_prob, num_chains, dim, dtype, num_warmup=500,
                   num_samples=500, algorithm="nuts", target_accept=0.8,
                   max_depth=10, num_leapfrog=32, dense_mass=False,
                   step_size=None, axis_name=None, adapt_mass=True):
    """Build the traceable warmup+sampling program ``core(z0, key)``.

    The returned function is pure and traceable — wrap it in ``jit`` (done by
    :func:`run_mcmc`) or in ``shard_map`` over a chain-sharded mesh (done by
    :func:`george_tpu.parallel.run_mcmc_sharded`, passing ``axis_name`` so
    the adaptation statistics pool across devices with psum/pmean).
    """
    vg = jax.value_and_grad(log_prob)

    if algorithm == "nuts":
        def kernel(key, state, eps, inv_mass):
            return nuts_step(key, state, vg, eps, inv_mass,
                             max_depth=max_depth)
    elif algorithm == "hmc":
        def kernel(key, state, eps, inv_mass):
            return hmc_step(key, state, vg, eps, inv_mass,
                            n_steps=num_leapfrog)
    else:
        raise ValueError("unknown algorithm '{0}'".format(algorithm))

    v_kernel = jax.vmap(kernel, in_axes=(0, 0, None, None))

    in_window, window_end = adapt.build_schedule(num_warmup)
    in_window = jnp.asarray(in_window)
    window_end = jnp.asarray(window_end)

    init_inv_mass = (
        jnp.eye(dim, dtype=dtype) if dense_mass
        else jnp.ones(dim, dtype=dtype)
    )

    def chain_init(z):
        logp, grad = vg(z)
        return HMCState(z, logp, grad)

    def core(z0, key):
        states = jax.vmap(chain_init)(z0)
        key, key_eps, key_warm, key_main = jax.random.split(key, 4)

        if step_size is None:
            state0 = jax.tree_util.tree_map(lambda s: s[0], states)
            eps0 = adapt.find_reasonable_step_size(
                vg, state0, init_inv_mass, key_eps
            )
        else:
            eps0 = jnp.asarray(step_size, dtype)

        da = adapt.da_init(eps0)
        welford = adapt.welford_init(dim, dense=dense_mass, dtype=dtype)

        def warm_step(carry, inputs):
            states, da, welford, inv_mass, key = carry
            in_win, win_end = inputs
            key, sub = jax.random.split(key)
            step_keys = jax.random.split(sub, num_chains)
            eps = jnp.exp(da.log_step)
            states, info = v_kernel(step_keys, states, eps, inv_mass)

            da = adapt.da_update(
                da, _cross_mean(info.accept_prob, axis_name),
                target=target_accept,
            )

            if adapt_mass:
                updated = adapt.welford_update_batch(
                    welford, states.z, axis_name=axis_name
                )
                welford = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(in_win, new, old),
                    updated, welford,
                )
                new_mass = adapt.welford_variance(welford)
                inv_mass = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(win_end, new, old),
                    new_mass, inv_mass,
                )
                # Reset the accumulator and re-center the step size search
                # at each window boundary (Stan's scheme).
                welford = jax.tree_util.tree_map(
                    lambda w, z: jnp.where(win_end, z, w),
                    welford,
                    adapt.welford_init(dim, dense=dense_mass, dtype=dtype),
                )
                da = jax.tree_util.tree_map(
                    lambda fresh, old: jnp.where(win_end, fresh, old),
                    adapt.da_init(jnp.exp(da.log_step)), da,
                )
            return (states, da, welford, inv_mass, key), None

        carry = (states, da, welford, init_inv_mass, key_warm)
        if num_warmup > 0:
            carry, _ = jax.lax.scan(
                warm_step, carry, (in_window, window_end)
            )
        states, da, _, inv_mass, _ = carry
        eps = jnp.where(num_warmup > 0, jnp.exp(da.log_step_avg), eps0)

        def draw(carry, _):
            states, key = carry
            key, sub = jax.random.split(key)
            step_keys = jax.random.split(sub, num_chains)
            states, info = v_kernel(step_keys, states, eps, inv_mass)
            out = (states.z, states.logp, info.accept_prob,
                   info.diverging, info.n_leapfrog)
            return (states, key), out

        (states, _), (zs, logps, accs, divs, nleap) = jax.lax.scan(
            draw, (states, key_main), None, length=num_samples
        )
        return MCMCResult(
            samples=jnp.swapaxes(zs, 0, 1),
            log_prob=jnp.swapaxes(logps, 0, 1),
            accept_prob=jnp.swapaxes(accs, 0, 1),
            diverging=jnp.swapaxes(divs, 0, 1),
            n_leapfrog=jnp.swapaxes(nleap, 0, 1),
            step_size=eps,
            inv_mass=inv_mass,
        )

    return core


def run_mcmc(log_prob, z0, key, **kwargs):
    """Run warmup + sampling for a batch of chains on one device.

    :param log_prob: traceable scalar density of one parameter vector.
    :param z0: (chains, dim) initial positions.
    :param key: PRNG key (one; chain keys are split internally).
    :returns: :class:`MCMCResult` with per-chain draws and diagnostics.

    Keyword options: num_warmup, num_samples, algorithm ("nuts"/"hmc"),
    target_accept, max_depth, num_leapfrog, dense_mass, step_size,
    adapt_mass.  For multi-device chain sharding use
    :func:`george_tpu.parallel.run_mcmc_sharded`.
    """
    z0 = jnp.asarray(z0)
    num_chains, dim = z0.shape
    core = make_mcmc_core(log_prob, num_chains, dim, z0.dtype, **kwargs)
    return jax.jit(core)(z0, jnp.asarray(key))
