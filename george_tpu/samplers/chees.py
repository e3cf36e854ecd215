# -*- coding: utf-8 -*-
"""ChEES-HMC: gradient-based trajectory-length adaptation (batch kernel).

NUTS adapts trajectory length per chain by building a tree until a U-turn —
control flow that costs masked lockstep work under ``vmap`` and wastes up to
half the computed tree.  ChEES-HMC (Hoffman, Radul & Sountsov, AISTATS 2021,
"An Adaptive-MCMC Scheme for Setting Trajectory Lengths in Hamiltonian Monte
Carlo") is the accelerator-native alternative: ONE shared trajectory length
for the whole chain batch, jittered by a shared quasi-random factor each
iteration, adapted during warmup by stochastic gradient ascent on the
Change-in-the-Estimator-of-the-Expected-Square (ChEES) criterion

    ChEES = 1/4 E[ (||z' - E z'||^2 - ||z - E z||^2)^2 ],

whose gradient w.r.t. the trajectory time is available from the proposal's
end-point velocity.  Every chain takes the same number of leapfrog steps per
iteration, so thousands of chains stay in perfect VPU/MXU lockstep with zero
masking waste — this is the sampler the hardware wants.

Cross-chain expectations reduce over the chain batch and, when an
``axis_name`` is given, over the device mesh (pmean) — the same pooled-
adaptation design as the step-size/mass adaptation (SURVEY.md §2.6).

This module provides the batch-level transition kernel and the Adam state
for the trajectory-length adaptation; the warmup/sampling driver lives in
:func:`george_tpu.samplers.run_mcmc` (``algorithm="chees"``).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hmc import HMCState

__all__ = [
    "TrajectoryState", "traj_init", "traj_update",
    "chees_step", "halton_sequence",
]


def halton_sequence(i):
    """Van der Corput base-2 radical inverse of integer(s) ``i`` in [0, 1).

    The shared per-iteration trajectory jitter; quasi-random so the warmup's
    gradient estimates stratify [0, 1) instead of clumping (paper §4).
    """
    u32 = jnp.uint32
    i = jnp.asarray(i, u32)
    # Masks as uint32 scalars: bare python literals above 0x7FFFFFFF would
    # overflow the default int32 weak type when x64 is off.
    i = ((i & u32(0x55555555)) << 1) | ((i & u32(0xAAAAAAAA)) >> 1)
    i = ((i & u32(0x33333333)) << 2) | ((i & u32(0xCCCCCCCC)) >> 2)
    i = ((i & u32(0x0F0F0F0F)) << 4) | ((i & u32(0xF0F0F0F0)) >> 4)
    i = ((i & u32(0x00FF00FF)) << 8) | ((i & u32(0xFF00FF00)) >> 8)
    i = (i << 16) | (i >> 16)
    return i.astype(jnp.float32) / jnp.float32(4294967296.0)


# Batched Hamiltonian pieces: hmc.py's helpers are batch-polymorphic over a
# leading chains axis, so ChEES shares them verbatim.
from .hmc import kinetic_energy as _kinetic_batch
from .hmc import sample_momentum as _momentum_batch
from .hmc import velocity as _velocity_batch


# -- trajectory-length adaptation state (Adam on log T) ------------------------

class TrajectoryState(NamedTuple):
    log_t: jnp.ndarray      # log of the max trajectory *time*
    m: jnp.ndarray          # Adam first moment
    v: jnp.ndarray          # Adam second moment
    count: jnp.ndarray
    log_t_avg: jnp.ndarray  # iterate average (used after warmup)


def traj_init(t0):
    t0 = jnp.asarray(t0)
    z = jnp.zeros_like(t0)
    return TrajectoryState(jnp.log(t0), z, z, z, jnp.log(t0))


def traj_update(state, grad_log_t, step_size, max_leapfrog,
                learning_rate=0.025, b1=0.0, b2=0.5, averaging_frac=0.5):
    """Adam ascent step on log T, clipped to [step, max_leapfrog * step].

    b1=0, b2=0.5 follow the reference implementation of the paper (fast
    tracking of the noisy criterion gradient); the returned average is an
    exponential iterate average warmed over ``averaging_frac``.
    """
    g = -grad_log_t  # Adam minimizes; we ascend the criterion
    count = state.count + 1.0
    m = b1 * state.m + (1.0 - b1) * g
    v = b2 * state.v + (1.0 - b2) * g * g
    mhat = m / (1.0 - b1 ** count) if b1 > 0 else m
    vhat = v / (1.0 - b2 ** count)
    log_t = state.log_t - learning_rate * mhat / (jnp.sqrt(vhat) + 1e-8)
    lo = jnp.log(step_size)
    hi = jnp.log(max_leapfrog * step_size)
    log_t = jnp.clip(log_t, lo, hi)
    # Polyak-style tail averaging, weight ~ t^{-averaging_frac}.
    eta = count ** (-averaging_frac)
    log_t_avg = eta * log_t + (1.0 - eta) * state.log_t_avg
    log_t_avg = jnp.clip(log_t_avg, lo, hi)
    return TrajectoryState(log_t, m, v, count, log_t_avg)


# -- the batch transition -------------------------------------------------------


class ChEESInfo(NamedTuple):
    accept_prob: jnp.ndarray    # (chains,)
    accepted: jnp.ndarray       # (chains,) bool
    diverging: jnp.ndarray      # (chains,) bool
    energy: jnp.ndarray         # (chains,)
    n_leapfrog: jnp.ndarray     # scalar — shared by construction
    grad_log_t: jnp.ndarray     # scalar ChEES gradient estimate d/d log T


def _cross_mean(x, axis_name, axis=0):
    m = jnp.mean(x, axis=axis)
    if axis_name is not None:
        m = jax.lax.pmean(m, axis_name)
    return m


def chees_step(key, states, value_and_grad, step_size, inv_mass, traj_time,
               max_leapfrog=1024, axis_name=None,
               divergence_threshold=1000.0, batched_value_and_grad=None):
    """One jittered-HMC transition for the WHOLE chain batch.

    :param states: batched :class:`HMCState` (leading chains axis).
    :param value_and_grad: per-chain ``value_and_grad(z)`` (unbatched; it is
        vmapped internally).
    :param traj_time: shared trajectory *time* for this iteration (already
        jittered by the caller).  Steps = ceil(t / eps), shared by all
        chains, capped at ``max_leapfrog``.
    :param batched_value_and_grad: optional ``f(zs (B, dim)) -> (logps,
        grads)`` replacing ``vmap(value_and_grad)`` — e.g. the fused Pallas
        Kalman kernel attached by :func:`build_gp_log_prob`.
    :returns: (new_states, :class:`ChEESInfo`).
    """
    num_chains, dim = states.z.shape
    dtype = states.z.dtype
    key_r, key_u = jax.random.split(key)

    n_steps = jnp.clip(
        jnp.ceil(traj_time / step_size).astype(jnp.int32), 1, max_leapfrog
    )

    r0 = _momentum_batch(key_r, inv_mass, (num_chains, dim), dtype)
    energy0 = -states.logp + _kinetic_batch(r0, inv_mass)

    vg_batch = batched_value_and_grad or jax.vmap(value_and_grad)

    def leap(carry):
        z, logp, grad, r, i = carry
        r_half = r + 0.5 * step_size * grad
        z_new = z + step_size * _velocity_batch(r_half, inv_mass)
        logp_new, grad_new = vg_batch(z_new)
        r_new = r_half + 0.5 * step_size * grad_new
        return z_new, logp_new, grad_new, r_new, i + 1

    def cond(carry):
        return carry[-1] < n_steps

    z1, logp1, grad1, r1, _ = jax.lax.while_loop(
        cond, leap, (states.z, states.logp, states.grad, r0,
                     jnp.zeros((), jnp.int32))
    )

    energy1 = -logp1 + _kinetic_batch(r1, inv_mass)
    delta = energy0 - energy1
    delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
    accept_prob = jnp.minimum(1.0, jnp.exp(delta))
    diverging = -delta > divergence_threshold

    accept = jax.random.uniform(key_u, (num_chains,), dtype) < accept_prob
    pick = lambda a, b: jnp.where(accept[:, None], a, b)
    new = HMCState(
        z=pick(z1, states.z),
        logp=jnp.where(accept, logp1, states.logp),
        grad=pick(grad1, states.grad),
    )

    # ChEES criterion gradient w.r.t. log T (paper eq. 8, reference impl):
    #   per chain  a = ||z' - m'||^2 - ||z - m||^2,   d a / d t = 2 (z'-m')·v'
    #   d/d t  1/4 E[a^2] = E[ a (z'-m')·v' ],  weighted by accept prob;
    #   d/d log T = t * d/d t  (t = u T, shared).
    # The proposal-side statistics (m1, per-chain contributions) are
    # accept-weighted AND finite-masked: one exploded endpoint would
    # otherwise drag the cross-chain mean — and with it every chain's
    # adaptation signal — during exactly the early-warmup iterations that
    # set the trajectory length.
    finite1 = jnp.all(jnp.isfinite(z1), axis=-1) \
        & jnp.all(jnp.isfinite(r1), axis=-1)
    w = jnp.where(diverging | ~finite1, 0.0, accept_prob)
    w_mean = _cross_mean(w, axis_name)
    denom = jnp.maximum(w_mean, 1e-10)
    z1_safe = jnp.where(finite1[:, None], z1, 0.0)
    r1_safe = jnp.where(finite1[:, None], r1, 0.0)

    m0 = _cross_mean(states.z, axis_name)
    m1 = _cross_mean(w[:, None] * z1_safe, axis_name) / denom
    v1 = _velocity_batch(r1_safe, inv_mass)
    a = jnp.sum((z1_safe - m1) ** 2, axis=-1) - jnp.sum(
        (states.z - m0) ** 2, axis=-1
    )
    dot = jnp.sum((z1_safe - m1) * v1, axis=-1)
    per_chain = w * a * dot
    grad_t = _cross_mean(per_chain, axis_name) / denom
    grad_log_t = grad_t * traj_time
    # All-divergent batches give no signal: freeze instead of NaN.
    grad_log_t = jnp.where(
        jnp.isfinite(grad_log_t) & (w_mean > 1e-10), grad_log_t, 0.0
    )

    info = ChEESInfo(accept_prob, accept, diverging, energy1,
                     n_steps, grad_log_t)
    return new, info
