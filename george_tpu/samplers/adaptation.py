# -*- coding: utf-8 -*-
"""Warmup adaptation: dual-averaging step size + Welford mass matrix.

Stan-style three-phase windows (fast / expanding-slow / fast).  All statistics
pool across the chain batch — and, when an ``axis_name`` is given, across the
device mesh via ``lax.pmean``/``lax.psum`` — so thousands of (possibly
sharded) chains share one step size and mass matrix.  This is the
"cross-chain psum of welford moments" design from the north star
(BASELINE.json / SURVEY.md §2.6).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "DualAveragingState", "da_init", "da_update",
    "WelfordState", "welford_init", "welford_update_batch",
    "welford_variance", "build_schedule", "find_reasonable_step_size",
    "find_reasonable_step_size_batched",
]


# -- dual averaging (Nesterov 2009, as used by Stan) --------------------------

class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray
    log_step_avg: jnp.ndarray
    h_avg: jnp.ndarray
    t: jnp.ndarray
    mu: jnp.ndarray


def da_init(step_size):
    step_size = jnp.asarray(step_size)
    return DualAveragingState(
        log_step=jnp.log(step_size),
        log_step_avg=jnp.log(step_size),
        h_avg=jnp.zeros_like(step_size),
        t=jnp.zeros_like(step_size),
        mu=jnp.log(10.0 * step_size),
    )


def da_update(state, accept_prob, target=0.8, gamma=0.05, t0=10.0,
              kappa=0.75):
    t = state.t + 1.0
    h_avg = (1.0 - 1.0 / (t + t0)) * state.h_avg \
        + (target - accept_prob) / (t + t0)
    log_step = state.mu - jnp.sqrt(t) / gamma * h_avg
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, h_avg, t, state.mu)


# -- Welford online (co)variance ---------------------------------------------

class WelfordState(NamedTuple):
    count: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray     # (dim,) diagonal or (dim, dim) dense


def welford_init(dim, dense=False, dtype=jnp.float64):
    shape = (dim, dim) if dense else (dim,)
    return WelfordState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros(dim, dtype),
        m2=jnp.zeros(shape, dtype),
    )


def welford_update_batch(state, zs, axis_name=None):
    """Merge a (chains, dim) batch of draws (Chan's parallel update).

    With ``axis_name``, the batch statistics additionally reduce across the
    named mesh axis, so sharded chains contribute to one global estimate.
    """
    n_b = jnp.asarray(zs.shape[0], zs.dtype)
    mean_b = jnp.mean(zs, axis=0)
    if axis_name is not None:
        n_b = jax.lax.psum(n_b, axis_name)
        mean_b = jax.lax.pmean(mean_b, axis_name)
    centered = zs - mean_b
    if state.m2.ndim == 2:
        m2_b = centered.T @ centered
    else:
        m2_b = jnp.sum(centered * centered, axis=0)
    if axis_name is not None:
        m2_b = jax.lax.psum(m2_b, axis_name)

    n = state.count + n_b
    delta = mean_b - state.mean
    mean = state.mean + delta * n_b / jnp.maximum(n, 1.0)
    if state.m2.ndim == 2:
        cross = jnp.outer(delta, delta)
    else:
        cross = delta * delta
    m2 = state.m2 + m2_b + cross * state.count * n_b / jnp.maximum(n, 1.0)
    return WelfordState(n, mean, m2)


def welford_merge_across(state, axis_name):
    """Exact merge of per-device Welford states over a mesh axis.

    Welford merging is associative, so accumulating locally and merging
    only when the variance is *read* (window boundaries) is mathematically
    identical to psum-ing the batch moments every step — at 1/window_len
    the collective count.  Merged via the sufficient statistics
    (n, sum z, sum zz^T):  m2_g = sum_d (m2_d + n_d mean_d mean_d^T)
    - n_g mean_g mean_g^T.
    """
    n = jax.lax.psum(state.count, axis_name)
    s1 = jax.lax.psum(state.count * state.mean, axis_name)
    mean = s1 / jnp.maximum(n, 1.0)
    if state.m2.ndim == 2:
        raw = state.m2 + state.count * jnp.outer(state.mean, state.mean)
        m2 = jax.lax.psum(raw, axis_name) - n * jnp.outer(mean, mean)
    else:
        raw = state.m2 + state.count * state.mean ** 2
        m2 = jax.lax.psum(raw, axis_name) - n * mean ** 2
    return WelfordState(n, mean, m2)


def welford_variance(state, regularize=True):
    """The (regularized, as in Stan) variance / covariance estimate."""
    n = jnp.maximum(state.count, 2.0)
    var = state.m2 / (n - 1.0)
    if regularize:
        shrink = n / (n + 5.0)
        var = shrink * var
        if var.ndim == 2:
            var = var + 1e-3 * (1.0 - shrink) * jnp.eye(var.shape[0],
                                                        dtype=var.dtype)
        else:
            var = var + 1e-3 * (1.0 - shrink)
    return var


# -- the warmup window schedule ------------------------------------------------

def build_schedule(num_warmup, init_buffer=75, term_buffer=50, base_window=25):
    """Per-step flags: (update_mass_window, window_end), Stan's scheme."""
    if num_warmup < 20:
        in_window = np.zeros(num_warmup, bool)
        window_end = np.zeros(num_warmup, bool)
        return in_window, window_end
    if init_buffer + term_buffer + base_window > num_warmup:
        scale = num_warmup / (init_buffer + term_buffer + base_window)
        init_buffer = int(init_buffer * scale)
        term_buffer = int(term_buffer * scale)
        base_window = num_warmup - init_buffer - term_buffer

    in_window = np.zeros(num_warmup, bool)
    window_end = np.zeros(num_warmup, bool)
    t = init_buffer
    w = base_window
    while t < num_warmup - term_buffer:
        end = min(t + w, num_warmup - term_buffer)
        # The final window absorbs any remainder that couldn't double again.
        if end + 2 * w > num_warmup - term_buffer:
            end = num_warmup - term_buffer
        in_window[t:end] = True
        window_end[end - 1] = True
        t = end
        w *= 2
    return in_window, window_end


# -- step size initialization ---------------------------------------------------

def find_reasonable_step_size(value_and_grad, state, inv_mass, key,
                              step_size=1.0, target=0.5, max_iter=64):
    """Double/halve the step until the one-step accept prob crosses 0.5."""
    from .hmc import kinetic_energy, sample_momentum, leapfrog_one

    r0 = sample_momentum(key, inv_mass, state.z.shape, state.z.dtype)
    energy0 = -state.logp + kinetic_energy(r0, inv_mass)

    def accept_logprob(eps):
        _, r1, logp1, _ = leapfrog_one(
            value_and_grad, state.z, r0, state.grad, eps, inv_mass
        )
        energy1 = -logp1 + kinetic_energy(r1, inv_mass)
        delta = energy0 - energy1
        return jnp.where(jnp.isnan(delta), -jnp.inf, delta)

    log_target = jnp.log(jnp.asarray(target, state.z.dtype))
    eps0 = jnp.asarray(step_size, state.z.dtype)
    going_up = accept_logprob(eps0) > log_target

    def cond(carry):
        eps, i = carry
        a = accept_logprob(eps)
        keep = jnp.where(going_up, a > log_target, a < log_target)
        return (i < max_iter) & keep

    def body(carry):
        eps, i = carry
        factor = jnp.where(going_up, 2.0, 0.5)
        return eps * factor, i + 1

    from .._vma import pvary_like

    # Under shard_map the loop values vary per device (they depend on the
    # local chain state); the carry must be typed accordingly up front.
    carry0 = pvary_like(
        (eps0, jnp.zeros((), jnp.int32)), state, key, inv_mass
    )
    eps, _ = jax.lax.while_loop(cond, body, carry0)
    # One step back on the way up so the accept prob ends >= target.
    return jnp.where(going_up, eps * 0.5, eps)


def find_reasonable_step_size_batched(value_and_grad, states, inv_mass,
                                      key, step_size=1.0, target=0.5,
                                      max_iter=64, axis_name=None):
    """Batched variant of :func:`find_reasonable_step_size`: probe EVERY
    chain with one vmapped leapfrog per doubling iteration and decide on
    the batch-mean one-step accept probability.

    The single-chain probe pays a latency-bound scalar likelihood per
    iteration (on the headline bench the scalar scan-filter path: ~13 s
    of the warmup fixed cost, BENCH_NOTES.md round 4); here each
    iteration is ONE batched value+gradient — the fused Pallas kernel
    when the log-prob carries one (6.5 ms at 16384 chains) — and the
    decision statistic pools the whole batch (and the device mesh when
    ``axis_name`` is given), so the chosen step reflects the actual
    initial ensemble rather than chain 0's luck.
    """
    from .hmc import kinetic_energy, sample_momentum, leapfrog_one

    r0 = sample_momentum(key, inv_mass, states.z.shape, states.z.dtype)
    energy0 = -states.logp + kinetic_energy(r0, inv_mass)

    def mean_accept_logprob(eps):
        _, r1, logp1, _ = jax.vmap(
            lambda z, r, g: leapfrog_one(
                value_and_grad, z, r, g, eps, inv_mass
            )
        )(states.z, r0, states.grad)
        energy1 = -logp1 + kinetic_energy(r1, inv_mass)
        delta = energy0 - energy1
        accept = jnp.where(
            jnp.isnan(delta), 0.0, jnp.exp(jnp.minimum(delta, 0.0))
        )
        a = jnp.mean(accept)
        if axis_name is not None:
            a = jax.lax.pmean(a, axis_name)
        return jnp.log(a)

    dtype = states.z.dtype
    log_target = jnp.log(jnp.asarray(target, dtype))
    eps0 = jnp.asarray(step_size, dtype)
    going_up = mean_accept_logprob(eps0) > log_target

    def cond(carry):
        eps, i = carry
        a = mean_accept_logprob(eps)
        keep = jnp.where(going_up, a > log_target, a < log_target)
        return (i < max_iter) & keep

    def body(carry):
        eps, i = carry
        factor = jnp.where(going_up, 2.0, 0.5)
        return eps * factor, i + 1

    from .._vma import pvary_like

    carry0 = pvary_like(
        (eps0, jnp.zeros((), jnp.int32)), states, key, inv_mass
    )
    eps, _ = jax.lax.while_loop(cond, body, carry0)
    return jnp.where(going_up, eps * 0.5, eps)
