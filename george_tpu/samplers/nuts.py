# -*- coding: utf-8 -*-
"""Iterative No-U-Turn Sampler.

The textbook NUTS builds binary trees recursively with data-dependent
shapes — impossible to ``vmap`` across chains on an accelerator.  This is the
iterative reformulation (as popularized by numpyro): trajectories grow by
doublings inside masked ``while_loop``s with static ``max_depth``, and
U-turn checks inside each doubling use an O(log n) checkpoint stack of
momenta indexed by the bit pattern of the leaf counter, so thousands of
chains stay in lockstep on the VPU.

Multinomial (biased-progressive) sampling over leaves, generalized U-turn
criterion <M^{-1} rho, r_edge> <= 0, divergence threshold DeltaE > 1000
(Stan conventions).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hmc import kinetic_energy, sample_momentum, velocity, leapfrog_one

__all__ = ["nuts_step", "NUTSInfo"]


class NUTSInfo(NamedTuple):
    accept_prob: jnp.ndarray     # mean Metropolis stat over visited leaves
    diverging: jnp.ndarray
    energy: jnp.ndarray
    depth: jnp.ndarray
    n_leapfrog: jnp.ndarray


def _is_turning(r_left, r_right, rho, inv_mass):
    """Generalized no-U-turn condition across a (sub)trajectory."""
    v_left = velocity(r_left, inv_mass)
    v_right = velocity(r_right, inv_mass)
    return (jnp.dot(v_left, rho) <= 0.0) | (jnp.dot(v_right, rho) <= 0.0)


def _popcount(n):
    return jax.lax.population_count(n.astype(jnp.uint32)).astype(jnp.int32)


class _Subtree(NamedTuple):
    # Moving edge (outermost visited point in the current direction).
    z: jnp.ndarray
    r: jnp.ndarray
    grad: jnp.ndarray
    logp: jnp.ndarray
    # Multinomial proposal within the subtree.
    z_prop: jnp.ndarray
    logp_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    log_weight: jnp.ndarray
    # Momentum bookkeeping for U-turn checks.
    rho: jnp.ndarray                 # sum of momenta in the subtree
    ckpt_r: jnp.ndarray              # (max_depth, dim) boundary momenta
    ckpt_rho: jnp.ndarray            # (max_depth, dim) cumulative sums
    # Termination + adaptation statistics.
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray
    n_leaves: jnp.ndarray
    key: jnp.ndarray


def _build_subtree(key, z, r, grad, logp, direction, num_leaves, energy0,
                   value_and_grad, step_size, inv_mass, max_depth,
                   divergence_threshold):
    """Extend the trajectory by ``num_leaves`` leapfrog steps in one
    direction, with in-subtree U-turn detection via the checkpoint stack."""
    dim = z.shape[0]
    dtype = z.dtype
    init = _Subtree(
        z=z, r=r, grad=grad, logp=logp,
        z_prop=z, logp_prop=logp, grad_prop=grad,
        log_weight=-jnp.inf * jnp.ones((), dtype),
        rho=jnp.zeros(dim, dtype),
        ckpt_r=jnp.zeros((max_depth, dim), dtype),
        ckpt_rho=jnp.zeros((max_depth, dim), dtype),
        turning=jnp.zeros((), bool),
        diverging=jnp.zeros((), bool),
        sum_accept=jnp.zeros((), dtype),
        n_leaves=jnp.zeros((), jnp.int32),
        key=key,
    )

    def cond(carry):
        leaf, st = carry
        return (leaf < num_leaves) & ~st.turning & ~st.diverging

    def body(carry):
        leaf, st = carry
        key, key_mn = jax.random.split(st.key)

        z, r_new, logp_new, grad_new = leapfrog_one(
            value_and_grad, st.z, st.r, st.grad,
            direction * step_size, inv_mass,
        )
        energy = -logp_new + kinetic_energy(r_new, inv_mass)
        delta = energy0 - energy                      # log leaf weight
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        diverging = (-delta) > divergence_threshold

        # Multinomial sampling within the subtree.
        log_weight = jnp.logaddexp(st.log_weight, delta)
        take = jnp.log(jax.random.uniform(key_mn, dtype=dtype)) \
            < (delta - log_weight)
        z_prop = jnp.where(take, z, st.z_prop)
        logp_prop = jnp.where(take, logp_new, st.logp_prop)
        grad_prop = jnp.where(take, grad_new, st.grad_prop)

        # Checkpoint stack: an even leaf opens subtrees — record its
        # momentum and the cumulative sum before it at slot popcount(leaf).
        is_even = (leaf % 2) == 0
        slot = _popcount(leaf)
        ckpt_r = jnp.where(
            is_even,
            st.ckpt_r.at[slot].set(r_new),
            st.ckpt_r,
        )
        ckpt_rho = jnp.where(
            is_even,
            st.ckpt_rho.at[slot].set(st.rho),
            st.ckpt_rho,
        )
        rho = st.rho + r_new

        # An odd leaf closes the subtrees recorded at slots
        # [popcount(leaf) - trailing_ones(leaf), popcount(leaf) - 1].
        trailing_ones = _popcount(((leaf + 1) & -(leaf + 1)) - 1)
        pc = _popcount(leaf)
        idx_min = pc - trailing_ones
        idx_max = pc - 1
        slots = jnp.arange(max_depth)
        active = (~is_even) & (slots >= idx_min) & (slots <= idx_max)
        sub_rho = rho[None, :] - ckpt_rho            # (max_depth, dim)
        v_l = jax.vmap(lambda rr: velocity(rr, inv_mass))(ckpt_r)
        v_r = velocity(r_new, inv_mass)
        turn = (jnp.einsum("kd,kd->k", v_l, sub_rho) <= 0.0) \
            | (sub_rho @ v_r <= 0.0)
        turning = st.turning | jnp.any(active & turn)

        st = _Subtree(
            z=z, r=r_new, grad=grad_new, logp=logp_new,
            z_prop=z_prop, logp_prop=logp_prop, grad_prop=grad_prop,
            log_weight=log_weight,
            rho=rho, ckpt_r=ckpt_r, ckpt_rho=ckpt_rho,
            turning=turning, diverging=diverging,
            sum_accept=st.sum_accept + jnp.minimum(1.0, jnp.exp(delta)),
            n_leaves=st.n_leaves + 1,
            key=key,
        )
        return leaf + 1, st

    _, out = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), init))
    return out


class _Tree(NamedTuple):
    z_left: jnp.ndarray
    r_left: jnp.ndarray
    grad_left: jnp.ndarray
    logp_left: jnp.ndarray
    z_right: jnp.ndarray
    r_right: jnp.ndarray
    grad_right: jnp.ndarray
    logp_right: jnp.ndarray
    z_prop: jnp.ndarray
    logp_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    log_weight: jnp.ndarray
    rho: jnp.ndarray
    depth: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray
    n_leaves: jnp.ndarray
    key: jnp.ndarray


def nuts_step(key, state, value_and_grad, step_size, inv_mass,
              max_depth=10, divergence_threshold=1000.0):
    """One NUTS transition.  ``state`` is an :class:`hmc.HMCState`."""
    dtype = state.z.dtype
    key, key_r = jax.random.split(key)
    r0 = sample_momentum(key_r, inv_mass, state.z.shape, state.z.dtype)
    energy0 = -state.logp + kinetic_energy(r0, inv_mass)

    tree = _Tree(
        z_left=state.z, r_left=r0, grad_left=state.grad,
        logp_left=state.logp,
        z_right=state.z, r_right=r0, grad_right=state.grad,
        logp_right=state.logp,
        z_prop=state.z, logp_prop=state.logp, grad_prop=state.grad,
        log_weight=jnp.zeros((), dtype),
        rho=r0,
        depth=jnp.zeros((), jnp.int32),
        turning=jnp.zeros((), bool),
        diverging=jnp.zeros((), bool),
        sum_accept=jnp.zeros((), dtype),
        n_leaves=jnp.zeros((), jnp.int32),
        key=key,
    )

    def cond(tree):
        return (tree.depth < max_depth) & ~tree.turning & ~tree.diverging

    def body(tree):
        key, key_dir, key_sub, key_acc = jax.random.split(tree.key, 4)
        going_right = jax.random.bernoulli(key_dir)
        direction = jnp.where(going_right, 1.0, -1.0).astype(dtype)

        z0 = jnp.where(going_right, tree.z_right, tree.z_left)
        r0_edge = jnp.where(going_right, tree.r_right, tree.r_left)
        g0 = jnp.where(going_right, tree.grad_right, tree.grad_left)
        p0 = jnp.where(going_right, tree.logp_right, tree.logp_left)

        sub = _build_subtree(
            key_sub, z0, r0_edge, g0, p0, direction,
            num_leaves=jnp.left_shift(1, tree.depth), energy0=energy0,
            value_and_grad=value_and_grad, step_size=step_size,
            inv_mass=inv_mass, max_depth=max_depth,
            divergence_threshold=divergence_threshold,
        )

        ok = ~sub.turning & ~sub.diverging
        # Biased progressive sampling: prefer the fresh subtree.
        take = ok & (
            jnp.log(jax.random.uniform(key_acc, dtype=dtype))
            < (sub.log_weight - tree.log_weight)
        )
        z_prop = jnp.where(take, sub.z_prop, tree.z_prop)
        logp_prop = jnp.where(take, sub.logp_prop, tree.logp_prop)
        grad_prop = jnp.where(take, sub.grad_prop, tree.grad_prop)

        z_left = jnp.where(going_right, tree.z_left, sub.z)
        r_left = jnp.where(going_right, tree.r_left, sub.r)
        grad_left = jnp.where(going_right, tree.grad_left, sub.grad)
        logp_left = jnp.where(going_right, tree.logp_left, sub.logp)
        z_right = jnp.where(going_right, sub.z, tree.z_right)
        r_right = jnp.where(going_right, sub.r, tree.r_right)
        grad_right = jnp.where(going_right, sub.grad, tree.grad_right)
        logp_right = jnp.where(going_right, sub.logp, tree.logp_right)

        # A backward excursion visits true trajectory points, so its momenta
        # are the true momenta there and rho is the plain (order-free) sum.
        rho = tree.rho + sub.rho
        turning = sub.turning | _is_turning(r_left, r_right, rho, inv_mass)

        return _Tree(
            z_left=z_left, r_left=r_left, grad_left=grad_left,
            logp_left=logp_left,
            z_right=z_right, r_right=r_right, grad_right=grad_right,
            logp_right=logp_right,
            z_prop=z_prop, logp_prop=logp_prop, grad_prop=grad_prop,
            log_weight=jnp.logaddexp(tree.log_weight, sub.log_weight),
            rho=rho,
            depth=tree.depth + 1,
            turning=turning,
            diverging=sub.diverging,
            sum_accept=tree.sum_accept + sub.sum_accept,
            n_leaves=tree.n_leaves + sub.n_leaves,
            key=key,
        )

    tree = jax.lax.while_loop(cond, body, tree)

    from .hmc import HMCState

    new_state = HMCState(tree.z_prop, tree.logp_prop, tree.grad_prop)
    n = jnp.maximum(tree.n_leaves, 1)
    info = NUTSInfo(
        accept_prob=tree.sum_accept / n,
        diverging=tree.diverging,
        energy=-tree.logp_prop,
        depth=tree.depth,
        n_leapfrog=tree.n_leaves,
    )
    return new_state, info
