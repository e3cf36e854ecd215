# -*- coding: utf-8 -*-
"""Iterative No-U-Turn Sampler, flattened to a single device loop.

The textbook NUTS builds binary trees recursively with data-dependent
shapes — impossible to ``vmap`` across chains on an accelerator.  Common
iterative reformulations still nest a per-doubling loop inside the doubling
loop; nested ``while_loop``s inflate TPU compile times badly.  Here the
whole transition is ONE ``lax.while_loop`` whose body does exactly one
leapfrog step plus O(max_depth) bookkeeping:

  * the trajectory grows leaf by leaf; a doubling's random direction is
    drawn when its first leaf starts, and the finished subtree merges into
    the trajectory (biased-progressive multinomial proposal swap, edge
    extension, trajectory-level U-turn check) when its last leaf lands —
    both as masked selects, so every iteration is the same straightline
    program;
  * within-subtree U-turn detection uses the O(log n) checkpoint stack of
    momenta indexed by the bit pattern of the leaf counter (an even leaf
    opens subtrees at slot popcount(i); an odd leaf closes the slots
    [popcount(i) - trailing_ones(i), popcount(i) - 1]);
  * multinomial sampling over leaves, generalized U-turn criterion
    <M^{-1} rho, r_edge> <= 0, divergence at DeltaE > 1000 (Stan
    conventions).

Thousands of chains vmap over this in lockstep: the masked loop runs until
every chain terminates, which matches the nested formulation's cost under
vmap while compiling an order of magnitude faster.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hmc import HMCState, kinetic_energy, sample_momentum, velocity, \
    leapfrog_one

__all__ = ["nuts_step", "nuts_draws_persistent", "NUTSInfo"]


class NUTSInfo(NamedTuple):
    accept_prob: jnp.ndarray     # mean Metropolis stat over visited leaves
    diverging: jnp.ndarray
    energy: jnp.ndarray
    depth: jnp.ndarray
    n_leapfrog: jnp.ndarray


def _popcount(n):
    return jax.lax.population_count(n.astype(jnp.uint32)).astype(jnp.int32)


class _State(NamedTuple):
    # Per-transition energy origin (set at transition init).
    energy0: jnp.ndarray
    # Committed trajectory.
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
    tree_logw: jnp.ndarray
    tree_rho: jnp.ndarray
    depth: jnp.ndarray
    # Subtree under construction.
    direction: jnp.ndarray       # +-1.0
    sub_count: jnp.ndarray       # leaves completed in this subtree
    sub_logw: jnp.ndarray
    sub_rho: jnp.ndarray
    sub_zprop: jnp.ndarray
    sub_logp_prop: jnp.ndarray
    sub_grad_prop: jnp.ndarray
    ckpt_r: jnp.ndarray          # (max_depth, dim)
    ckpt_rho: jnp.ndarray        # (max_depth, dim)
    # Moving integration edge.
    z_cur: jnp.ndarray
    r_cur: jnp.ndarray
    grad_cur: jnp.ndarray
    logp_cur: jnp.ndarray
    # Termination + stats.
    done: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray
    n_leaves: jnp.ndarray
    key: jnp.ndarray


def _init_transition(key, state, inv_mass, max_depth, dtype, dim):
    """Fresh :class:`_State` for one NUTS transition from ``state``."""
    key, key_r = jax.random.split(key)
    r0 = sample_momentum(key_r, inv_mass, state.z.shape, dtype)
    energy0 = -state.logp + kinetic_energy(r0, inv_mass)

    return _State(
        energy0=energy0,
        z_left=state.z, r_left=r0, grad_left=state.grad,
        logp_left=state.logp,
        z_right=state.z, r_right=r0, grad_right=state.grad,
        logp_right=state.logp,
        z_prop=state.z, logp_prop=state.logp, grad_prop=state.grad,
        tree_logw=jnp.zeros((), dtype),
        tree_rho=r0,
        depth=jnp.zeros((), jnp.int32),
        direction=jnp.ones((), dtype),
        sub_count=jnp.zeros((), jnp.int32),
        sub_logw=jnp.full((), -jnp.inf, dtype),
        sub_rho=jnp.zeros(dim, dtype),
        sub_zprop=state.z, sub_logp_prop=state.logp,
        sub_grad_prop=state.grad,
        ckpt_r=jnp.zeros((max_depth, dim), dtype),
        ckpt_rho=jnp.zeros((max_depth, dim), dtype),
        z_cur=state.z, r_cur=r0, grad_cur=state.grad, logp_cur=state.logp,
        done=jnp.zeros((), bool),
        diverging=jnp.zeros((), bool),
        sum_accept=jnp.zeros((), dtype),
        n_leaves=jnp.zeros((), jnp.int32),
        key=key,
    )


def _make_body(value_and_grad, step_size, inv_mass, max_depth,
               divergence_threshold, dtype, dim):
    """The one-leapfrog-per-iteration transition body (see module docs)."""

    def select(pred, a, b):
        return jnp.where(pred, a, b)

    def is_turning(r_a, r_b, rho):
        v_a = velocity(r_a, inv_mass)
        v_b = velocity(r_b, inv_mass)
        return (jnp.dot(v_a, rho) <= 0.0) | (jnp.dot(v_b, rho) <= 0.0)

    def body(st):
        key, key_dir, key_mn, key_acc = jax.random.split(st.key, 4)

        # -- subtree start: draw a direction, move the edge, reset trackers.
        starting = st.sub_count == 0
        new_dir = select(
            jax.random.bernoulli(key_dir),
            jnp.ones((), dtype), -jnp.ones((), dtype)
        )
        direction = select(starting, new_dir, st.direction)
        going_right = direction > 0
        pick = lambda right, left: select(going_right, right, left)
        z_cur = select(starting, pick(st.z_right, st.z_left), st.z_cur)
        r_cur = select(starting, pick(st.r_right, st.r_left), st.r_cur)
        grad_cur = select(
            starting, pick(st.grad_right, st.grad_left), st.grad_cur
        )
        sub_logw = select(starting, jnp.full((), -jnp.inf, dtype),
                          st.sub_logw)
        sub_rho = select(starting, jnp.zeros(dim, dtype), st.sub_rho)

        # -- one leapfrog step.
        z_new, r_new, logp_new, grad_new = leapfrog_one(
            value_and_grad, z_cur, r_cur, grad_cur,
            direction * step_size, inv_mass,
        )
        energy = -logp_new + kinetic_energy(r_new, inv_mass)
        delta = st.energy0 - energy
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        diverging = (-delta) > divergence_threshold

        # -- multinomial proposal within the subtree.
        sub_logw_new = jnp.logaddexp(sub_logw, delta)
        take = jnp.log(jax.random.uniform(key_mn, dtype=dtype)) \
            < (delta - sub_logw_new)
        sub_zprop = select(take, z_new, st.sub_zprop)
        sub_logp_prop = select(take, logp_new, st.sub_logp_prop)
        sub_grad_prop = select(take, grad_new, st.sub_grad_prop)

        # -- checkpoint-stack U-turn bookkeeping (leaf index = sub_count).
        leaf = st.sub_count
        is_even = (leaf % 2) == 0
        slot = _popcount(leaf)
        ckpt_r = select(is_even, st.ckpt_r.at[slot].set(r_new), st.ckpt_r)
        ckpt_rho = select(
            is_even, st.ckpt_rho.at[slot].set(sub_rho), st.ckpt_rho
        )
        sub_rho = sub_rho + r_new
        trailing_ones = _popcount(((leaf + 1) & -(leaf + 1)) - 1)
        pc = _popcount(leaf)
        slots = jnp.arange(max_depth)
        active = (~is_even) & (slots >= pc - trailing_ones) \
            & (slots <= pc - 1)
        seg_rho = sub_rho[None, :] - ckpt_rho
        v_ck = ckpt_r * inv_mass if inv_mass.ndim == 1 \
            else ckpt_r @ inv_mass.T
        v_new = velocity(r_new, inv_mass)
        seg_turn = (jnp.einsum("kd,kd->k", v_ck, seg_rho) <= 0.0) \
            | (seg_rho @ v_new <= 0.0)
        sub_turning = jnp.any(active & seg_turn)

        sub_count = leaf + 1
        sub_target = jnp.left_shift(1, st.depth)
        sub_done = sub_count >= sub_target
        ok = ~sub_turning & ~diverging

        # -- subtree merge (fires only when the subtree completed cleanly).
        merge = sub_done & ok
        swap = merge & (
            jnp.log(jax.random.uniform(key_acc, dtype=dtype))
            < (sub_logw_new - st.tree_logw)
        )
        z_prop = select(swap, sub_zprop, st.z_prop)
        logp_prop = select(swap, sub_logp_prop, st.logp_prop)
        grad_prop = select(swap, sub_grad_prop, st.grad_prop)
        tree_logw = select(
            merge, jnp.logaddexp(st.tree_logw, sub_logw_new), st.tree_logw
        )

        ext_right = merge & going_right
        ext_left = merge & ~going_right
        z_right = select(ext_right, z_new, st.z_right)
        r_right = select(ext_right, r_new, st.r_right)
        grad_right = select(ext_right, grad_new, st.grad_right)
        logp_right = select(ext_right, logp_new, st.logp_right)
        z_left = select(ext_left, z_new, st.z_left)
        r_left = select(ext_left, r_new, st.r_left)
        grad_left = select(ext_left, grad_new, st.grad_left)
        logp_left = select(ext_left, logp_new, st.logp_left)

        tree_rho = select(merge, st.tree_rho + sub_rho, st.tree_rho)
        tree_turn = merge & is_turning(r_left, r_right, tree_rho)
        depth = select(merge, st.depth + 1, st.depth)

        done = diverging | sub_turning | tree_turn \
            | (merge & (depth >= max_depth))

        return _State(
            energy0=st.energy0,
            z_left=z_left, r_left=r_left, grad_left=grad_left,
            logp_left=logp_left,
            z_right=z_right, r_right=r_right, grad_right=grad_right,
            logp_right=logp_right,
            z_prop=z_prop, logp_prop=logp_prop, grad_prop=grad_prop,
            tree_logw=tree_logw, tree_rho=tree_rho, depth=depth,
            direction=direction,
            sub_count=select(sub_done, jnp.zeros((), jnp.int32), sub_count),
            sub_logw=sub_logw_new, sub_rho=sub_rho,
            sub_zprop=sub_zprop, sub_logp_prop=sub_logp_prop,
            sub_grad_prop=sub_grad_prop,
            ckpt_r=ckpt_r, ckpt_rho=ckpt_rho,
            z_cur=z_new, r_cur=r_new, grad_cur=grad_new, logp_cur=logp_new,
            done=done, diverging=diverging,
            sum_accept=st.sum_accept + jnp.minimum(1.0, jnp.exp(delta)),
            n_leaves=st.n_leaves + 1,
            key=key,
        )

    return body


def nuts_step(key, state, value_and_grad, step_size, inv_mass,
              max_depth=10, divergence_threshold=1000.0):
    """One NUTS transition.  ``state`` is an :class:`hmc.HMCState`."""
    dtype = state.z.dtype
    dim = state.z.shape[0]
    st = _init_transition(key, state, inv_mass, max_depth, dtype, dim)
    body = _make_body(value_and_grad, step_size, inv_mass, max_depth,
                      divergence_threshold, dtype, dim)

    from .._vma import pvary_like

    # shard_map vma discipline: the zero-initialized counters/flags must be
    # typed varying like the chain state before entering the loop.
    st = pvary_like(st, st, key, step_size, inv_mass)
    st = jax.lax.while_loop(lambda s: ~s.done, body, st)

    new_state = HMCState(st.z_prop, st.logp_prop, st.grad_prop)
    n = jnp.maximum(st.n_leaves, 1)
    info = NUTSInfo(
        accept_prob=st.sum_accept / n,
        diverging=st.diverging,
        energy=-st.logp_prop,
        depth=st.depth,
        n_leapfrog=st.n_leaves,
    )
    return new_state, info


def nuts_draws_persistent(keys, states, value_and_grad, step_size,
                          inv_mass, num_draws, max_depth=10,
                          divergence_threshold=1000.0):
    """``num_draws`` NUTS transitions in ONE trajectory-persistent loop.

    The per-draw formulation pays the batch-MAX trajectory length every
    draw under ``vmap``: the masked ``while_loop`` in :func:`nuts_step`
    runs until the longest chain's U-turn (measured on the headline bench:
    p99 = 15 leapfrogs paid for a 9.2 mean — ~40% of step time was
    lockstep tail, BENCH_NOTES.md round 3).  Here the loop is persistent
    across transitions: the moment a chain's trajectory terminates, its
    draw is recorded and the SAME device-loop iteration starts its next
    transition, so chains never idle waiting for the batch — the tail is
    paid once at the very end of the run instead of once per draw.

    Fixed ``step_size``/``inv_mass`` only (the sampling phase; warmup
    keeps the per-draw structure so cross-chain adaptation pooling stays
    in lockstep).  BATCH-level function: ``keys`` is ``(chains,)`` and
    ``states`` a chain-batched :class:`hmc.HMCState` — the transition
    body is vmapped internally so that the emit scan below stacks its
    outputs time-major (vmapping the whole loop instead puts the chain
    axis innermost and every per-iteration emit becomes a strided write —
    measured at ~3x the total sampling time).  The fused batched
    value_and_grad seam applies as usual.

    Returns ``(final HMCState, final keys, outs)`` with ``outs`` a tuple
    of ``(z (chains, num_draws, dim), logp, accept_prob, diverging,
    n_leapfrog)``.  Restarting from ``(final HMCState, final keys)``
    continues the exact stream: chains freeze at their quota on a
    committed draw (no partial next trajectory), so blocked execution
    reproduces the fused run bitwise.
    """
    dtype = states.z.dtype
    nchains, dim = states.z.shape
    body1 = _make_body(value_and_grad, step_size, inv_mass, max_depth,
                       divergence_threshold, dtype, dim)

    def per_chain_step(st, frozen):
        fresh = _init_transition(
            st.key, HMCState(st.z_prop, st.logp_prop, st.grad_prop),
            inv_mass, max_depth, dtype, dim,
        )
        st_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(st.done, a, b), fresh, st
        )
        st_new = body1(st_new)
        # Chains that reached their quota freeze on their last committed
        # draw, so the exit state continues the stream bitwise.
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(frozen, b, a), st_new, st
        )

    v_step = jax.vmap(per_chain_step)
    st0 = jax.vmap(
        _init_transition, in_axes=(0, 0, None, None, None, None)
    )(keys, states, inv_mass, max_depth, dtype, dim)

    bufs0 = (
        jnp.zeros((nchains, num_draws, dim), dtype),   # z
        jnp.zeros((nchains, num_draws), dtype),        # logp
        jnp.zeros((nchains, num_draws), dtype),        # accept_prob
        jnp.zeros((nchains, num_draws), bool),         # diverging
        jnp.zeros((nchains, num_draws), jnp.int32),    # n_leapfrog
    )

    # Per-iteration scattered writes into the draw buffers were measured
    # at ~12x the cost of the leapfrog itself (XLA lowers a batched
    # .at[idx].set to a serializing scatter).  Instead the loop runs in
    # SEGments of a fixed-length inner scan that merely EMITS
    # (rec, draw) rows — time-major contiguous writes — and one
    # amortized batched scatter per segment compacts them into the
    # buffers.
    seg = int(min(128, max(32, num_draws * 2)))

    def seg_step(carry, _):
        st, idx = carry                                # idx: (chains,)
        frozen = idx >= num_draws
        st = v_step(st, frozen)
        rec = st.done & ~frozen
        n = jnp.maximum(st.n_leaves, 1)
        out = (rec, st.z_prop, st.logp_prop, st.sum_accept / n,
               st.diverging, st.n_leaves)
        return (st, idx + rec.astype(jnp.int32)), out

    def cond(carry):
        _, idx, _ = carry
        return jnp.any(idx < num_draws)

    chain_ix = jnp.arange(nchains)[None, :]

    def body(carry):
        st, idx, bufs = carry
        (st, idx_new), outs = jax.lax.scan(
            seg_step, (st, idx), None, length=seg
        )
        recs = outs[0]                                 # (seg, chains)
        # Target slot per emitted row; non-recorded rows land out of
        # range and are dropped by the scatter.
        slots = jnp.where(
            recs,
            idx[None, :] + jnp.cumsum(recs.astype(jnp.int32), axis=0) - 1,
            num_draws,
        )
        bufs = tuple(
            buf.at[chain_ix, slots].set(v, mode="drop")
            for buf, v in zip(bufs, outs[1:])
        )
        return st, idx_new, bufs

    from .._vma import pvary_like

    st0 = pvary_like(st0, st0, keys, step_size, inv_mass)
    carry = (st0, jnp.zeros((nchains,), jnp.int32), bufs0)
    carry = pvary_like(carry, carry)
    st, _, bufs = jax.lax.while_loop(cond, body, carry)
    return HMCState(st.z_prop, st.logp_prop, st.grad_prop), st.key, bufs
