# -*- coding: utf-8 -*-
"""Vectorized MCMC driver: warmup adaptation + sampling for NUTS and HMC.

Chains are a batch dimension handled by ``vmap`` — hundreds to thousands per
chip.  Adaptation statistics (mean accept prob, Welford moments) pool across
the chain batch, and across the device mesh when ``axis_name`` is set (the
driver then runs inside ``shard_map``; see george_tpu.parallel).

Execution comes in two shapes:

  * one fused program (``block_size=None``): the whole warmup and sampling
    loops are ``lax.scan``s inside a single jit — maximum fusion, right for
    short runs and for wrapping in ``shard_map``;
  * blocked (``block_size=k``): the same scans split into bounded segments
    re-invoked from the host — keeps each device execution short (tunneled
    or preemptible backends), enables progress/checkpoint hooks between
    blocks, identical math and identical RNG stream.
"""

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


def _pmean_tree(tree, axis_name):
    return jax.tree_util.tree_map(
        lambda v: jax.lax.pmean(v, axis_name), tree
    )


def _sync_da(da, sync, axis_name):
    """Pool the dual-averaging state across devices at sync points.

    Every DA field is affine in the per-step accept statistics with
    device-identical coefficients, so pooling the *state* at any cadence
    lands on exactly the trajectory the old pool-every-step scheme produced
    at those points; between syncs each device runs on its local accept
    mean.  ``sync_every=1`` therefore reproduces the old math step for
    step.
    """
    if axis_name is None:
        return da
    from .._vma import _pvary_axis

    def pooled(d):
        # Re-type the pooled (numerically device-identical) state as
        # varying so both cond branches carry the same vma type.
        return jax.tree_util.tree_map(
            lambda v: _pvary_axis(jax.lax.pmean(v, axis_name), axis_name),
            d,
        )

    return jax.lax.cond(sync, pooled, lambda d: d, da)


class _Pieces(NamedTuple):
    """Traceable building blocks shared by both execution shapes."""

    chain_init: object
    init_step_size: object
    warm_step: object    # (carry, (in_win, win_end, idx)) -> (carry, None)
    draw_step: object    # (carry, _, eps, inv_mass, extra) -> (carry, outs)
    schedule: tuple      # (in_window, window_end) numpy arrays
    extra_init: object   # eps0 -> algorithm-specific warmup state (or ())
    # Optional batch sampler: (carry, n, eps, inv_mass, extra) ->
    # (carry, outs) with outs already (chains, n, ...)-shaped — used by
    # trajectory-persistent NUTS, where the n-draw loop must live INSIDE
    # the traced function (one leapfrog per device iteration across
    # transition boundaries) rather than as a scan over transitions.
    draw_many: object = None


def _mass_window_update(da, welford, inv_mass, states, in_win, win_end,
                        dim, dense_mass, dtype, axis_name):
    """Stan's windowed Welford mass adaptation + per-window DA reset.

    Cross-device pooling happens only when the variance is read (window
    boundaries): Welford accumulates device-locally and the exact merge
    (:func:`adaptation.welford_merge_across`) runs under ``lax.cond`` on
    the replicated ``win_end`` flag — identical mass estimates to the old
    psum-every-step scheme with O(1/window) the collectives.
    """
    updated = adapt.welford_update_batch(welford, states.z, axis_name=None)
    welford = jax.tree_util.tree_map(
        lambda new, old: jnp.where(in_win, new, old), updated, welford,
    )
    if axis_name is None:
        new_mass = adapt.welford_variance(welford)
        inv_mass = jax.tree_util.tree_map(
            lambda new, old: jnp.where(win_end, new, old), new_mass,
            inv_mass,
        )
    else:
        inv_mass = jax.lax.cond(
            win_end,
            lambda w: adapt.welford_variance(
                adapt.welford_merge_across(w, axis_name)
            ),
            lambda w: inv_mass,
            welford,
        )
    # Reset the accumulator and re-center the step size search at each
    # window boundary (Stan's scheme).
    welford = jax.tree_util.tree_map(
        lambda w, z: jnp.where(win_end, z, w),
        welford, adapt.welford_init(dim, dense=dense_mass, dtype=dtype),
    )
    da = jax.tree_util.tree_map(
        lambda fresh, old: jnp.where(win_end, fresh, old),
        adapt.da_init(jnp.exp(da.log_step)), da,
    )
    return da, welford, inv_mass


def _fuse_batched_vg(scalar_vg, batched_vg):
    """Route ``vmap`` of a per-chain value_and_grad through a fused batch
    kernel (e.g. the Pallas Kalman / dense value+gradient programs).

    ``jax.custom_vmap`` is the idiomatic seam: per-chain callers (step-size
    search) run the scalar implementation; anything vmapped over chains —
    including the leapfrog inside the vmapped NUTS/HMC transition — hits
    the batch rule and executes ONE fused kernel for the whole chain batch.
    """
    @jax.custom_batching.custom_vmap
    def vg(z):
        return scalar_vg(z)

    @vg.def_vmap
    def _rule(axis_size, in_batched, zs):
        if not in_batched[0]:
            zs = jnp.broadcast_to(zs, (axis_size,) + zs.shape)
        logp, grad = batched_vg(zs)
        return (logp, grad), (True, True)

    return vg


def _build_pieces(log_prob, num_chains, dim, dtype, num_warmup,
                  algorithm, target_accept, max_depth, num_leapfrog,
                  dense_mass, axis_name, adapt_mass, sync_every=8,
                  persistent=True):
    vg = jax.value_and_grad(log_prob)
    batched_vg = getattr(log_prob, "batched_value_and_grad", None)

    if algorithm == "chees":
        return _build_chees_pieces(
            vg, num_chains, dim, dtype, num_warmup, target_accept,
            num_leapfrog, dense_mass, axis_name, adapt_mass,
            batched_vg=batched_vg, sync_every=sync_every,
        )

    if batched_vg is not None:
        vg = _fuse_batched_vg(vg, batched_vg)

    draw_many = None
    if algorithm == "nuts":
        def kernel(key, state, eps, inv_mass):
            return nuts_step(key, state, vg, eps, inv_mass,
                             max_depth=max_depth)

        if persistent:
            from .nuts import nuts_draws_persistent

            # At 16384 chains the compiled persistent loop produces
            # corrupted U-turn decisions on TPU (trajectories truncate to
            # odd leapfrog counts at subtree merges; 8192 and below are
            # bit-healthy, CPU is clean at every size — an XLA codegen
            # issue in the select-heavy while+scan at that batch size,
            # BENCH_NOTES.md round 4).  Chains are independent, so larger
            # batches run as sequential sub-batches — statistically
            # identical, and each sub-batch still amortizes its own tail.
            max_batch = 8192

            def draw_many(carry, n, eps, inv_mass, extra):
                states, key = carry
                typed = jnp.issubdtype(key.dtype, jax.dtypes.prng_key)
                if key.ndim == (1 if typed else 2):
                    step_keys = key          # continued block: per-chain
                else:
                    _, sub = jax.random.split(key)
                    step_keys = jax.random.split(sub, num_chains)
                parts = []
                for lo in range(0, num_chains, max_batch):
                    hi = min(lo + max_batch, num_chains)
                    sub_states = jax.tree_util.tree_map(
                        lambda a: a[lo:hi], states
                    )
                    parts.append(nuts_draws_persistent(
                        step_keys[lo:hi], sub_states, vg, eps, inv_mass,
                        n, max_depth=max_depth,
                    ))
                states = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs), *[p[0] for p in parts]
                )
                out_keys = jnp.concatenate([p[1] for p in parts])
                bufs = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs), *[p[2] for p in parts]
                )
                return (states, out_keys), bufs
    elif algorithm == "hmc":
        def kernel(key, state, eps, inv_mass):
            return hmc_step(key, state, vg, eps, inv_mass,
                            n_steps=num_leapfrog)
    else:
        raise ValueError("unknown algorithm '{0}'".format(algorithm))

    v_kernel = jax.vmap(kernel, in_axes=(0, 0, None, None))

    def chain_init(z):
        logp, grad = vg(z)
        return HMCState(z, logp, grad)

    def init_step_size(states, inv_mass, key):
        # Batch-mean probe over every chain: one fused value+gradient per
        # doubling iteration instead of a latency-bound scalar likelihood
        # (which cost ~13 s of the headline bench's warmup fixed cost).
        # With axis_name the accept statistic pools across devices, so
        # the result is already device-invariant.
        return adapt.find_reasonable_step_size_batched(
            vg, states, inv_mass, key, axis_name=axis_name
        )

    def warm_step(carry, inputs):
        states, da, welford, inv_mass, extra, key = carry
        in_win, win_end, idx = inputs
        key, sub = jax.random.split(key)
        step_keys = jax.random.split(sub, num_chains)
        eps = jnp.exp(da.log_step)
        states, info = v_kernel(step_keys, states, eps, inv_mass)

        da = adapt.da_update(
            da, jnp.mean(info.accept_prob), target=target_accept,
        )
        # Periodic cross-device pooling of the (affine) DA state; forced at
        # window boundaries and on the last warmup step so the sampling
        # step size is device-identical.
        sync = ((idx + 1) % sync_every == 0) | win_end \
            | (idx == num_warmup - 1)
        da = _sync_da(da, sync, axis_name)

        if adapt_mass:
            da, welford, inv_mass = _mass_window_update(
                da, welford, inv_mass, states, in_win, win_end,
                dim, dense_mass, dtype, axis_name,
            )
        return (states, da, welford, inv_mass, extra, key), None

    def draw_step(carry, _, eps, inv_mass, extra):
        states, key = carry
        key, sub = jax.random.split(key)
        step_keys = jax.random.split(sub, num_chains)
        states, info = v_kernel(step_keys, states, eps, inv_mass)
        out = (states.z, states.logp, info.accept_prob,
               info.diverging, info.n_leapfrog)
        return (states, key), out

    schedule = adapt.build_schedule(num_warmup)
    return _Pieces(chain_init, init_step_size, warm_step, draw_step,
                   schedule, lambda eps0: (), draw_many=draw_many)


def _build_chees_pieces(vg, num_chains, dim, dtype, num_warmup,
                        target_accept, max_leapfrog, dense_mass, axis_name,
                        adapt_mass, batched_vg=None, sync_every=8):
    """ChEES-HMC: one shared jittered trajectory for the whole batch.

    The kernel is batch-level (cross-chain means feed the trajectory
    gradient), so the vmap lives inside :func:`chees.chees_step` — unless
    the log-prob carries a fused batched kernel (``batched_vg``, e.g. the
    Pallas Kalman value+gradient), which replaces it outright.
    """
    from . import chees

    def chain_init(z):
        logp, grad = vg(z)
        return HMCState(z, logp, grad)

    # ChEES passes the fused batched kernel into chees_step directly, so
    # `vg` here is the bare scalar fn; give the batched step-size probe
    # the same custom_vmap seam the NUTS/HMC path gets.
    vg_search = (_fuse_batched_vg(vg, batched_vg)
                 if batched_vg is not None else vg)

    def init_step_size(states, inv_mass, key):
        return adapt.find_reasonable_step_size_batched(
            vg_search, states, inv_mass, key, axis_name=axis_name
        )

    def warm_step(carry, inputs):
        states, da, welford, inv_mass, traj, key = carry
        in_win, win_end, idx = inputs
        key, sub = jax.random.split(key)
        eps = jnp.exp(da.log_step)
        # Shared quasi-random jitter: all chains run u * T this iteration.
        u = chees.halton_sequence(idx).astype(dtype)
        t = u * jnp.exp(traj.log_t)
        states, info = chees.chees_step(
            sub, states, vg, eps, inv_mass, t,
            max_leapfrog=max_leapfrog, axis_name=axis_name,
            batched_value_and_grad=batched_vg,
        )
        da = adapt.da_update(
            da, jnp.mean(info.accept_prob), target=target_accept,
        )
        sync = ((idx + 1) % sync_every == 0) | win_end \
            | (idx == num_warmup - 1)
        da = _sync_da(da, sync, axis_name)
        traj = chees.traj_update(
            traj, info.grad_log_t, jnp.exp(da.log_step), max_leapfrog
        )
        if adapt_mass:
            da, welford, inv_mass = _mass_window_update(
                da, welford, inv_mass, states, in_win, win_end,
                dim, dense_mass, dtype, axis_name,
            )
        return (states, da, welford, inv_mass, traj, key), None

    def draw_step(carry, _, eps, inv_mass, traj):
        states, key = carry
        key, sub, key_u = jax.random.split(key, 3)
        u = jax.random.uniform(key_u, dtype=dtype)
        t = u * jnp.exp(traj.log_t_avg)
        states, info = chees.chees_step(
            sub, states, vg, eps, inv_mass, t,
            max_leapfrog=max_leapfrog, axis_name=axis_name,
            batched_value_and_grad=batched_vg,
        )
        nleap = jnp.broadcast_to(info.n_leapfrog, (num_chains,))
        out = (states.z, states.logp, info.accept_prob,
               info.diverging, nleap)
        return (states, key), out

    schedule = adapt.build_schedule(num_warmup)
    # Initial trajectory = one step; the Adam ascent grows it quickly.
    extra_init = lambda eps0: chees.traj_init(eps0)
    return _Pieces(chain_init, init_step_size, warm_step, draw_step,
                   schedule, extra_init)


def make_mcmc_core(log_prob, num_chains, dim, dtype, num_warmup=500,
                   num_samples=500, algorithm="nuts", target_accept=None,
                   max_depth=10, num_leapfrog=32, dense_mass=False,
                   step_size=None, axis_name=None, adapt_mass=True,
                   sync_every=8, persistent=True):
    """Build the traceable single-program ``core(z0, key)``.

    Wrap in ``jit`` (as :func:`run_mcmc` does) or in ``shard_map`` over a
    chain-sharded mesh (:func:`george_tpu.parallel.run_mcmc_sharded`,
    passing ``axis_name`` so adaptation pools across devices).

    ``persistent`` (NUTS only, default on): run the sampling phase as ONE
    trajectory-persistent device loop — a chain whose trajectory U-turns
    starts its next transition in the same iteration instead of idling
    until the batch's longest trajectory finishes (the per-draw lockstep
    tail measured at ~40% of NUTS step time, BENCH_NOTES.md).  Warmup
    keeps the per-transition structure either way (cross-chain adaptation
    pooling needs transition lockstep).
    """
    target_accept = _default_target(algorithm, target_accept)
    pieces = _build_pieces(
        log_prob, num_chains, dim, dtype, num_warmup, algorithm,
        target_accept, max_depth, num_leapfrog, dense_mass, axis_name,
        adapt_mass, sync_every=sync_every, persistent=persistent,
    )
    in_window = jnp.asarray(pieces.schedule[0])
    window_end = jnp.asarray(pieces.schedule[1])
    init_inv_mass = (
        jnp.eye(dim, dtype=dtype) if dense_mass
        else jnp.ones(dim, dtype=dtype)
    )

    def core(z0, key):
        states = jax.vmap(pieces.chain_init)(z0)
        key, key_eps, key_warm, key_main = jax.random.split(key, 4)

        if step_size is None:
            eps0 = pieces.init_step_size(states, init_inv_mass, key_eps)
        else:
            eps0 = jnp.asarray(step_size, dtype)

        da = adapt.da_init(eps0)
        welford = adapt.welford_init(dim, dense=dense_mass, dtype=dtype)
        extra = pieces.extra_init(eps0)
        if axis_name is not None:
            # Between sync points the DA/Welford/trajectory states evolve
            # from device-local statistics, so the scan carry must be
            # vma-typed varying from the start.
            from .._vma import pvary_like

            da = pvary_like(da, states)
            welford = pvary_like(welford, states)
            extra = pvary_like(extra, states)
        carry = (states, da, welford, init_inv_mass, extra, key_warm)
        if num_warmup > 0:
            idx = jnp.arange(num_warmup, dtype=jnp.int32)
            carry, _ = jax.lax.scan(
                pieces.warm_step, carry, (in_window, window_end, idx)
            )
        states, da, _, inv_mass, extra, _ = carry
        eps = jnp.exp(da.log_step_avg) if num_warmup > 0 else eps0
        if axis_name is not None and num_warmup > 0:
            # One final pooling (numerically a no-op: the last warmup step
            # forced a DA sync) makes the sampling-phase step size and any
            # algorithm state device-invariant for the draw scan and the
            # replicated out_specs.
            eps = jax.lax.pmean(eps, axis_name)
            extra = _pmean_tree(extra, axis_name)

        if pieces.draw_many is not None:
            _, outs = pieces.draw_many(
                (states, key_main), num_samples, eps, inv_mass, extra
            )
            return _pack_result(outs, eps, inv_mass, stacked_first=None)

        def draw(carry, _):
            return pieces.draw_step(carry, _, eps, inv_mass, extra)

        (states, _), outs = jax.lax.scan(
            draw, (states, key_main), None, length=num_samples
        )
        return _pack_result(outs, eps, inv_mass, stacked_first=True)

    return core


def _default_target(algorithm, target_accept):
    if target_accept is not None:
        return target_accept
    # 0.651 is optimal for jittered-trajectory HMC (ChEES paper §4);
    # 0.8 is Stan's default for NUTS/HMC.
    return 0.651 if algorithm == "chees" else 0.8


def _pack_result(outs, eps, inv_mass, stacked_first):
    zs, logps, accs, divs, nleap = outs
    if stacked_first is None:        # already (chains, samples, ...)
        swap = lambda a: a
    elif stacked_first:
        swap = lambda a: jnp.swapaxes(a, 0, 1)
    else:
        swap = lambda a: np.swapaxes(a, 0, 1)
    return MCMCResult(
        samples=swap(zs),
        log_prob=swap(logps),
        accept_prob=swap(accs),
        diverging=swap(divs),
        n_leapfrog=swap(nleap),
        step_size=eps,
        inv_mass=inv_mass,
    )


def _run_blocked(pieces, z0, key, num_warmup, num_samples, block_size,
                 step_size, dense_mass, dim, dtype, progress=None,
                 warmup_block_size=None):
    """Host-orchestrated execution in bounded jitted segments."""
    in_window, window_end = pieces.schedule
    init_inv_mass = (
        jnp.eye(dim, dtype=dtype) if dense_mass
        else jnp.ones(dim, dtype=dtype)
    )

    states = jax.jit(jax.vmap(pieces.chain_init))(z0)
    key, key_eps, key_warm, key_main = jax.random.split(key, 4)

    if step_size is None:
        eps0 = jax.jit(pieces.init_step_size)(
            states, init_inv_mass, key_eps
        )
    else:
        eps0 = jnp.asarray(step_size, dtype)

    warm_block = jax.jit(
        lambda carry, flags: jax.lax.scan(pieces.warm_step, carry, flags)[0]
    )

    da = adapt.da_init(eps0)
    welford = adapt.welford_init(dim, dense=dense_mass, dtype=dtype)
    extra = pieces.extra_init(eps0)
    wblock = warmup_block_size or block_size
    carry = (states, da, welford, init_inv_mass, extra, key_warm)
    for start in range(0, num_warmup, wblock):
        stop = min(start + wblock, num_warmup)
        flags = (jnp.asarray(in_window[start:stop]),
                 jnp.asarray(window_end[start:stop]),
                 jnp.arange(start, stop, dtype=jnp.int32))
        carry = warm_block(carry, flags)
        if progress:
            jax.tree_util.tree_leaves(carry)[0].block_until_ready()
            progress("warmup", stop, num_warmup)
    states, da, _, inv_mass, extra, _ = carry
    eps = jnp.exp(da.log_step_avg) if num_warmup > 0 else eps0

    from functools import partial

    many = pieces.draw_many is not None

    @partial(jax.jit, static_argnums=(4,))
    def draw_block(carry, eps, inv_mass, extra, n):
        if many:
            return pieces.draw_many(carry, n, eps, inv_mass, extra)
        return jax.lax.scan(
            lambda c, _: pieces.draw_step(c, _, eps, inv_mass, extra),
            carry, None, length=n,
        )

    carry = (states, key_main)
    collected = []
    done = 0
    while done < num_samples:
        n = min(block_size, num_samples - done)
        carry, outs = draw_block(carry, eps, inv_mass, extra, n)
        collected.append(jax.tree_util.tree_map(np.asarray, outs))
        done += n
        if progress:
            progress("sampling", done, num_samples)
    outs = tuple(
        np.concatenate([c[i] for c in collected], axis=1 if many else 0)
        for i in range(5)
    )
    return _pack_result(outs, eps, inv_mass,
                        stacked_first=None if many else False)


def run_mcmc(log_prob, z0, key, num_warmup=500, num_samples=500,
             algorithm="nuts", target_accept=None, max_depth=10,
             num_leapfrog=32, dense_mass=False, step_size=None,
             adapt_mass=True, block_size=None, progress=None,
             persistent=True, warmup_block_size=None):
    """Run warmup + sampling for a batch of chains on one device.

    :param log_prob: traceable scalar density of one parameter vector.
    :param z0: (chains, dim) initial positions.
    :param key: PRNG key (one; chain keys are split internally).
    :param algorithm: ``"nuts"`` (iterative masked tree NUTS),
        ``"hmc"`` (fixed ``num_leapfrog`` trajectories), or ``"chees"``
        (ChEES-HMC — shared jittered trajectory length adapted by gradient
        ascent on the ChEES criterion, every chain in lockstep; here
        ``num_leapfrog`` is the per-iteration leapfrog *cap* and
        ``target_accept`` defaults to 0.651).
    :param block_size: if set, execute in host-driven segments of this many
        transitions (bounded device executions; progress callbacks).
    :param persistent: NUTS only (default on) — trajectory-persistent
        sampling: chains start their next transition the moment their
        trajectory terminates instead of idling until the batch's longest
        one, eliminating the per-draw lockstep tail (~40% of step time on
        the headline bench).  Warmup always keeps per-transition lockstep
        (cross-chain adaptation pooling).  Set False for the per-draw
        formulation (identical posterior; different RNG consumption).
    :returns: :class:`MCMCResult` with per-chain draws and diagnostics.

    For multi-device chain sharding use
    :func:`george_tpu.parallel.run_mcmc_sharded`.
    """
    z0 = jnp.asarray(z0)
    num_chains, dim = z0.shape
    if block_size is None:
        core = make_mcmc_core(
            log_prob, num_chains, dim, z0.dtype, num_warmup=num_warmup,
            num_samples=num_samples, algorithm=algorithm,
            target_accept=target_accept, max_depth=max_depth,
            num_leapfrog=num_leapfrog, dense_mass=dense_mass,
            step_size=step_size, adapt_mass=adapt_mass,
            persistent=persistent,
        )
        return jax.jit(core)(z0, jnp.asarray(key))

    pieces = _build_pieces(
        log_prob, num_chains, dim, z0.dtype, num_warmup, algorithm,
        _default_target(algorithm, target_accept), max_depth,
        num_leapfrog, dense_mass, None, adapt_mass,
        persistent=persistent,
    )
    return _run_blocked(
        pieces, z0, jnp.asarray(key), num_warmup, num_samples, block_size,
        step_size, dense_mass, dim, z0.dtype, progress=progress,
        warmup_block_size=warmup_block_size,
    )
