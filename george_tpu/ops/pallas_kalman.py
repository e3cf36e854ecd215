# -*- coding: utf-8 -*-
"""Pallas TPU kernel: fused Kalman-filter log-likelihood WITH gradient.

The sampler hot path is ``value_and_grad`` of the O(N) state-space marginal
likelihood over thousands of chains.  Reverse-mode through the sequential
scan costs ~3x the forward pass on TPU (adjoint sweep +
rematerialization).  This kernel removes that gap: the ENTIRE filter —
N sequential steps — runs inside one Pallas program with the chain batch laid out as (rows, 128) register tiles,
and the gradient is propagated *forward* alongside the primal as dual
numbers (one tangent state per hyperparameter, exact for the ~3-6 params a
GP posterior has).  Everything stays in vector registers / VMEM; the shared
time series streams from SMEM.  Measured on the production 3-parameter
Matern32+white-noise posterior: 6.5 ms per value+gradient at 16384 chains,
N=1000, vs 17.3 ms for the reverse-mode vmapped scan (2.7x).

The per-step math is the SAME generic scalarized filter the scan path uses
(:class:`george_tpu.ops.state_space._FilterMachine` — entrywise transitions
built from the kernel's state-space term list), traced with (rows, 128)
tiles instead of vmapped scalars; tangents come from ``jax.jvp`` of the
step function, whose repeated primal subexpressions CSE away inside the
single kernel body.

Semantics: ``ll(theta) = sum_k log N(y_k | pred_k)`` for the GP
``mean=mu (scalar), noise=yerr^2 + exp(wn), kernel=sum of Markovian
terms`` — exactly the quantity `samplers.logprob` builds, reference
gp.py:369-397.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .state_space import _FilterMachine, extract_terms

__all__ = ["pallas_kalman_available", "make_kalman_vg", "MAX_N"]

_LANES = 128
_MIN_ROWS = 8          # float32 register tile is (8, 128)

# Up to this N the shared time series (dt, y, yerr2) lives fully in SMEM
# (3 x 4 x N bytes).  Longer series stream chunk-by-chunk from HBM into a
# double-buffered SMEM window (the DMA for chunk c+1 overlaps the filter
# steps of chunk c), which lifts the cap to the HBM-resident limit below.
_SMEM_N = 32768
_STREAM_CHUNK = 4096

# Hard cap for the streaming path (HBM footprint is 3 x 4 x N bytes — tiny;
# this bound just keeps padded shapes sane).
MAX_N = 1 << 22


def pallas_kalman_available():
    return jax.default_backend() == "tpu"


def _round_up(n, m):
    return -(-n // m) * m


@functools.lru_cache(maxsize=None)
def _kernel_builder(node, n, n_mean, n_wn, active):
    """Trace-time construction of the fused value+grad kernel.

    ``active`` is the tuple of *full-vector* parameter indices that need
    tangents (the unfrozen positions).  Parameter layout, matching the GP
    full vector: [mean (n_mean in {0,1}) | white-noise (n_wn in {0,1}) |
    kernel params].
    """
    terms = extract_terms(node)
    fm = _FilterMachine(terms)
    n_act = len(active)

    def q_of(params):
        """params (tuple of tiles, full layout) -> per-step quantities."""
        th_k = params[n_mean + n_wn:]
        # Term closures may emit default-dtype constants (jnp.ones(()) is
        # f64 under x64 in interpret-mode tests); pin everything to f32.
        sig_rates = [
            tuple(jnp.asarray(u, jnp.float32) for u in sr)
            for sr in fm.sig_rates(th_k)
        ]
        mu = params[0] if n_mean else None
        vwn = jnp.exp(params[n_mean]) if n_wn else None
        return (sig_rates, mu, vwn)

    def kernel(*refs):
        param_refs = refs[:n_mean + n_wn + 1]
        # Single stacked (P_k, rows, 128) ref for kernel params would break
        # the tuple-indexing term closures; separate refs keep it simple.
        dt_ref, y_ref, v_ref = refs[len(refs) - 5:len(refs) - 2]
        out_ref, jac_ref = refs[len(refs) - 2:]

        th_k_ref = param_refs[-1]          # (P_k, rows, 128)
        p_k = th_k_ref.shape[0]
        scalar_params = [r[...] for r in param_refs[:-1]]
        params = tuple(scalar_params) + tuple(
            th_k_ref[i] for i in range(p_k)
        )
        zero = jnp.zeros_like(params[0] if params else th_k_ref[0])
        one = jnp.ones_like(zero)

        def basis(j):
            return tuple(one if i == j else zero
                         for i in range(len(params)))

        q = q_of(params)
        dq = [jax.jvp(q_of, (params,), (basis(j),))[1] for j in active]

        # SMEM reads happen OUTSIDE the jvp-traced closures (values, not
        # refs, cross into the differentiated functions).
        y0 = y_ref[0]
        v0_s = v_ref[0]

        def first(q_):
            sig_rates, mu, vwn = q_
            m0, P0 = fm.init_stationary(sig_rates, zero)
            r0 = y0 - (mu if mu is not None else 0.0)
            v0 = v0_s + (vwn if vwn is not None else 0.0)
            return fm.flatten(*fm.obs_update(m0, P0, r0, v0, zero))

        prim = first(q)
        tans = [jax.jvp(first, (q,), (dq[j],))[1] for j in range(n_act)]

        def body(k, carry):
            prim, tans = carry
            dt_k = dt_ref[k]
            y_k = y_ref[k + 1]
            v_k = v_ref[k + 1]

            def f(state, q_):
                sig_rates, mu, vwn = q_
                m, P, acc = fm.unflatten(state)
                r = y_k - (mu if mu is not None else 0.0)
                v = v_k + (vwn if vwn is not None else 0.0)
                return fm.flatten(
                    *fm.step(m, P, acc, sig_rates, dt_k, r, v)
                )

            new_prim = f(prim, q)
            new_tans = tuple(
                jax.jvp(f, (prim, q), (tans[j], dq[j]))[1]
                for j in range(n_act)
            )
            return new_prim, new_tans

        prim, tans = jax.lax.fori_loop(
            0, n - 1, body, (prim, tuple(tans))
        )
        out_ref[...] = prim[-1]
        for j in range(n_act):
            jac_ref[j] = tans[j][-1]

    return kernel, n_act


@functools.lru_cache(maxsize=None)
def _kernel_builder_streaming(node, n, n_mean, n_wn, active, chunk):
    """Streaming variant: the (dt, y, v) series stays in HBM and is DMA'd
    chunk-by-chunk into a double-buffered SMEM window, overlapping the
    next chunk's transfer with the current chunk's filter steps.  Same
    per-step math as :func:`_kernel_builder`; series arrays arrive
    pre-shifted (y/v aligned with dt so step k reads index k) and padded
    to a chunk multiple, with (y0, v0) passed separately for the first
    observation update.
    """
    terms = extract_terms(node)
    fm = _FilterMachine(terms)
    n_act = len(active)
    n_steps = n - 1
    n_chunks = -(-n_steps // chunk)

    def q_of(params):
        th_k = params[n_mean + n_wn:]
        sig_rates = [
            tuple(jnp.asarray(u, jnp.float32) for u in sr)
            for sr in fm.sig_rates(th_k)
        ]
        mu = params[0] if n_mean else None
        vwn = jnp.exp(params[n_mean]) if n_wn else None
        return (sig_rates, mu, vwn)

    def kernel_with_scratch(*args):
        nin = n_mean + n_wn + 1 + 1 + 3            # params, first, series
        refs = args[:nin + 2]                      # + out, jac
        dt_s, y_s, v_s, sems = args[nin + 2:]

        param_refs = refs[:n_mean + n_wn + 1]
        first_ref = refs[n_mean + n_wn + 1]
        dt_hbm, y_hbm, v_hbm = refs[nin - 3:nin]
        out_ref, jac_ref = refs[nin:nin + 2]

        th_k_ref = param_refs[-1]
        p_k = th_k_ref.shape[0]
        scalar_params = [r[...] for r in param_refs[:-1]]
        params = tuple(scalar_params) + tuple(
            th_k_ref[i] for i in range(p_k)
        )
        zero = jnp.zeros_like(params[0] if params else th_k_ref[0])
        one = jnp.ones_like(zero)

        def basis(j):
            return tuple(one if i == j else zero
                         for i in range(len(params)))

        q = q_of(params)
        dq = [jax.jvp(q_of, (params,), (basis(j),))[1] for j in active]

        y0 = first_ref[0]
        v0_s = first_ref[1]

        def first(q_):
            sig_rates, mu, vwn = q_
            m0, P0 = fm.init_stationary(sig_rates, zero)
            r0 = y0 - (mu if mu is not None else 0.0)
            v0 = v0_s + (vwn if vwn is not None else 0.0)
            return fm.flatten(*fm.obs_update(m0, P0, r0, v0, zero))

        prim = first(q)
        tans = [jax.jvp(first, (q,), (dq[j],))[1] for j in range(n_act)]

        streams = ((dt_hbm, dt_s), (y_hbm, y_s), (v_hbm, v_s))

        # The SMEM windows are flat (2 * chunk,) buffers — slot-major —
        # because Mosaic cannot slice a (2, chunk) SMEM memref on the
        # sublane-tiled leading dim.
        def copies(c, slot):
            return [
                pltpu.make_async_copy(
                    hbm.at[pl.ds(c * chunk, chunk)],
                    smem.at[pl.ds(slot * chunk, chunk)],
                    sems.at[a, slot],
                )
                for a, (hbm, smem) in enumerate(streams)
            ]

        for dma in copies(0, 0):
            dma.start()

        def chunk_body(c, carry):
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                for dma in copies(c + 1, (c + 1) % 2):
                    dma.start()

            for dma in copies(c, slot):
                dma.wait()

            def body(i, carry2):
                prim, tans = carry2
                dt_k = dt_s[slot * chunk + i]
                y_k = y_s[slot * chunk + i]
                v_k = v_s[slot * chunk + i]

                def f(state, q_):
                    sig_rates, mu, vwn = q_
                    m, P, acc = fm.unflatten(state)
                    r = y_k - (mu if mu is not None else 0.0)
                    v = v_k + (vwn if vwn is not None else 0.0)
                    return fm.flatten(
                        *fm.step(m, P, acc, sig_rates, dt_k, r, v)
                    )

                new_prim = f(prim, q)
                new_tans = tuple(
                    jax.jvp(f, (prim, q), (tans[j], dq[j]))[1]
                    for j in range(n_act)
                )
                return new_prim, new_tans

            steps_here = jnp.minimum(chunk, n_steps - c * chunk)
            return jax.lax.fori_loop(0, steps_here, body, carry)

        prim, tans = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (prim, tuple(tans))
        )
        out_ref[...] = prim[-1]
        for j in range(n_act):
            jac_ref[j] = tans[j][-1]

    return kernel_with_scratch, n_act


def make_kalman_vg(node, t, y, yerr2, n_mean, n_wn, active,
                   interpret=False):
    """Build ``vg(theta_full_b) -> (ll (B,), grad (B, n_active))``.

    :param node: kernel spec tree (must support the state-space form).
    :param t,y,yerr2: the *time-sorted* dataset (host arrays, baked in).
    :param n_mean,n_wn: 1 if the mean / log-white-noise is a per-chain
        scalar parameter (ConstantModel), else 0 (baked into ``y``/
        ``yerr2``).
    :param active: tuple of full-vector indices needing gradients.
    :param interpret: run the Pallas kernel in interpret mode (CPU tests).
    """
    n = int(len(t))
    if n > MAX_N:
        raise ValueError("series too long for the fused Kalman kernel")
    streaming = n > _SMEM_N
    # Gaps in f64 BEFORE the f32 cast: f32 resolution at large |t| (e.g.
    # astronomical epochs ~2.45e6) is coarser than typical cadences, and
    # only the differences enter the filter.
    dt_host = np.diff(np.asarray(t, np.float64)).astype(np.float32)
    y_host = np.asarray(y, np.float32)
    v_host = np.asarray(yerr2, np.float32)
    n_scalar = int(n_mean) + int(n_wn)

    if streaming:
        chunk = _STREAM_CHUNK
        pad = _round_up(n - 1, chunk) - (n - 1)
        series = tuple(
            jnp.asarray(np.pad(a, ((0, pad),)))
            for a in (dt_host, y_host[1:], v_host[1:])
        )
        first_dev = jnp.asarray(
            np.array([y_host[0], v_host[0]], np.float32)
        )
        kernel, n_act = _kernel_builder_streaming(
            node, n, int(n_mean), int(n_wn),
            tuple(int(a) for a in active), chunk,
        )
        extra_in = [first_dev, *series]
        extra_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)] * 3
        )
        scratch = [
            pltpu.SMEM((2 * chunk,), jnp.float32),
            pltpu.SMEM((2 * chunk,), jnp.float32),
            pltpu.SMEM((2 * chunk,), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ]
    else:
        kernel, n_act = _kernel_builder(
            node, n, int(n_mean), int(n_wn), tuple(int(a) for a in active)
        )
        extra_in = [jnp.asarray(dt_host), jnp.asarray(y_host),
                    jnp.asarray(v_host)]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        scratch = []

    def vg(theta_full_b):
        """theta_full_b: (B, D_full) float32."""
        B, d_full = theta_full_b.shape
        b_pad = _round_up(max(B, 1), _MIN_ROWS * _LANES)
        rows = b_pad // _LANES

        th = jnp.concatenate(
            [theta_full_b,
             jnp.zeros((b_pad - B, d_full), theta_full_b.dtype)], axis=0
        ).astype(jnp.float32)
        tiles = th.T.reshape(d_full, rows, _LANES)

        scalar_tiles = [tiles[i] for i in range(n_scalar)]
        th_k_tiles = tiles[n_scalar:]

        # Under shard_map with vma checking (the chain-sharded sampler
        # path) the outputs inherit the chain batch's varying-axes type,
        # and the baked series must be promoted to the same type (the
        # interpret-mode evaluator type-checks every in-kernel op).
        vma = jax.typeof(theta_full_b).vma
        extras = [
            jax.lax.pcast(a, tuple(sorted(vma)), to="varying")
            for a in extra_in
        ] if vma else extra_in
        shp = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32, vma=vma)
        jac_shp = jax.ShapeDtypeStruct((n_act, rows, _LANES), jnp.float32,
                                       vma=vma)
        out, jac = pl.pallas_call(
            kernel,
            out_shape=(shp, jac_shp),
            in_specs=(
                [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_scalar
                + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                + extra_specs
            ),
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*scalar_tiles, th_k_tiles, *extras)

        ll = out.reshape(b_pad)[:B]
        grad = jac.reshape(n_act, b_pad)[:, :B].T
        return ll, grad

    return vg
