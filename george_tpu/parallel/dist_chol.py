# -*- coding: utf-8 -*-
"""Distributed blocked Cholesky over a device mesh (shard_map collectives).

The reference has no distributed linear algebra at all (SURVEY.md §2.6); its
answer to large N is the serial HODLR tree (reference hodlr.h).  This module
is the dense counterpart mandated by the north star: the O(N^3)
factorization itself distributes over the mesh so the N=16k+ dense path
scales past one chip's FLOPs and HBM.

Layout: K is sharded by **contiguous row blocks** over one mesh axis; each
device holds an (N/P, N) stripe.  The factorization is right-looking over
column panels of width B:

  1. the panel column (N, B) is assembled with one ``all_gather`` of each
     device's (N/P, B) slice — this is the "panel broadcast over ICI" of
     SURVEY.md §5;
  2. every device redundantly factorizes the (B, B) diagonal block and
     triangular-solves its local rows of the panel (B^3 work is negligible);
  3. the trailing update ``K -= L_panel L_panel^T`` runs on each device's
     local stripe — an (N/P, B) x (B, N) matmul on the MXU, masked to the
     columns right of the panel.

Per-device compute is N^3/P + lower-order terms, per-device communication is
(N/B) gathers of (N, B).  Rows left of the panel are *not* skipped (masked
instead — uniform shapes keep XLA happy), so the constant is ~2x the
triangular-aware serial count; the trade is even load without block-cyclic
index gymnastics.

The solves are blocked substitutions: the (B,) panel pieces of x are
produced sequentially, but the O(N^2) inner products against the committed
prefix reduce across the mesh with ``psum`` — each device only ever touches
its own row stripe.

Everything here runs *inside* ``shard_map`` (functions take device-local
shards and an ``axis_name``); :func:`distributed_loglike_fn` packages the
whole GP marginal likelihood — stripe build, factorization, solve — into one
sharded program.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular, cholesky as _chol
from jax.sharding import PartitionSpec as P

__all__ = [
    "cholesky_local", "solve_local", "distributed_cholesky",
    "distributed_loglike_fn",
]


def _axis_size(axis_name):
    return jax.lax.axis_size(axis_name)


def _pvary(x, axis_name):
    """pvary that is a no-op when ``x`` already varies over the axis."""
    if axis_name in getattr(jax.typeof(x), "vma", ()):
        return x
    return jax.lax.pcast(x, (axis_name,), to="varying")


def _global_rows(n_local, axis_name):
    """Global indices of this device's rows."""
    start = jax.lax.axis_index(axis_name) * n_local
    return start + jnp.arange(n_local)


def cholesky_local(K_local, axis_name, block_size=256):
    """Distributed lower-Cholesky of a row-sharded SPD matrix.

    Call inside ``shard_map``.  ``K_local`` is this device's (N/P, N) row
    stripe; N must be a multiple of ``P * block_size`` (pad with identity
    rows/cols — see :func:`distributed_loglike_fn`).  Returns
    ``(L_local, logdet)`` with ``L_local`` the same stripe of the lower
    factor and ``logdet`` replicated.
    """
    n_local, n = K_local.shape
    nb = n // block_size
    if n % block_size:
        raise ValueError("N must be a multiple of block_size")
    grows = _global_rows(n_local, axis_name)
    cols = jnp.arange(n)
    dtype = K_local.dtype

    # Trailing updates run per column *chunk* under lax.cond, so chunks
    # entirely left of the panel are skipped instead of masked — this
    # removes the ~2x FLOP overhead of the uniform-shape formulation (the
    # matmul only runs for chunks at or right of the panel).
    n_chunks = max(1, min(8, nb))
    while n % (n_chunks * block_size):
        n_chunks -= 1
    chunk = n // n_chunks

    def body(k, carry):
        K_loc, logdet = carry
        off = k * block_size
        col = jax.lax.dynamic_slice(
            K_loc, (0, off), (n_local, block_size)
        )                                               # (n_loc, B)
        full_col = jax.lax.all_gather(
            col, axis_name, axis=0, tiled=True
        )                                               # (N, B)
        D = jax.lax.dynamic_slice(
            full_col, (off, 0), (block_size, block_size)
        )
        Ld = _chol(D, lower=True)
        logdet = logdet + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Ld)))

        # Local panel rows: col @ inv(Ld)^T.  For the diagonal-block rows
        # this reproduces Ld itself (D = Ld Ld^T); rows above the panel
        # yield upper-triangle garbage that the final tril mask removes.
        Lp_loc = solve_triangular(Ld, col.T, lower=True).T
        Lp_full = solve_triangular(Ld, full_col.T, lower=True).T

        def upd_chunk(c, K_loc):
            c0 = c * chunk
            # Within the chunk holding the panel, columns <= panel must
            # stay untouched; strictly-right chunks take the full product.
            csl = jax.lax.dynamic_slice(
                Lp_full, (c0, 0), (chunk, block_size)
            )
            mask = (c0 + jnp.arange(chunk) >= off + block_size)[:, None]
            upd = Lp_loc @ jnp.where(mask, csl, 0).T     # (n_loc, chunk)
            old = jax.lax.dynamic_slice(
                K_loc, (0, c0), (n_local, chunk)
            )
            return jax.lax.dynamic_update_slice(
                K_loc, old - upd, (0, c0)
            )

        def chunk_step(c, K_loc):
            # Skip chunks that end at or before the panel's last column.
            return jax.lax.cond(
                (c + 1) * chunk > off + block_size,
                lambda K: upd_chunk(c, K),
                lambda K: K,
                K_loc,
            )

        K_loc = jax.lax.fori_loop(0, n_chunks, chunk_step, K_loc)
        K_loc = jax.lax.dynamic_update_slice(K_loc, Lp_loc, (0, off))
        return K_loc, logdet

    # pvary: the loop computes logdet from gathered (device-varying-typed)
    # values, so the initial carry must carry the same vma type.
    K_local, logdet = jax.lax.fori_loop(
        0, nb, body,
        (K_local, _pvary(jnp.zeros((), dtype), axis_name)),
    )
    L_local = jnp.where(grows[:, None] >= cols[None, :], K_local, 0)
    return L_local, logdet


def _fwd_subst_local(L_local, b, axis_name, block_size):
    """x with L x = b; ``L_local`` row stripe, ``b``/``x`` replicated."""
    n_local, n = L_local.shape
    nb = n // block_size
    grows = _global_rows(n_local, axis_name)
    cols = jnp.arange(n)

    def body(k, x):
        off = k * block_size
        in_panel = (grows >= off) & (grows < off + block_size)
        slot = jnp.clip(grows - off, 0, block_size - 1)

        # acc = L[panel rows, :off] @ x[:off], reduced across devices.
        left = jnp.where(cols[None, :] < off, L_local, 0)
        partial_acc = left @ x                           # (n_loc,)
        acc = jnp.zeros((block_size,), x.dtype).at[slot].add(
            jnp.where(in_panel, partial_acc, 0)
        )
        panel_cols = jax.lax.dynamic_slice(
            L_local, (0, off), (n_local, block_size)
        )
        D = jnp.zeros((block_size, block_size), x.dtype).at[slot].add(
            jnp.where(in_panel[:, None], panel_cols, 0)
        )
        acc, D = jax.lax.psum((acc, D), axis_name)

        b_k = jax.lax.dynamic_slice(b, (off,), (block_size,))
        x_k = solve_triangular(D, b_k - acc, lower=True)
        return jax.lax.dynamic_update_slice(x, x_k, (off,))

    return jax.lax.fori_loop(
        0, nb, body, _pvary(jnp.zeros_like(b), axis_name)
    )


def _bwd_subst_local(L_local, b, axis_name, block_size):
    """x with L^T x = b; panels sweep bottom-up."""
    n_local, n = L_local.shape
    nb = n // block_size
    grows = _global_rows(n_local, axis_name)

    def body(i, x):
        k = nb - 1 - i
        off = k * block_size
        in_panel = (grows >= off) & (grows < off + block_size)
        below = grows >= off + block_size
        slot = jnp.clip(grows - off, 0, block_size - 1)

        panel_cols = jax.lax.dynamic_slice(
            L_local, (0, off), (n_local, block_size)
        )
        # acc = L[below rows, panel cols]^T @ x[below], reduced across mesh.
        x_here = x[grows]
        acc = panel_cols.T @ jnp.where(below, x_here, 0)
        D = jnp.zeros((block_size, block_size), x.dtype).at[slot].add(
            jnp.where(in_panel[:, None], panel_cols, 0)
        )
        acc, D = jax.lax.psum((acc, D), axis_name)

        b_k = jax.lax.dynamic_slice(b, (off,), (block_size,))
        x_k = solve_triangular(D, b_k - acc, lower=True, trans=1)
        return jax.lax.dynamic_update_slice(x, x_k, (off,))

    return jax.lax.fori_loop(
        0, nb, body, _pvary(jnp.zeros_like(b), axis_name)
    )


def solve_local(L_local, b, axis_name, block_size=256):
    """K^{-1} b from the distributed factor (two blocked substitutions)."""
    z = _fwd_subst_local(L_local, b, axis_name, block_size)
    return _bwd_subst_local(L_local, z, axis_name, block_size)


def distributed_cholesky(K, mesh, axis_name="data", block_size=256):
    """Host-facing wrapper: factor a replicated/global K over ``mesh``.

    Returns ``(L, logdet)`` with L materialized globally (use the ``_local``
    functions inside your own shard_map to keep everything sharded).
    """
    n = K.shape[0]
    p = mesh.shape[axis_name]
    step = p * block_size
    n_pad = -(-n // step) * step
    if n_pad != n:
        K = jnp.pad(K, ((0, n_pad - n), (0, n_pad - n)))
        K = K.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)

    def run(K_local):
        L_local, logdet = cholesky_local(
            K_local, axis_name, block_size=block_size
        )
        return L_local, jax.lax.pmean(logdet, axis_name)

    fn = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=(P(axis_name, None), P()),
        check_vma=True,
    )
    L, logdet = jax.jit(fn)(K)
    return L[:n, :n], logdet


def distributed_loglike_fn(kernel_value, mean_fn, wn_fn, n_total,
                           axis_name="data", block_size=256, n_real=None):
    """Fully-distributed GP marginal log-likelihood (call inside shard_map).

    Returns ``ll(theta_kernel, theta_mean, theta_wn, x_local, y_local,
    yerr2_local)`` where the data arrays are this device's row shard.  The
    covariance never exists unsharded: each device builds its (N/P, N) row
    stripe, the factorization is :func:`cholesky_local`, and the quadratic
    form reduces with psum.  ``n_total`` (the padded, sharded size) must be
    a multiple of ``P * block_size``; when ``n_real < n_total`` the padded
    rows/columns become the identity (zero covariance, unit diagonal, zero
    residual) so they contribute nothing to logdet or the quadratic form —
    this is how the factory lifts the divisibility restriction.
    """
    if n_real is None:
        n_real = n_total

    def ll(th_kernel, th_mean, th_wn, x_local, y_local, yerr2_local):
        n_local = x_local.shape[0]
        grows = _global_rows(n_local, axis_name)
        x_full = jax.lax.all_gather(x_local, axis_name, axis=0, tiled=True)
        y_full = jax.lax.all_gather(y_local, axis_name, axis=0, tiled=True)
        vloc = grows < n_real
        vfull = jnp.arange(n_total) < n_real

        stripe = kernel_value(th_kernel, x_local, x_full)   # (n_loc, N)
        if n_real != n_total:
            stripe = jnp.where(
                vloc[:, None] & vfull[None, :], stripe, 0.0
            )
        diag_noise = yerr2_local + jnp.exp(wn_fn(th_wn, x_local))
        if n_real != n_total:
            diag_noise = jnp.where(vloc, diag_noise, 1.0)
        stripe = stripe.at[jnp.arange(n_local), grows].add(diag_noise)

        L_local, logdet = cholesky_local(
            stripe, axis_name, block_size=block_size
        )
        r = y_full - mean_fn(th_mean, x_full)
        if n_real != n_total:
            r = jnp.where(vfull, r, 0.0)
        alpha = solve_local(L_local, r, axis_name, block_size=block_size)
        norm = n_real * jnp.log(2.0 * jnp.pi).astype(r.dtype)
        out = -0.5 * (norm + logdet + jnp.dot(r, alpha))
        # Every device computed the identical scalar, but its vma type is
        # "varying" (it came through gathers).  pmean makes it invariant —
        # and, crucially, gives jax.grad the correct transpose: the theta
        # cotangent psums across the mesh instead of keeping one device's
        # partial contribution.
        return jax.lax.pmean(out, axis_name)

    return ll
