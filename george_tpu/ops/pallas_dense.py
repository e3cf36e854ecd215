# -*- coding: utf-8 -*-
"""Pallas TPU kernel: fused batched dense-GP log-likelihood WITH gradient.

The config-#5 sampler hot path is ``value_and_grad`` of the *dense* GP
marginal likelihood over thousands of chains at small N (multi-dim inputs /
subspace metrics have no state-space form).  XLA's batched small Cholesky
and its reverse pass are column-loop bound: the round-1 measurement was
162.6 ms per batched value+gradient at 4096 chains x N=128 (~77 GFLOP/s).

This kernel runs the whole pipeline for 128 chains per grid step inside one
Pallas program, with the chain batch laid out on the 128 vector lanes so
every step of the factorization is a full-width VPU op:

  * covariance build: the kernel expression tree is evaluated on
    (rows, N, 128) tiles from lane-replicated coordinate boards
    (XR[a, n, b] = x[n, a] for every lane b), so the whole build is
    full-width VPU work with sublane-only broadcasts;
  * in-place blocked right-looking Cholesky on an (N, N, 128) VMEM
    resident buffer (8-column panels, unrolled; trailing updates looped,
    expressed as sublane reductions so no cross-layout shuffles occur);
  * all 8x8 diagonal blocks of L inverted in ONE batched exact Neumann
    product ((I-G)^-1 = (I+G)(I+G^2)(I+G^4) for nilpotent G);
  * in-place block-substitution triangular inversion L -> S = L^-1;
  * alpha = S^T S r, logdet from the panel pivots;
  * gradient by the reference's closed form 0.5*tr[(aa^T - K^-1) dK]
    (gp.py:406-468) — but tiled: each 8-row block of the cotangent
    A = aa^T - S^T S is formed on the fly and contracted against
    forward-mode covariance tangents (one jvp direction per active
    parameter), so neither K^{-1} nor an (N, N, P) gradient tensor is ever
    materialized (kernel_interface.cpp:92-125 is the reference analog
    being replaced).

Layout rules this kernel lives by (learned from Mosaic): values only take
static slices (dynamic indexing goes through refs with ``pl.ds``); getitems
never mix a real index with ``None``; bool vectors never gain a trailing
unit dim; NOTHING in the hot path may carry a 1-wide lane dim — shared
coordinates, observations, and noise enter as lane-replicated boards and
all masks are built as full-width iotas (a single (R, N, 1)-shaped operand
forces a lane-broadcast relayout that costs more than the factorization).

Semantics match ``samplers.logprob.build_gp_log_prob(method="dense")``:
``ll = -0.5 (N log 2pi + logdet + r^T K^-1 r)`` with
``K = k(theta; X, X) + diag(yerr^2 + exp(wn))``, NaN on a failed
factorization (mapped to -inf by the caller).
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dsl import compiler
from ..dsl.compiler import Op

__all__ = [
    "pallas_dense_available", "supports_pallas_dense",
    "make_dense_batched_vg", "MAX_N",
]

_LANES = 128
_T = 8                  # panel / block width (f32 sublane tile)

# The (N, N, 128) working set must stay VMEM resident: 8 MB at N=128,
# 32 MB at N=256 (v5e VMEM holds it; the vmem_limit below allows it).
MAX_N = 256

_LOG_2PI = float(np.log(2.0 * np.pi))


def pallas_dense_available():
    return jax.default_backend() == "tpu"


def supports_pallas_dense(node, n):
    """True when the kernel tree / problem shape fits this kernel.

    Requirements: N <= MAX_N and every stationary leaf uses an isotropic or
    axis-aligned metric (the general-metric Cholesky solve has no lane-
    batched form here; those fall back to the XLA path).
    """
    if n > MAX_N:
        return False

    def ok(nd):
        if isinstance(nd, Op):
            return ok(nd.k1) and ok(nd.k2)
        return (not nd.stationary) or nd.metric_type in (0, 1)

    return ok(node)


def _round_up(n, m):
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# Batched kernel-tree evaluation on (R, N, B) tiles.
#
# Coordinates enter as lane-REPLICATED boards ``XR (d, N, B)`` with
# ``XR[a, n, b] = x[n, a]`` for every lane b.  Row tiles slice to (R, 1, B)
# and column tiles reshape to (1, N, B), so every subtraction, mask, and
# radial op below broadcasts along sublanes only and runs at full VPU
# width.  (The previous (R, N, 1) shared-tile design left the lane dim
# 1-wide, and the lane-broadcast relayout into the (R, N, B) chain layout
# dominated the whole kernel: 102 of 103 ms at 4096 chains x N=128.)
# ---------------------------------------------------------------------------

def _row_tile(xr, a, i0, rows):
    """(rows, 1, B) tile of coordinate axis ``a`` for rows [i0, i0+rows).

    ``xr`` is the whole-board VALUE when ``i0`` is a static Python int
    (the unrolled small-N path — value slicing schedules ~15% faster), and
    the REF when ``i0`` is a traced fori index (values only admit static
    slices; the ref read goes through ``pl.ds``)."""
    if isinstance(i0, int):
        return xr[a][i0:i0 + rows][:, None, :]
    return xr[a, pl.ds(i0, rows), :][:, None, :]


def _col_tile(xr, a):
    """(1, N, B) tile of coordinate axis ``a`` (all columns).

    The same expression indexes a value or loads from a ref."""
    return xr[a][None, :, :]


def _block_mask_f32(node, XR, i0, rows):
    """Block-window mask as an f32 (rows, N, B) multiplier."""
    m1 = m2 = None
    for axis, lo, hi in zip(node.axes, node.min_block, node.max_block):
        r = _row_tile(XR, axis, i0, rows)
        c = _col_tile(XR, axis)
        mr = (r >= lo) & (r <= hi)
        mc = (c >= lo) & (c <= hi)
        m1 = mr if m1 is None else (m1 & mr)
        m2 = mc if m2 is None else (m2 & mc)
    return (m1 & m2).astype(jnp.float32)


def _batched_builder(node):
    """``f(theta (P, B), XR (d, N, B), i0) -> (R, N, B)`` row-tile builder.

    The chain batch rides the trailing axis; coordinates are shared across
    lanes.  Same leaf semantics as :func:`compiler._value_builder` (per-axis
    sums for non-stationary kernels, metric-scaled r2 for stationary ones,
    block windows) restricted to metric types 0/1.
    """
    if isinstance(node, Op):
        f1 = _batched_builder(node.k1)
        f2 = _batched_builder(node.k2)
        n1 = compiler.node_size(node.k1)
        if node.op == "sum":
            return lambda th, XR, i0: (
                f1(th[:n1], XR, i0) + f2(th[n1:], XR, i0)
            )
        return lambda th, XR, i0: f1(th[:n1], XR, i0) * f2(th[n1:], XR, i0)

    axes = list(node.axes)

    if node.stationary:
        radial = compiler._radial_fn(node.name, node.constants)
        mtype = node.metric_type

        def value(th, XR, i0):
            # Mosaic cannot type zero-sized vectors: kernels without radial
            # parameters (Matern, ExpSquared, ...) get a dummy row whose
            # custom-jvp parameter tangent is identically zero.
            p = th[:node.nparams] if node.nparams else th[:1]
            mp = th[node.nparams:]
            d2 = [
                (_row_tile(XR, a, i0, _T) - _col_tile(XR, a)) ** 2
                for a in axes
            ]
            if mtype == 0:
                r2 = sum(d2) * jnp.exp(-mp[0]).reshape(1, 1, -1)
            else:
                r2 = sum(
                    d2[i] * jnp.exp(-mp[i]).reshape(1, 1, -1)
                    for i in range(len(axes))
                )
            K = radial(p, r2)
            if node.blocked:
                K = K * _block_mask_f32(node, XR, i0, _T)
            return K

        return value

    pair = compiler._pair_fn(node.name, node.constants)

    def value(th, XR, i0):
        total = 0.0
        for a in axes:
            total = total + pair(
                th, _row_tile(XR, a, i0, _T), _col_tile(XR, a)
            )
        out = jnp.broadcast_to(
            total, (_T, XR.shape[1], th.shape[1])
        )
        if node.blocked:
            out = out * _block_mask_f32(node, XR, i0, _T)
        return out

    return value


# ---------------------------------------------------------------------------
# In-kernel linear algebra on the lanes layout.
# ---------------------------------------------------------------------------

def _mm8(A, B):
    """Per-lane (..., 8, 8, B) @ (..., 8, 8, B) block product.

    Indexing is split int-first, newaxis-second: Mosaic lowers a getitem
    that mixes a real index with ``None`` as an (unsupported >2-D) gather.
    """
    return sum(
        A[..., :, w, :][..., :, None, :] * B[..., w, :, :][..., None, :, :]
        for w in range(_T)
    )


def _eye3():
    """(8, 8, 1) identity with a replicated lane dim, built in-kernel."""
    r = jax.lax.broadcasted_iota(jnp.int32, (_T, _T, 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (_T, _T, 1), 1)
    return (r == c).astype(jnp.float32)


def _invert_diag_blocks(blocks):
    """Batched exact inverse of (nb, 8, 8, B) lower-triangular blocks.

    D = Lam (I - G) with G strictly lower and nilpotent (G^8 = 0), so
    (I - G)^{-1} = (I + G)(I + G^2)(I + G^4) exactly.  Inputs are masked
    lower-triangular here so the Neumann identity holds by construction
    even when the caller's block carries above-diagonal garbage (the
    in-place factorization leaves f32 cancellation residue there).
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (1, _T, _T, 1), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, _T, _T, 1), 2)
    blocks = blocks * (r >= c).astype(jnp.float32)
    eye = _eye3()[None]                                  # (1, 8, 8, 1)
    d = jnp.sum(blocks * eye, axis=2)                    # (nb, 8, B)
    inv_d = 1.0 / d
    G = eye - blocks * inv_d[:, :, None, :]              # I - Lam^{-1} D
    G2 = _mm8(G, G)
    G4 = _mm8(G2, G2)
    inv_unit = _mm8(_mm8(eye + G, eye + G2), eye + G4)   # (I - G)^{-1}
    return inv_unit * inv_d[:, None, :, :]               # column scaling


# Row-chunk height for every value read that scales with the remaining
# column height.  Mosaic's register allocator works over the whole
# unrolled program: panel/copy values proportional to H = n - j0 spill
# catastrophically past 128 rows (147 MB of spill slots at N=256), while
# <= 128-row chunks stay register-clean at every supported N.
_CHUNK = 128
# Height of the column-arithmetic top tile in the in-place Cholesky (see
# _cholesky_in_place).
_CHOL_TOP = int(os.environ.get("GT_PD_CHOLTOP", "128"))


def _cholesky_in_place(M, n):
    """Blocked right-looking Cholesky on the (N, N, B) scratch ref.

    Returns the summed log-determinant (1, B).  The top (<= _CHUNK)-row
    panel tile is factored with (rows, 1, B) column arithmetic; deeper row
    chunks forward-substitute against the inverted 8x8 diagonal block, and
    the trailing downdate runs per row chunk, skipping chunks entirely
    above the diagonal.  Entries above the diagonal are left as garbage —
    valid entries never read them — and are zeroed by the caller.
    """
    nb = n // _T
    logdet = jnp.zeros((1, M.shape[-1]), jnp.float32)

    for jb in range(nb):
        j0 = jb * _T
        # Column arithmetic runs on (h, 1, B) values — 1 sublane wide, so
        # a full-height top chunk wastes 7/8 of every vector op.  Factor
        # only the 8x8 diagonal tile column-by-column and push all lower
        # rows through the full-width Dinv substitution slabs instead
        # (GT_PD_CHOLTOP=128 restores the round-4 full-height behavior).
        h_top = min(n - j0, _CHOL_TOP)
        P = M[j0:j0 + h_top, j0:j0 + _T, :]              # (h, 8, B)
        cols = []
        for t in range(_T):
            c = P[:, t:t + 1, :]                         # (h, 1, B)
            for s in range(t):
                c = c - cols[s] * cols[s][t]
            piv = c[t]                                   # (1, B)
            logdet = logdet + jnp.log(piv)
            c = c * (1.0 / jnp.sqrt(piv))
            cols.append(c)
        M[j0:j0 + h_top, j0:j0 + _T, :] = jnp.concatenate(cols, axis=1)

        # Rows below the factored chunk: L21 = A21 L11^{-T} via the exact
        # 8x8 diagonal-block inverse (same Neumann product the solver
        # reuses), chunked so no value exceeds (_CHUNK, 8, B).
        if h_top < n - j0:
            Dinv = _invert_diag_blocks(
                M[j0:j0 + _T, j0:j0 + _T, :][None]
            )[0]                                         # (8, 8, B)
            for r0 in range(j0 + h_top, n, _CHUNK):
                rc = min(_CHUNK, n - r0)
                A = M[r0:r0 + rc, j0:j0 + _T, :]         # (rc, 8, B)
                L21 = jnp.concatenate([
                    jnp.sum(A * Dinv[j][None, :, :], axis=1,
                            keepdims=True)
                    for j in range(_T)
                ], axis=1)
                M[r0:r0 + rc, j0:j0 + _T, :] = L21

        # Trailing downdate: K[r, c] -= sum_s L[r, j0+s] L[c, j0+s],
        # per row chunk; col blocks beyond the chunk's last row are
        # above-diagonal garbage and are skipped outright.
        j1 = j0 + _T
        for r0 in range(j1, n, _CHUNK):
            rc = min(_CHUNK, n - r0)
            Lr = M[r0:r0 + rc, j0:j0 + _T, :]            # (rc, 8, B)
            ncb = (r0 + rc - j1) // _T

            def trail(cb, _, Lr=Lr, r0=r0, rc=rc):
                c0 = j1 + cb * _T
                F = M[pl.ds(c0, _T), pl.ds(j0, _T), :]   # (8c, 8s, B)
                upd = [
                    jnp.sum(Lr * F[c][None, :, :], axis=1,
                            keepdims=True)
                    for c in range(_T)
                ]
                M[r0:r0 + rc, pl.ds(c0, _T), :] = (
                    M[r0:r0 + rc, pl.ds(c0, _T), :]
                    - jnp.concatenate(upd, axis=1)
                )
                return _

            jax.lax.fori_loop(0, ncb, trail, 0)
    return logdet


def _zero_upper(M, n):
    """Zero the garbage above the diagonal (panel by panel, static)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (_T, _T, 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (_T, _T, 1), 1)
    low = (r >= c).astype(jnp.float32)
    for jb in range(n // _T):
        j0 = jb * _T
        for r0 in range(0, j0, _CHUNK):
            rc = min(_CHUNK, j0 - r0)
            M[r0:r0 + rc, j0:j0 + _T, :] = jnp.zeros(
                (rc, _T, M.shape[-1]), jnp.float32
            )
        M[j0:j0 + _T, j0:j0 + _T, :] = M[j0:j0 + _T, j0:j0 + _T, :] * low


def _trtri_in_place(M, Z, Dref, n):
    """In-place triangular inversion L -> S = L^{-1} (lower).

    Left-to-right over 8-column panels: panel jb solves
    ``L[j0:, j0:] Z = I[:, :8]`` by block forward substitution into the
    (N, 8, B) scratch ``Z``, then overwrites ``M[j0:, j0:j0+8]``.  Panels
    to the right still hold L when they are read; panels to the left are
    already S and are never read.
    """
    eye = jnp.broadcast_to(_eye3(), (_T, _T, _LANES))
    nb = n // _T
    for jb in range(nb):
        j0 = jb * _T
        nrb = nb - jb

        def row_block(rb, _):
            rhs = jnp.where(rb == 0, eye, 0.0)           # (8, 8, B)

            def sub(kb, acc):
                Lblk = M[pl.ds(j0 + rb * _T, _T),
                         pl.ds(j0 + kb * _T, _T), :]
                Zkb = Z[pl.ds(kb * _T, _T), :, :]
                return acc - _mm8(Lblk, Zkb)

            acc = jax.lax.fori_loop(0, rb, sub, rhs)
            # Dynamic indexing must go through a ref (values only support
            # static slices in Mosaic).
            dinv = Dref[pl.ds(jb + rb, 1)][0]
            Z[pl.ds(rb * _T, _T), :, :] = _mm8(dinv, acc)
            return _

        jax.lax.fori_loop(0, nrb, row_block, 0)
        for r0 in range(j0, n, _CHUNK):
            rc = min(_CHUNK, n - r0)
            M[r0:r0 + rc, j0:j0 + _T, :] = Z[r0 - j0:r0 - j0 + rc, :, :]


def _apply_sts(M, r, n):
    """alpha = S^T (S r) with S = L^{-1} resident in M; r is (N, B).

    Row-block reads only: z = S r reduces over the sublane (column) axis;
    the back-application accumulates leading-row fmas.  Fully static.
    """
    zs = []
    for ib in range(n // _T):
        Sb = M[ib * _T:(ib + 1) * _T, :, :]              # (8, N, B)
        zs.append(jnp.sum(Sb * r[None], axis=1))         # (8, B)
    alpha = jnp.zeros((n, _LANES), jnp.float32)
    for ib in range(n // _T):
        Sb = M[ib * _T:(ib + 1) * _T, :, :]
        alpha = alpha + sum(
            Sb[w] * zs[ib][w] for w in range(_T)
        )
    return alpha


# ---------------------------------------------------------------------------
# The fused kernel.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _kernel_builder(node, n_pad, n_real, n_mean, n_wn, active, stage=99):
    """Trace-time construction.  ``active``: full-vector indices needing
    gradients; full layout [mean | white-noise | kernel].  ``stage``
    truncates the kernel after a pipeline step (profiling/bisection aid;
    99 = full kernel)."""
    build = _batched_builder(node)
    nb = n_pad // _T
    n_scalar = n_mean + n_wn
    n_act = len(active)

    def kernel(th_ref, xr_ref, y_ref, v_ref, ll_ref, g_ref, M, Z, Dref,
               Aref):
        th = th_ref[...]                                  # (P, B)
        y = y_ref[...]                                    # (n_pad, B)

        # Small problems unroll every row-block loop over static indices
        # and slice whole-board VALUES (best Mosaic scheduling); larger
        # ones run fori_loops with ref reads so per-iteration register
        # lifetimes stay bounded (the unrolled N=256 kernel spilled 140 MB
        # of VMEM).
        unroll = n_pad <= _CHUNK
        xr_src = xr_ref[...] if unroll else xr_ref
        if unroll:
            v_all = v_ref[...]                            # (n_pad, B)

        def vrow(i0):
            if unroll:
                return v_all[i0:i0 + _T]
            return v_ref[pl.ds(i0, _T), :]

        mean = th[0] if n_mean else None
        wn = th[n_mean] if n_wn else None
        th_k = th[n_scalar:]

        r = y - (mean[None, :] if n_mean else 0.0)
        if n_pad != n_real:
            # Padding-row mask, built in-kernel (captured host constants
            # are rejected by pallas_call).  Full-width: lanes replicated.
            ridx = jax.lax.broadcasted_iota(
                jnp.int32, (n_pad, _LANES), 0
            )
            r = r * (ridx < n_real).astype(jnp.float32)
        r = jnp.broadcast_to(r, (n_pad, _LANES))

        def build_rows(i0, th_k_, wn_):
            """Covariance rows [i0, i0+8) incl. noise + padding.

            ``i0`` is a static int on the unrolled path (value slicing) or
            a traced fori index (ref reads through ``pl.ds``)."""
            Kb = build(th_k_, xr_src, i0)                 # (8, n_pad, B)
            noise = vrow(i0)[:, None, :] + (
                jnp.exp(wn_).reshape(1, 1, -1) if n_wn else 0.0
            )                                             # (8, 1, B)
            # All masks are built at full lane width so no vreg needs a
            # lane-broadcast relayout (Mosaic charges ~the whole build for
            # (R, N, 1)-shaped operands).
            rr = i0 + jax.lax.broadcasted_iota(
                jnp.int32, (_T, n_pad, _LANES), 0
            )
            cc = jax.lax.broadcasted_iota(
                jnp.int32, (_T, n_pad, _LANES), 1
            )
            dmask = (rr == cc).astype(jnp.float32)        # (8, n_pad, B)
            Kb = Kb + dmask * noise
            if n_pad == n_real:
                return Kb
            # f32 blend, not where-on-bool: Mosaic cannot reshape i1
            # vectors to a trailing unit dim.  Padded rows/cols become the
            # identity, so their pivots are 1 and logdet/alpha are clean.
            inb = ((rr < n_real) & (cc < n_real)).astype(jnp.float32)
            return Kb * inb + dmask * (1.0 - inb)

        def bail(val):
            ll_ref[0, :, :] = jnp.broadcast_to(val[None, :], (_T, _LANES))
            g_ref[...] = jnp.zeros((1, n_act, _LANES), jnp.float32)

        # 1. build K (fori vs unroll per the ``unroll`` rationale above).
        def build_body(ib, _):
            i0 = ib * _T
            M[pl.ds(i0, _T), :, :] = build_rows(i0, th_k, wn)
            return _

        if unroll:
            for ib in range(nb):
                build_body(ib, 0)
        else:
            jax.lax.fori_loop(0, nb, build_body, 0)
        if stage <= 1:
            return bail(M[0, 0, :])

        # 2. factorize; 3. clean upper garbage; 4. diag-block inverses.
        logdet = _cholesky_in_place(M, n_pad)[0]
        if stage <= 2:
            return bail(logdet)
        _zero_upper(M, n_pad)
        Dref[...] = _invert_diag_blocks(jnp.stack(
            [M[jb * _T:(jb + 1) * _T, jb * _T:(jb + 1) * _T, :]
             for jb in range(nb)], axis=0,
        ))

        if stage <= 3:
            return bail(Dref[0, 0, 0, :])
        # 5. S = L^{-1} in place; 6. alpha and the scalar pieces.
        _trtri_in_place(M, Z, Dref, n_pad)
        if stage <= 4:
            return bail(M[0, 0, :])
        alpha = _apply_sts(M, r, n_pad)
        Aref[...] = alpha                # ref copy for dynamic row reads
        quad = jnp.sum(r * alpha, axis=0)
        ll = -0.5 * (n_real * _LOG_2PI + logdet + quad)
        # (1, 8, 128) output block: broadcast over the sublane tile.
        ll_ref[0, :, :] = jnp.broadcast_to(ll[None, :], (_T, _LANES))
        if stage <= 5:
            g_ref[...] = jnp.zeros((1, n_act, _LANES), jnp.float32)
            return

        # 7. gradient: blockwise A = aa^T - S^T S contracted with jvp-built
        # covariance tangents (one direction per active parameter).  The
        # row blocks of S^T S accumulate as 8 separate (N, B) carries so
        # every operand is a natural leading-row read or a lane-scalar.
        # The outer row-block loop is a fori_loop (same register-spill
        # reasoning as the build loop), so every slice it takes goes
        # through refs with ``pl.ds``.
        g_mean = jnp.sum(alpha, axis=0) if n_mean else None
        acts = tuple(a for a in active if a >= n_mean)

        def sts_blocks(i0, lower):
            """S^T S rows [i0, i0+8) as 8 (N, B) carries, summing over
            row blocks kb >= lower of S (S is lower-triangular, so blocks
            above ``lower`` contribute nothing)."""
            def sts_rows(kb, Gs):
                k0 = kb * _T
                Sk = M[pl.ds(k0, _T), :, :]               # (8, N, B)
                Fblk = M[pl.ds(k0, _T), pl.ds(i0, _T), :]  # (8w, 8u, B)
                out = []
                for u in range(_T):
                    g = Gs[u]
                    for w in range(_T):
                        g = g + Fblk[w, u] * Sk[w]
                    out.append(g)
                return tuple(out)

            return jax.lax.fori_loop(
                lower, nb, sts_rows,
                tuple(jnp.zeros((n_pad, _LANES), jnp.float32)
                      for _ in range(_T)),
            )

        def contractions(i0, Gs, carry):
            """A-block forms + the per-parameter jvp contraction."""
            if isinstance(i0, int):
                Ab = alpha[i0:i0 + _T]                    # (8, B)
            else:
                Ab = Aref[pl.ds(i0, _T), :]               # (8, B)
            A_halves = [
                0.5 * (Ab[u] * alpha - Gs[u]) for u in range(_T)
            ]
            # FORWARD-mode jvp, one direction per active parameter
            # (reverse-mode transposes of the radial custom_jvp trip a
            # Mosaic relayout bug; the jvp path is the same machinery the
            # Kalman kernel uses).  The primal build is identical across
            # directions and CSEs away.
            out = []
            for idx, a in enumerate(acts):
                if n_wn and a == n_mean:
                    tk_dir = jnp.zeros_like(th_k)
                    wn_dir = jnp.ones_like(wn)
                else:
                    j = a - n_scalar
                    tk_dir = (jax.lax.broadcasted_iota(
                        jnp.int32, th_k.shape, 0
                    ) == j).astype(jnp.float32)
                    wn_dir = jnp.zeros_like(wn) if n_wn else None
                if n_wn:
                    _, dK = jax.jvp(
                        lambda tk, w_: build_rows(i0, tk, w_),
                        (th_k, wn), (tk_dir, wn_dir),
                    )
                else:
                    _, dK = jax.jvp(
                        lambda tk: build_rows(i0, tk, None),
                        (th_k,), (tk_dir,),
                    )
                out.append(carry[idx] + sum(
                    jnp.sum(A_halves[u] * dK[u], axis=0)
                    for u in range(_T)
                ))
            return tuple(out)

        if stage <= 7:
            Gs = sts_blocks(0, 0)
            if stage <= 6:
                return bail(Gs[0][0])
            Ab = Aref[0:_T, :]
            return bail((0.5 * (Ab[0] * alpha - Gs[0]))[0])

        def grad_body(ib, carry):
            i0 = ib * _T
            return contractions(i0, sts_blocks(i0, ib), carry)

        g_init = tuple(jnp.zeros((_LANES,), jnp.float32) for _ in acts)
        if unroll:
            g_acts = g_init
            for ib in range(nb):
                g_acts = grad_body(ib, g_acts)
        else:
            g_acts = jax.lax.fori_loop(0, nb, grad_body, g_init)
        g_of = dict(zip(acts, g_acts))
        for j, a in enumerate(active):
            g_ref[0, j, :] = g_mean if a < n_mean else g_of[a]

    return kernel, n_act


def make_dense_batched_vg(node, x, y, yerr2, n_mean, n_wn, active,
                          interpret=False):
    """Build ``vg(theta_full_b (B, D)) -> (ll (B,), grad (B, n_active))``.

    :param node: kernel spec tree (``supports_pallas_dense`` must hold).
    :param x: (N, d) coordinates (host array, baked in).
    :param y: observations with any parameter-free mean already subtracted.
    :param yerr2: per-point noise variances with any parameter-free
        white-noise model already folded in.
    :param n_mean,n_wn: 1 if the mean / log-white-noise is a per-chain
        scalar parameter (ConstantModel), else 0.
    :param active: tuple of full-vector indices needing gradients.
    :param interpret: run the Pallas kernel in interpret mode (CPU tests).
    """
    x = np.atleast_2d(np.asarray(x, np.float32))
    n_real = x.shape[0]
    n_pad = _round_up(max(n_real, _T), _T)
    if n_pad > MAX_N:
        raise ValueError(
            "pallas dense kernel supports N <= {0}".format(MAX_N)
        )

    # Lane-replicated boards: coordinates/observations repeated across the
    # 128 chain lanes, so every in-kernel op on them is full VPU width.
    x_pad = np.concatenate(
        [x, np.zeros((n_pad - n_real, x.shape[1]), np.float32)], axis=0
    )
    xr_dev = jnp.asarray(np.ascontiguousarray(np.broadcast_to(
        x_pad.T[:, :, None], (x.shape[1], n_pad, _LANES)
    )))
    pad1 = ((0, n_pad - n_real),)
    y_dev = jnp.asarray(np.ascontiguousarray(np.broadcast_to(
        np.pad(np.asarray(y, np.float32), pad1)[:, None],
        (n_pad, _LANES),
    )))
    v_dev = jnp.asarray(np.ascontiguousarray(np.broadcast_to(
        np.pad(np.asarray(yerr2, np.float32), pad1)[:, None],
        (n_pad, _LANES),
    )))

    kernel, n_act = _kernel_builder(
        node, n_pad, n_real, int(n_mean), int(n_wn),
        tuple(int(a) for a in active),
        stage=int(os.environ.get("GT_PD_STAGE", "99")),
    )

    def vg(theta_full_b):
        B, d_full = theta_full_b.shape
        b_pad = _round_up(max(B, 1), _LANES)
        grid = b_pad // _LANES
        th = jnp.concatenate(
            [theta_full_b.astype(jnp.float32),
             jnp.zeros((b_pad - B, d_full), jnp.float32)], axis=0
        ).T                                               # (D, b_pad)

        # Under shard_map with vma checking (the chain-sharded sampler
        # path) the outputs inherit the chain batch's varying-axes type,
        # and the baked data boards must be promoted to the same type: the
        # interpret-mode evaluator type-checks every in-kernel op, and
        # mixing an invariant board with varying parameters is a vma error.
        vma = jax.typeof(theta_full_b).vma
        xr_in, y_in, v_in = (
            (jax.lax.pcast(a, tuple(sorted(vma)), to="varying")
             for a in (xr_dev, y_dev, v_dev))
            if vma else (xr_dev, y_dev, v_dev)
        )
        ll, grad = pl.pallas_call(
            kernel,
            grid=(grid,),
            out_shape=(
                jax.ShapeDtypeStruct((grid, _T, _LANES), jnp.float32,
                                     vma=vma),
                jax.ShapeDtypeStruct((grid, n_act, _LANES), jnp.float32,
                                     vma=vma),
            ),
            in_specs=[
                pl.BlockSpec((d_full, _LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((x.shape[1], n_pad, _LANES),
                             lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, _LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, _LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, _T, _LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_act, _LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((n_pad, n_pad, _LANES), jnp.float32),
                pltpu.VMEM((n_pad, _T, _LANES), jnp.float32),
                pltpu.VMEM((n_pad // _T, _T, _T, _LANES), jnp.float32),
                pltpu.VMEM((n_pad, _LANES), jnp.float32),     # alpha
            ],
            compiler_params=pltpu.CompilerParams(
                # The (N, N, 128) buffer plus transient build/jvp tiles sit
                # just above the default 16 MB scoped-vmem budget at N=128.
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(th, xr_in, y_in, v_in)

        ll = ll[:, 0, :].reshape(b_pad)[:B]
        grad = jnp.moveaxis(grad, 1, 0).reshape(n_act, b_pad)[:, :B].T
        return ll, grad

    return vg
