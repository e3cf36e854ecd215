# -*- coding: utf-8 -*-
"""MXU per-chain-matrix batched dense-GP value+gradient (N up to 512).

The chains-on-lanes VPU kernel (:mod:`.pallas_dense`) is at its own
lane-throughput ceiling for N > 128: the O(N^3) Cholesky downdates are
rank-8 outer products on the VPU, and at 4096 chains x N=256 the whole
fused program measures ~96 ms — 4.5x XLA but far from the chip's matmul
rate.  The N^3-flavored work is per-chain matrix algebra the MXU has
never seen.  This module lays the chains on the BATCH axis with per-chain
(N, N) matrices and restructures the factorization so that everything
O(N^3) is a batched 128^3 matmul:

  * blocked right-looking Cholesky over 128-wide panels: the trailing
    Schur downdates ``S_ij -= L_ik L_jk^T`` and the panel solves
    ``L_ij = S_ij T_jj^T`` are plain batched matmuls (MXU, precision
    HIGH — the 3-pass bf16 decomposition measured at ~33 TFLOP/s on this
    chip);
  * the only part the MXU cannot do — the narrow sequential 128x128
    diagonal-block factorization + triangular inversion — runs in a small
    Pallas "spine" kernel that reuses the proven chains-on-lanes
    machinery from :mod:`.pallas_dense` (in-register 8-panel Cholesky,
    exact Neumann 8x8 inverses, in-place block-substitution trtri), with
    XLA layout moves (B, 128, 128) <-> (128, 128, B) at the seam;
  * the explicit inverse ``K^{-1} = T^T T`` (T = L^{-1} assembled
    blockwise) feeds the reference's closed-form gradient
    ``dl/dth = 0.5 tr[(aa^T - K^{-1}) dK/dth]`` (gp.py:406-468) as ONE
    cotangent matrix A contracted against forward-mode covariance
    tangents — one jvp direction per active parameter, fused by XLA into
    the tangent build (no (N, N, P) tensor, no reverse-mode Cholesky).

Because the covariance build is plain (vmapped) XLA here, the kernel-tree
envelope is wider than the VPU kernel's: every metric type works,
including the general (Cholesky-parameterized) dense metric that falls
out of the lanes formulation (metrics.h:144-236 semantics via
``compiler.metric_r2_matrix``).

Semantics match ``samplers.logprob.build_gp_log_prob(method="dense")``:
``ll = -0.5 (N log 2pi + logdet + r^T K^-1 r)`` with
``K = k(theta; X, X) + diag(yerr2 + exp(wn))``; a failed factorization
surfaces as NaN (mapped to -inf by the caller).
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dsl import compiler
from .pallas_dense import (
    _cholesky_in_place, _zero_upper, _invert_diag_blocks,
    _trtri_in_place, _T, _LANES,
)

__all__ = ["dense_mxu_available", "supports_dense_mxu",
           "make_dense_mxu_vg", "MXU_MAX_N", "PANEL"]

# Spine block width.  128 measured best: the spine kernel's cost per grid
# step is dominated by fixed per-step scheduling, not flops, so smaller
# panels do NOT get cheaper (p64 spine = 6.2 ms/call vs ~9 at p128 for 1/8
# the flops) while doubling the layout-boundary traffic (BENCH_NOTES.md).
PANEL = int(os.environ.get("GT_DM_PANEL", "128"))
MXU_MAX_N = 512        # per-chain K is 1 MB, B*N^2 HBM-bound

_LOG_2PI = float(np.log(2.0 * np.pi))
# MXU matmul precision: HIGHEST (6-pass bf16, f32-exact) measured within
# noise of HIGH (3-pass) on this pipeline's matmul mix while cutting the
# on-chip ll error ~4x (see BENCH_NOTES.md); overridable for experiments.
_PREC = getattr(jax.lax.Precision,
                os.environ.get("GT_DM_PREC", "HIGHEST").upper())


def dense_mxu_available():
    return jax.default_backend() == "tpu"


def supports_dense_mxu(node, n):
    """Any kernel tree the DSL can build works here (the build is vmapped
    XLA, so all three metric types are supported); only N is bounded."""
    return n <= MXU_MAX_N


def _round_up(n, m):
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# The spine: chol + trtri of (128, 128, B) diagonal blocks, lanes layout.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _spine_kernel():
    nb = PANEL // _T

    def kernel(k_ref, t_ref, ld_ref, Z, Dref):
        # Work in the output ref: copy in, factor, invert in place.
        t_ref[...] = k_ref[...]
        logdet = _cholesky_in_place(t_ref, PANEL)[0]        # (B,)
        _zero_upper(t_ref, PANEL)
        Dref[...] = _invert_diag_blocks(jnp.stack(
            [t_ref[jb * _T:(jb + 1) * _T, jb * _T:(jb + 1) * _T, :]
             for jb in range(nb)], axis=0,
        ))
        _trtri_in_place(t_ref, Z, Dref, PANEL)
        ld_ref[0, :, :] = jnp.broadcast_to(logdet[None, :], (_T, _LANES))

    return kernel


def _spine(K_l, interpret=False):
    """(PANEL, PANEL, Bp) SPD blocks -> (T = chol(K)^{-1} lanes layout,
    logdet (Bp,)).  Bp must be a multiple of 128."""
    bp = K_l.shape[-1]
    grid = bp // _LANES
    vma = jax.typeof(K_l).vma
    T_l, ld = pl.pallas_call(
        _spine_kernel(),
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((PANEL, PANEL, bp), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((grid, _T, _LANES), jnp.float32, vma=vma),
        ),
        in_specs=[
            pl.BlockSpec((PANEL, PANEL, _LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((PANEL, PANEL, _LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((PANEL, _T, _LANES), jnp.float32),
            pltpu.VMEM((PANEL // _T, _T, _T, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(K_l)
    return T_l, ld[:, 0, :].reshape(bp)


def _mmT(a, b):
    """a @ b^T, batched chain-major."""
    return jnp.einsum("bij,bkj->bik", a, b, precision=_PREC)


# ---------------------------------------------------------------------------
# Board-based covariance builder: the coordinate differences are theta-
# independent, so the per-axis pairwise boards are precomputed ONCE and
# shared across every chain — each chain's build is then a handful of
# scalar-times-board fmas plus the elementwise radial, and the reverse
# (VJP) pass reduces its cotangent against the same boards.  (The plain
# compiler builder recomputes the (N, d) broadcast differences per chain
# per direction — measured at ~2.5x the cost at 4096 chains x N=256.)
# ---------------------------------------------------------------------------

def _board_builder(node, x_pad):
    """``f(theta_leaf) -> (N, N)`` with coordinate boards baked in."""
    if isinstance(node, compiler.Op):
        f1 = _board_builder(node.k1, x_pad)
        f2 = _board_builder(node.k2, x_pad)
        n1 = compiler.node_size(node.k1)
        if node.op == "sum":
            return lambda th: f1(th[:n1]) + f2(th[n1:])
        return lambda th: f1(th[:n1]) * f2(th[n1:])

    axes = list(node.axes)
    A = x_pad[:, axes]                                   # (N, naxes)
    naxes = len(axes)

    mask_board = None
    if node.blocked:
        m = np.ones(x_pad.shape[0], dtype=bool)
        for axis, lo, hi in zip(node.axes, node.min_block, node.max_block):
            col = x_pad[:, axis]
            m = m & (col >= lo) & (col <= hi)
        mask_board = jnp.asarray(
            (m[:, None] & m[None, :]).astype(np.float32)
        )

    if node.stationary:
        radial = compiler._radial_fn(node.name, node.constants)
        mtype = node.metric_type
        diffs = [A[:, i][:, None] - A[:, i][None, :] for i in range(naxes)]
        if mtype == 0:
            d2_sum = jnp.asarray(sum(d * d for d in diffs))
        elif mtype == 1:
            d2 = jnp.asarray(np.stack([d * d for d in diffs]))
        else:
            cross = jnp.asarray(np.stack([
                diffs[a] * diffs[b]
                for a in range(naxes) for b in range(naxes)
            ]))                                          # (naxes^2, N, N)

        def value(theta):
            p, mp = theta[:node.nparams], theta[node.nparams:]
            if mtype == 0:
                r2 = d2_sum * jnp.exp(-mp[0])
            elif mtype == 1:
                r2 = jnp.tensordot(jnp.exp(-mp), d2, axes=1)
            else:
                L = compiler._unpack_cholesky(mp, naxes)
                Linv = jax.scipy.linalg.solve_triangular(
                    L, jnp.eye(naxes, dtype=L.dtype), lower=True
                )
                Minv = Linv.T @ Linv                     # (naxes, naxes)
                r2 = jnp.tensordot(Minv.reshape(-1), cross, axes=1)
            K = radial(p, r2)
            return K * mask_board if mask_board is not None else K

        return value

    pair = compiler._pair_fn(node.name, node.constants)
    cols = [jnp.asarray(A[:, i]) for i in range(naxes)]

    def value(theta):
        total = 0.0
        for c in cols:
            total = total + pair(theta, c[:, None], c[None, :])
        out = jnp.broadcast_to(total, (x_pad.shape[0], x_pad.shape[0]))
        return out * mask_board if mask_board is not None else out

    return value


# ---------------------------------------------------------------------------
# The batched value+gradient program.
# ---------------------------------------------------------------------------

def make_dense_mxu_vg(node, x, y, yerr2, n_mean, n_wn, active,
                      interpret=False):
    """Build ``vg(theta_full_b (B, D)) -> (ll (B,), grad (B, n_active))``.

    Same contract as :func:`.pallas_dense.make_dense_batched_vg`; see the
    module docstring for the algorithm.  ``interpret`` runs the spine
    kernel through the Pallas interpreter (CPU tests).
    """
    x = np.atleast_2d(np.asarray(x, np.float32))
    n_real = x.shape[0]
    n_pad = _round_up(max(n_real, PANEL), PANEL)
    if n_pad > MXU_MAX_N:
        raise ValueError(
            "MXU dense kernel supports N <= {0}".format(MXU_MAX_N)
        )
    np_ = n_pad // PANEL

    x_pad = np.concatenate(
        [x, np.zeros((n_pad - n_real, x.shape[1]), np.float32)], axis=0
    )
    board_value = _board_builder(node, x_pad)
    y_dev = jnp.asarray(np.pad(
        np.asarray(y, np.float32), ((0, n_pad - n_real),)
    ))
    v_dev = jnp.asarray(np.pad(
        np.asarray(yerr2, np.float32), ((0, n_pad - n_real),)
    ))
    # Padding rows/cols become the identity: pivots 1, logdet/alpha clean.
    if n_pad != n_real:
        idx = np.arange(n_pad)
        inb = ((idx[:, None] < n_real) & (idx[None, :] < n_real)
               ).astype(np.float32)
        pad_eye = (np.eye(n_pad, dtype=np.float32) * (1.0 - inb)
                   ).astype(np.float32)
        inb_dev, pad_eye_dev = jnp.asarray(inb), jnp.asarray(pad_eye)
    rmask = jnp.asarray((np.arange(n_pad) < n_real).astype(np.float32))

    n_scalar = int(n_mean) + int(n_wn)
    active = tuple(int(a) for a in active)

    def build_K(th_k, wn):
        """Per-chain (n_pad, n_pad) covariance + noise (+ padding)."""
        K = board_value(th_k)
        noise = v_dev + (jnp.exp(wn) if n_wn else 0.0)
        K = K + jnp.diag(noise)
        if n_pad != n_real:
            K = K * inb_dev + pad_eye_dev
        return K

    # Stage bisection aid (benchmarks): 1 = build, 2 = factor, 3 = inverse
    # assembly, 4 = ll, 99 = full program.
    stage = int(os.environ.get("GT_DM_STAGE", "99"))

    def vg(theta_full_b):
        B, d_full = theta_full_b.shape
        bp = _round_up(max(B, 1), _LANES)
        th = jnp.concatenate(
            [theta_full_b.astype(jnp.float32),
             jnp.zeros((bp - B, d_full), jnp.float32)], axis=0
        )
        mean = th[:, 0] if n_mean else None
        wn = th[:, n_mean] if n_wn else jnp.zeros(bp, jnp.float32)
        th_k = th[:, n_scalar:]

        # ONE primal build, with its vjp closure kept for the gradient —
        # the reverse pass reuses the primal residuals (r2 etc.) instead of
        # re-running the build inside jax.grad.
        K, build_vjp = jax.vjp(
            lambda tk, w: jax.vmap(build_K)(tk, w), th_k, wn
        )                                                 # (bp, N, N)

        def bail(v):
            z = jnp.broadcast_to(jnp.sum(v, axis=tuple(range(1, v.ndim))),
                                 (bp,))[:B]
            return z, jnp.zeros((B, len(active)), jnp.float32)

        if stage <= 1:
            return bail(K)

        def blk(M, i, j):
            return M[:, i * PANEL:(i + 1) * PANEL,
                     j * PANEL:(j + 1) * PANEL]

        def diag_lanes(j):
            """Diagonal block j built DIRECTLY in (PANEL, PANEL, bp) lanes
            layout (vmap out_axes=-1): a separate fused elementwise build
            is far cheaper than transposing a slice of K — the
            (bp, p, p) <-> (p, p, bp) moveaxis measured ~5 ms per 256 MB
            on this chip (~100 GB/s), ~half the whole factor stage."""
            lo = j * PANEL

            def one(tk, w):
                return build_K(tk, w)[lo:lo + PANEL, lo:lo + PANEL]

            return jax.vmap(one, out_axes=-1)(th_k, wn)

        # Blocked right-looking Cholesky; T = L^{-1} assembled blockwise.
        # Layout discipline: diagonal/inverse blocks live LANES-resident
        # ((p, p, bp) — the spine's native layout), off-diagonal L blocks
        # live chain-major ((bp, p, p) — the matmul batch layout), and
        # every cross-layout contraction is a single einsum whose operand
        # spec carries the layout (measured: identical matmul cost to the
        # canonical layout, so the transposes vanish into the matmuls).
        Lb, Tb = {}, {}
        logdet = jnp.zeros(bp, jnp.float32)
        for j in range(np_):
            Sjj_l = diag_lanes(j)
            for k in range(j):
                Sjj_l = Sjj_l - jnp.einsum(
                    "bij,bkj->ikb", Lb[j, k], Lb[j, k], precision=_PREC
                )
            T_l, ld = _spine(Sjj_l, interpret=interpret)
            Tb[j, j] = T_l                               # lanes-resident
            logdet = logdet + ld
            for i in range(j + 1, np_):
                Sij = blk(K, i, j)
                for k in range(j):
                    Sij = Sij - _mmT(Lb[i, k], Lb[j, k])
                # L_ij = S_ij @ T_jj^T, T_jj lanes-resident.
                Lb[i, j] = jnp.einsum(
                    "bij,kjb->bik", Sij, Tb[j, j], precision=_PREC
                )
        if stage <= 2:
            return bail(logdet[:, None] + sum(
                jnp.sum(v, axis=(0, 1))[:, None] for v in Tb.values()
            ))
        # Off-diagonal inverse blocks: T_ij = -T_ii (sum_k L_ik T_kj),
        # produced straight into the lanes layout.
        for j in range(np_):
            for i in range(j + 1, np_):
                acc = jnp.einsum("bij,jkb->bik", Lb[i, j], Tb[j, j],
                                 precision=_PREC)
                for k in range(j + 1, i):
                    acc = acc + jnp.einsum(
                        "bij,jkb->bik", Lb[i, k], Tb[k, j],
                        precision=_PREC,
                    )
                Tb[i, j] = -jnp.einsum(
                    "ijb,bjk->ikb", Tb[i, i], acc, precision=_PREC
                )

        # W = K^{-1} = T^T T blockwise (chain-major output feeding A);
        # alpha and the quadratic form come straight from T (z = T r,
        # quad = |z|^2, alpha = T^T z — cheaper and better-conditioned
        # than W r).
        Wb = {}
        for a in range(np_):
            for b in range(a, np_):
                acc = None
                for k in range(b, np_):
                    term = jnp.einsum("jib,jkb->bik", Tb[k, a], Tb[k, b],
                                      precision=_PREC)
                    acc = term if acc is None else acc + term
                Wb[a, b] = acc
        rows = []
        for a in range(np_):
            rows.append(jnp.concatenate(
                [Wb[a, b] if a <= b else
                 jnp.swapaxes(Wb[b, a], 1, 2) for b in range(np_)],
                axis=2,
            ))
        W = jnp.concatenate(rows, axis=1)                 # (bp, N, N)
        if stage <= 3:
            return bail(W)

        r = (y_dev[None, :] - (mean[:, None] if n_mean else 0.0)) * rmask
        r_blk = [r[:, a * PANEL:(a + 1) * PANEL] for a in range(np_)]
        z_blk = [
            sum(jnp.einsum("ijb,bj->bi", Tb[k, a], r_blk[a],
                           precision=_PREC) for a in range(k + 1))
            for k in range(np_)
        ]
        alpha = jnp.concatenate([
            sum(jnp.einsum("jib,bj->bi", Tb[k, a], z_blk[k],
                           precision=_PREC) for k in range(a, np_))
            for a in range(np_)
        ], axis=1)
        quad = sum(jnp.einsum("bi,bi->b", z, z) for z in z_blk)
        ll = -0.5 * (n_real * _LOG_2PI + logdet + quad)
        if stage <= 4:
            return ll[:B], jnp.zeros((B, len(active)), jnp.float32)

        # Gradient: A = aa^T - K^{-1} is the cotangent of the covariance in
        # the reference's closed form (gp.py:406-468); ONE reverse pass
        # through the (XLA) build gives every parameter direction at once —
        # dl/dth = 0.5 vjp(build_K, A), no (N, N, P) tensor, no
        # reverse-mode factorization (the factorization never enters the
        # differentiated graph), and the primal residuals come from the
        # main build above.  (A blockwise-W contraction variant was
        # measured 2x slower: per-block K slicing defeats the reverse
        # pass's elementwise fusion.)
        A = alpha[:, :, None] * alpha[:, None, :] - W
        g_k, g_wn = build_vjp(0.5 * A)
        cols = []
        for a in active:
            if a < n_mean:
                cols.append(jnp.sum(alpha, axis=1))       # d ll / d mean
            elif n_wn and a == n_mean:
                cols.append(g_wn)
            else:
                cols.append(g_k[:, a - n_scalar])
        grad = jnp.stack(cols, axis=1) if cols else jnp.zeros(
            (bp, 0), jnp.float32
        )
        return ll[:B], grad[:B]

    return vg
