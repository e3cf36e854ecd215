# -*- coding: utf-8 -*-
"""Hierarchical (HODLR) solver — level-batched TPU re-derivation.

API parity with /root/reference/src/george/solvers/hodlr.py: same
constructor signature (min_size=100, tol=0.1, seed=42), same solver protocol,
``apply_sqrt`` unsupported, and pickling drops the device-side factorization
(solvers/hodlr.py:62-76 in the reference).  The factorization itself lives in
:mod:`george_tpu.ops.hodlr_core` as batched XLA programs.
"""

import numpy as np

from ..ops import hodlr_core
from .basic import BasicSolver

__all__ = ["HODLRSolver"]


class HODLRSolver(BasicSolver):
    """O(N log^2 N) solver via hierarchical off-diagonal low-rank compression.

    :param kernel: the kernel instance.
    :param min_size: leaf switch-over size for the recursion (default 100).
    :param tol: Frobenius-norm tolerance of the blockwise low-rank
        approximation (default 0.1).
    :param seed: accepted for reference API parity; the batched ACA here is
        deterministic, so results are reproducible with or without it.
    :param max_rank: optional hard cap on the per-block rank (defaults to a
        cap derived from ``tol``).
    :param order: internal point ordering: ``"auto"`` (default; recursive
        KD median splits via the native runtime — makes off-diagonal blocks
        low-rank for multi-dimensional or unsorted inputs), ``"kd"``,
        ``"hilbert"``, ``"distance"`` (the reference's nd_sort_samples), or
        ``None`` to factor in user order like the reference does.  The
        permutation is applied and undone internally, so results are
        identical up to approximation quality.
    """

    def __init__(self, kernel, min_size=100, tol=0.1, seed=42,
                 max_rank=None, order="auto"):
        self.min_size = min_size
        self.tol = tol
        self.seed = seed
        self.max_rank = max_rank
        self.order = order
        super(HODLRSolver, self).__init__(kernel)

    def _ordering(self, x):
        from .. import utils

        order = "kd" if self.order == "auto" else self.order
        if order in (None, "none"):
            return None
        fn = {
            "kd": utils.kd_sort_samples,
            "hilbert": utils.hilbert_sort_samples,
            "distance": utils.nd_sort_samples,
        }[order]
        perm = np.asarray(fn(x))
        if np.array_equal(perm, np.arange(x.shape[0])):
            return None
        return perm

    def compute(self, x, yerr):
        x = np.ascontiguousarray(np.atleast_2d(x), dtype=np.float64)
        if x.shape[0] == 1 and x.shape[1] != self.kernel.ndim:
            x = x.T
        diag_noise = np.asarray(yerr, dtype=np.float64) ** 2
        diag_noise = np.broadcast_to(diag_noise, (x.shape[0],))
        self._perm = self._ordering(x)
        if self._perm is not None:
            x = x[self._perm]
            diag_noise = diag_noise[self._perm]
            self._inv_perm = np.argsort(self._perm)
        node = self.kernel.spec_node()
        theta = self.kernel.get_parameter_vector(include_frozen=True)
        self._fact = hodlr_core.hodlr_compute(
            node, theta, x, diag_noise,
            min_size=self.min_size, tol=self.tol, seed=self.seed,
            max_rank=self.max_rank,
        )
        self._x_sorted = x
        self.log_determinant = self._fact.log_determinant
        self.computed = True

    def grad_core(self, node, theta, wn_vec, r, yerr2, wn_dirs=None,
                  theta_idx=None):
        """Factorization-aware gradient of -0.5 (logdet + r^T K^-1 r).

        Forward mode through the level sweeps (ops/hodlr_core.py) — never
        materializes N x N, unlike the reference's dense ``get_inverse``
        gradient path (gp.py:436).  Inputs in user order; the internal sort
        permutation is applied here.  ``wn_dirs`` (n_active_wn, N) carries
        the white-noise model's derivative rows; the returned white-noise
        gradient is already projected onto them (``wn_projected=True``
        contract in GP.grad_log_likelihood).
        """
        import numpy as np

        perm, inv = self._perm, getattr(self, "_inv_perm", None)
        if perm is not None:
            wn_vec, r, yerr2 = wn_vec[perm], r[perm], yerr2[perm]
            if wn_dirs is not None:
                wn_dirs = np.atleast_2d(wn_dirs)[:, perm]
        g_theta, g_wn_proj, alpha = hodlr_core.hodlr_grad_core(
            node, self._fact, theta, wn_vec, self._x_sorted, r, yerr2,
            self.tol, wn_dirs=wn_dirs, theta_idx=theta_idx,
        )
        g_theta = np.asarray(g_theta)
        g_wn_proj = np.asarray(g_wn_proj)
        alpha = np.asarray(alpha)
        if perm is not None:
            alpha = alpha[inv]
        return g_theta, g_wn_proj, alpha

    def apply_inverse(self, y, in_place=False):
        z = np.asarray(y)
        if self._perm is not None:
            z = z[self._perm]
        result = np.array(hodlr_core.hodlr_solve(self._fact, z))
        if self._perm is not None:
            result = result[self._inv_perm]
        if in_place and isinstance(y, np.ndarray) and y.shape == result.shape:
            y[...] = result
            return y
        return result

    def dot_solve(self, y):
        y = np.asarray(y)
        if self._perm is not None:
            # y^T K^-1 y = (Py)^T (P K P^T)^-1 (Py): permutation-invariant.
            y = y[self._perm]
        if y.ndim <= 1:
            # Fused on device: only the scalar comes back to the host.
            return float(hodlr_core.hodlr_dot_solve(self._fact, y))
        out = np.asarray(y.T @ hodlr_core.hodlr_solve(self._fact, y))
        return float(out) if out.ndim == 0 else out

    def apply_sqrt(self, r):
        raise NotImplementedError(
            "apply_sqrt is not implemented for the HODLRSolver"
        )

    def get_inverse(self):
        # apply_inverse handles the internal permutation: K^-1 = K^-1 @ I.
        return self.apply_inverse(np.eye(self._fact.n))

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_computed"] = False
        state.pop("_fact", None)
        state.pop("_perm", None)
        state.pop("_inv_perm", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
