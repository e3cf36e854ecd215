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
    """

    def __init__(self, kernel, min_size=100, tol=0.1, seed=42,
                 max_rank=None):
        self.min_size = min_size
        self.tol = tol
        self.seed = seed
        self.max_rank = max_rank
        super(HODLRSolver, self).__init__(kernel)

    def compute(self, x, yerr):
        x = np.ascontiguousarray(np.atleast_2d(x), dtype=np.float64)
        if x.shape[0] == 1 and x.shape[1] != self.kernel.ndim:
            x = x.T
        diag_noise = np.asarray(yerr, dtype=np.float64) ** 2
        diag_noise = np.broadcast_to(diag_noise, (x.shape[0],))
        node = self.kernel.spec_node()
        theta = self.kernel.get_parameter_vector(include_frozen=True)
        self._fact = hodlr_core.hodlr_compute(
            node, theta, x, diag_noise,
            min_size=self.min_size, tol=self.tol, seed=self.seed,
            max_rank=self.max_rank,
        )
        self.log_determinant = self._fact.log_determinant
        self.computed = True

    def apply_inverse(self, y, in_place=False):
        result = np.array(hodlr_core.hodlr_solve(self._fact, np.asarray(y)))
        if in_place and isinstance(y, np.ndarray) and y.shape == result.shape:
            y[...] = result
            return y
        return result

    def dot_solve(self, y):
        y = np.asarray(y)
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
        n = self._fact.n
        return np.array(
            hodlr_core.hodlr_solve(self._fact, np.eye(n))
        )

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_computed"] = False
        state.pop("_fact", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
