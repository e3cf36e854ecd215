# -*- coding: utf-8 -*-
"""Linear-algebra solvers for the GP covariance matrix.

Four backends — the reference's solver ladder
(/root/reference/docs/user/solvers.rst) plus an exact O(N) path it lacks:

  * :class:`TrivialSolver` — diagonal-only (no kernel);
  * :class:`BasicSolver` — dense Cholesky, O(N^3), fused jitted XLA path;
  * :class:`HODLRSolver` — hierarchical off-diagonal low-rank solver,
    re-derived for TPU as level-batched randomized low-rank factorizations
    (O(N log^2 N) work, MXU-resident matmuls);
  * :class:`StateSpaceSolver` — exact Kalman-filter solver, O(N), for 1-D
    Markovian kernels (Exp / Matern32 / Matern52 / Cosine / Constant sums).
"""

from .trivial import TrivialSolver
from .basic import BasicSolver
from .hodlr import HODLRSolver
from .state_space import StateSpaceSolver

__all__ = ["TrivialSolver", "BasicSolver", "HODLRSolver",
           "StateSpaceSolver"]
