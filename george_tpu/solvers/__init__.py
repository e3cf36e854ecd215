# -*- coding: utf-8 -*-
"""Linear-algebra solvers for the GP covariance matrix.

Three backends, mirroring the reference's solver ladder
(/root/reference/docs/user/solvers.rst):

  * :class:`TrivialSolver` — diagonal-only (no kernel);
  * :class:`BasicSolver` — dense Cholesky, O(N^3), fused jitted XLA path;
  * :class:`HODLRSolver` — hierarchical off-diagonal low-rank solver,
    re-derived for TPU as level-batched randomized low-rank factorizations
    (O(N log^2 N) work, MXU-resident matmuls).
"""

from .trivial import TrivialSolver
from .basic import BasicSolver
from .hodlr import HODLRSolver

__all__ = ["TrivialSolver", "BasicSolver", "HODLRSolver"]
