# -*- coding: utf-8 -*-
"""Hierarchical off-diagonal low-rank (HODLR) solver — TPU re-derivation.

Placeholder module: the level-batched implementation lands in
ops/hodlr_core; this wrapper keeps the reference-compatible constructor
signature (min_size / tol / seed, solvers/hodlr.py:43 in the reference).
"""

from .basic import BasicSolver

__all__ = ["HODLRSolver"]


class HODLRSolver(BasicSolver):

    def __init__(self, kernel, min_size=100, tol=0.1, seed=42):
        self.min_size = min_size
        self.tol = tol
        self.seed = seed
        super(HODLRSolver, self).__init__(kernel)

    def compute(self, x, yerr):
        raise NotImplementedError("HODLR solver is not wired up yet")
