# -*- coding: utf-8 -*-
"""george_tpu — fast and flexible Gaussian Process regression, TPU-native.

A from-scratch JAX/XLA/Pallas re-design of the george GP framework
(https://github.com/dfm/george): the YAML kernel DSL compiles to jitted
matrix-level covariance and gradient programs, the dense solver path runs
fused on the MXU, the HODLR hierarchical solver is re-derived as
level-batched low-rank factorizations, and a first-class sampler layer
(HMC / NUTS / ADVI / SMC) runs thousands of chains per chip with
multi-host sharding over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

__all__ = [
    "__version__",
    "kernels",
    "GP",
    "Metric",
    "TrivialSolver",
    "BasicSolver",
    "HODLRSolver",
    "StateSpaceSolver",
    "optimize",
]

from . import kernels
from .gp import GP
from .metrics import Metric
from .solvers import (
    TrivialSolver, BasicSolver, HODLRSolver, StateSpaceSolver
)


def __getattr__(name):
    # Lazy: the optimizer pulls in optax, which not every GP user needs.
    if name == "optimize":
        import importlib

        module = importlib.import_module(".optimize", __name__)
        globals()["optimize"] = module
        return module
    raise AttributeError(name)
