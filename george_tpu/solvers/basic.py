# -*- coding: utf-8 -*-
"""Dense Cholesky solver on the XLA/TPU path.

The API (compute / apply_inverse / dot_solve / apply_sqrt / get_inverse /
log_determinant / computed) matches the reference's BasicSolver
(/root/reference/src/george/solvers/basic.py) and the solver protocol
documented in its docs/user/solvers.rst.  The covariance build + noise add +
factorization run as one fused jitted program (see
:mod:`george_tpu.ops.linalg`); the MXU does the heavy lifting for both the
pairwise-distance matmul and the blocked Cholesky.
"""

import numpy as np
from scipy.linalg import LinAlgError

from ..ops import linalg

__all__ = ["BasicSolver"]


class BasicSolver(object):

    def __init__(self, kernel):
        self.kernel = kernel
        self._computed = False
        self._log_det = None
        self._factor = None

    @property
    def computed(self):
        """True once :meth:`compute` has factorized the covariance."""
        return self._computed

    @computed.setter
    def computed(self, v):
        self._computed = v

    @property
    def log_determinant(self):
        return self._log_det

    @log_determinant.setter
    def log_determinant(self, v):
        self._log_det = v

    def compute(self, x, yerr):
        """Build K(x, x) + diag(yerr^2) and factorize it."""
        x = np.ascontiguousarray(x, dtype=np.float64)
        diag_noise = np.asarray(yerr, dtype=np.float64) ** 2
        diag_noise = np.broadcast_to(diag_noise, (x.shape[0],))
        node = self.kernel.spec_node()
        theta = self.kernel.get_parameter_vector(include_frozen=True)
        L, logdet = linalg.factor_fn(node)(theta, x, diag_noise)
        # XLA's cholesky reports failure through NaNs rather than raising;
        # surface it as the LinAlgError the GP layer's quiet=... contract
        # expects (reference gp.py:349-359).
        if not bool(np.isfinite(np.asarray(logdet))):
            raise LinAlgError("covariance matrix is not positive definite")
        self._factor = L
        self.log_determinant = float(logdet)
        self.computed = True

    def apply_inverse(self, y, in_place=False):
        """Solve K x = y for a vector or matrix y."""
        result = np.array(linalg.solve_fn(self._factor, np.asarray(y)))
        if in_place and isinstance(y, np.ndarray) and y.shape == result.shape:
            y[...] = result
            return y
        return result

    def dot_solve(self, y):
        """The inner product y^T K^{-1} y (scalar for vector input)."""
        out = np.asarray(linalg.dot_solve_fn(self._factor, np.asarray(y)))
        return float(out) if out.ndim == 0 else out

    def apply_sqrt(self, r):
        """Apply the (upper) Cholesky square root: r @ U."""
        return np.array(linalg.apply_sqrt_fn(self._factor, np.asarray(r)))

    def get_inverse(self):
        """Materialize the dense inverse (gradients/diagnostics only)."""
        return np.array(linalg.inverse_fn(self._factor))
