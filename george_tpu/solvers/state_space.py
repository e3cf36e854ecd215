# -*- coding: utf-8 -*-
"""O(N) state-space solver for 1-D Markovian kernels.

A fourth solver the reference does not have (its scaling answers are the
dense Cholesky in solvers/basic.py and the serial C++ HODLR tree in
hodlr.h): for ``Exp`` / ``Matern32`` / ``Matern52`` / ``Cosine`` /
``Constant`` kernels (and sums / constant-scalings thereof) on sorted 1-D
inputs, the GP is an exact linear-Gaussian state-space model and every
solver-protocol operation reduces to Kalman passes:

  * ``log_determinant`` — sum of innovation-variance logs (prediction-error
    decomposition of det K);
  * ``dot_solve``       — sum innov^2 / S from one filter pass;
  * ``apply_inverse``   — the regression identity
    ``K^{-1} y = (y - H x_smoothed) / v`` via an RTS smoother per column;
  * ``apply_sqrt``      — the innovations square root (the time-ordered
    Cholesky factorization K = L S L^T that the filter computes
    implicitly), so ``GP.sample`` is O(N) too.

Same API surface as the other solvers (reference solver protocol,
docs/user/solvers.rst:11-22).  Inputs need not be pre-sorted; the solver
orders them internally and un-permutes results.
"""

import numpy as np

from ..dsl import compiler
from ..ops import state_space as sskf

__all__ = ["StateSpaceSolver"]


class StateSpaceSolver(object):

    def __init__(self, kernel):
        self.kernel = kernel
        node = kernel.spec_node()
        if not sskf.supports_state_space(node):
            raise ValueError(
                "StateSpaceSolver requires a 1-D Markovian kernel "
                "(Exp/Matern32/Matern52/Cosine/Constant sums); got an "
                "unsupported kernel tree"
            )
        self._computed = False
        self._log_det = None
        self._t = None
        self._v = None
        self._order = None
        self._inv_order = None

    @property
    def computed(self):
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

    def _theta(self):
        return self.kernel.get_parameter_vector(include_frozen=True)

    def compute(self, x, yerr):
        x = np.ascontiguousarray(x, dtype=np.float64)
        if x.ndim == 2:
            if x.shape[1] != 1:
                raise ValueError("StateSpaceSolver requires 1-D inputs")
            x = x[:, 0]
        v = np.broadcast_to(
            np.asarray(yerr, dtype=np.float64) ** 2, x.shape
        )
        if not np.all(v > 0):
            raise ValueError(
                "StateSpaceSolver needs strictly positive yerr (the "
                "smoother-based solve divides by the noise variance)"
            )
        order = np.argsort(x, kind="stable")
        self._order = order
        self._inv_order = np.argsort(order)
        self._t = np.ascontiguousarray(x[order])
        self._v = np.ascontiguousarray(v[order])

        import jax
        node = self.kernel.spec_node()
        factor = _factor_cached(node)
        logdet, _ = factor(self._theta(), self._t, self._v)
        logdet = float(np.asarray(logdet))
        if not np.isfinite(logdet):
            from scipy.linalg import LinAlgError
            raise LinAlgError("state-space factorization failed")
        self.log_determinant = logdet
        self.computed = True

    def dot_solve(self, y):
        node = self.kernel.spec_node()
        out = _dot_solve_cached(node)(
            self._theta(), self._t, self._v,
            np.asarray(y, dtype=np.float64)[self._order],
        )
        return float(np.asarray(out))

    def apply_inverse(self, y, in_place=False):
        y_arr = np.asarray(y, dtype=np.float64)
        node = self.kernel.spec_node()
        ys = y_arr[self._order]
        out = np.asarray(_apply_inverse_cached(node)(
            self._theta(), self._t, self._v, ys
        ))[self._inv_order]
        if in_place and isinstance(y, np.ndarray) and y.shape == out.shape:
            y[...] = out
            return y
        return out

    def apply_sqrt(self, r):
        """Map iid normals to draws with covariance K + diag(v), O(N).

        Uses the innovations square root (the time-ordered Cholesky): rows
        of the result have exactly the computed covariance, like the dense
        solver's ``r @ U`` — the factor orientation differs (time order),
        which only matters if the caller depends on the specific U.
        """
        r_arr = np.asarray(r, dtype=np.float64)
        out_sorted = np.asarray(_apply_sqrt_cached(self.kernel.spec_node())(
            self._theta(), self._t, self._v, r_arr
        ))
        return out_sorted[..., self._inv_order]

    def get_inverse(self):
        n = self._t.shape[0]
        return self.apply_inverse(np.eye(n))


# -- cached jitted cores (keyed on the kernel expression tree) ---------------

from functools import lru_cache


@lru_cache(maxsize=None)
def _factor_cached(node):
    import jax
    return jax.jit(sskf.state_space_factor_fn(node))


@lru_cache(maxsize=None)
def _dot_solve_cached(node):
    import jax
    import jax.numpy as jnp
    build = sskf.system_fn(node)

    @jax.jit
    def dot_solve(th, t, v, r):
        sys = build(th, t)
        S, innov, *_ = sskf.kalman_filter(*sys, r, v)
        return jnp.sum(innov * innov / S)

    return dot_solve


@lru_cache(maxsize=None)
def _apply_inverse_cached(node):
    import jax
    return jax.jit(sskf.state_space_apply_inverse_fn(node))


@lru_cache(maxsize=None)
def _apply_sqrt_cached(node):
    import jax
    return jax.jit(sskf.state_space_apply_sqrt_fn(node))
