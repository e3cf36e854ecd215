# -*- coding: utf-8 -*-
"""The Gaussian Process object.

API-compatible with the reference GP (/root/reference/src/george/gp.py):
``compute`` / ``log_likelihood`` / ``grad_log_likelihood`` / ``predict`` /
``sample`` / ``sample_conditional`` / ``apply_inverse`` / ``get_matrix`` plus
the full modeling-protocol parameter surface, the dirty-flag recompute
contract, and the alpha cache keyed on the identity of ``y``.

The numerics are TPU-native: the covariance build, Cholesky factorization,
solves, and the *entire* hyperparameter gradient run as fused jitted XLA
programs.  In particular :meth:`grad_log_likelihood` is one reverse-mode pass
through the Cholesky (O(N^2) memory) instead of the reference's dense
``K^{-1}`` plus (N, N, P) gradient-tensor contraction (gp.py:406-468).

For the sampler-facing *pure functional* interface (no object state, fully
jit/vmap/shard_map-able), see :func:`george_tpu.samplers.build_gp_log_prob`.
"""

import warnings

import numpy as np
import jax.numpy as jnp
from scipy.linalg import LinAlgError

from . import kernels
from .dsl import compiler
from .modeling import ModelSet, ConstantModel
from .ops import linalg
from .solvers import TrivialSolver, BasicSolver
from .utils import multivariate_gaussian_samples

__all__ = ["GP"]

# Diagonal jitter used when sampling without observational uncertainties;
# value matches the reference (gp.py:19).
TINY = 1.25e-12


def _parse_model(model):
    try:
        value = float(model)
    except TypeError:
        return model
    return ConstantModel(value)


def _deprecated(old, new):
    # stacklevel=3: attribute the warning to the caller of the deprecated
    # method, not this helper (and keep distinct once-per-location sites).
    warnings.warn(
        "'{0}' is deprecated. Use '{1}'".format(old, new),
        DeprecationWarning, stacklevel=3,
    )


class GP(ModelSet):
    """The basic Gaussian Process regression object.

    :param kernel: a :class:`kernels.Kernel` (default: EmptyKernel, in which
        case the trivial diagonal solver is used).
    :param fit_kernel: include kernel parameters in the active set
        (default True).
    :param mean: scalar, callable, or modeling-protocol object for the mean
        function (default 0).
    :param fit_mean: include mean parameters in the active set.
    :param white_noise: scalar, callable, or model for the *log* of the white
        noise variance added to the diagonal (default log(TINY)).
    :param fit_white_noise: include white-noise parameters in the active set.
    :param solver: solver class (TrivialSolver / BasicSolver / HODLRSolver).
    :param kwargs: forwarded to the solver constructor.
    """

    def __init__(self, kernel=None, fit_kernel=True, mean=None,
                 fit_mean=None, white_noise=None, fit_white_noise=None,
                 solver=None, **kwargs):
        self._computed = False
        self._alpha = None
        self._y = None

        super(GP, self).__init__([
            ("mean",
             ConstantModel(0.0) if mean is None else _parse_model(mean)),
            ("white_noise",
             ConstantModel(np.log(TINY)) if white_noise is None
             else _parse_model(white_noise)),
            ("kernel",
             kernels.EmptyKernel() if kernel is None else kernel),
        ])

        # A bare scalar mean / white noise should not be fit unless asked.
        if _is_scalar(mean):
            fit_mean = bool(fit_mean)
        if _is_scalar(white_noise):
            fit_white_noise = bool(fit_white_noise)

        # Freeze whatever the caller did not ask to fit; an absent model is
        # always frozen regardless of the flag.
        def off(flag):
            return flag is not None and not flag

        frozen = {
            "kernel": not fit_kernel,
            "mean": mean is None or off(fit_mean),
            "white_noise": white_noise is None or off(fit_white_noise),
        }
        for name, freeze in frozen.items():
            if freeze:
                self.models[name].freeze_all_parameters()

        if solver is None:
            # An absent/empty kernel needs only the diagonal solver.
            empty = kernels.EmptyKernel.kernel_type
            if kernel is None or kernel.kernel_type == empty:
                solver = TrivialSolver
            else:
                solver = BasicSolver
        self.solver_type = solver
        self.solver_kwargs = dict(kwargs)
        self.solver = None

    # -- component access -------------------------------------------------------

    @property
    def mean(self):
        """The mean-function model."""
        return self.models["mean"]

    @property
    def white_noise(self):
        """The log-white-noise-variance model."""
        return self.models["white_noise"]

    def _call_mean(self, x):
        x_in = x[:, 0] if (x.ndim == 2 and x.shape[1] == 1) else x
        mu = np.asarray(self.mean.get_value(x_in)).flatten()
        if not np.all(np.isfinite(mu)):
            raise ValueError(
                "mean function returned NaN or Inf for parameters:\n"
                "{0}".format(self.mean.get_parameter_dict(include_frozen=True))
            )
        return mu

    def _call_mean_gradient(self, x):
        x_in = x[:, 0] if (x.ndim == 2 and x.shape[1] == 1) else x
        mu = self.mean.get_gradient(x_in)
        if np.any(np.isnan(mu)) or np.any(np.isinf(mu)):
            raise ValueError(
                "mean gradient function returned NaN or Inf for parameters:\n"
                "{0}".format(self.mean.get_parameter_dict(include_frozen=True))
            )
        return mu

    def _call_white_noise(self, x):
        x_in = x[:, 0] if (x.ndim == 2 and x.shape[1] == 1) else x
        return np.asarray(self.white_noise.get_value(x_in)).flatten()

    def _call_white_noise_gradient(self, x):
        x_in = x[:, 0] if (x.ndim == 2 and x.shape[1] == 1) else x
        return self.white_noise.get_gradient(x_in)

    # -- computed state -----------------------------------------------------------

    @property
    def computed(self):
        """True if the factorization is current w.r.t. the parameters."""
        return (
            self._computed
            and self.solver.computed
            and not self.kernel.dirty
        )

    @computed.setter
    def computed(self, v):
        self._computed = v
        if v:
            self.kernel.dirty = False

    def parse_samples(self, t):
        """Coerce inputs to a C-contiguous f64 (nsamples, ndim) array.

        1-D inputs are promoted to a single column; the trailing dimension
        must match the kernel's ``ndim``.
        """
        t = np.ascontiguousarray(t, dtype=np.float64)
        if t.ndim == 0:
            t = t[None]
        if t.ndim == 1:
            t = t[:, None]
        if t.ndim != 2 or t.shape[1] != self.kernel.ndim:
            raise ValueError("Dimension mismatch")
        return t

    def _check_dimensions(self, y, check_dim=True):
        n = self._x.shape[0]
        y = np.atleast_1d(y)
        if check_dim and y.ndim > 1:
            raise ValueError("The predicted dimension must be 1-D")
        if len(y) != n:
            raise ValueError("Dimension mismatch")
        return y

    def _residual(self, y):
        """Mean-subtracted observations as a fresh f64 vector."""
        r = self._check_dimensions(y) - self._call_mean(self._x)
        return np.ascontiguousarray(r, dtype=np.float64)

    def _compute_alpha(self, y, cache):
        """K^{-1} (y - mu), optionally cached on the identity of ``y``."""
        if not cache:
            return self.solver.apply_inverse(
                self._residual(y), in_place=True
            ).ravel()
        stale = self._alpha is None or not np.array_equiv(y, self._y)
        if stale:
            self._y = y
            self._alpha = self.solver.apply_inverse(
                self._residual(y), in_place=True
            ).ravel()
        return self._alpha

    # -- factorization ---------------------------------------------------------------

    def compute(self, x, yerr=0.0, **kwargs):
        """Factorize K(x, x) + diag(yerr^2 + exp(white_noise))."""
        self._x = self.parse_samples(x)
        n = self._x.shape[0]
        yerr = np.asarray(yerr, dtype=np.float64)
        if yerr.ndim:
            yerr = self._check_dimensions(yerr)
        self._yerr2 = np.ascontiguousarray(
            np.broadcast_to(yerr, (n,)) ** 2, dtype=np.float64
        )

        # The diagonal handed to the solver folds the white-noise model in
        # with the observational variances.
        noise = self._yerr2 + np.exp(self._call_white_noise(self._x))
        self.solver = self.solver_type(self.kernel, **self.solver_kwargs)
        self.solver.compute(self._x, np.sqrt(noise), **kwargs)

        self._const = -0.5 * (
            n * np.log(2 * np.pi) + self.solver.log_determinant
        )
        self.computed = True
        self._alpha = None

    def recompute(self, quiet=False, **kwargs):
        """Refactorize if the parameters changed since the last compute."""
        if not self.computed:
            if not (hasattr(self, "_x") and hasattr(self, "_yerr2")):
                raise RuntimeError("You need to compute the model first")
            try:
                self.compute(self._x, np.sqrt(self._yerr2), **kwargs)
            except (ValueError, LinAlgError):
                if quiet:
                    return False
                raise
        return True

    # -- likelihood ---------------------------------------------------------------------

    def log_likelihood(self, y, quiet=False):
        """Marginalized log-likelihood of ``y`` under the GP model."""
        if not self.recompute(quiet=quiet):
            return -np.inf
        y = self._check_dimensions(y)
        try:
            r = self._residual(y)
        except ValueError:
            # A NaN/Inf mean evaluation; dimension errors surfaced above.
            if quiet:
                return -np.inf
            raise
        ll = self._const - 0.5 * self.solver.dot_solve(r)
        return ll if np.isfinite(ll) else -np.inf

    def grad_log_likelihood(self, y, quiet=False):
        """Gradient of the log-likelihood w.r.t. the active parameters.

        Ordering matches :meth:`get_parameter_vector`: mean, white noise,
        kernel.  Kernel and white-noise terms come from a single reverse-mode
        pass (see ops/linalg.grad_core_fn); the mean term is the analytic
        (d mu / d theta) @ alpha contraction.
        """
        if not self.recompute(quiet=quiet):
            return np.zeros(len(self), dtype=np.float64)

        y = self._check_dimensions(y)
        try:
            r = self._residual(y)
        except ValueError:
            if quiet:
                return np.zeros(len(self), dtype=np.float64)
            raise

        node = self.kernel.spec_node()
        theta = self.kernel.get_parameter_vector(include_frozen=True)
        wn_vec = self._call_white_noise(self._x)
        wn_projected = False

        from .solvers.state_space import StateSpaceSolver
        if isinstance(self.solver, StateSpaceSolver):
            # O(N) reverse-mode pass through the Kalman filter instead of
            # the O(N^2) dense core; sorted order in, original order out.
            from .ops.state_space import state_space_grad_core_fn
            order = self.solver._order
            g_theta, g_wn_sorted, alpha_sorted = (
                np.asarray(v) for v in state_space_grad_core_fn(node)(
                    theta, wn_vec[order], self.solver._t, r[order],
                    self._yerr2[order],
                )
            )
            inv = self.solver._inv_order
            g_wn_vec = g_wn_sorted[inv]
            alpha = alpha_sorted[inv]
        elif hasattr(self.solver, "grad_core"):
            # Factorization-aware path (e.g. HODLR): forward mode through
            # the solver's own structure, never materializing N x N.  The
            # white-noise chain rule runs in-program (one jvp direction per
            # active noise parameter), so the solver hands back the
            # already-projected white-noise gradient.
            if len(self.white_noise):
                wn_dirs = np.atleast_2d(
                    self._call_white_noise_gradient(self._x)
                )
            else:
                wn_dirs = None
            # Each jvp direction is a full factorization sweep: restrict
            # the kernel sweeps to the active (unfrozen) parameters.
            g_theta, g_wn_vec, alpha = self.solver.grad_core(
                node, theta, wn_vec, r, self._yerr2, wn_dirs,
                tuple(np.flatnonzero(self.kernel.unfrozen_mask)),
            )
            wn_projected = True
        else:
            g_theta, g_wn_vec, alpha = (
                np.asarray(v) for v in linalg.grad_core_fn(node)(
                    theta, wn_vec, self._x, r, self._yerr2
                )
            )

        grad = np.empty(len(self))
        n = 0

        n_mean = len(self.mean)
        if n_mean:
            try:
                mu_grad = self._call_mean_gradient(self._x)
            except ValueError:
                if quiet:
                    return np.zeros(len(self), dtype=np.float64)
                raise
            grad[n:n + n_mean] = np.dot(mu_grad, alpha)
            n += n_mean

        n_wn = len(self.white_noise)
        if n_wn:
            if wn_projected:
                grad[n:n + n_wn] = g_wn_vec      # already (d wn/d theta) @ g
            else:
                wn_grad = np.atleast_2d(
                    self._call_white_noise_gradient(self._x)
                )
                grad[n:n + n_wn] = wn_grad @ g_wn_vec
            n += n_wn

        n_k = len(self.kernel)
        if n_k:
            grad[n:n + n_k] = g_theta[self.kernel.unfrozen_mask]

        return grad

    def lnlikelihood(self, y, quiet=False):
        _deprecated("lnlikelihood", "log_likelihood")
        return self.log_likelihood(y, quiet=quiet)

    def grad_lnlikelihood(self, y, quiet=False):
        _deprecated("grad_lnlikelihood", "grad_log_likelihood")
        return self.grad_log_likelihood(y, quiet=quiet)

    def nll(self, vector, y, quiet=True):
        """Negative log-likelihood at ``vector`` (for scipy optimizers)."""
        self.set_parameter_vector(vector)
        if not np.isfinite(self.log_prior()):
            return np.inf
        return -self.log_likelihood(y, quiet=quiet)

    def grad_nll(self, vector, y, quiet=True):
        """Gradient of :meth:`nll` at ``vector``."""
        self.set_parameter_vector(vector)
        if not np.isfinite(self.log_prior()):
            return np.zeros(len(vector))
        return -self.grad_log_likelihood(y, quiet=quiet)

    # -- prediction -----------------------------------------------------------------------

    def apply_inverse(self, y):
        """Apply K^{-1} (with the mean subtracted) to a vector or matrix.

        Multi-RHS inputs of shape (N, K) are handled column-wise; the mean
        is broadcast down the leading (data) axis.
        """
        self.recompute(quiet=False)
        r = self._check_dimensions(
            np.array(y, dtype=np.float64, order="F"), check_dim=False
        )
        mu = self._call_mean(self._x)
        r -= mu.reshape(mu.shape + (1,) * (r.ndim - 1))
        out = self.solver.apply_inverse(r, in_place=True)
        return out.ravel() if r.ndim == 1 else out

    def predict(self, y, t, return_cov=True, return_var=False, cache=True,
                kernel=None):
        """Conditional predictive distribution at test points ``t``.

        Returns ``mu``, ``(mu, cov)``, or ``(mu, var)`` depending on
        ``return_cov`` / ``return_var``.  Passing ``kernel=`` computes the
        cross terms with a different kernel (for separating the predictions
        of kernel mixtures).
        """
        self.recompute()
        xs = self.parse_samples(t)
        cross = self.kernel if kernel is None else kernel

        a = self._compute_alpha(y, cache)
        Ks = cross.get_value(xs, self._x)            # (M, N) cross-cov
        mean_pred = Ks @ a + self._call_mean(xs)
        if not (return_cov or return_var):
            return mean_pred

        # One multi-RHS solve W = K^{-1} Ks^T serves both output forms.
        W = self.solver.apply_inverse(Ks.T)
        if return_var:
            diag_prior = cross.get_value(xs, diag=True)
            return mean_pred, diag_prior - np.einsum("ij,ji->i", Ks, W)
        return mean_pred, cross.get_value(xs) - Ks @ W

    def predictor(self, y):
        """Build a fast repeated-prediction closure for fixed training data.

        Returns ``f(t, return_var=True) -> (mu, var)`` where the cross-
        covariance, solve, and variance run as one jitted program per test
        shape.  The serving-path complement to :meth:`predict` (which
        mirrors the reference's stateful host flow).
        """
        self.recompute()
        alpha = jnp.asarray(self._compute_alpha(y, True))
        node = self.kernel.spec_node()
        theta = jnp.asarray(self.kernel.get_parameter_vector(
            include_frozen=True
        ))
        x_train = jnp.asarray(self._x)
        L = getattr(self.solver, "_factor", None)
        if L is None:
            raise NotImplementedError(
                "predictor() requires a dense-factor solver"
            )
        value = linalg.predict_fn(node)
        diag_fn = compiler.kernel_diag_fn(node)

        def predict_fast(t, return_var=True):
            xs = np.ascontiguousarray(
                self.parse_samples(t), dtype=np.float64
            )
            mu, Kxs, KinvKxs = value(theta, x_train, L, alpha, xs)
            mu = np.asarray(mu) + self._call_mean(xs)
            if not return_var:
                return mu
            var = np.asarray(diag_fn(theta, xs, xs)) - np.asarray(
                jnp.sum(Kxs * KinvKxs.T, axis=1)
            )
            return mu, var

        return predict_fast

    def sample_conditional(self, y, t, size=1):
        """Draw samples from the predictive conditional distribution."""
        mu, cov = self.predict(y, t)
        return multivariate_gaussian_samples(cov, size, mean=mu)

    def sample(self, t=None, size=1):
        """Draw samples from the GP prior."""
        if t is None:
            # Ride the computed factorization: draws = mean + z sqrt(K).
            self.recompute()
            z = np.random.randn(size, self._x.shape[0])
            draws = self.solver.apply_sqrt(z) + self._call_mean(self._x)
            return draws[0] if size == 1 else draws

        xs = self.parse_samples(t)
        cov = self.get_matrix(xs)
        cov.flat[:: len(cov) + 1] += TINY      # jitter the diagonal
        return multivariate_gaussian_samples(
            cov, size, mean=self._call_mean(xs)
        )

    def get_matrix(self, x1, x2=None):
        """The bare covariance matrix at coordinates x1 (x cross x2)."""
        a = self.parse_samples(x1)
        if x2 is not None:
            return self.kernel.get_value(a, self.parse_samples(x2))
        return self.kernel.get_value(a)

    # -- modeling-protocol synonyms ----------------------------------------------------------

    def get_value(self, *args, **kwargs):
        """Synonym for :meth:`log_likelihood` (modeling protocol)."""
        return self.log_likelihood(*args, **kwargs)

    def get_gradient(self, *args, **kwargs):
        """Synonym for :meth:`grad_log_likelihood` (modeling protocol)."""
        return self.grad_log_likelihood(*args, **kwargs)


def _is_scalar(value):
    try:
        float(value)
    except TypeError:
        return False
    return value is not None
