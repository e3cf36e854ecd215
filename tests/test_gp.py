# -*- coding: utf-8 -*-
"""GP-level tests (parity with reference tests/test_gp.py): gradient vs
centered differences, prediction vs dense oracle, alpha-cache behavior,
apply_inverse with vector and matrix right-hand sides."""

from itertools import product

import numpy as np
import pytest

from george_tpu import kernels, GP, BasicSolver, HODLRSolver

SOLVERS = [BasicSolver, HODLRSolver]


def _solver_kwargs(solver, tol=1e-8):
    return {"tol": tol} if solver == HODLRSolver else {}


@pytest.mark.parametrize(
    "solver,white_noise", product(SOLVERS, [None, 0.1])
)
def test_gradient(solver, white_noise, seed=123, N=305, ndim=3, eps=1.32e-3):
    np.random.seed(seed)

    kernel = 1.0 * kernels.ExpSquaredKernel(0.5, ndim=ndim)
    kwargs = _solver_kwargs(solver)
    if white_noise is not None:
        kwargs.update(white_noise=white_noise, fit_white_noise=True)
    gp = GP(kernel, solver=solver, **kwargs)

    x = np.random.rand(N, ndim)
    x = x[np.argsort(x[:, 0])]
    y = gp.sample(x)
    gp.compute(x, yerr=0.1)

    grad0 = gp.grad_log_likelihood(y)
    vector = gp.get_parameter_vector()
    for i, v in enumerate(vector):
        vector[i] = v + eps
        gp.set_parameter_vector(vector)
        lp = gp.log_likelihood(y)
        vector[i] = v - eps
        gp.set_parameter_vector(vector)
        lm = gp.log_likelihood(y)
        vector[i] = v
        gp.set_parameter_vector(vector)
        fd = 0.5 * (lp - lm) / eps
        assert np.abs(fd - grad0[i]) < 5 * eps, (
            "gradient mismatch in dimension {0} ({1}): |{2}|".format(
                i, solver.__name__, np.abs(fd - grad0[i])
            )
        )


@pytest.mark.parametrize("solver", SOLVERS)
def test_prediction(solver, seed=42):
    np.random.seed(seed)

    kernel = kernels.ExpSquaredKernel(1.0)
    gp = GP(kernel, solver=solver, white_noise=0.0,
            **_solver_kwargs(solver))

    x0 = np.linspace(-10, 10, 500)
    x = np.sort(np.random.uniform(-10, 10, 300))
    gp.compute(x)

    y = np.sin(x)
    mu, _ = gp.predict(y, x0)

    Kstar = gp.get_matrix(x0, x)
    K = gp.get_matrix(x)
    K[np.diag_indices_from(K)] += 1.0
    mu0 = np.dot(Kstar, np.linalg.solve(K, y))
    assert np.allclose(mu, mu0)


def test_repeated_prediction_cache():
    kernel = kernels.ExpSquaredKernel(1.0)
    gp = GP(kernel)

    x = np.array((-1, 0, 1))
    gp.compute(x)

    t = np.array((-0.5, 0.3, 1.2))

    y = x / x.std()
    mu0, mu1 = (gp.predict(y, t, return_cov=False) for _ in range(2))
    assert np.array_equal(mu0, mu1), \
        "identical training data must give identical predictions"

    y2 = 2 * y
    mu2 = gp.predict(y2, t, return_cov=False)
    assert not np.array_equal(mu0, mu2), \
        "different training data must give different predictions"

    a0 = gp._alpha
    gp.kernel[0] += 0.1
    gp.recompute()
    gp._compute_alpha(y2, True)
    a1 = gp._alpha
    assert not np.allclose(a0, a1), \
        "different parameters must give different alphas"

    mu, cov = gp.predict(y2, t)
    _, var = gp.predict(y2, t, return_var=True)
    assert np.allclose(np.diag(cov), var), \
        "predictive variance must equal the diagonal of the covariance"


@pytest.mark.parametrize("solver", SOLVERS)
def test_apply_inverse(solver, seed=1234, N=201, yerr=0.1):
    np.random.seed(seed)

    kernel = 1.0 * kernels.ExpSquaredKernel(0.5)
    gp = GP(kernel, solver=solver, **_solver_kwargs(solver, tol=1e-10))

    x = np.sort(np.random.rand(N))
    y = gp.sample(x)
    gp.compute(x, yerr=yerr)

    K = gp.get_matrix(x)
    K[np.diag_indices_from(K)] += yerr ** 2

    b1 = np.linalg.solve(K, y)
    b2 = gp.apply_inverse(y)
    assert np.allclose(b1, b2)

    y = gp.sample(x, size=5).T
    b1 = np.linalg.solve(K, y)
    b2 = gp.apply_inverse(y)
    assert np.allclose(b1, b2)


@pytest.mark.parametrize("solver", SOLVERS)
def test_predict_single(solver, seed=1234, N=201, yerr=0.1):
    np.random.seed(seed)
    kernel = 1.0 * kernels.ExpSquaredKernel(0.5)
    gp = GP(kernel, solver=solver, **_solver_kwargs(solver))

    x = np.sort(np.random.rand(N))
    y = gp.sample(x)
    gp.compute(x, yerr=yerr)
    mu0, var0 = gp.predict(y, [0.0], return_var=True)
    mu, var = gp.predict(y, [0.0, 1.0], return_var=True)
    _, cov = gp.predict(y, [0.0, 1.0])
    assert np.allclose(mu0, mu[0])
    assert np.allclose(var0, var[0])
    assert np.allclose(var0, cov[0, 0])


def test_anchor_log_likelihood():
    # The published correctness anchor from the reference docs
    # (docs/tutorials/scaling.rst:62-76): 133.946394912.
    np.random.seed(1234)
    x = np.sort(np.random.uniform(0, 10, 50000))
    yerr = 0.1 * np.ones_like(x)
    y = np.sin(x)
    kernel = np.var(y) * kernels.ExpSquaredKernel(1.0)
    gp = GP(kernel)
    gp.compute(x[:100], yerr[:100])
    assert abs(gp.log_likelihood(y[:100]) - 133.946394912) < 1e-6


def test_quiet_failure_modes():
    kernel = 1.0 * kernels.ExpSquaredKernel(1.0)
    gp = GP(kernel)
    x = np.linspace(0, 1, 10)
    gp.compute(x, 0.1)
    y = np.sin(x)
    assert np.isfinite(gp.log_likelihood(y))
    # A catastrophically bad parameter setting should go -inf when quiet.
    gp.set_parameter_vector([1e300, 1e300])
    assert gp.log_likelihood(y, quiet=True) == -np.inf
    assert np.all(gp.grad_log_likelihood(y, quiet=True) == 0.0)


def test_predict_kernel_mixture(seed=99, N=40):
    # predict(kernel=...) separates mixture components (gp.py:482-545).
    np.random.seed(seed)
    k1 = 1.0 * kernels.ExpSquaredKernel(1.0)
    k2 = 0.5 * kernels.CosineKernel(log_period=0.5)
    gp = GP(k1 + k2)
    x = np.sort(np.random.uniform(0, 8, N))
    y = np.sin(x)
    gp.compute(x, 0.1)
    mu_full = gp.predict(y, x, return_cov=False)
    mu_1 = gp.predict(y, x, return_cov=False, kernel=k1)
    mu_2 = gp.predict(y, x, return_cov=False, kernel=k2)
    # Component predictions sum to the full prediction (zero mean function).
    assert np.allclose(mu_1 + mu_2, mu_full)
