# -*- coding: utf-8 -*-
"""End-to-end tutorial smoke test (parity with reference
tests/test_tutorial.py): the Matern32 + constant model likelihood is finite
and solver-independent."""

import numpy as np

from george_tpu import kernels, GP, BasicSolver, HODLRSolver


def test_tutorial():
    def model(params, t):
        _, _, amp, loc, sig2 = params
        return amp * np.exp(-0.5 * (t - loc) ** 2 / sig2)

    def lnlike(p, t, y, yerr, solver=BasicSolver):
        a, tau = np.exp(p[:2])
        gp = GP(a * kernels.Matern32Kernel(tau) + 0.001, solver=solver)
        gp.compute(t, yerr)
        return gp.log_likelihood(y - model(p, t))

    def lnprior(p):
        lna, lntau, amp, loc, sig2 = p
        if (-5 < lna < 5 and -5 < lntau < 5 and -10 < amp < 10
                and -5 < loc < 5 and 0 < sig2 < 3):
            return 0.0
        return -np.inf

    def lnprob(p, x, y, yerr, **kwargs):
        lp = lnprior(p)
        if not np.isfinite(lp):
            return -np.inf
        return lp + lnlike(p, x, y, yerr, **kwargs)

    np.random.seed(1234)
    x = np.sort(np.random.rand(50))
    yerr = 0.05 + 0.01 * np.random.rand(len(x))
    y = np.sin(x) + yerr * np.random.randn(len(x))
    p = [0, 0, -1.0, 0.1, 0.4]
    assert np.isfinite(lnprob(p, x, y, yerr)), "incorrect result"
    assert np.allclose(
        lnprob(p, x, y, yerr), lnprob(p, x, y, yerr, solver=HODLRSolver)
    ), "inconsistent results between solvers"


def test_first_steps_optimize():
    # The docs' first-steps tutorial: optimize the NLL with scipy and check
    # the published optimum (docs/tutorials/first.rst:117-120).
    from scipy.optimize import minimize

    np.random.seed(1234)
    x = 10 * np.sort(np.random.rand(15))
    yerr = 0.2 * np.ones_like(x)
    y = np.sin(x) + yerr * np.random.randn(len(x))

    kernel = np.var(y) * kernels.ExpSquaredKernel(0.5)
    gp = GP(kernel)
    gp.compute(x, yerr)
    # Published initial value (first.rst:89-91): -11.82.
    assert np.allclose(gp.log_likelihood(y), -11.8165102869, atol=1e-8)

    result = minimize(
        gp.nll, gp.get_parameter_vector(), jac=gp.grad_nll, args=(y,)
    )
    gp.set_parameter_vector(result.x)
    assert result.success
    # Published optimum (first.rst:117-120).
    assert np.allclose(result.fun, 9.225282556043894, atol=1e-6)
    assert np.allclose(result.x, [-0.48730733, 0.60407551], atol=1e-4)
