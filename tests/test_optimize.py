# -*- coding: utf-8 -*-
"""On-device L-BFGS hyperparameter optimization.

Oracle pattern: scipy.optimize.minimize over the stateful gp.nll/grad_nll
pair (the reference's documented flow, docs/tutorials/first.rst:95-113) must
agree with the jitted on-device run on the same problem.
"""

import numpy as np
import pytest

import jax

from george_tpu import GP, kernels, optimize


def _first_steps_data():
    np.random.seed(1234)
    x = 10 * np.sort(np.random.rand(15))
    yerr = 0.2 * np.ones_like(x)
    y = np.sin(x) + yerr * np.random.randn(len(x))
    return x, y, yerr


def test_first_steps_on_device():
    # The docs' first-steps tutorial optimum (first.rst:117-120).
    x, y, yerr = _first_steps_data()
    gp = GP(np.var(y) * kernels.ExpSquaredKernel(0.5))
    gp.compute(x, yerr)

    res = optimize.minimize(gp, y, method="dense")
    assert res.success
    assert np.allclose(res.fun, 9.225282556043894)
    # set_params=True wrote the optimum back into the GP.
    assert np.allclose(gp.get_parameter_vector(), res.x)
    assert np.allclose(-gp.log_likelihood(y), res.fun)


def test_matches_scipy_oracle():
    from scipy.optimize import minimize as sp_minimize

    x, y, yerr = _first_steps_data()
    gp = GP(np.var(y) * kernels.Matern32Kernel(2.0))
    gp.compute(x, yerr)
    p0 = gp.get_parameter_vector()

    ref = sp_minimize(gp.nll, p0, jac=gp.grad_nll, args=(y,))
    gp.set_parameter_vector(p0)
    res = optimize.minimize(gp, y, method="dense")
    assert np.allclose(res.fun, ref.fun, rtol=1e-8)


def test_state_space_method_agrees():
    x, y, yerr = _first_steps_data()
    gp = GP(np.var(y) * kernels.Matern32Kernel(2.0))
    gp.compute(x, yerr)
    p0 = gp.get_parameter_vector()

    res_dense = optimize.minimize(gp, y, method="dense")
    gp.set_parameter_vector(p0)
    res_ss = optimize.minimize(gp, y, method="auto")
    assert np.allclose(res_dense.fun, res_ss.fun, rtol=1e-7)
    assert np.allclose(res_dense.x, res_ss.x, atol=1e-4)


def test_restarts_escape_local_minimum():
    # Quasi-periodic data: the period posterior is multimodal, so a start at
    # the wrong harmonic sticks in a local optimum a single L-BFGS run can't
    # leave; vmapped random restarts find the better mode.
    np.random.seed(42)
    x = np.sort(np.random.uniform(0, 20, 80))
    yerr = 0.1 * np.ones_like(x)
    y = np.sin(2 * np.pi * x / 2.3) + yerr * np.random.randn(len(x))

    k = 1.0 * kernels.ExpSine2Kernel(gamma=2.0, log_period=np.log(7.0))
    gp = GP(k)
    gp.compute(x, yerr)

    res0 = optimize.minimize(gp, y, set_params=False)
    res = optimize.minimize(
        gp, y, restarts=32, init_scale=1.5, key=jax.random.key(0),
        set_params=False,
    )
    assert res.fun <= res0.fun + 1e-9
    assert res.fun < res0.fun - 1.0  # strictly better mode


def test_bounds_act_as_barrier():
    x, y, yerr = _first_steps_data()
    # The unconstrained optimum sits at log-metric 0.604 < log(2): with the
    # bound in place (start in-bounds at metric=4) the line-search barrier
    # must keep the iterates feasible.
    k = np.var(y) * kernels.ExpSquaredKernel(
        metric=4.0, metric_bounds=[(np.log(2.0), None)]
    )
    gp = GP(k)
    gp.compute(x, yerr)

    res = optimize.minimize(gp, y, method="dense", tol=1e-6)
    lo = np.log(2.0)
    assert res.x[-1] >= lo - 1e-9
    assert np.isfinite(res.fun)


def test_map_with_custom_prior():
    x, y, yerr = _first_steps_data()
    gp = GP(np.var(y) * kernels.ExpSquaredKernel(0.5))
    gp.compute(x, yerr)

    def log_prior(theta):
        return -0.5 * jax.numpy.sum((theta / 0.5) ** 2)

    res_ml = optimize.minimize(gp, y, method="dense", set_params=False)
    res_map = optimize.minimize(
        gp, y, method="dense", log_prior=log_prior, set_params=False
    )
    # The strong zero-centered prior must pull the optimum toward 0.
    assert np.linalg.norm(res_map.x) < np.linalg.norm(res_ml.x)


def test_explicit_xy_without_compute():
    x, y, yerr = _first_steps_data()
    gp = GP(np.var(y) * kernels.ExpSquaredKernel(0.5))
    with pytest.raises(RuntimeError):
        optimize.minimize(gp, y)
    res = optimize.minimize(gp, y, x=x, yerr=yerr, method="dense")
    assert np.allclose(res.fun, 9.225282556043894)
