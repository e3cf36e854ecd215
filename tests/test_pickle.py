# -*- coding: utf-8 -*-
"""Serialization round trips (parity with reference tests/test_pickle.py):
a pickled BasicSolver GP must not need recompute; a pickled HODLR GP must
recompute (its device-side factorization is dropped)."""

import pickle

import numpy as np
import pytest

from george_tpu import GP, kernels, BasicSolver, HODLRSolver


def _fail_compute(*args, **kwargs):
    raise AssertionError("unpickled GP shouldn't need to be computed")


@pytest.mark.parametrize(
    "solver,survives", [(BasicSolver, True), (HODLRSolver, False)]
)
def test_pickle(solver, survives, N=50, seed=123):
    np.random.seed(seed)
    kernel = 0.1 * kernels.ExpSquaredKernel(1.5)
    gp = GP(kernel, solver=solver)
    x = np.random.rand(100)
    gp.compute(x, 1e-2)
    ll0 = gp.log_likelihood(np.sin(x))

    gp = pickle.loads(pickle.dumps(gp, -1))
    if survives:
        gp.compute = _fail_compute
    assert np.allclose(gp.log_likelihood(np.sin(x)), ll0)


def test_pickle_kernel_round_trip():
    k = 0.4 * kernels.Matern32Kernel([1.0, 2.0], ndim=2) \
        + kernels.ExpSine2Kernel(gamma=1.0, log_period=0.5, ndim=2)
    k2 = pickle.loads(pickle.dumps(k, -1))
    assert np.allclose(
        k.get_parameter_vector(), k2.get_parameter_vector()
    )
    x = np.random.default_rng(0).random((7, 2))
    assert np.allclose(k.get_value(x), k2.get_value(x))
