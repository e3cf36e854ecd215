# -*- coding: utf-8 -*-
"""Modeling-protocol tests (behavioral parity with reference
tests/test_modeling.py)."""

import numpy as np
import pytest

from george_tpu import GP, kernels
from george_tpu.modeling import Model, ConstantModel, CallableModel
from george_tpu.utils import check_gradient


class LinearWhiteNoise(Model):
    parameter_names = ("m", "b")

    def get_value(self, x):
        return self.m * x + self.b

    @Model.parameter_sort
    def compute_gradient(self, x):
        return dict(m=x, b=np.ones(len(x)))


def test_constant_mean():
    check_gradient(ConstantModel(5.0), np.zeros(4))


def test_callable_mean():
    check_gradient(CallableModel(lambda x: 5.0 * x), np.zeros(4))


def test_gp_mean(seed=1234):
    np.random.seed(seed)
    x = np.random.uniform(0, 5)
    y = 5 + np.sin(x)
    gp = GP(10.0 * kernels.ExpSquaredKernel(1.3), mean=5.0, fit_mean=True)
    gp.compute(x)
    check_gradient(gp, y)


def test_gp_callable_mean(seed=1234):
    np.random.seed(seed)
    x = np.random.uniform(0, 5)
    y = 5 + np.sin(x)
    gp = GP(10.0 * kernels.ExpSquaredKernel(1.3),
            mean=CallableModel(lambda x: 5.0 * x))
    gp.compute(x)
    check_gradient(gp, y)


def test_gp_white_noise(seed=1234):
    np.random.seed(seed)
    x = np.random.uniform(0, 5)
    y = 5 + np.sin(x)
    gp = GP(10.0 * kernels.ExpSquaredKernel(1.3), mean=5.0, fit_mean=True,
            white_noise=0.1, fit_white_noise=True)
    gp.compute(x)
    check_gradient(gp, y)


def test_gp_callable_white_noise(seed=1234):
    np.random.seed(seed)
    x = np.random.uniform(0, 5)
    y = 5 + np.sin(x)
    gp = GP(10.0 * kernels.ExpSquaredKernel(1.3), mean=5.0,
            white_noise=LinearWhiteNoise(-6, 0.01), fit_white_noise=True)
    gp.compute(x)
    check_gradient(gp, y)

    gp.freeze_parameter("white_noise:m")
    check_gradient(gp, y)


def test_parameters():
    kernel = 10 * kernels.ExpSquaredKernel(1.0)
    kernel += 0.5 * kernels.RationalQuadraticKernel(log_alpha=0.1, metric=5.0)
    gp = GP(kernel, white_noise=LinearWhiteNoise(1.0, 0.1))

    n = len(gp.get_parameter_vector())
    assert n == len(gp.get_parameter_names())
    assert n - 2 == len(kernel.get_parameter_names())

    gp.freeze_parameter(gp.get_parameter_names()[0])
    assert n - 1 == len(gp.get_parameter_names())
    assert n - 1 == len(gp.get_parameter_vector())

    gp.freeze_all_parameters()
    assert len(gp.get_parameter_names()) == 0
    assert len(gp.get_parameter_vector()) == 0

    gp.kernel.thaw_all_parameters()
    gp.white_noise.thaw_all_parameters()
    assert n == len(gp.get_parameter_vector())
    assert n == len(gp.get_parameter_names())

    assert np.allclose(kernel[0], np.log(10.0))


def test_bounds():
    kernel = 10 * kernels.ExpSquaredKernel(1.0, metric_bounds=[(None, 4.0)])
    kernel += 0.5 * kernels.RationalQuadraticKernel(log_alpha=0.1, metric=5.0)
    gp = GP(kernel, white_noise=LinearWhiteNoise(1.0, 0.1))

    assert len(gp.get_parameter_bounds()) == len(gp.get_parameter_vector())
    gp.freeze_all_parameters()
    gp.thaw_parameter("white_noise:m")
    assert len(gp.get_parameter_bounds()) == len(gp.get_parameter_vector())

    with pytest.raises(ValueError):
        kernels.ExpSine2Kernel(gamma=0.1, log_period=5.0, bounds=[10.0])


def test_log_prior_bounds():
    m = ConstantModel(1.0, bounds=[(0.0, 2.0)])
    assert np.isfinite(m.log_prior())
    m.set_parameter_vector([5.0])
    assert m.log_prior() == -np.inf
    assert not m.check_parameter_vector([5.0])
    assert m.check_parameter_vector([1.5])


def test_parameter_dict_and_named_access():
    m = LinearWhiteNoise(2.0, 3.0)
    assert m.get_parameter_dict() == {"m": 2.0, "b": 3.0}
    assert m["m"] == 2.0
    m["b"] = -1.0
    assert m.get_parameter("b") == -1.0
    m.freeze_parameter("m")
    assert m.get_parameter_names() == ("b",)
    assert m.full_size == 2 and m.vector_size == 1
