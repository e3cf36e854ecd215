# -*- coding: utf-8 -*-
"""Kernel zoo finite-difference tests (parity with reference
tests/test_kernels.py: hyperparameter, x1, and x2 gradients over
multi-dimensional inputs, axis subsets, sums, and negative parameters)."""

import numpy as np
import pytest

from george_tpu import kernels, GP


def test_dtype(seed=123):
    np.random.seed(seed)
    kernel = 0.1 * kernels.ExpSquaredKernel(1.5)
    gp = GP(kernel)
    x = np.random.rand(100)
    gp.compute(x, 1e-2)


KERNEL_ZOO = [
    kernels.ConstantKernel(log_constant=0.1),
    kernels.ConstantKernel(log_constant=10.0, ndim=2),
    kernels.ConstantKernel(log_constant=5.0, ndim=5),

    kernels.DotProductKernel(),
    kernels.DotProductKernel(ndim=2),
    kernels.DotProductKernel(ndim=5, axes=0),

    kernels.CosineKernel(log_period=1.0),
    kernels.CosineKernel(log_period=0.5, ndim=2),
    kernels.CosineKernel(log_period=0.5, ndim=2, axes=1),
    kernels.CosineKernel(log_period=0.75, ndim=5, axes=[2, 3]),

    kernels.ExpSine2Kernel(gamma=0.4, log_period=1.0),
    kernels.ExpSine2Kernel(gamma=12.0, log_period=0.5, ndim=2),
    kernels.ExpSine2Kernel(gamma=17.0, log_period=0.5, ndim=2, axes=1),
    kernels.ExpSine2Kernel(gamma=13.7, log_period=-0.75, ndim=5, axes=[2, 3]),
    kernels.ExpSine2Kernel(gamma=-0.7, log_period=0.75, ndim=5, axes=[2, 3]),
    kernels.ExpSine2Kernel(gamma=-10, log_period=0.75),

    kernels.LocalGaussianKernel(log_width=0.5, location=1.0),
    kernels.LocalGaussianKernel(log_width=0.1, location=0.5, ndim=2),
    kernels.LocalGaussianKernel(log_width=1.5, location=-0.5, ndim=2, axes=1),
    kernels.LocalGaussianKernel(log_width=2.0, location=0.75, ndim=5,
                                axes=[2, 3]),

    kernels.LinearKernel(order=0, log_gamma2=0.0),
    kernels.LinearKernel(order=2, log_gamma2=0.0),
    kernels.LinearKernel(order=5, log_gamma2=1.0, ndim=2),
    kernels.LinearKernel(order=3, log_gamma2=-1.0, ndim=5, axes=2),
    kernels.LinearKernel(order=0, log_gamma2=0.0)
    + kernels.LinearKernel(order=1, log_gamma2=-1.0)
    + kernels.LinearKernel(order=2, log_gamma2=-2.0),

    kernels.PolynomialKernel(order=0, log_sigma2=-10.0),
    kernels.PolynomialKernel(order=2, log_sigma2=-10.0),
    kernels.PolynomialKernel(order=2, log_sigma2=0.0),
    kernels.PolynomialKernel(order=5, log_sigma2=1.0, ndim=2),
    kernels.PolynomialKernel(order=3, log_sigma2=-1.0, ndim=5, axes=2),

    12.0 * kernels.ExpSine2Kernel(gamma=0.4, log_period=1.0, ndim=5),
    12.0 * kernels.ExpSquaredKernel(0.4, ndim=3) + 0.1,
]


@pytest.mark.parametrize("kernel", KERNEL_ZOO)
def test_kernel_gradients(kernel, N=20, seed=123, eps=1.32e-6):
    np.random.seed(seed)
    t1 = np.random.randn(N, kernel.ndim)
    kernel.test_gradient(t1, eps=eps)
    kernel.test_gradient(t1, t1[:1], eps=eps)


@pytest.mark.parametrize("kernel", KERNEL_ZOO)
def test_kernel_x_gradients(kernel, N=20, seed=123, eps=1.32e-6):
    np.random.seed(seed)
    t1 = np.random.randn(N, kernel.ndim)
    kernel.test_x1_gradient(t1, eps=eps)
    kernel.test_x1_gradient(t1, np.array(t1[:1]), eps=eps)
    kernel.test_x2_gradient(t1, eps=eps)
    kernel.test_x2_gradient(np.array(t1[:1]), t1, eps=eps)


STATIONARY = [
    (kernels.ExpKernel, {}),
    (kernels.ExpSquaredKernel, {}),
    (kernels.Matern32Kernel, {}),
    (kernels.Matern52Kernel, {}),
    (kernels.RationalQuadraticKernel, dict(log_alpha=np.log(1.0))),
    (kernels.RationalQuadraticKernel, dict(log_alpha=np.log(0.1))),
    (kernels.RationalQuadraticKernel, dict(log_alpha=np.log(10.0))),
]


@pytest.mark.parametrize("kernel_type,kwargs", STATIONARY)
def test_stationary_metric_sweep(kernel_type, kwargs):
    def build(metric, **more):
        return kernel_type(metric=metric, **dict(kwargs, **more))

    def check(kernel):
        test_kernel_gradients(kernel)
        test_kernel_x_gradients(kernel)

    for metric in (0.1, 1.0, 10.0):
        check(build(metric))

    check(build([1.0, 0.1, 10.0], ndim=3))
    check(build(1.0, ndim=3))

    with pytest.raises(ValueError):
        build([1.0, 0.1, 10.0, 500], ndim=3)

    check(build(1.0, ndim=3, axes=2))
    check(build(1.0, ndim=3, axes=2, block=(-0.1, 0.1)))


def test_scalar_promotion_ndim():
    # c * kernel promotes to ConstantKernel(log(c/ndim)): summed over the
    # ndim axes the constant contributes exactly c.
    for ndim in (1, 3):
        k = 5.0 * kernels.ExpSquaredKernel(1.0, ndim=ndim)
        x = np.zeros((2, ndim))
        assert np.allclose(k.get_value(x)[0, 0], 5.0)


def test_numpy_scalar_arithmetic():
    y = np.random.randn(10)
    k = np.var(y) * kernels.ExpSquaredKernel(1.0)
    assert np.allclose(
        k.get_value(np.zeros((1, 1)))[0, 0], np.var(y)
    )
    k2 = kernels.ExpSquaredKernel(1.0) + np.float64(0.5)
    assert np.allclose(k2.get_value(np.zeros((1, 1)))[0, 0], 1.5)


def test_sum_product_dimension_mismatch():
    with pytest.raises(ValueError):
        kernels.ExpSquaredKernel(1.0) + kernels.ExpSquaredKernel(1.0, ndim=2)
    with pytest.raises(ValueError):
        kernels.ExpSquaredKernel(1.0) * kernels.ExpSquaredKernel(1.0, ndim=2)


def test_block_zeroes_outside_window():
    k = kernels.ExpSquaredKernel(1.0, block=(-1.0, 1.0))
    x = np.array([[0.0], [0.5], [3.0]])
    K = k.get_value(x)
    assert K[0, 1] > 0
    assert K[0, 2] == 0.0 and K[2, 2] == 0.0
    g = k.get_gradient(x)
    assert np.all(g[:, 2, :] == 0.0)
