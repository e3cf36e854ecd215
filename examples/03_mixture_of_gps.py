# -*- coding: utf-8 -*-
"""Separating kernel-mixture components with predict(kernel=...).

Parity with the reference's mixture tutorial: a long-trend ExpSquared plus a
periodic ExpSine2, predicted separately from one joint fit.
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without installing

import george_tpu as george
from george_tpu import kernels


def main():
    np.random.seed(42)
    n = 150
    x = np.sort(np.random.uniform(0, 20, n))
    yerr = 0.05 * np.ones(n)
    trend = 0.5 * x
    seasonal = np.sin(2 * np.pi * x / 3.0)
    y = trend + seasonal + yerr * np.random.randn(n)

    k_trend = 100.0 * kernels.ExpSquaredKernel(50.0)
    k_seasonal = 2.0 * kernels.ExpSine2Kernel(gamma=5.0,
                                              log_period=np.log(3.0)) \
        * kernels.ExpSquaredKernel(100.0)
    gp = george.GP(k_trend + k_seasonal)
    gp.compute(x, yerr)
    print("joint ln-likelihood: {0:.2f}".format(gp.log_likelihood(y)))

    mu_trend = gp.predict(y, x, return_cov=False, kernel=k_trend)
    mu_seasonal = gp.predict(y, x, return_cov=False, kernel=k_seasonal)
    print("trend rms error:    {0:.3f}".format(
        np.sqrt(np.mean((mu_trend - trend) ** 2))))
    print("seasonal rms error: {0:.3f}".format(
        np.sqrt(np.mean((mu_seasonal - seasonal) ** 2))))


if __name__ == "__main__":
    main()
