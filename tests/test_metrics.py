# -*- coding: utf-8 -*-
"""Metric semantics vs explicit per-pair oracles (parity with reference
tests/test_metrics.py)."""

import numpy as np

from george_tpu import kernels, GP, Metric


def _check_general_metric(metric, N=2, ndim=3):
    kernel = 0.1 * kernels.ExpSquaredKernel(metric, ndim=ndim)

    x = np.random.rand(N, ndim)
    M0 = kernel.get_value(x)

    gp = GP(kernel)
    M1 = gp.get_matrix(x)
    assert np.allclose(M0, M1)

    # Per-pair oracle: r2 = r^T metric^{-1} r.
    M2 = np.empty((N, N))
    for i in range(N):
        for j in range(N):
            r = x[i] - x[j]
            r2 = np.dot(r, np.linalg.solve(metric, r))
            M2[i, j] = 0.1 * np.exp(-0.5 * r2)
    assert np.allclose(M0, M2)


def test_general_metric(seed=1234, N=2, ndim=3):
    np.random.seed(seed)
    _check_general_metric(np.eye(ndim), N=N, ndim=ndim)

    L = np.random.randn(ndim, ndim)
    L[np.diag_indices(ndim)] = np.exp(L[np.diag_indices(ndim)])
    L[np.triu_indices(ndim, 1)] = 0.0
    _check_general_metric(np.dot(L, L.T), N=N, ndim=ndim)


def test_axis_aligned_metric(seed=1234, N=100, ndim=3):
    np.random.seed(seed)
    kernel = 0.1 * kernels.ExpSquaredKernel(np.ones(ndim), ndim=ndim)

    x = np.random.rand(N, ndim)
    M0 = kernel.get_value(x)

    gp = GP(kernel)
    assert np.allclose(M0, gp.get_matrix(x))

    M2 = 0.1 * np.exp(
        -0.5 * np.sum((x[None, :, :] - x[:, None, :]) ** 2, axis=-1)
    )
    assert np.allclose(M0, M2)


def test_metric_round_trip(seed=42, ndim=3):
    np.random.seed(seed)
    L = np.random.randn(ndim, ndim)
    L[np.diag_indices(ndim)] = np.exp(L[np.diag_indices(ndim)])
    L[np.triu_indices(ndim, 1)] = 0.0
    M = L @ L.T
    metric = Metric(M, ndim=ndim)
    assert np.allclose(metric.to_matrix(), M)

    # Copy construction preserves everything.
    copy = Metric(metric)
    assert copy.metric_type == metric.metric_type
    assert np.allclose(copy.to_matrix(), M)


def test_metric_gradient_through_kernel(seed=5, N=8, ndim=2):
    # FD check of the kernel gradient w.r.t. general-metric parameters.
    np.random.seed(seed)
    L = np.random.randn(ndim, ndim)
    L[np.diag_indices(ndim)] = np.exp(L[np.diag_indices(ndim)])
    L[np.triu_indices(ndim, 1)] = 0.0
    kernel = kernels.ExpSquaredKernel(L @ L.T, ndim=ndim)
    t = np.random.randn(N, ndim)
    kernel.test_gradient(t)
