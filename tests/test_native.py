# -*- coding: utf-8 -*-
"""Native (C++) ordering runtime + HODLR internal-permutation tests."""

import numpy as np
import pytest

import george_tpu as george
from george_tpu import kernels, native, HODLRSolver
from george_tpu.utils import (
    nd_sort_samples, kd_sort_samples, hilbert_sort_samples,
)


def _mean_step(x, order):
    return np.mean(np.linalg.norm(np.diff(x[order], axis=0), axis=1))


def test_native_builds():
    # The toolchain is present in CI images; the fallback path is exercised
    # separately below.
    assert native.have_native()


@pytest.mark.parametrize("fn", [
    nd_sort_samples, kd_sort_samples, hilbert_sort_samples,
])
def test_orderings_are_permutations(fn):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((257, 3))
    order = np.asarray(fn(x))
    assert np.array_equal(np.sort(order), np.arange(257))


def test_distance_order_semantics():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((100, 2))
    order = nd_sort_samples(x)
    d2 = np.sum((x - x[0]) ** 2, axis=1)
    assert np.all(np.diff(d2[order]) >= 0)
    assert order[0] == 0


def test_locality_orderings_improve_mean_step():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1000, 3))
    base = _mean_step(x, np.arange(1000))
    assert _mean_step(x, kd_sort_samples(x)) < 0.5 * base
    assert _mean_step(x, hilbert_sort_samples(x)) < 0.5 * base


def test_kd_order_halving_clusters():
    # Every level of the kd ordering must split into spatially separated
    # halves: the property the HODLR factorization relies on.
    rng = np.random.default_rng(5)
    x = rng.standard_normal((256, 2))
    order = kd_sort_samples(x)
    left, right = x[order[:128]], x[order[128:]]
    # The split axis separates the halves exactly at the median.
    spread = x.max(axis=0) - x.min(axis=0)
    axis = int(np.argmax(spread))
    assert left[:, axis].max() <= right[:, axis].min() + 1e-12


def test_numpy_fallback_matches_native_kd():
    rng = np.random.default_rng(13)
    x = rng.standard_normal((200, 3))
    a = np.asarray(native.kd_order(x))
    b = np.asarray(native._kd_order_numpy(x))
    # Identical cluster structure at every power-of-two level.
    for size in (100, 50, 25):
        for lo in range(0, 200, size):
            assert set(a[lo:lo + size]) == set(b[lo:lo + size])


def test_hodlr_auto_order_multidim():
    # Unsorted multi-dimensional inputs: the internal kd ordering recovers
    # dense-oracle accuracy where user order would saturate the rank caps.
    rng = np.random.default_rng(42)
    N, ndim = 600, 2
    x = rng.standard_normal((N, ndim))  # deliberately NOT pre-sorted
    yerr = 0.3 * np.ones(N)
    y = np.sin(x.sum(axis=1))

    kernel = 1.0 * kernels.ExpSquaredKernel(2.0, ndim=ndim)
    solver = HODLRSolver(kernel, tol=1e-10, min_size=64, max_rank=180)
    assert solver.order == "auto"
    solver.compute(x, yerr)

    K = kernel.get_value(x)
    K[np.diag_indices_from(K)] += yerr ** 2
    _, lndet = np.linalg.slogdet(K)
    assert abs(solver.log_determinant - lndet) < 1e-3

    b0 = np.linalg.solve(K, y)
    assert np.allclose(solver.apply_inverse(y), b0, atol=1e-3)
    assert np.allclose(solver.dot_solve(y), y @ b0, rtol=1e-3)
    assert np.allclose(solver.get_inverse() @ K, np.eye(N), atol=1e-3)


def test_hodlr_order_none_matches_reference_behaviour():
    # order=None factors in user order, exactly like the reference.
    rng = np.random.default_rng(1)
    N = 400
    x = np.sort(rng.uniform(0, 10, N))[:, None]
    yerr = 0.5 * np.ones(N)
    y = np.sin(x[:, 0])

    kernel = 1.0 * kernels.Matern32Kernel(1.0)
    for order in (None, "auto"):
        solver = HODLRSolver(kernel, tol=1e-10, min_size=50, order=order)
        solver.compute(x, yerr)
        K = kernel.get_value(x)
        K[np.diag_indices_from(K)] += yerr ** 2
        _, lndet = np.linalg.slogdet(K)
        assert abs(solver.log_determinant - lndet) < 1e-6
        assert np.allclose(solver.apply_inverse(y), np.linalg.solve(K, y),
                           atol=1e-6)


def test_gp_with_auto_ordered_hodlr():
    # Full GP round trip (log_likelihood + predict) on shuffled 1-D inputs.
    rng = np.random.default_rng(8)
    N = 500
    x = rng.uniform(0, 10, N)  # unsorted on purpose
    yerr = 0.3 * np.ones(N)
    y = np.sin(x) + yerr * rng.standard_normal(N)

    kernel = 1.0 * kernels.ExpSquaredKernel(1.0)
    gp_h = george.GP(kernel, solver=HODLRSolver, tol=1e-10, seed=42)
    gp_b = george.GP(kernel)
    gp_h.compute(x, yerr)
    gp_b.compute(x, yerr)
    assert np.allclose(gp_h.log_likelihood(y), gp_b.log_likelihood(y),
                       rtol=1e-6)
    t = np.linspace(0, 10, 37)
    mu_h, var_h = gp_h.predict(y, t, return_var=True)
    mu_b, var_b = gp_b.predict(y, t, return_var=True)
    assert np.allclose(mu_h, mu_b, atol=1e-5)
    assert np.allclose(var_h, var_b, atol=1e-5)
