# -*- coding: utf-8 -*-
"""Small host-side helpers (sampling, ordering, gradient checking).

API-compatible with /root/reference/src/george/utils.py.
"""

import numpy as np

from . import native

__all__ = [
    "multivariate_gaussian_samples",
    "nd_sort_samples",
    "kd_sort_samples",
    "hilbert_sort_samples",
    "numerical_gradient",
    "check_gradient",
]


def multivariate_gaussian_samples(matrix, N, mean=None):
    """Draw ``N`` samples from N(mean, matrix); squeezed when ``N == 1``."""
    if mean is None:
        mean = np.zeros(len(matrix))
    samples = np.random.multivariate_normal(mean, matrix, N)
    return samples[0] if N == 1 else samples


def nd_sort_samples(samples):
    """Order N-d samples by distance from the first sample.

    Semantics of the reference's cKDTree ``query(samples[0], k=N)``
    (utils.py:36-56): a sort by distance from the first sample.  Runs in the
    native (C++) ordering runtime when available.  For hierarchical solvers
    prefer :func:`kd_sort_samples`, whose median splits align with the HODLR
    level structure.
    """
    assert len(samples.shape) == 2
    return native.distance_order(samples)


def kd_sort_samples(samples):
    """Recursive median-split ordering — the best HODLR point ordering.

    Splits at n/2 on the widest-spread axis so that every level of the HODLR
    halving separates two spatial clusters (low-rank off-diagonal blocks).
    """
    assert len(samples.shape) == 2
    return native.kd_order(samples)


def hilbert_sort_samples(samples, bits=16):
    """Hilbert space-filling-curve ordering of N-d samples."""
    assert len(samples.shape) == 2
    return native.hilbert_order(samples, bits=bits)


def numerical_gradient(f, x, dx=1.234e-6):
    """Centered finite-difference gradient of a scalar function."""
    g = np.empty_like(x, dtype=float)
    for i in range(len(g)):
        x[i] += dx
        fp = f(x)
        x[i] -= 2 * dx
        fm = f(x)
        x[i] += dx
        g[i] = 0.5 * (fp - fm) / dx
    return g


def check_gradient(obj, *args, **kwargs):
    """Assert a model's gradient against centered finite differences."""
    eps = kwargs.pop("eps", 1.23e-5)
    grad0 = obj.get_gradient(*args, **kwargs)
    vector = obj.get_parameter_vector()
    for i, v in enumerate(vector):
        vector[i] = v + eps
        obj.set_parameter_vector(vector)
        plus = obj.get_value(*args, **kwargs)

        vector[i] = v - eps
        obj.set_parameter_vector(vector)
        minus = obj.get_value(*args, **kwargs)

        vector[i] = v
        obj.set_parameter_vector(vector)

        fd = 0.5 * (plus - minus) / eps
        assert np.allclose(grad0[i], fd), (
            "grad computation failed for '{0}' ({1})".format(
                obj.get_parameter_names()[i], i
            )
        )
