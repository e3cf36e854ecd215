# -*- coding: utf-8 -*-
"""Small host-side helpers (sampling, ordering, gradient checking).

API-compatible with /root/reference/src/george/utils.py.
"""

import numpy as np
from scipy.spatial import cKDTree

__all__ = [
    "multivariate_gaussian_samples",
    "nd_sort_samples",
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
    """Order N-d samples by distance from the first sample via a KD-tree.

    Used to make multi-dimensional inputs friendlier to hierarchical
    (HODLR-style) solvers, which want nearby points adjacent in index space.
    """
    assert len(samples.shape) == 2
    tree = cKDTree(samples)
    _, inds = tree.query(samples[0], k=len(samples))
    return inds


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
