# -*- coding: utf-8 -*-
"""Bayesian-optimization building block: input gradients of the GP mean.

Uses get_x1_gradient (the reference's x1/x2 gradient machinery,
templates/kernels.py:119-133) to climb the posterior-mean surface.
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without installing

import jax

# This example demonstrates finite-difference gradient checks, whose 1e-5
# tolerances assume double precision; pin the x64 CPU backend (numerics
# demo — the accelerator path is exercised by the other examples).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import george_tpu as george
from george_tpu import kernels


def objective(x):
    return -np.sin(3 * x) - x ** 2 + 0.7 * x


def main():
    np.random.seed(3)
    x_obs = np.random.uniform(-2, 2, 12)
    y_obs = objective(x_obs) + 0.01 * np.random.randn(12)

    gp = george.GP(1.0 * kernels.Matern52Kernel(0.5))
    gp.compute(x_obs, 0.01)
    alpha = gp.apply_inverse(y_obs)

    # d mu / d t at a test point, from the kernel's input gradients.
    t = np.array([[0.3]])
    g = gp.kernel.get_x1_gradient(t, gp._x)          # (1, N, 1)
    grad_mu = float(np.einsum("inj,n->j", g, alpha)[0])
    eps = 1e-5
    mu_p = gp.predict(y_obs, (t + eps).ravel(), return_cov=False)[0]
    mu_m = gp.predict(y_obs, (t - eps).ravel(), return_cov=False)[0]
    fd = (mu_p - mu_m) / (2 * eps)
    print("analytic d mu/dt = {0:+.6f}, finite diff = {1:+.6f}".format(
        grad_mu, fd))
    assert abs(grad_mu - fd) < 1e-5

    # Gradient ascent on the posterior mean finds a local optimum.
    for _ in range(int(os.environ.get("EX_STEPS", 100))):
        g = gp.kernel.get_x1_gradient(t, gp._x)
        t = t + 0.05 * np.einsum("inj,n->j", g, alpha)
    mu = gp.predict(y_obs, t.ravel(), return_cov=False)
    print("local argmax of posterior mean: t={0:+.4f}, mu={1:+.4f}".format(
        float(t[0, 0]), float(mu[0])))


if __name__ == "__main__":
    main()
