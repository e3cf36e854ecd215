# -*- coding: utf-8 -*-
"""Exact O(N) state-space GP inference for time series.

The reference's scaling tutorial (docs/tutorials/scaling.rst) compares the
dense and HODLR solvers.  george_tpu adds a third, exact option for 1-D
Markovian kernels: the GP as a linear-Gaussian state-space model, solved by
Kalman passes — O(N) likelihoods, gradients, predictions, and samples with
*identical* numerics to the dense path.

Run: python examples/07_state_space.py
"""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without installing

import george_tpu as george
from george_tpu import kernels
from george_tpu.solvers import BasicSolver, StateSpaceSolver
from george_tpu.samplers import build_gp_log_prob


def main():
    rng = np.random.default_rng(42)
    n = int(os.environ.get("EX_N", 20000))
    t = np.sort(rng.uniform(0, 100, n))
    yerr = 0.1 * np.ones(n)
    y = (np.sin(t) + 0.3 * np.cos(3.1 * t)
         + yerr * rng.standard_normal(n))

    kernel = (1.0 * kernels.Matern32Kernel(2.0)
              + 0.3 * kernels.ExpKernel(0.5))

    # GP API with the O(N) solver — same calls, 20k points.
    gp = george.GP(kernel, solver=StateSpaceSolver)
    t0 = time.time()
    gp.compute(t, yerr)
    ll = gp.log_likelihood(y)
    grad = gp.grad_log_likelihood(y)
    print("N = {0}: log-likelihood {1:.3f} in {2:.3f}s (incl. compile)"
          .format(n, ll, time.time() - t0))
    print("grad:", grad)

    # Cross-check a subset against the dense solver.
    m = 500
    gp_d = george.GP(kernel, solver=BasicSolver)
    gp_d.compute(t[:m], yerr[:m])
    gp_s = george.GP(kernel, solver=StateSpaceSolver)
    gp_s.compute(t[:m], yerr[:m])
    print("dense vs state-space at N=500: {0:.9f} vs {1:.9f}".format(
        gp_d.log_likelihood(y[:m]), gp_s.log_likelihood(y[:m])
    ))

    # The sampler hot path picks this representation automatically.
    log_prob, theta0 = build_gp_log_prob(gp, t, y, yerr)  # method="auto"
    v, g = jax.value_and_grad(log_prob)(theta0)
    print("jitted O(N) posterior density:", float(v))

    # O(N) prior sample.
    s = gp.sample(size=2)
    print("prior draws:", s.shape)


if __name__ == "__main__":
    main()
