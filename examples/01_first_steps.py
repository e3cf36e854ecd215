# -*- coding: utf-8 -*-
"""First steps: fit a 1-D GP to noisy data and optimize the hyperparameters.

Parity with the reference's first-steps tutorial (docs/tutorials/first.rst):
model, compute, predict, then scipy optimization of the NLL with the
analytic gradient.
"""
import numpy as np
from scipy.optimize import minimize

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without installing

import george_tpu as george
from george_tpu import kernels


def main():
    np.random.seed(1234)
    x = 10 * np.sort(np.random.rand(15))
    yerr = 0.2 * np.ones_like(x)
    y = np.sin(x) + yerr * np.random.randn(len(x))

    kernel = np.var(y) * kernels.ExpSquaredKernel(0.5)
    gp = george.GP(kernel)
    gp.compute(x, yerr)
    print("initial ln-likelihood: {0:.2f}".format(gp.log_likelihood(y)))

    t = np.linspace(0, 10, 500)
    mu, var = gp.predict(y, t, return_var=True)
    print("predictive band width at t=5: {0:.3f}".format(
        2 * np.sqrt(var[250])))

    result = minimize(gp.nll, gp.get_parameter_vector(),
                      jac=gp.grad_nll, args=(y,))
    gp.set_parameter_vector(result.x)
    print("optimized NLL (scipy): {0:.6f}".format(result.fun))
    print("parameters:", gp.get_parameter_dict())

    # The same optimization fully on device: the whole L-BFGS run is one
    # jitted XLA program (and restarts batch under vmap — see
    # george_tpu.optimize.minimize(restarts=...)).
    gp.set_parameter_vector(np.log([np.var(y), 0.5]))
    res = george.optimize.minimize(gp, y)
    print("optimized NLL (on-device L-BFGS): {0:.6f} "
          "in {1} iterations".format(res.fun, res.nit))


if __name__ == "__main__":
    main()
