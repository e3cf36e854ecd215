# -*- coding: utf-8 -*-
"""Defining a new kernel in the YAML DSL at runtime.

Parity with the reference's new-kernel tutorial
(docs/tutorials/new-kernel.rst), minus the C++ recompile: a spec registered
at runtime compiles straight to jitted evaluators.
"""
import numpy as np
import yaml

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

from george_tpu.dsl.specs import _parse_spec, available_kernels
from george_tpu.kernels import _make_kernel_class
import george_tpu.kernels as kernels_module

SPEC = """
name: MyLocalGaussianKernel
kernel_type: 100
stationary: false
params: [x0, log_w]
reparams:
  inv_2w: 0.5 * exp(-log_w)
value: exp(-((x1 - x0) ** 2 + (x2 - x0) ** 2) * inv_2w)
grad:
  x0: 2.0 * exp(-((x1 - x0) ** 2 + (x2 - x0) ** 2) * inv_2w) * inv_2w * ((x1 - x0) + (x2 - x0))
  log_w: exp(-((x1 - x0) ** 2 + (x2 - x0) ** 2) * inv_2w) * ((x1 - x0) ** 2 + (x2 - x0) ** 2) * inv_2w
  x1: -2.0 * exp(-((x1 - x0) ** 2 + (x2 - x0) ** 2) * inv_2w) * (x1 - x0) * inv_2w
  x2: -2.0 * exp(-((x1 - x0) ** 2 + (x2 - x0) ** 2) * inv_2w) * (x2 - x0) * inv_2w
doc: A local Gaussian window kernel (tutorial example).
"""


def main():
    spec = _parse_spec(yaml.safe_load(SPEC), "<inline>")
    available_kernels()[spec.name] = spec
    cls = _make_kernel_class(spec)
    setattr(kernels_module, spec.name, cls)

    k = cls(x0=0.5, log_w=0.1)
    x = np.random.default_rng(0).standard_normal((10, 1))
    K = k.get_value(x)
    print("K[0,0] = {0:.4f}".format(K[0, 0]))
    k.test_gradient(x)       # FD-check hyper gradients
    k.test_x1_gradient(x)    # FD-check input gradients
    print("gradient checks passed")


if __name__ == "__main__":
    main()
