# -*- coding: utf-8 -*-
"""Multi-dimensional inputs with subspace metrics, sampled at scale.

BASELINE config #5: a Matern-3/2 kernel acting on a 2-axis *subspace* of
3-D inputs (axes=[0, 2]; axis 1 is ignored), with a fitted constant mean
and white noise.  Posteriors like this have no 1-D state-space form, so
the sampler rides the fused Pallas batched dense value+gradient kernel
(ops/pallas_dense.py) on TPU — thousands of chains, each with its own
N x N Cholesky, in one program per step (~18 ms per batched
value+gradient at 4096 chains x N=128 on one v5e chip).

On CPU the same script runs on the XLA path (config.engine_log notes the
engine choice); the math is identical.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without installing

import george_tpu as george
from george_tpu import kernels
from george_tpu.samplers import build_gp_log_prob, run_mcmc, summary


def main():
    rng = np.random.default_rng(7)
    n = 128
    x = rng.uniform(-3, 8, (n, 3))
    yerr = 0.22 * np.ones(n)
    y = np.sin(x[:, 0]) + 0.3 * np.cos(x[:, 2]) \
        + yerr * rng.standard_normal(n)

    gp = george.GP(
        1.0 * kernels.Matern32Kernel(metric=[1.0, 2.0], ndim=3,
                                     axes=[0, 2]),
        white_noise=np.log(1e-3), fit_white_noise=True,
        mean=0.0, fit_mean=True,
    )
    center = jnp.asarray(gp.get_parameter_vector())

    def log_prior(theta):
        return -0.5 * jnp.sum(((theta - center) / 2.0) ** 2)

    # method="dense" is what config-#5 posteriors get from "auto" anyway
    # (no state-space form); on TPU the fused batch kernel attaches here.
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr, method="dense",
                                         log_prior=log_prior)
    engine = ("fused pallas dense"
              if hasattr(log_prob, "batched_value_and_grad")
              else "XLA batched")
    print("engine:", engine)

    chains = 512 if jax.default_backend() == "tpu" else 32
    key = jax.random.PRNGKey(1)
    z0 = jnp.asarray(theta0)[None, :] + 0.1 * jax.random.normal(
        key, (chains, len(theta0))
    )
    steps = int(os.environ.get("EX_STEPS", 200))
    res = run_mcmc(log_prob, z0, key, num_warmup=steps, num_samples=steps,
                   max_depth=4, block_size=25)
    stats = summary(res.samples)
    names = gp.get_parameter_names()
    print("{0:>42s} {1:>9s} {2:>8s} {3:>8s}".format(
        "parameter", "mean", "std", "rhat"))
    for i, nm in enumerate(names):
        print("{0:>42s} {1:9.3f} {2:8.3f} {3:8.3f}".format(
            nm, float(stats["mean"][i]), float(stats["std"][i]),
            float(stats["rhat"][i])))
    assert float(np.max(np.asarray(stats["rhat"]))) < 1.1


if __name__ == "__main__":
    main()
