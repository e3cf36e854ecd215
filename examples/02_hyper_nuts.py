# -*- coding: utf-8 -*-
"""Hyperparameter posteriors with in-framework NUTS.

Replaces the reference's external emcee loop (docs/tutorials/hyper.rst)
with vectorized NUTS: hundreds of chains, windowed adaptation, ESS/R-hat
diagnostics — all on-device.
"""
import numpy as np
import jax

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without installing

import george_tpu as george
from george_tpu import kernels
from george_tpu.samplers import build_gp_log_prob, run_mcmc, summary


def main():
    np.random.seed(1234)
    n = 100
    x = np.sort(np.random.uniform(0, 10, n))
    yerr = 0.1 * np.ones(n)
    truth = george.GP(0.5 * kernels.Matern32Kernel(1.5))
    y = truth.sample(x) + yerr * np.random.randn(n)

    gp = george.GP(
        1.0 * kernels.Matern32Kernel(1.0),
        white_noise=np.log(1e-4), fit_white_noise=True,
    )

    # Weakly-informative Gaussian prior: the log-white-noise direction is
    # an improper flat tail to -inf once the jitter is negligible, and no
    # sampler mixes on it without a prior.
    center = jax.numpy.asarray(gp.get_parameter_vector())

    def log_prior(theta):
        return -0.5 * jax.numpy.sum(((theta - center) / 3.0) ** 2)

    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr,
                                         log_prior=log_prior)

    key = jax.random.PRNGKey(0)
    z0 = theta0 + 0.1 * jax.random.normal(key, (64, len(theta0)))
    # block_size keeps each device invocation bounded on tunneled or
    # preemptible backends; identical math and RNG stream.
    steps = int(os.environ.get("EX_STEPS", 400))
    res = run_mcmc(log_prob, z0, key, num_warmup=steps, num_samples=steps,
                   block_size=100)

    stats = summary(res.samples)
    names = gp.get_parameter_names()
    for i, name in enumerate(names):
        print("{0:28s} mean={1:+.3f} std={2:.3f} ess={3:.0f} rhat={4:.3f}"
              .format(name, float(stats["mean"][i]), float(stats["std"][i]),
                      float(stats["ess"][i]), float(stats["rhat"][i])))
    print("divergence fraction:", float(res.diverging.mean()))

    # The same posterior with ChEES-HMC — the accelerator-native sampler
    # (shared adapted trajectory, whole batch in lockstep; ~7x the ESS/s of
    # NUTS on the benchmark config).
    res_c = run_mcmc(log_prob, z0, key, algorithm="chees",
                     num_warmup=steps, num_samples=steps, block_size=100)
    stats_c = summary(res_c.samples)
    for i, name in enumerate(names):
        print("[chees] {0:20s} mean={1:+.3f} std={2:.3f} ess={3:.0f}"
              .format(name, float(stats_c["mean"][i]),
                      float(stats_c["std"][i]), float(stats_c["ess"][i])))


if __name__ == "__main__":
    main()
