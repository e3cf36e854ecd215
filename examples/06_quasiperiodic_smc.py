# -*- coding: utf-8 -*-
"""SMC over the multimodal period posterior of a quasi-periodic GP.

Benchmark config #3: an ExpSine2 x ExpSquared kernel on an irregularly
sampled oscillating series.  The period posterior has harmonic aliases;
tempered SMC populates the modes where a single HMC chain would stick.
"""
import numpy as np
import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without installing

import george_tpu as george
from george_tpu import kernels
from george_tpu.samplers import build_gp_log_prob
from george_tpu.samplers.smc import run_smc


def main():
    rng = np.random.default_rng(8)
    n = 80
    true_period = 2.3
    x = np.sort(rng.uniform(0, 18, n))
    yerr = 0.15 * np.ones(n)
    y = np.sin(2 * np.pi * x / true_period) \
        + yerr * rng.standard_normal(n)

    kernel = 1.0 * kernels.ExpSine2Kernel(
        gamma=3.0, log_period=np.log(2.0)
    ) * kernels.ExpSquaredKernel(100.0)
    gp = george.GP(kernel, white_noise=np.log(1e-4), fit_white_noise=True)
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr)
    dim = len(theta0)

    # Initial cloud: broad Gaussian around the rough guess.
    scale = jnp.asarray([1.0, 1.0, 0.8, 1.0, 1.0][:dim])

    def log_init(z):
        d = (z - theta0) / scale
        return -0.5 * jnp.sum(d * d) - jnp.sum(jnp.log(scale)) \
            - 0.5 * dim * jnp.log(2 * jnp.pi)

    key = jax.random.PRNGKey(0)
    n_particles = int(os.environ.get("EX_PARTICLES", 2000))
    particles0 = theta0 + scale * jax.random.normal(key, (n_particles, dim))
    # (This run uses the default random-walk mutations; passing
    # mutation="hmc" would swap in gradient-based Metropolis-HMC instead —
    # better decorrelation per step on smooth posteriors.)
    res = run_smc(log_prob, log_init, particles0, key, num_mutations=8)

    names = gp.get_parameter_names()
    i_period = next(
        i for i, n in enumerate(names) if n.endswith("log_period")
    )
    periods = np.exp(np.asarray(res.particles[:, i_period]))
    print("stages: {0}, acceptance: {1:.2f}, logZ: {2:.1f}".format(
        int(res.num_stages), float(res.acceptance),
        float(res.log_evidence)))
    print("period posterior: median {0:.3f} (true {1})".format(
        np.median(periods), true_period))
    hist, edges = np.histogram(periods, bins=30)
    for h, lo in zip(hist, edges):
        if h > 20:
            print("  mode near P={0:.2f}: {1} particles".format(lo, h))


if __name__ == "__main__":
    main()
