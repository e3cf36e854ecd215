# -*- coding: utf-8 -*-
"""One engine leg of the dense_mxu posterior-fidelity check (subprocess).

Run as ``python _fidelity_leg.py {auto|never}``; prints one JSON line with
the posterior moments.  A subprocess per leg because the tunneled backend's
worker has been seen crashing (UNAVAILABLE) when a second large MCMC
program compiles after a long run in the same process.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(mode):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import george_tpu as george
    from george_tpu import config, kernels
    from george_tpu.samplers import build_gp_log_prob, run_mcmc, summary

    rng = np.random.default_rng(7)
    n, chains = 256, 512
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

    config.pallas_dense = mode
    # Opt in to the MXU engine explicitly: this test MEASURES its
    # posterior fidelity (the sampler router keeps it off by default).
    config.dense_mxu_sampling = True
    log_prob, theta0 = build_gp_log_prob(
        gp, x, y, yerr, log_prior=log_prior, method="dense"
    )
    key = jax.random.PRNGKey(11)
    z0 = jnp.asarray(theta0, jnp.float32)[None, :] + 0.1 * \
        jax.random.normal(key, (chains, theta0.shape[0]), jnp.float32)
    res = run_mcmc(log_prob, z0, key, algorithm="chees",
                   num_warmup=150, num_samples=300,
                   num_leapfrog=64, block_size=50)
    s = summary(res.samples)
    print(json.dumps({
        "engine": log_prob.engine,
        "mean": [float(v) for v in s["mean"]],
        "std": [float(v) for v in s["std"]],
        "rhat": [float(v) for v in s["rhat"]],
        "divergence_frac": float(res.diverging.mean()),
    }))


if __name__ == "__main__":
    main(sys.argv[1])
