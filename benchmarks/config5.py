# -*- coding: utf-8 -*-
"""BASELINE config #5 sampler benchmark: multi-dim subspace-metric GP,
4096 chains, fused Pallas batched dense value+gradient kernel.

    python benchmarks/config5.py [--algo chees|nuts] [--chains 4096]

Emits one JSON line with ESS/s/chip and the run configuration.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--algo", default="chees",
                        choices=["chees", "nuts", "hmc"])
    parser.add_argument("--chains", type=int, default=4096)
    parser.add_argument("--n", type=int, default=128)
    parser.add_argument("--warmup", type=int, default=150)
    parser.add_argument("--samples", type=int, default=400)
    parser.add_argument("--max-depth", type=int, default=4)
    parser.add_argument("--pallas", default="auto",
                        choices=["auto", "never"])
    parser.add_argument("--dense-mass", action="store_true")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import george_tpu as george
    from george_tpu import config, kernels
    from george_tpu.samplers import build_gp_log_prob, run_mcmc
    from george_tpu.samplers.diagnostics import effective_sample_size

    config.pallas_dense = args.pallas
    # Benchmarks opt in to the MXU hybrid above the VPU envelope (the
    # sampler router keeps it off by default — round-5 moment-fidelity
    # finding, BENCH_NOTES).
    config.dense_mxu_sampling = True

    rng = np.random.default_rng(7)
    x = rng.uniform(-3, 8, (args.n, 3))
    yerr = 0.22 * np.ones(args.n)
    y = np.sin(x[:, 0]) + 0.3 * np.cos(x[:, 2]) \
        + yerr * rng.standard_normal(args.n)

    gp = george.GP(
        1.0 * kernels.Matern32Kernel(metric=[1.0, 2.0], ndim=3,
                                     axes=[0, 2]),
        white_noise=np.log(1e-3), fit_white_noise=True,
        mean=0.0, fit_mean=True,
    )
    center = jnp.asarray(gp.get_parameter_vector())

    def log_prior(theta):
        return -0.5 * jnp.sum(((theta - center) / 2.0) ** 2)

    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr, method="dense",
                                         log_prior=log_prior)
    fused = hasattr(log_prob, "batched_value_and_grad")

    dim = theta0.shape[0]
    key = jax.random.PRNGKey(0)
    z0 = jnp.asarray(theta0)[None, :] + 0.1 * jax.random.normal(
        key, (args.chains, dim), jnp.asarray(theta0).dtype
    )

    opts = dict(num_warmup=args.warmup, num_samples=args.samples,
                max_depth=args.max_depth, block_size=20,
                algorithm=args.algo, dense_mass=args.dense_mass)
    t_compile = time.time()
    run_mcmc(log_prob, z0, key, **dict(opts, num_warmup=20,
                                       num_samples=20))
    t_compile = time.time() - t_compile
    t0 = time.time()
    res = run_mcmc(log_prob, z0, jax.random.PRNGKey(3), **opts)
    np.asarray(res.samples)
    elapsed = time.time() - t0
    ess = np.asarray(effective_sample_size(res.samples))
    print(json.dumps({
        "config": 5, "algo": args.algo, "fused_pallas_dense": fused,
        "dense_mass": args.dense_mass,
        "n": args.n, "chains": args.chains, "dim": int(dim),
        "warmup": args.warmup, "samples": args.samples,
        "ess_per_s": round(float(ess.min() / elapsed), 1),
        "ess_min": round(float(ess.min()), 1),
        "seconds": round(elapsed, 2),
        "divergence_frac": round(float(res.diverging.mean()), 4),
        "compile_plus_smoke_seconds": round(t_compile, 1),
    }))


if __name__ == "__main__":
    main()
