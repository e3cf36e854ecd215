# -*- coding: utf-8 -*-
"""Tempered-SMC throughput on the multimodal quasi-periodic posterior.

Benchmark config #3 (BASELINE.md): ExpSine2 x ExpSquared GP on an
irregularly sampled oscillating series; the period posterior has harmonic
aliases, so the quality gate is that SMC lands the dominant mode on the
true period.  The reference has no in-library analog (its tutorials run
36 emcee walkers in Python, docs/tutorials/hyper.rst:236-246); the metric
here is tempered-posterior particle-mutations/s on one chip.

Emits one JSON line.
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
    parser.add_argument("--particles", type=int, default=4096)
    parser.add_argument("--n", type=int, default=120)
    parser.add_argument("--mutations", type=int, default=8)
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import george_tpu as george
    from george_tpu import kernels
    from george_tpu.samplers import build_gp_log_prob
    from george_tpu.samplers.smc import run_smc

    rng = np.random.default_rng(8)
    true_period = 2.3
    x = np.sort(rng.uniform(0, 18, args.n))
    yerr = 0.15 * np.ones(args.n)
    y = np.sin(2 * np.pi * x / true_period) \
        + yerr * rng.standard_normal(args.n)

    kernel = 1.0 * kernels.ExpSine2Kernel(
        gamma=3.0, log_period=np.log(2.0)
    ) * kernels.ExpSquaredKernel(100.0)
    gp = george.GP(kernel, white_noise=np.log(1e-4), fit_white_noise=True)
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr)
    dim = len(theta0)

    scale = jnp.asarray([1.0, 1.0, 0.8, 1.0, 1.0][:dim])

    def log_init(z):
        d = (z - theta0) / scale
        return -0.5 * jnp.sum(d * d) - jnp.sum(jnp.log(scale)) \
            - 0.5 * dim * jnp.log(2 * jnp.pi)

    key = jax.random.PRNGKey(0)

    def once(k, nparticles):
        p0 = theta0 + scale * jax.random.normal(k, (nparticles, dim))
        t0 = time.time()
        res = run_smc(log_prob, log_init, p0, k,
                      num_mutations=args.mutations)
        np.asarray(res.particles)
        return res, time.time() - t0

    # Compile with a tiny run, then time the real one.
    _, t_compile = once(jax.random.PRNGKey(9), 256)
    res, elapsed = once(key, args.particles)

    names = gp.get_parameter_names()
    i_period = next(
        i for i, nm in enumerate(names) if nm.endswith("log_period")
    )
    periods = np.exp(np.asarray(res.particles[:, i_period]))
    median_p = float(np.median(periods))
    mutations = int(res.num_stages) * args.mutations * args.particles
    print(json.dumps({
        "metric": "tempered-SMC particle-mutations/s, quasi-periodic GP",
        "value": round(mutations / elapsed, 1),
        "unit": "mutations/s",
        "detail": {
            "particles": args.particles, "n": args.n,
            "stages": int(res.num_stages),
            "mutations_per_stage": args.mutations,
            "seconds": round(elapsed, 2),
            "compile_plus_small_run_seconds": round(t_compile, 1),
            "acceptance": round(float(res.acceptance), 3),
            "log_evidence": round(float(res.log_evidence), 2),
            "period_median": round(median_p, 3),
            "period_true": true_period,
            "mode_hit": bool(abs(median_p - true_period) < 0.15),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
