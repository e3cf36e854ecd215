# -*- coding: utf-8 -*-
"""NUTS max_depth sweep on the headline config (N=1k Matern32, fused
Kalman likelihood, 16384 chains).

The vmapped masked while_loop pays the LONGEST chain's trajectory each
draw, so max_depth directly trades tail-trajectory headroom against
batch-lockstep waste.  Round-3 measurements (BENCH_NOTES.md): depth 3 =
22.2k, depth 4 = 27.5k, depth 6 = 12.0k ESS/s at 300 draws.

Usage: python benchmarks/nuts_depth.py MAX_DEPTH [SAMPLES]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import george_tpu as george
from george_tpu import kernels
from george_tpu.samplers import build_gp_log_prob, run_mcmc
from george_tpu.samplers.diagnostics import effective_sample_size

max_depth = int(sys.argv[1])
samples = int(sys.argv[2]) if len(sys.argv) > 2 else 300
n, chains, warmup, block = 1000, 16384, 150, 20

rng = np.random.default_rng(42)
x = np.sort(rng.uniform(0, 10, n))
yerr = 0.1 * np.ones(n)
y = np.sin(x) + yerr * rng.standard_normal(n)
gp = george.GP(1.0 * kernels.Matern32Kernel(1.0),
               white_noise=np.log(1e-4), fit_white_noise=True)
center = jnp.asarray(gp.get_parameter_vector())
log_prior = lambda th: -0.5 * jnp.sum(((th - center) / 2.0) ** 2)
log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr, log_prior=log_prior)
dim = theta0.shape[0]
key = jax.random.PRNGKey(0)
z0 = jnp.asarray(theta0)[None, :] + 0.1 * jax.random.normal(
    key, (chains, dim), jnp.asarray(theta0).dtype)

opts = dict(num_warmup=warmup, num_samples=samples, max_depth=max_depth,
            block_size=block, algorithm="nuts",
            progress=lambda *a: None)
run_mcmc(log_prob, z0, key, **dict(opts, num_warmup=block,
                                   num_samples=block))
t0 = time.time()
res = run_mcmc(log_prob, z0, jax.random.PRNGKey(7), **opts)
np.asarray(res.samples)
dt = time.time() - t0
ess = np.asarray(effective_sample_size(res.samples))
nl = np.asarray(res.n_leapfrog, np.float64)
print(f"depth {max_depth}: ess/s {ess.min()/dt:.0f} "
      f"(ess_min {ess.min():.0f}, {dt:.1f}s, "
      f"{dt/(warmup+samples)*1e3:.0f} ms/draw, "
      f"leapfrog mean {nl.mean():.1f} "
      f"p99 {np.percentile(nl, 99):.0f} max {nl.max():.0f}, "
      f"div {float(res.diverging.mean()):.4f}, eps {float(res.step_size):.3f})")
