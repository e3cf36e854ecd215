# -*- coding: utf-8 -*-
"""HBM-streaming fused Kalman value+gradient device time at large N.

The SMEM-resident fused kernel caps at N=32768; above it the time series
streams from HBM through a double-buffered DMA pipeline
(ops/pallas_kalman.py).  Reports device time via in-jit repetition plus
the single-dispatch end-to-end time (tunnel floor included).

    python benchmarks/kalman_stream.py [--n 100000] [--chains 1024]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--chains", type=int, default=1024)
    parser.add_argument("--reps", type=int, default=5)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import george_tpu as george
    from george_tpu import kernels
    from george_tpu.samplers import build_gp_log_prob
    from george_tpu.profiling import timeit

    n, B, REP = args.n, args.chains, args.reps
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, n / 33.0, n))
    yerr = 0.1 * np.ones(n)
    y = np.sin(x) + yerr * rng.standard_normal(n)
    gp = george.GP(1.0 * kernels.Matern32Kernel(1.0),
                   white_noise=np.log(1e-4), fit_white_noise=True)
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr)
    if not hasattr(log_prob, "batched_value_and_grad"):
        raise SystemExit("fused kernel did not attach (not on TPU?)")
    th0 = jnp.asarray(
        np.asarray(theta0)[None, :]
        + 0.1 * rng.standard_normal((B, len(theta0))).astype(np.float32)
    )
    vg = log_prob.batched_value_and_grad

    @jax.jit
    def repeated(z):
        def body(c, i):
            lp, g = vg(th0 + 1e-4 * i)
            return c + jnp.sum(lp) + jnp.sum(g), None
        return jax.lax.scan(body, z,
                            jnp.arange(REP, dtype=jnp.float32))[0]

    repeated(jnp.float32(0)).block_until_ready()
    dev = timeit(repeated, jnp.float32(0), repeats=3) / REP
    f = jax.jit(lambda th: vg(th))
    f(th0)[0].block_until_ready()
    e2e = timeit(f, th0, repeats=3)
    print(json.dumps({
        "n": n, "chains": B,
        "device_ms_per_call": round(dev * 1e3, 1),
        "e2e_ms_per_call": round(e2e * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
