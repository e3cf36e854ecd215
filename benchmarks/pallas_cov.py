# -*- coding: utf-8 -*-
"""Pallas vs XLA covariance-build microbenchmark (TPU).

Compares the fused XLA path (broadcast differences + radial elementwise)
against the tiled Pallas kernel for the stationary build, forward and
forward+gradient.

    python benchmarks/pallas_cov.py [--n 8192]
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
    parser.add_argument("--n", type=int, default=8192)
    parser.add_argument("--ndim", type=int, default=1)
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from george_tpu.dsl import compiler
    from george_tpu.ops import pallas_cov
    from george_tpu.profiling import timeit

    n, d = args.n, args.ndim
    rng = np.random.default_rng(0)
    A = jnp.asarray(np.sort(rng.uniform(0, 10, (n, d)), axis=0),
                    jnp.float32)
    radial = compiler._radial_fn("Matern32Kernel", ())
    p = jnp.zeros((0,), jnp.float32)

    @jax.jit
    def xla_build(A, bump):
        r2 = compiler.pairwise_squared_distance(A + bump, A)
        return radial(p, r2)

    cov = pallas_cov.make_stationary_cov(radial, d, 0)

    @jax.jit
    def pallas_build(A, bump):
        return cov(p, A + bump, A)

    @jax.jit
    def xla_grad(A, bump):
        def loss(A):
            r2 = compiler.pairwise_squared_distance(A + bump, A)
            return jnp.sum(radial(p, r2))
        return jax.grad(loss)(A)

    @jax.jit
    def pallas_grad(A, bump):
        return jax.grad(lambda A: jnp.sum(cov(p, A + bump, A)))(A)

    out = {}
    for name, fn in [("xla_fwd", xla_build), ("pallas_fwd", pallas_build),
                     ("xla_grad", xla_grad), ("pallas_grad", pallas_grad)]:
        seconds = timeit(fn, A, repeats=5, warmup=1,
                         vary=lambda i: {"bump": 1e-6 * (i + 2)})
        out[name] = round(seconds * 1e3, 3)

    K1 = np.asarray(xla_build(A, 0.0))
    K2 = np.asarray(pallas_build(A, 0.0))
    out["max_abs_diff"] = float(np.abs(K1 - K2).max())
    print(json.dumps({
        "metric": "covariance build {0}x{0} (ms)".format(n),
        "detail": out,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
