# -*- coding: utf-8 -*-
"""Cholesky + logdet wall time at N=16k (the second BASELINE.json metric).

Times the fused covariance-build + Cholesky + log-determinant program (the
BasicSolver compute path) on the current backend.

    python benchmarks/chol16k.py [--n 16384] [--dtype float32]
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
    parser.add_argument("--n", type=int, default=16384)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "float64"])
    parser.add_argument("--repeats", type=int, default=5)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    from george_tpu import kernels
    from george_tpu.ops import linalg
    from george_tpu.profiling import timeit

    n = args.n
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, n)).reshape(-1, 1).astype(args.dtype)
    diag_noise = (0.1 ** 2) * np.ones(n, dtype=args.dtype)

    kernel = 1.0 * kernels.ExpSquaredKernel(1.0)
    node = kernel.spec_node()
    theta = jnp.asarray(
        kernel.get_parameter_vector(include_frozen=True), dtype=args.dtype
    )
    x_dev = jnp.asarray(x)
    d_dev = jnp.asarray(diag_noise)

    factor = linalg.factor_fn(node)

    def run(bump=0.0):
        L, logdet = factor(theta, x_dev, d_dev + bump)
        return logdet

    # Vary the noise diagonal per call: some backends memoize executions
    # with identical inputs, which would time as ~0.
    seconds = timeit(run, repeats=args.repeats, warmup=1,
                     vary=lambda i: {"bump": 1e-7 * (i + 2)})
    logdet = float(run())
    flops = n ** 3 / 3.0
    print(json.dumps({
        "metric": "covariance build + Cholesky + logdet, N={0}".format(n),
        "value": round(seconds, 4),
        "unit": "s",
        "detail": {
            "logdet": logdet,
            "dtype": args.dtype,
            "effective_tflops": round(flops / seconds / 1e12, 2),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
