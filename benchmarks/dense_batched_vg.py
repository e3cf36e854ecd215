# -*- coding: utf-8 -*-
"""Fused Pallas batched dense value+gradient vs the XLA oracle.

Config-#5 hot-path shape: B chains x N points, multi-dim subspace metric,
6 active parameters.  Reports DEVICE time via in-jit scan repetition (the
tunneled backend has a ~50-60 ms dispatch floor that otherwise dominates;
see BENCH_NOTES.md "methodology").

    python benchmarks/dense_batched_vg.py [--n 128] [--chains 4096]
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
    parser.add_argument("--n", type=int, default=128)
    parser.add_argument("--chains", type=int, default=4096)
    parser.add_argument("--reps", type=int, default=10)
    parser.add_argument("--skip-xla", action="store_true")
    parser.add_argument("--engine", choices=["vpu", "mxu"], default="vpu",
                        help="vpu = chains-on-lanes pallas_dense kernel; "
                             "mxu = per-chain-matrix dense_mxu hybrid")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from george_tpu import kernels
    from george_tpu.ops import pallas_dense as pd
    from george_tpu.dsl import compiler
    from george_tpu.profiling import timeit

    N, B, REP = args.n, args.chains, args.reps
    rng = np.random.default_rng(1)
    x = rng.uniform(-3, 8, (N, 3))
    y = np.sin(x[:, 0])
    yerr2 = 0.05 * np.ones(N)
    k = 1.0 * kernels.Matern32Kernel(metric=[1.0, 2.0], ndim=3,
                                     axes=[0, 2])
    node = k.spec_node()
    kv = np.asarray(k.get_parameter_vector(include_frozen=True),
                    np.float32)
    active = tuple(range(2 + len(kv)))
    th0 = jnp.asarray(np.concatenate([
        0.1 * rng.standard_normal((B, 1)),
        -2.5 + 0.2 * rng.standard_normal((B, 1)),
        np.tile(kv, (B, 1)) + 0.2 * rng.standard_normal((B, len(kv))),
    ], axis=1).astype(np.float32))

    if args.engine == "mxu":
        from george_tpu.ops import dense_mxu as pdm

        vg = pdm.make_dense_mxu_vg(node, x, y, yerr2, 1, 1, active)
    else:
        vg = pd.make_dense_batched_vg(node, x, y, yerr2, 1, 1, active)

    def rep_time(fn):
        @jax.jit
        def f(z):
            def body(c, i):
                ll, g = fn(th0 + 1e-4 * i)
                return c + jnp.sum(ll) + jnp.sum(g), None
            return jax.lax.scan(
                body, z, jnp.arange(REP, dtype=jnp.float32))[0]

        f(jnp.float32(0)).block_until_ready()
        return timeit(f, jnp.float32(0), repeats=3) / REP

    out = {"n": N, "chains": B, "engine": args.engine,
           "pallas_ms": round(rep_time(vg) * 1e3, 2)}

    if not args.skip_xla:
        value = compiler._value_builder(node)
        xj = jnp.asarray(x, jnp.float32)
        yj = jnp.asarray(y, jnp.float32)
        vj = jnp.asarray(yerr2, jnp.float32)

        def oracle_ll(theta):
            r = yj - theta[0]
            K = value(theta[2:], xj, xj)
            K = K + jnp.diag(vj + jnp.exp(theta[1]))
            L = jnp.linalg.cholesky(K)
            logdet = 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
            al = jax.scipy.linalg.cho_solve((L, True), r)
            return -0.5 * (N * jnp.log(2 * jnp.pi) + logdet
                           + jnp.dot(r, al))

        ovg = jax.vmap(jax.value_and_grad(oracle_ll))
        out["xla_ms"] = round(rep_time(ovg) * 1e3, 2)
        out["speedup"] = round(out["xla_ms"] / out["pallas_ms"], 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
