# -*- coding: utf-8 -*-
"""Blocked vs native Cholesky on TPU, in-jit device time (amortized).

Methodology: the whole build+factor+logdet program is repeated REP times
inside one jitted ``lax.scan`` (inputs perturbed per iteration), so the
~50-60 ms tunnel dispatch floor is paid once and amortized away; reported
times are per-iteration device times.  ``--e2e`` additionally reports the
single-dispatch wall time (what a user's first call feels like, floor
included).

    python benchmarks/chol_blocked.py --sizes 4096 8192 16384 32768
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
    parser.add_argument("--sizes", type=int, nargs="+",
                        default=[4096, 8192, 16384])
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--e2e", action="store_true")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from george_tpu.ops.linalg import _blocked_cholesky_impl, _CHOL_BLOCK
    from george_tpu.profiling import timeit

    rows = []
    for n in args.sizes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(np.sort(rng.uniform(0, 10, n)).astype(np.float32))

        def build(bump):
            d = x[:, None] - x[None, :]
            return jnp.exp(-0.5 * d * d) + (0.01 + bump) * jnp.eye(
                n, dtype=jnp.float32)

        def ld_blocked(bump):
            L = _blocked_cholesky_impl(build(bump), _CHOL_BLOCK)
            return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

        def ld_native(bump):
            L = jnp.linalg.cholesky(build(bump))
            return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

        def rep(fn):
            @jax.jit
            def f(z):
                def body(c, i):
                    return c + fn(1e-6 * i), None
                return jax.lax.scan(
                    body, z, jnp.arange(args.reps, dtype=jnp.float32)
                )[0]

            f(jnp.float32(0)).block_until_ready()
            return timeit(f, jnp.float32(0), repeats=3) / args.reps

        t_b = rep(ld_blocked)
        t_n = rep(ld_native)
        row = {
            "n": n,
            "blocked_ms": round(t_b * 1e3, 1),
            "native_ms": round(t_n * 1e3, 1),
            "speedup": round(t_n / t_b, 2),
            "eff_tflops_blocked": round(n ** 3 / 3 / t_b / 1e12, 1),
        }
        if args.e2e:
            g = jax.jit(ld_blocked)
            g(jnp.float32(0)).block_until_ready()
            row["e2e_ms"] = round(
                timeit(g, jnp.float32(0), repeats=3) * 1e3, 1
            )
        rows.append(row)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
