# -*- coding: utf-8 -*-
"""The reference's scaling benchmark (docs/tutorials/scaling.rst:146-237):
best-of-K wall clock of compute + log_likelihood over N for the dense and
HODLR solvers.  Emits one JSON line per (solver, N).

    python benchmarks/scaling.py [--max-n 50000] [--x64]
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
    parser.add_argument("--max-n", type=int, default=50000)
    parser.add_argument("--x64", action="store_true")
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    import jax

    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import george_tpu as george
    from george_tpu import kernels
    from george_tpu.profiling import timeit

    np.random.seed(1234)
    x_all = np.sort(np.random.uniform(0, 10, 50000))
    yerr_all = 0.1 * np.ones_like(x_all)
    y_all = np.sin(x_all)
    kernel = np.var(y_all) * kernels.ExpSquaredKernel(1.0)

    sizes = [50, 100, 200, 500, 1000, 5000, 10000, 50000]
    sizes = [n for n in sizes if n <= args.max_n]

    for solver_name in ("basic", "hodlr"):
        for n in sizes:
            if solver_name == "basic" and n > 20000:
                continue  # O(N^3) dense beyond this is pointless here
            x, yerr, y = x_all[:n], yerr_all[:n], y_all[:n]

            def run(bump=0.0):
                # bump defeats execution memoization on remote backends
                if solver_name == "basic":
                    gp = george.GP(kernel)
                else:
                    gp = george.GP(kernel, solver=george.HODLRSolver,
                                   tol=0.1, seed=42)
                gp.compute(x, yerr + bump)
                return gp.log_likelihood(y)

            seconds = timeit(run, repeats=args.repeats, warmup=1,
                             vary=lambda i: {"bump": 1e-9 * (i + 2)})
            print(json.dumps({
                "solver": solver_name,
                "n": n,
                "seconds": round(seconds, 5),
                "loglike": round(float(run()), 6),
                "backend": jax.default_backend(),
                "x64": bool(jax.config.jax_enable_x64),
            }), flush=True)


if __name__ == "__main__":
    main()
