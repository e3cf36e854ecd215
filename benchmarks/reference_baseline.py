# -*- coding: utf-8 -*-
"""Measure the reference-stack-equivalent baseline: ESS/s of a stretch-move
ensemble sampler (emcee's algorithm, docs/tutorials/hyper.rst:231-246 in the
reference) over a dense scipy-Cholesky GP marginal likelihood (BasicSolver
semantics) at N=1000, Matern32 + white noise — benchmark config #2.

The reference publishes no absolute numbers (BASELINE.md), so this measured
number is the baseline bench.py compares against.  Run on the round's CPU
host:  python benchmarks/reference_baseline.py
"""

import json
import time

import numpy as np
from scipy.linalg import cho_factor, cho_solve


def matern32_likelihood_factory(n=1000, seed=42):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 10, n))
    yerr = 0.1 * np.ones(n)
    y = np.sin(x) + yerr * rng.standard_normal(n)
    d = np.abs(x[:, None] - x[None, :])

    center = np.array([0.0, 0.0, np.log(1e-4)])

    def log_like(theta):
        log_amp, log_tau, log_wn = theta
        if np.any(np.abs(theta) > 20.0):
            return -np.inf
        # Same weakly-informative Gaussian prior as bench.py.
        lp = -0.5 * np.sum(((theta - center) / 2.0) ** 2)
        r = d * np.exp(-0.5 * log_tau) * np.sqrt(3.0)
        K = np.exp(log_amp) * (1.0 + r) * np.exp(-r)
        K[np.diag_indices_from(K)] += yerr ** 2 + np.exp(log_wn)
        try:
            factor = cho_factor(K, overwrite_a=True)
        except (np.linalg.LinAlgError, ValueError):
            return -np.inf
        logdet = 2.0 * np.sum(np.log(np.diag(factor[0])))
        return lp - 0.5 * (
            n * np.log(2 * np.pi) + logdet + y @ cho_solve(factor, y)
        )

    return log_like, np.array([0.0, 0.0, np.log(1e-4)])


def stretch_move(log_like, theta0, n_walkers=32, n_steps=300, a=2.0,
                 seed=0):
    """emcee's affine-invariant stretch move (Goodman & Weare 2010)."""
    rng = np.random.default_rng(seed)
    dim = len(theta0)
    walkers = theta0 + 0.1 * rng.standard_normal((n_walkers, dim))
    logp = np.array([log_like(w) for w in walkers])
    chain = np.empty((n_walkers, n_steps, dim))
    n_like = 0
    for t in range(n_steps):
        for k in range(n_walkers):
            j = rng.integers(n_walkers - 1)
            j = j if j < k else j + 1
            z = (1.0 + (a - 1.0) * rng.random()) ** 2 / a
            prop = walkers[j] + z * (walkers[k] - walkers[j])
            lp = log_like(prop)
            n_like += 1
            if np.log(rng.random()) < (dim - 1) * np.log(z) + lp - logp[k]:
                walkers[k] = prop
                logp[k] = lp
        chain[:, t] = walkers
    return chain, n_like


def ess(chain):
    """Bulk ESS (same estimator as george_tpu.samplers.diagnostics)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")
    from george_tpu.samplers.diagnostics import effective_sample_size
    return np.asarray(effective_sample_size(chain))


def main():
    log_like, theta0 = matern32_likelihood_factory()
    # Warm the BLAS path.
    log_like(theta0)
    t0 = time.time()
    chain, n_like = stretch_move(log_like, theta0, n_walkers=32,
                                 n_steps=300)
    elapsed = time.time() - t0
    # Discard the adaptation transient.
    e = ess(chain[:, 100:])
    result = {
        "metric": "ensemble ESS/s, Matern32 GP N=1000 (reference stack)",
        "ess_min": float(e.min()),
        "ess": [float(v) for v in e],
        "seconds": elapsed,
        "likelihood_evals": n_like,
        "ess_per_s": float(e.min()) / elapsed,
        "like_evals_per_s": n_like / elapsed,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
