# -*- coding: utf-8 -*-
"""Large-N non-Markovian sampling through the HODLR engine (VERDICT r4 #5).

The reference's answer to large-N inference is its HODLR factorization
driven by an external emcee loop (hodlr.h:75-120, hyper.rst:236-246);
george_tpu compiles the same hierarchical compression INTO the sampler's
posterior density (``build_gp_log_prob(method="hodlr")``).  Two legs:

  * ``--leg big``  — NUTS on an ExpSquared N=10^4 posterior, end-to-end,
    records ESS/s/chip (an O(N^3)-dense build at this N pays a ~0.7 s
    Cholesky per leapfrog per chain batch; HODLR runs it at
    O(N log^2 N));
  * ``--leg match`` — N=2048: the same posterior sampled through BOTH
    engines; prints posterior moments and their delta in units of the
    posterior sd (the MC-error agreement check).

Run on the TPU host:  python benchmarks/hodlr_sampler.py --leg match
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_posterior(n, seed=42):
    import jax.numpy as jnp
    import george_tpu as george
    from george_tpu import kernels

    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 100, n))
    yerr = 0.1 * np.ones(n)
    y = np.sin(x / 4.0) + yerr * rng.standard_normal(n)
    gp = george.GP(1.0 * kernels.ExpSquaredKernel(4.0),
                   white_noise=np.log(1e-3), fit_white_noise=True)
    center = jnp.asarray(gp.get_parameter_vector())

    def log_prior(theta):
        return -0.5 * jnp.sum(((theta - center) / 2.0) ** 2)

    return gp, x, y, yerr, log_prior


def run(method, gp, x, y, yerr, log_prior, chains, warmup, samples,
        mopts=None, seed=0):
    import jax
    import jax.numpy as jnp
    from george_tpu.samplers import build_gp_log_prob, run_mcmc
    from george_tpu.samplers.diagnostics import (
        effective_sample_size, summary,
    )

    log_prob, theta0 = build_gp_log_prob(
        gp, x, y, yerr, log_prior=log_prior, method=method,
        method_options=mopts,
    )
    print("engine:", log_prob.engine, file=sys.stderr)
    key = jax.random.PRNGKey(seed)
    z0 = jnp.asarray(theta0, jnp.float32)[None, :] + 0.1 * \
        jax.random.normal(key, (chains, theta0.shape[0]), jnp.float32)
    t0 = time.time()
    # block_size 10: a 50-transition HODLR block at N=2048 exceeded the
    # tunneled backend's single-execution tolerance (UNAVAILABLE device
    # errors); short blocks are bounded and identical math.
    res = run_mcmc(log_prob, z0, key, num_warmup=warmup,
                   num_samples=samples, max_depth=4, block_size=10,
                   progress=lambda *a: print(*a, file=sys.stderr))
    np.asarray(res.samples)
    sec = time.time() - t0
    ess = np.asarray(effective_sample_size(res.samples))
    s = summary(res.samples)
    return {
        "engine": log_prob.engine, "chains": chains, "seconds": round(sec, 1),
        "ess_min": round(float(ess.min()), 1),
        "ess_per_s": round(float(ess.min() / sec), 1),
        "mean": [round(float(v), 4) for v in s["mean"]],
        "std": [round(float(v), 4) for v in s["std"]],
        "rhat": [round(float(v), 3) for v in s["rhat"]],
        "divergence_frac": round(float(res.diverging.mean()), 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--leg", choices=["big", "match"], default="match")
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--chains", type=int, default=None)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--samples", type=int, default=200)
    p.add_argument("--one", choices=["dense", "hodlr"], default=None,
                   help="(internal) run one engine of the match leg and "
                        "print its JSON")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if args.leg == "big":
        n = args.n or 10000
        chains = args.chains or 32
        gp, x, y, yerr, log_prior = make_posterior(n)
        out = run("hodlr", gp, x, y, yerr, log_prior, chains,
                  args.warmup, args.samples,
                  mopts=dict(tol=1e-4, min_size=256))
        out.update({"n": n, "leg": "big"})
        print(json.dumps(out))
        return

    # 16 chains: the dense comparison leg holds 128 reverse-mode N=2048
    # Cholesky graphs per leapfrog otherwise (~100 MB/chain — OOMs the
    # 16 GB chip at 128 chains).
    n = args.n or 2048
    chains = args.chains or 16
    gp, x, y, yerr, log_prior = make_posterior(n)
    res = {}
    # Each engine runs in its own subprocess: the tunneled backend has
    # been seen flaking (UNAVAILABLE) when a second large program
    # compiles after a long run in the same process.
    import subprocess

    for method in ("dense", "hodlr"):
        if args.one == method or not args.one:
            if args.one:
                mopts = (None if method == "dense"
                         else dict(tol=1e-4, min_size=256))
                out = run(method, gp, x, y, yerr, log_prior, chains,
                          args.warmup, args.samples, mopts=mopts)
                print(json.dumps(out))
                return
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--leg", "match", "--one", method,
                   "--n", str(n), "--chains", str(chains),
                   "--warmup", str(args.warmup),
                   "--samples", str(args.samples)]
            proc = subprocess.run(cmd, capture_output=True, text=True)
            if proc.returncode != 0:
                print(proc.stderr[-2000:], file=sys.stderr)
                raise SystemExit("leg {0} failed".format(method))
            res[method] = json.loads(proc.stdout.strip().split("\n")[-1])
    d, h = res["dense"], res["hodlr"]
    delta_sd = max(
        abs(md - mh) / sd
        for md, mh, sd in zip(d["mean"], h["mean"], d["std"])
    )
    std_rel = max(
        abs(sh / sd - 1.0) for sh, sd in zip(h["std"], d["std"])
    )
    print(json.dumps({
        "leg": "match", "n": n, "dense": d, "hodlr": h,
        "mean_delta_in_sd": round(delta_sd, 4),
        "std_rel_delta": round(std_rel, 4),
        "agrees": bool(delta_sd < 0.1 and std_rel < 0.1),
    }))


if __name__ == "__main__":
    main()
