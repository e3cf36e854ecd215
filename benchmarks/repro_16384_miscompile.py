# -*- coding: utf-8 -*-
"""Minimal reproducer for the TPU 16384-chain persistent-NUTS miscompile.

Recorded in round 4 (BENCH_NOTES.md "Trajectory-persistent NUTS"): at
EXACTLY 16384 chains the compiled trajectory-persistent loop
(``george_tpu.samplers.nuts.nuts_draws_persistent``) truncates
trajectories at subtree merges — the merge U-turn vote reads garbage, so
draws pile up at complete-subtree lengths (46% end at exactly 3
leapfrogs, 34% at exactly 7).  8192 chains and below are bit-healthy on
the same chip; CPU is healthy at every size; both the fused-Pallas and
XLA-scan likelihood engines show it.  The shipped workaround
(``samplers/mcmc.py``) runs >8192-chain batches as sequential 8192-chain
sub-batches.

This script calls ``nuts_draws_persistent`` DIRECTLY — bypassing the
workaround — so the raw compiled loop is what executes.  Exit status 1 if
the trajectory-length distribution carries the truncation signature
(``diagnostics.trajectory_health``).  Usage:

    python benchmarks/repro_16384_miscompile.py --chains 8192    # healthy
    python benchmarks/repro_16384_miscompile.py --chains 16384   # bug

The on-chip canary (tests_tpu/test_smoke.py::test_persistent_nuts_canary)
asserts the WORKAROUND stays healthy at both sizes; this script is the
instrument for checking whether the underlying bug has moved when the
jax/libtpu toolchain changes.
"""

import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chains", type=int, default=16384)
    p.add_argument("--draws", type=int, default=300)
    p.add_argument("--max-depth", type=int, default=4)
    p.add_argument("--target", choices=["gp", "gauss"], default="gp",
                   help="gp = the headline Matern32 N=1k posterior "
                        "(fused Kalman engine, the recorded repro config); "
                        "gauss = a plain 3-D Gaussian (engine-independent "
                        "check)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from george_tpu.samplers.diagnostics import trajectory_health
    from george_tpu.samplers.hmc import HMCState
    from george_tpu.samplers.mcmc import _fuse_batched_vg
    from george_tpu.samplers.nuts import nuts_draws_persistent

    dim = 3
    if args.target == "gp":
        import george_tpu as george
        from george_tpu import kernels
        from george_tpu.samplers import build_gp_log_prob

        rng = np.random.default_rng(42)
        x = np.sort(rng.uniform(0, 10, 1000))
        yerr = 0.1 * np.ones_like(x)
        y = np.sin(x) + yerr * rng.standard_normal(x.shape[0])
        gp = george.GP(1.0 * kernels.Matern32Kernel(1.0),
                       white_noise=np.log(1e-4), fit_white_noise=True)
        center = jnp.asarray(gp.get_parameter_vector())

        def log_prior(theta):
            return -0.5 * jnp.sum(((theta - center) / 2.0) ** 2)

        log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr,
                                             log_prior=log_prior)
        print("engine:", getattr(log_prob, "engine", "unknown"))
        step_size = 0.37       # the bench's adapted value (BENCH_r04)
    else:
        theta0 = jnp.zeros(dim, jnp.float32)

        def log_prob(z):
            return -0.5 * jnp.sum(z * z)

        step_size = 0.7

    vg = jax.value_and_grad(log_prob)
    batched = getattr(log_prob, "batched_value_and_grad", None)
    if batched is not None:
        vg = _fuse_batched_vg(vg, batched)

    key = jax.random.PRNGKey(0)
    z0 = jnp.asarray(theta0, jnp.float32)[None, :] + 0.1 * jax.random.normal(
        key, (args.chains, dim), jnp.float32
    )
    logp0, grad0 = jax.jit(jax.vmap(vg))(z0)
    states = HMCState(z0, logp0, grad0)
    keys = jax.random.split(jax.random.PRNGKey(1), args.chains)
    inv_mass = jnp.ones(dim, jnp.float32)

    run = jax.jit(
        lambda ks, st: nuts_draws_persistent(
            ks, st, vg, jnp.float32(step_size), inv_mass, args.draws,
            max_depth=args.max_depth,
        )
    )
    _, _, outs = run(keys, states)
    n_leap = np.asarray(outs[4])

    # Absolute anchor: the gp target at eps=0.37 runs a 9.2-leapfrog
    # healthy mean (BENCH_NOTES round 4); the gauss target's natural mean
    # is ~3.5 (measure it healthy at 8192 first if the toolchain changed).
    expected = 9.2 if args.target == "gp" else 3.5
    h = trajectory_health(n_leap, expected_mean=expected)
    vals, counts = np.unique(n_leap, return_counts=True)
    print("chains={0} draws={1} backend={2}".format(
        args.chains, args.draws, jax.default_backend()))
    for v, c in zip(vals, counts):
        print("  n_leapfrog={0:3d}: {1:8.4f}".format(
            int(v), c / n_leap.size))
    print("health:", h)
    if not h["healthy"]:
        print("TRUNCATION SIGNATURE PRESENT — the miscompile reproduces "
              "at this chain count on this toolchain.")
        return 1
    print("healthy trajectory-length distribution.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
