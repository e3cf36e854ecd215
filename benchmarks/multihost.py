# -*- coding: utf-8 -*-
"""Chain-sharded NUTS scaling efficiency (BASELINE config #5).

Weak-scaling sweep: fix chains-per-device, grow the mesh 1 -> 2 -> ... ->
all visible devices, and report samples/s plus the efficiency vs. linear
scaling from the single-device run.  The BASELINE.json target is >=80%
samples/s efficiency on 2+ hosts; on real multi-chip hardware this script
measures exactly that (the sampler's only cross-device traffic is the
psum'd adaptation moments, a few scalars + one (dim,) vector per step).

On this image only one TPU chip is visible, so by default the sweep runs on
a virtual CPU mesh (--platform cpu --devices 8).  Virtual devices share the
host's physical cores, so CPU "efficiency" numbers measure collective
overhead only, not real scaling — the harness is written for the day a pod
slice is attached: `python benchmarks/multihost.py --platform tpu`.

Emits one JSON line per mesh size.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default="cpu",
                        choices=["cpu", "tpu"])
    parser.add_argument("--devices", type=int, default=8,
                        help="virtual device count (cpu platform only)")
    parser.add_argument("--chains-per-device", type=int, default=64)
    parser.add_argument("--n", type=int, default=256)
    parser.add_argument("--warmup", type=int, default=100)
    parser.add_argument("--samples", type=int, default=100)
    parser.add_argument("--max-depth", type=int, default=6)
    args = parser.parse_args()

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=%d" % args.devices
        )

    import jax

    if args.platform == "cpu":
        # A sitecustomize on this image pins the tunneled TPU platform
        # regardless of env vars; re-force the virtual CPU mesh explicitly
        # (must happen before the backend initializes).
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.devices)
        except RuntimeError:
            pass  # backend already initialized

    import jax.numpy as jnp
    import george_tpu as george
    from george_tpu import kernels
    from george_tpu.parallel import chain_mesh, run_mcmc_sharded
    from george_tpu.samplers import build_gp_log_prob

    n_devices = len(jax.devices())

    # Config #5's model shape: multi-dim kernel on a subspace metric.
    rng = np.random.default_rng(42)
    x = rng.uniform(0, 10, (args.n, 3))
    yerr = 0.1 * np.ones(args.n)
    y = np.sin(x[:, 0]) * np.cos(0.4 * x[:, 1]) \
        + yerr * rng.standard_normal(args.n)
    gp = george.GP(
        1.0 * kernels.Matern32Kernel([1.0, 2.0], ndim=3, axes=[0, 1]),
        white_noise=np.log(1e-4), fit_white_noise=True,
    )
    center_np = gp.get_parameter_vector()
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr)
    center = jnp.asarray(center_np)

    def log_prob_prior(theta):
        return log_prob(theta) - 0.5 * jnp.sum(((theta - center) / 2.0) ** 2)

    dim = theta0.shape[0]
    key = jax.random.PRNGKey(0)

    sizes = []
    m = 1
    while m <= n_devices:
        sizes.append(m)
        m *= 2
    if sizes[-1] != n_devices:
        sizes.append(n_devices)

    base_rate = None
    for ndev in sizes:
        mesh = chain_mesh(ndev)
        chains = args.chains_per_device * ndev
        z0 = jnp.asarray(theta0)[None, :] + 0.05 * jax.random.normal(
            key, (chains, dim), jnp.asarray(theta0).dtype
        )
        opts = dict(num_warmup=args.warmup, num_samples=args.samples,
                    max_depth=args.max_depth)
        # compile
        res = run_mcmc_sharded(
            log_prob_prior, None, z0, key, mesh,
            **dict(opts, num_warmup=2, num_samples=2)
        )
        np.asarray(res.samples)
        t0 = time.time()
        res = run_mcmc_sharded(
            log_prob_prior, None, z0, jax.random.PRNGKey(1), mesh, **opts
        )
        np.asarray(res.samples)
        elapsed = time.time() - t0
        rate = chains * args.samples / elapsed
        if base_rate is None:
            base_rate = rate / ndev  # per-device rate at 1 device
        print(json.dumps({
            "metric": "chain-sharded NUTS samples/s",
            "devices": ndev,
            "chains": chains,
            "value": round(rate, 1),
            "unit": "samples/s",
            "efficiency_vs_linear": round(rate / (base_rate * ndev), 3),
            "seconds": round(elapsed, 2),
            "platform": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
