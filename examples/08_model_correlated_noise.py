# -*- coding: utf-8 -*-
"""Model fitting with correlated noise (reference docs/tutorials/model.rst).

A non-linear mean model (a Gaussian dip: amplitude, location, log-width) is
fit to data whose noise is correlated.  First the classic mistake — assume
the noise is white — then the fix: model the covariance structure with a GP
and sample the *joint* posterior over mean-model and kernel hyperparameters.

The reference runs two emcee loops around its stateful GP object
(model.rst:174-186, 224-240).  Here both posteriors are single pure
densities (mean model via the ``jax_value`` hook) and NUTS samples hundreds
of chains in parallel on-device.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere without installing

import george_tpu as george
from george_tpu import kernels
from george_tpu.modeling import Model
from george_tpu.samplers import build_gp_log_prob, run_mcmc, summary


class GaussianFeature(Model):
    """amp * exp(-0.5 (t - location)^2 / sigma^2)  (model.rst:66-72)."""

    parameter_names = ("amp", "location", "log_sigma2")

    def get_value(self, t):
        return self.amp * np.exp(
            -0.5 * (t.flatten() - self.location) ** 2
            * np.exp(-self.log_sigma2)
        )

    def jax_value(self, params, t):
        amp, loc, log_s2 = params[0], params[1], params[2]
        return amp * jnp.exp(
            -0.5 * (t[:, 0] - loc) ** 2 * jnp.exp(-log_s2)
        )


def generate_data(params, n, rng=(-5, 5), seed=1234):
    np.random.seed(seed)
    truth_gp = george.GP(0.1 * kernels.ExpSquaredKernel(3.3))
    t = rng[0] + np.diff(rng) * np.sort(np.random.rand(n))
    y = truth_gp.sample(t)
    y += GaussianFeature(**params).get_value(t)
    yerr = 0.05 + 0.05 * np.random.rand(n)
    y += yerr * np.random.randn(n)
    return t, y, yerr


CHAINS = int(os.environ.get("EX_CHAINS", 128))
STEPS = int(os.environ.get("EX_STEPS", 500))


def sample_posterior(gp, t, y, yerr, key, label):
    log_prob, theta0 = build_gp_log_prob(gp, t, y, yerr)
    z0 = theta0 + 0.1 * jax.random.normal(key, (CHAINS, len(theta0)))
    # Blocked execution keeps each device invocation bounded (tunneled /
    # preemptible backends kill very long single executions); identical
    # math and RNG stream to the fused form.
    res = run_mcmc(log_prob, z0, key, num_warmup=STEPS, num_samples=STEPS,
                   max_depth=8, block_size=50)
    stats = summary(res.samples)
    print("--", label)
    for i, name in enumerate(gp.get_parameter_names()):
        print("  {0:32s} mean={1:+.3f} std={2:.3f} ess={3:.0f} rhat={4:.3f}"
              .format(name, float(stats["mean"][i]), float(stats["std"][i]),
                      float(stats["ess"][i]), float(stats["rhat"][i])))
    return stats


def main():
    truth = dict(amp=-1.0, location=0.1, log_sigma2=np.log(0.4))
    t, y, yerr = generate_data(truth, 50)
    key = jax.random.PRNGKey(42)

    # 1) Assume white noise: mean model over an EmptyKernel GP (the
    #    TrivialSolver path) — biased, overconfident `location`.
    wn = george.GP(
        mean=GaussianFeature(**truth), fit_mean=True,
        white_noise=np.log(0.5 ** 2), fit_white_noise=True,
    )
    white = sample_posterior(wn, t, y, yerr, key, "white-noise model")

    # 2) Model the correlated noise with a Matern-3/2 GP and marginalize
    #    (model.rst:196-240); the location posterior widens to the truth.
    #    The GP absorbs the white component, so the extra white-noise
    #    amplitude is bounded below (the bounds prior keeps NUTS off the
    #    improper exp(wn) -> 0 plateau).
    from george_tpu.modeling import ConstantModel
    # The reference bounds the mean-model parameters (model.rst's flat
    # prior over amp in (-10,10), location in (-5,5), width in (0,3)):
    # without them `location` is unidentified once the GP absorbs the dip
    # and NUTS wanders an improper plateau.  The modeling protocol's
    # bounds ARE the prior here, exactly as in the reference.
    feature = GaussianFeature(
        bounds=dict(amp=(-10.0, 10.0), location=(-5.0, 5.0),
                    log_sigma2=(np.log(1e-3), np.log(3.0))),
        **truth,
    )
    gp = george.GP(
        np.var(y) * kernels.Matern32Kernel(10.0),
        mean=feature, fit_mean=True,
        white_noise=ConstantModel(np.log(0.5 ** 2), bounds=[(-12.0, 5.0)]),
        fit_white_noise=True,
    )
    corr = sample_posterior(gp, t, y, yerr, jax.random.fold_in(key, 1),
                            "correlated-noise (GP) model")

    names = gp.get_parameter_names()
    i_loc = names.index("mean:location")
    print("location: truth={0:+.3f}  white={1:+.3f}+/-{2:.3f}  "
          "gp={3:+.3f}+/-{4:.3f}".format(
              truth["location"],
              float(white["mean"][1]), float(white["std"][1]),
              float(corr["mean"][i_loc]), float(corr["std"][i_loc])))


if __name__ == "__main__":
    main()
