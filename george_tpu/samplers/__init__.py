# -*- coding: utf-8 -*-
"""First-class posterior inference over GP hyperparameters.

The reference delegates inference to external scipy/emcee loops
(docs/tutorials/hyper.rst); here NUTS / HMC / ADVI / SMC are part of the
framework, built on pure-functional transition kernels that vmap over
thousands of chains per chip and shard across device meshes.

Quick start::

    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr)
    z0 = theta0 + 0.1 * jax.random.normal(key, (64, len(theta0)))
    result = run_mcmc(log_prob, z0, key, num_warmup=500, num_samples=500)
    stats = summary(result.samples)
"""

from .logprob import build_gp_log_prob, traceable_model_fn
from .hmc import HMCState, hmc_step, leapfrog, new_state
from .nuts import nuts_step, NUTSInfo
from .chees import chees_step, ChEESInfo
from .mcmc import run_mcmc, MCMCResult
from .diagnostics import split_rhat, effective_sample_size, summary

__all__ = [
    "build_gp_log_prob", "traceable_model_fn",
    "HMCState", "hmc_step", "leapfrog", "new_state",
    "nuts_step", "NUTSInfo",
    "chees_step", "ChEESInfo",
    "run_mcmc", "MCMCResult",
    "split_rhat", "effective_sample_size", "summary",
]
