# -*- coding: utf-8 -*-
"""Sampler diagnostics: split R-hat and effective sample size.

Pure jnp implementations (Vehtari et al. 2021 conventions, matching Stan's
split-chain definitions) returning per-parameter arrays.
"""

import jax.numpy as jnp

__all__ = ["split_rhat", "effective_sample_size", "summary"]


def _split(samples):
    """(chains, draws, dim) -> (2*chains, draws//2, dim)."""
    c, n, d = samples.shape
    half = n // 2
    return jnp.concatenate(
        [samples[:, :half], samples[:, half:2 * half]], axis=0
    )


def split_rhat(samples):
    """Split-chain potential scale reduction factor, per parameter."""
    x = _split(jnp.asarray(samples))
    m, n, _ = x.shape
    chain_mean = jnp.mean(x, axis=1)                      # (m, d)
    chain_var = jnp.var(x, axis=1, ddof=1)                # (m, d)
    between = n * jnp.var(chain_mean, axis=0, ddof=1)     # (d,)
    within = jnp.mean(chain_var, axis=0)                  # (d,)
    var_est = (n - 1.0) / n * within + between / n
    return jnp.sqrt(var_est / within)


def effective_sample_size(samples):
    """Bulk ESS via FFT autocorrelations + Geyer initial monotone sequence."""
    x = _split(jnp.asarray(samples))
    m, n, d = x.shape
    chain_mean = jnp.mean(x, axis=1, keepdims=True)
    centered = x - chain_mean

    # Per-chain autocovariance via FFT.
    size = int(2 ** jnp.ceil(jnp.log2(jnp.asarray(2 * n))))
    f = jnp.fft.rfft(centered, n=size, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=1)[:, :n].real
    acov = acov / n

    chain_var = jnp.var(x, axis=1, ddof=1)                # (m, d)
    mean_var = jnp.mean(chain_var, axis=0)                # W
    var_plus = mean_var * (n - 1.0) / n \
        + jnp.var(chain_mean[:, 0], axis=0, ddof=1)       # W + B/n

    rho = 1.0 - (mean_var[None, :] - jnp.mean(acov, axis=0)) / var_plus
    rho = rho.at[0].set(1.0)

    # Geyer: sums of adjacent pairs, truncated at first negative, forced
    # monotone non-increasing.
    even = rho[0::2]
    odd = rho[1::2]
    k = min(even.shape[0], odd.shape[0])
    pair = even[:k] + odd[:k]
    pair_positive = pair * (jnp.cumprod(pair > 0.0, axis=0) > 0)
    pair_mono = jnp.minimum.accumulate(
        jnp.where(pair_positive > 0, pair_positive, 0.0), axis=0
    )
    tau = -1.0 + 2.0 * jnp.sum(pair_mono, axis=0)
    ess = m * n / jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(n) + 1.0))
    return jnp.minimum(ess, 1.0 * m * n)


def summary(samples):
    """Posterior summary dict: mean, std, ESS, split R-hat per parameter."""
    samples = jnp.asarray(samples)
    flat = samples.reshape(-1, samples.shape[-1])
    return {
        "mean": jnp.mean(flat, axis=0),
        "std": jnp.std(flat, axis=0),
        "ess": effective_sample_size(samples),
        "rhat": split_rhat(samples),
    }
