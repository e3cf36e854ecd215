# -*- coding: utf-8 -*-
"""Sampler diagnostics: split R-hat and effective sample size.

Pure jnp implementations (Vehtari et al. 2021 conventions, matching Stan's
split-chain definitions) returning per-parameter arrays.
"""

import jax
import jax.numpy as jnp
import jax.scipy.stats as jstats

__all__ = ["split_rhat", "effective_sample_size", "rank_normalize",
           "rank_normalized_rhat", "tail_ess", "summary"]


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


def rank_normalize(samples):
    """Rank-normalize draws (Vehtari et al. 2021, eq. 14).

    Pooled ranks across all chains/draws, mapped through the normal
    quantile function with the (r - 3/8)/(S + 1/4) fractional-rank offset.
    Makes R-hat/ESS robust to heavy tails and nonlinear scale.
    """
    x = jnp.asarray(samples)
    c, n, d = x.shape
    flat = x.reshape(c * n, d)
    # Pooled ranks per parameter (argsort of argsort = 0-based ranks).
    ranks = jnp.argsort(jnp.argsort(flat, axis=0), axis=0) + 1.0
    z = jstats.norm.ppf((ranks - 0.375) / (c * n + 0.25))
    return z.reshape(c, n, d)


def rank_normalized_rhat(samples):
    """Max of bulk (rank-normalized) and tail (folded rank-normalized)
    split R-hat — the published convergence diagnostic (Vehtari et al.
    2021, "Rank-normalization, folding, and localization").
    """
    x = jnp.asarray(samples)
    bulk = split_rhat(rank_normalize(x))
    med = jnp.median(x.reshape(-1, x.shape[-1]), axis=0)
    folded = jnp.abs(x - med)
    tail = split_rhat(rank_normalize(folded))
    return jnp.maximum(bulk, tail)


def tail_ess(samples):
    """Tail ESS: minimum ESS of the 5% / 95% quantile *indicators*,
    measuring mixing in the distribution tails.  The indicators go to the
    ESS estimator directly — rank-normalizing a binary variable would
    shuffle its ties into noise."""
    x = jnp.asarray(samples)
    flat = x.reshape(-1, x.shape[-1])
    q05 = jnp.quantile(flat, 0.05, axis=0)
    q95 = jnp.quantile(flat, 0.95, axis=0)
    ess05 = effective_sample_size((x <= q05).astype(x.dtype))
    ess95 = effective_sample_size((x <= q95).astype(x.dtype))
    return jnp.minimum(ess05, ess95)


def summary(samples, rank_normalized=False):
    """Posterior summary dict: mean, std, ESS, split R-hat per parameter.

    With ``rank_normalized=True``, additionally: bulk ESS on
    rank-normalized draws (``ess_bulk``), ``ess_tail``, and the
    rank-normalized max-of-bulk-and-tail ``rhat`` (replacing the plain
    split R-hat) — the Vehtari et al. 2021 recommendations.
    """
    samples = jnp.asarray(samples)
    flat = samples.reshape(-1, samples.shape[-1])
    out = {
        "mean": jnp.mean(flat, axis=0),
        "std": jnp.std(flat, axis=0),
        "ess": effective_sample_size(samples),
        "rhat": split_rhat(samples),
    }
    if rank_normalized:
        out["ess_bulk"] = effective_sample_size(rank_normalize(samples))
        out["ess_tail"] = tail_ess(samples)
        out["rhat"] = rank_normalized_rhat(samples)
    return out
