# -*- coding: utf-8 -*-
"""Sampler diagnostics: split R-hat and effective sample size.

Pure jnp implementations (Vehtari et al. 2021 conventions, matching Stan's
split-chain definitions) returning per-parameter arrays.
"""

import jax
import jax.numpy as jnp
import jax.scipy.stats as jstats

__all__ = ["split_rhat", "effective_sample_size", "rank_normalize",
           "trajectory_health",
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


def trajectory_health(n_leapfrog, reference=None, expected_mean=None,
                      mean_rtol=0.25, sig_atol=0.25):
    """Screen a NUTS run's trajectory lengths for the truncation signature
    of the round-4 TPU 16384-chain miscompile.

    The recorded bug (BENCH_NOTES.md round 4;
    ``benchmarks/repro_16384_miscompile.py``): the compiled
    trajectory-persistent loop reads a corrupted U-turn vote at subtree
    merges, so trajectories truncate to *complete-subtree* lengths — on
    the headline posterior (natural mean 9.2 leapfrogs) 46% of draws
    ended at exactly 3 and 34% at exactly 7.

    A {3, 7} pileup is NOT an absolute signature — easy low-dimensional
    posteriors legitimately U-turn at 3 leapfrogs — so health is judged
    against an anchor for the *same posterior and step size*:

    :param n_leapfrog: per-draw leapfrog counts (any shape; typically
        ``MCMCResult.n_leapfrog``).
    :param reference: leapfrog counts from a trusted run of the same
        configuration (e.g. the per-draw ``persistent=False`` path, a
        CPU run, or a chain count known healthy).  Healthy iff the mean
        lengths agree within ``mean_rtol`` (relative) and the combined
        {3, 7} mass agrees within ``sig_atol`` (absolute).
    :param expected_mean: alternatively, the posterior's known healthy
        mean trajectory length; healthy iff the measured mean is within
        ``mean_rtol`` of it.  (At the recorded bug the headline
        posterior's mean dropped 9.2 -> ~4: a >50% shift.)
    :returns: dict with ``healthy`` (bool; None when no anchor was
        given), ``frac_3``, ``frac_7``, ``frac_truncation_signature``
        (their sum), ``mean_leapfrog``, and the anchor values used.
    """
    import numpy as np

    def stats(a):
        a = np.asarray(a).ravel()
        return (float(np.mean(a == 3) + np.mean(a == 7)),
                float(np.mean(a)))

    sig, mean = stats(n_leapfrog)
    n = np.asarray(n_leapfrog).ravel()
    out = {
        "frac_3": float(np.mean(n == 3)),
        "frac_7": float(np.mean(n == 7)),
        "frac_truncation_signature": sig,
        "mean_leapfrog": mean,
    }
    healthy = None
    if reference is not None:
        ref_sig, ref_mean = stats(reference)
        out["reference_mean_leapfrog"] = ref_mean
        out["reference_frac_truncation_signature"] = ref_sig
        healthy = (abs(mean - ref_mean) <= mean_rtol * max(ref_mean, 1.0)
                   and abs(sig - ref_sig) <= sig_atol)
    if expected_mean is not None:
        out["expected_mean_leapfrog"] = float(expected_mean)
        ok = abs(mean - expected_mean) <= mean_rtol * max(expected_mean,
                                                          1.0)
        healthy = ok if healthy is None else (healthy and ok)
    out["healthy"] = healthy
    return out


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
