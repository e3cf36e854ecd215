# -*- coding: utf-8 -*-
"""Fused Pallas Kalman value+gradient vs the scan path (interpret mode).

Oracle pattern: the batched kernel attached to a state-space log_prob must
reproduce vmap(value_and_grad(log_prob)) exactly (same filter math, same
bounds/prior handling).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import george_tpu as george
from george_tpu import config, kernels
from george_tpu.samplers import build_gp_log_prob


@pytest.fixture
def pallas_kalman_always():
    old = config.pallas_kalman
    config.pallas_kalman = "always"
    yield
    config.pallas_kalman = old


def _dataset(n=48, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 10, n))
    yerr = 0.1 * np.ones(n)
    y = np.sin(x) + yerr * rng.standard_normal(n)
    return x, y, yerr


def test_batched_vg_matches_scan_path(pallas_kalman_always):
    x, y, yerr = _dataset()
    gp = george.GP(
        1.0 * kernels.Matern32Kernel(1.0),
        white_noise=np.log(1e-4), fit_white_noise=True,
    )
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr)
    assert hasattr(log_prob, "batched_value_and_grad")

    rng = np.random.default_rng(1)
    thetas = jnp.asarray(
        np.asarray(theta0)[None, :]
        + 0.2 * rng.standard_normal((5, len(theta0)))
    )
    lp_p, g_p = log_prob.batched_value_and_grad(thetas)
    lp_s, g_s = jax.vmap(jax.value_and_grad(log_prob))(thetas)
    # f32 kernel vs f64 scan: tolerances are f32-level.
    assert np.allclose(np.asarray(lp_p), np.asarray(lp_s),
                       rtol=1e-4, atol=1e-2)
    assert np.allclose(np.asarray(g_p), np.asarray(g_s),
                       rtol=1e-3, atol=1e-2)


def test_batched_vg_bounds_and_prior(pallas_kalman_always):
    x, y, yerr = _dataset()
    k = 1.0 * kernels.Matern32Kernel(
        metric=1.0, metric_bounds=[(-2.0, 2.0)]
    )
    gp = george.GP(k)

    def log_prior(th):
        return -0.5 * jnp.sum(th ** 2)

    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr,
                                         log_prior=log_prior)
    thetas = jnp.stack([
        jnp.asarray(theta0),
        jnp.asarray(theta0).at[-1].set(5.0),   # out of bounds
    ])
    lp, g = log_prob.batched_value_and_grad(thetas)
    lp_ref = jax.vmap(log_prob)(thetas)
    assert np.isfinite(float(lp[0]))
    assert float(lp[1]) == -np.inf
    assert np.allclose(np.asarray(lp), np.asarray(lp_ref),
                       rtol=1e-4, atol=1e-2)
    # Out-of-bounds gradient is the prior's alone (likelihood part zeroed).
    assert np.allclose(np.asarray(g[1]), -np.asarray(thetas[1]), atol=1e-5)


def test_batched_vg_frozen_params(pallas_kalman_always):
    x, y, yerr = _dataset()
    gp = george.GP(2.0 * kernels.ExpKernel(1.5))
    gp.kernel.freeze_parameter("k1:log_constant")
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr)
    assert len(theta0) == 1
    thetas = jnp.asarray(np.linspace(-0.5, 0.5, 4)[:, None])
    lp_p, g_p = log_prob.batched_value_and_grad(thetas)
    lp_s, g_s = jax.vmap(jax.value_and_grad(log_prob))(thetas)
    assert np.allclose(np.asarray(lp_p), np.asarray(lp_s),
                       rtol=1e-4, atol=1e-2)
    assert np.allclose(np.asarray(g_p), np.asarray(g_s),
                       rtol=1e-3, atol=1e-2)


def test_not_attached_for_unsupported_models(pallas_kalman_always):
    x, y, yerr = _dataset()

    from george_tpu.modeling import Model

    class Mean(Model):
        parameter_names = ("a", "b")

        def get_value(self, x):
            return self.a * x[:, 0] + self.b

        def jax_value(self, params, x):
            return params[0] * x[:, 0] + params[1]

    gp = george.GP(1.0 * kernels.Matern32Kernel(1.0),
                   mean=Mean(a=0.1, b=0.0), fit_mean=True)
    log_prob, _ = build_gp_log_prob(gp, x, y, yerr)
    assert not hasattr(log_prob, "batched_value_and_grad")


def test_chees_uses_batched_vg(pallas_kalman_always):
    # End-to-end: run_mcmc(algorithm="chees") on a state-space GP with the
    # interpret-mode kernel attached; moments must match the scan path.
    x, y, yerr = _dataset(n=32)
    gp = george.GP(1.0 * kernels.Matern32Kernel(1.0))
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr)
    assert hasattr(log_prob, "batched_value_and_grad")

    from george_tpu.samplers import run_mcmc, summary

    key = jax.random.PRNGKey(0)
    z0 = jnp.asarray(theta0) + 0.1 * jax.random.normal(key, (16, 2))
    res = run_mcmc(log_prob, z0, key, algorithm="chees",
                   num_warmup=40, num_samples=40)
    s = summary(res.samples)
    assert np.all(np.isfinite(np.asarray(s["mean"])))

    config.pallas_kalman = "never"
    log_prob2, _ = build_gp_log_prob(gp, x, y, yerr)
    assert not hasattr(log_prob2, "batched_value_and_grad")
    res2 = run_mcmc(log_prob2, z0, key, algorithm="chees",
                    num_warmup=40, num_samples=40)
    s2 = summary(res2.samples)
    # Same posterior within loose MC error (different arithmetic, f32 vs
    # f64, so not bitwise).
    assert np.all(np.abs(np.asarray(s["mean"]) - np.asarray(s2["mean"]))
                  < 0.5)


def test_large_epoch_dt_precision(pallas_kalman_always):
    # f32 resolution at t ~ 2.45e6 (astronomical epochs) is ~0.25, far
    # coarser than the sampling cadence; the kernel must difference the
    # f64 host times BEFORE casting, or every transition matrix is wrong.
    rng = np.random.default_rng(3)
    n = 64
    x = 2.45e6 + np.sort(rng.uniform(0, 10, n))
    yerr = 0.1 * np.ones(n)
    y = np.sin(x - 2.45e6) + yerr * rng.standard_normal(n)
    gp = george.GP(1.0 * kernels.Matern32Kernel(1.0))
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr)

    # Oracle: same data on a small-offset axis (identical gaps).
    gp2 = george.GP(1.0 * kernels.Matern32Kernel(1.0))
    log_prob2, _ = build_gp_log_prob(gp2, x - x[0], y, yerr)

    thetas = jnp.asarray(
        np.asarray(theta0)[None, :]
        + 0.1 * rng.standard_normal((4, len(theta0)))
    )
    lp, g = log_prob.batched_value_and_grad(thetas)
    lp_ref, g_ref = jax.vmap(jax.value_and_grad(log_prob2))(thetas)
    assert np.allclose(np.asarray(lp), np.asarray(lp_ref),
                       rtol=1e-4, atol=5e-2)
    assert np.allclose(np.asarray(g), np.asarray(g_ref),
                       rtol=1e-3, atol=5e-2)


def test_streaming_kernel_matches_scan(pallas_kalman_always, monkeypatch):
    # Force the HBM-streaming path with a tiny SMEM window so the chunked
    # DMA pipeline (prologue, double buffering, ragged last chunk) is
    # exercised in interpret mode.
    from george_tpu.ops import pallas_kalman as pk

    monkeypatch.setattr(pk, "_SMEM_N", 40)
    monkeypatch.setattr(pk, "_STREAM_CHUNK", 32)

    rng = np.random.default_rng(7)
    n = 150                      # 149 steps -> 5 chunks, last one ragged
    x = np.sort(rng.uniform(0, 30, n))
    yerr = 0.1 * np.ones(n)
    y = np.sin(x) + yerr * rng.standard_normal(n)
    gp = george.GP(1.0 * kernels.Matern32Kernel(1.0),
                   white_noise=np.log(1e-4), fit_white_noise=True)
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr)
    assert hasattr(log_prob, "batched_value_and_grad")

    thetas = jnp.asarray(
        np.asarray(theta0)[None, :]
        + 0.2 * rng.standard_normal((5, len(theta0)))
    )
    lp_p, g_p = log_prob.batched_value_and_grad(thetas)
    lp_s, g_s = jax.vmap(jax.value_and_grad(log_prob))(thetas)
    assert np.allclose(np.asarray(lp_p), np.asarray(lp_s),
                       rtol=1e-4, atol=1e-2)
    assert np.allclose(np.asarray(g_p), np.asarray(g_s),
                       rtol=1e-3, atol=1e-2)
