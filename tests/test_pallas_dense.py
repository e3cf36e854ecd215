# -*- coding: utf-8 -*-
"""Fused Pallas batched dense value+gradient vs the XLA path (interpret).

Oracle pattern: the batched kernel attached to a dense log_prob must
reproduce vmap(value_and_grad(log_prob)) (same math: covariance build +
Cholesky + closed-form gradient contraction, same bounds/prior handling).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import george_tpu as george
from george_tpu import config, kernels
from george_tpu.samplers import build_gp_log_prob


@pytest.fixture
def pallas_dense_always():
    old = config.pallas_dense
    config.pallas_dense = "always"
    yield
    config.pallas_dense = old


def _dataset(n=40, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 8, (n, d))
    yerr = 0.1 * np.ones(n)
    y = np.sin(x[:, 0]) + yerr * rng.standard_normal(n)
    return x, y, yerr


def _config5_gp():
    # BASELINE config #5: multi-dim inputs, Matern32 on a subspace metric.
    return george.GP(
        1.0 * kernels.Matern32Kernel(metric=[1.0, 2.0], ndim=3,
                                     axes=[0, 2]),
        white_noise=np.log(1e-3), fit_white_noise=True,
        mean=0.0, fit_mean=True,
    )


def test_batched_vg_matches_dense_path(pallas_dense_always):
    x, y, yerr = _dataset()
    gp = _config5_gp()
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr, method="dense")
    assert hasattr(log_prob, "batched_value_and_grad")

    rng = np.random.default_rng(1)
    thetas = jnp.asarray(
        np.asarray(theta0)[None, :]
        + 0.2 * rng.standard_normal((6, len(theta0)))
    )
    lp_p, g_p = log_prob.batched_value_and_grad(thetas)
    lp_s, g_s = jax.vmap(jax.value_and_grad(log_prob))(thetas)
    assert np.allclose(np.asarray(lp_p), np.asarray(lp_s),
                       rtol=1e-4, atol=1e-2)
    assert np.allclose(np.asarray(g_p), np.asarray(g_s),
                       rtol=1e-3, atol=1e-2)


def test_batched_vg_bounds_prior_and_nonpd(pallas_dense_always):
    x, y, yerr = _dataset(n=24)
    k = 2.0 * kernels.ExpSquaredKernel(
        metric=1.0, metric_bounds=[(-2.0, 2.0)], ndim=3, axes=[1]
    )
    gp = george.GP(k)

    def log_prior(th):
        return -0.5 * jnp.sum(th ** 2)

    log_prob, theta0 = build_gp_log_prob(
        gp, x, y, yerr, method="dense", log_prior=log_prior
    )
    assert hasattr(log_prob, "batched_value_and_grad")
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
    # Out-of-bounds gradient is the prior's alone.
    assert np.allclose(np.asarray(g[1]), -np.asarray(thetas[1]), atol=1e-5)


def test_batched_vg_frozen_and_padding(pallas_dense_always):
    # N=21 pads to 24 inside the kernel; a frozen amplitude exercises the
    # partial active set.
    x, y, yerr = _dataset(n=21, d=2)
    gp = george.GP(2.0 * kernels.Matern52Kernel(metric=1.5, ndim=2))
    gp.kernel.freeze_parameter("k1:log_constant")
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr, method="dense")
    assert hasattr(log_prob, "batched_value_and_grad")
    assert len(theta0) == 1
    thetas = jnp.asarray(np.linspace(-0.5, 0.5, 4)[:, None])
    lp_p, g_p = log_prob.batched_value_and_grad(thetas)
    lp_s, g_s = jax.vmap(jax.value_and_grad(log_prob))(thetas)
    assert np.allclose(np.asarray(lp_p), np.asarray(lp_s),
                       rtol=1e-4, atol=1e-2)
    assert np.allclose(np.asarray(g_p), np.asarray(g_s),
                       rtol=1e-3, atol=1e-2)


def test_not_attached_when_unsupported(pallas_dense_always):
    x, y, yerr = _dataset(n=20, d=2)
    # General (full SPD) metric -> no lanes-batched form -> the MXU hybrid
    # takes it instead (its XLA build supports every metric type).
    gp = george.GP(1.0 * kernels.ExpSquaredKernel(
        metric=[[1.0, 0.1], [0.1, 2.0]], ndim=2
    ))
    log_prob, _ = build_gp_log_prob(gp, x, y, yerr, method="dense")
    assert log_prob.engine == "dense_mxu"

    # N > the MXU envelope -> no attach at all.
    from george_tpu.ops.dense_mxu import MXU_MAX_N
    x2, y2, yerr2 = _dataset(n=MXU_MAX_N + 12)
    gp2 = _config5_gp()
    log_prob2, _ = build_gp_log_prob(gp2, x2, y2, yerr2, method="dense")
    assert not hasattr(log_prob2, "batched_value_and_grad")


def test_vmapped_vg_routes_through_fused_kernel(pallas_dense_always):
    """The custom_vmap seam: vmap of the per-chain value_and_grad must hit
    the fused batch kernel and agree with the plain vmapped gradient."""
    from george_tpu.samplers.mcmc import _fuse_batched_vg

    x, y, yerr = _dataset(n=32)
    gp = _config5_gp()
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr, method="dense")
    assert hasattr(log_prob, "batched_value_and_grad")

    zs = jnp.asarray(theta0) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (8, len(theta0))
    )
    vg_s = jax.value_and_grad(log_prob)
    vg_f = _fuse_batched_vg(vg_s, log_prob.batched_value_and_grad)
    lp_f, g_f = jax.vmap(vg_f)(zs)
    lp_s, g_s = jax.vmap(vg_s)(zs)
    assert np.allclose(np.asarray(lp_f), np.asarray(lp_s),
                       rtol=1e-4, atol=1e-2)
    assert np.allclose(np.asarray(g_f), np.asarray(g_s),
                       rtol=1e-3, atol=1e-2)
    # Unbatched call takes the scalar path and is exact.
    l1, g1 = vg_f(zs[0])
    l2, g2 = vg_s(zs[0])
    assert float(l1) == float(l2)
    assert np.array_equal(np.asarray(g1), np.asarray(g2))


def test_nuts_routes_through_fused_kernel(pallas_dense_always):
    """End-to-end NUTS over the fused kernel reproduces the plain path
    within MC error (a weak prior keeps the posterior proper)."""
    x, y, yerr = _dataset(n=32)
    gp = _config5_gp()

    def log_prior(th):
        return -0.05 * jnp.sum(th ** 2)

    log_prob, theta0 = build_gp_log_prob(
        gp, x, y, yerr, method="dense", log_prior=log_prior
    )
    assert hasattr(log_prob, "batched_value_and_grad")

    from george_tpu.samplers import run_mcmc, summary

    key = jax.random.PRNGKey(0)
    z0 = jnp.asarray(theta0) + 0.1 * jax.random.normal(
        key, (16, len(theta0))
    )
    res = run_mcmc(log_prob, z0, key, algorithm="nuts",
                   num_warmup=60, num_samples=60, max_depth=6)
    s = summary(res.samples)
    assert np.all(np.isfinite(np.asarray(s["mean"])))

    config.pallas_dense = "never"
    log_prob2, _ = build_gp_log_prob(
        gp, x, y, yerr, method="dense", log_prior=log_prior
    )
    assert not hasattr(log_prob2, "batched_value_and_grad")
    res2 = run_mcmc(log_prob2, z0, key, algorithm="nuts",
                    num_warmup=60, num_samples=60, max_depth=6)
    s2 = summary(res2.samples)
    scale = 1.0 + np.abs(np.asarray(s2["mean"]))
    assert np.all(
        np.abs(np.asarray(s["mean"]) - np.asarray(s2["mean"])) / scale < 0.5
    )


def test_chees_uses_batched_dense_vg(pallas_dense_always):
    x, y, yerr = _dataset(n=24)
    gp = _config5_gp()
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr, method="dense")

    from george_tpu.samplers import run_mcmc, summary

    key = jax.random.PRNGKey(1)
    z0 = jnp.asarray(theta0) + 0.1 * jax.random.normal(
        key, (8, len(theta0))
    )
    res = run_mcmc(log_prob, z0, key, algorithm="chees",
                   num_warmup=40, num_samples=40)
    s = summary(res.samples)
    assert np.all(np.isfinite(np.asarray(s["mean"])))


def test_fallback_logging_out_of_envelope(caplog):
    # N above MAX_N lands on the XLA path with a one-line engine notice
    # (config.engine_log); "never" and in-envelope attach stay silent.
    import logging
    import george_tpu as george
    from george_tpu import kernels
    from george_tpu.samplers import build_gp_log_prob
    from george_tpu.ops import dense_mxu as pdm

    rng = np.random.default_rng(0)
    N = pdm.MXU_MAX_N + 8
    x = rng.uniform(-3, 8, (N, 3))
    y = np.sin(x[:, 0])
    gp = george.GP(
        1.0 * kernels.Matern32Kernel(metric=[1.0, 2.0], ndim=3,
                                     axes=[0, 2]),
        white_noise=np.log(1e-3), fit_white_noise=True,
    )
    config.pallas_dense = "always"
    try:
        with caplog.at_level(logging.WARNING, logger="george_tpu"):
            log_prob, _ = build_gp_log_prob(gp, x, y, 0.1, method="dense")
    finally:
        config.pallas_dense = "auto"
    assert not hasattr(log_prob, "batched_value_and_grad")
    assert any("falling back" in r.getMessage() for r in caplog.records)

    config.engine_log = False
    config.pallas_dense = "always"
    try:
        with caplog.at_level(logging.WARNING, logger="george_tpu"):
            caplog.clear()
            build_gp_log_prob(gp, x, y, 0.1, method="dense")
    finally:
        config.engine_log = True
        config.pallas_dense = "auto"
    assert not caplog.records


def test_batched_vg_fori_branch_above_128(pallas_dense_always):
    # N just over the unroll threshold exercises the fori_loop + ref-based
    # slicing code paths (build, gradient, chunked Cholesky/trtri) that
    # the N<=128 tests never touch.
    x, y, yerr = _dataset(n=136)
    gp = _config5_gp()
    log_prob, theta0 = build_gp_log_prob(gp, x, y, yerr, method="dense")
    assert hasattr(log_prob, "batched_value_and_grad")

    rng = np.random.default_rng(5)
    thetas = jnp.asarray(
        np.asarray(theta0)[None, :]
        + 0.15 * rng.standard_normal((4, len(theta0)))
    )
    lp_p, g_p = log_prob.batched_value_and_grad(thetas)
    lp_s, g_s = jax.vmap(jax.value_and_grad(log_prob))(thetas)
    assert np.allclose(np.asarray(lp_p), np.asarray(lp_s),
                       rtol=1e-4, atol=1e-2)
    assert np.allclose(np.asarray(g_p), np.asarray(g_s),
                       rtol=1e-3, atol=1e-2)
