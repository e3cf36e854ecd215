# -*- coding: utf-8 -*-
"""MXU per-chain-matrix batched dense value+gradient vs the XLA oracle.

Interpret-mode spine on CPU; the orchestration (blocked Schur Cholesky,
blockwise inverse, closed-form gradient contraction) is plain XLA and runs
identically on every backend.  Oracle: vmap(value_and_grad(log_prob)).
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
    old_mxu = config.dense_mxu_sampling
    config.pallas_dense = "always"
    # The MXU engine is opt-in on the sampler router (round-5 moment-
    # fidelity finding); these tests target the engine itself.
    config.dense_mxu_sampling = True
    yield
    config.pallas_dense = old
    config.dense_mxu_sampling = old_mxu


def _dataset(n, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 8, (n, d))
    yerr = 0.1 * np.ones(n)
    y = np.sin(x[:, 0]) + yerr * rng.standard_normal(n)
    return x, y, yerr


def _config5_gp():
    return george.GP(
        1.0 * kernels.Matern32Kernel(metric=[1.0, 2.0], ndim=3,
                                     axes=[0, 2]),
        white_noise=np.log(1e-3), fit_white_noise=True,
        mean=0.0, fit_mean=True,
    )


def _check_against_oracle(gp, x, y, yerr, n_chains=4, seed=1,
                          log_prior=None):
    log_prob, theta0 = build_gp_log_prob(
        gp, x, y, yerr, method="dense", log_prior=log_prior
    )
    assert log_prob.engine == "dense_mxu"
    assert hasattr(log_prob, "batched_value_and_grad")

    rng = np.random.default_rng(seed)
    thetas = jnp.asarray(
        np.asarray(theta0)[None, :]
        + 0.15 * rng.standard_normal((n_chains, len(theta0)))
    )
    lp_p, g_p = log_prob.batched_value_and_grad(thetas)
    lp_s, g_s = jax.vmap(jax.value_and_grad(log_prob))(thetas)
    assert np.allclose(np.asarray(lp_p), np.asarray(lp_s),
                       rtol=1e-4, atol=5e-2)
    assert np.allclose(np.asarray(g_p), np.asarray(g_s),
                       rtol=1e-3, atol=5e-2)
    return log_prob


def test_mxu_vg_two_panels(pallas_dense_always):
    # N=200 pads to 256: two spine panels + every off-diagonal matmul path.
    x, y, yerr = _dataset(200)
    _check_against_oracle(_config5_gp(), x, y, yerr)


def test_mxu_vg_single_panel_general_metric(pallas_dense_always):
    # The general (Cholesky-parameterized) SPD metric — outside the VPU
    # kernel's envelope entirely (VERDICT r3 #4); here the XLA build
    # handles it and the spine only sees the assembled SPD blocks.
    x, y, yerr = _dataset(40, d=2, seed=3)
    gp = george.GP(
        1.0 * kernels.ExpSquaredKernel(
            metric=[[1.0, 0.1], [0.1, 2.0]], ndim=2
        ),
        white_noise=np.log(1e-3), fit_white_noise=True,
    )
    old = config.dense_mxu_min_n
    config.dense_mxu_min_n = 0   # force the MXU path below 129
    try:
        _check_against_oracle(gp, x, y, yerr)
    finally:
        config.dense_mxu_min_n = old


def test_mxu_vg_three_panels_sum_kernel(pallas_dense_always):
    # N=300 pads to 384 (three panels); a Sum tree with a frozen param
    # exercises the partial active set.
    x, y, yerr = _dataset(300, seed=5)
    gp = george.GP(
        1.0 * kernels.Matern32Kernel(metric=[1.0, 2.0], ndim=3,
                                     axes=[0, 2])
        + 0.5 * kernels.ExpSquaredKernel(metric=2.0, ndim=3, axes=[1]),
        white_noise=np.log(1e-3), fit_white_noise=True,
    )
    gp.kernel.freeze_parameter("k2:k1:log_constant")
    _check_against_oracle(gp, x, y, yerr, n_chains=3)


def test_mxu_vg_bounds_prior_and_nonpd(pallas_dense_always):
    x, y, yerr = _dataset(150, seed=7)
    k = 2.0 * kernels.ExpSquaredKernel(
        metric=1.0, metric_bounds=[(-2.0, 2.0)], ndim=3, axes=[1]
    )
    gp = george.GP(k)

    def log_prior(th):
        return -0.5 * jnp.sum(th ** 2)

    log_prob, theta0 = build_gp_log_prob(
        gp, x, y, yerr, method="dense", log_prior=log_prior
    )
    assert log_prob.engine == "dense_mxu"
    thetas = jnp.stack([
        jnp.asarray(theta0),
        jnp.asarray(theta0).at[-1].set(5.0),   # out of bounds
    ])
    lp, g = log_prob.batched_value_and_grad(thetas)
    lp_ref = jax.vmap(log_prob)(thetas)
    assert np.isfinite(float(lp[0]))
    assert float(lp[1]) == -np.inf
    assert np.allclose(np.asarray(lp), np.asarray(lp_ref),
                       rtol=1e-4, atol=5e-2)
    assert np.allclose(np.asarray(g[1]), -np.asarray(thetas[1]), atol=1e-5)


def test_routing_thresholds(pallas_dense_always):
    # With dense_mxu_sampling opted in (the fixture): <=128 + metric 0/1
    # -> VPU lanes kernel; 129..512 -> MXU hybrid; > 512 -> XLA fallback.
    from george_tpu.ops.dense_mxu import MXU_MAX_N

    x, y, yerr = _dataset(40)
    lp, _ = build_gp_log_prob(_config5_gp(), x, y, yerr, method="dense")
    assert lp.engine == "pallas_dense"

    x, y, yerr = _dataset(140)
    lp, _ = build_gp_log_prob(_config5_gp(), x, y, yerr, method="dense")
    assert lp.engine == "dense_mxu"

    x, y, yerr = _dataset(MXU_MAX_N + 8)
    lp, _ = build_gp_log_prob(_config5_gp(), x, y, yerr, method="dense")
    assert lp.engine == "xla_dense"

    # DEFAULT routing (dense_mxu_sampling off — the round-5 posterior-
    # moment finding): the VPU kernel covers its WHOLE envelope
    # (N <= 256, metric 0/1), XLA beyond it; the MXU hybrid is never
    # silently attached.
    config.dense_mxu_sampling = False
    try:
        x, y, yerr = _dataset(140)
        lp, _ = build_gp_log_prob(_config5_gp(), x, y, yerr,
                                  method="dense")
        assert lp.engine == "pallas_dense"
        x, y, yerr = _dataset(300)
        lp, _ = build_gp_log_prob(_config5_gp(), x, y, yerr,
                                  method="dense")
        assert lp.engine == "xla_dense"
    finally:
        config.dense_mxu_sampling = True
