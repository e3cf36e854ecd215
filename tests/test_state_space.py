# -*- coding: utf-8 -*-
"""State-space (Kalman) likelihood vs the dense oracle.

Both paths compute the *same* marginal likelihood — the state-space form is
an exact reparameterization for Markovian 1-D kernels, not an approximation
— so agreement is to fp accuracy, not a tolerance band.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import george_tpu as george
from george_tpu import kernels
from george_tpu.samplers import build_gp_log_prob
from george_tpu.ops.state_space import (
    StateSpaceUnsupported, extract_terms, state_space_loglike_fn,
    supports_state_space,
)


def _dataset(n=300, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 10, n))
    yerr = 0.1 * np.ones(n)
    y = np.sin(t) + yerr * rng.standard_normal(n)
    return t, y, yerr


KERNELS = {
    "exp": lambda: 0.5 * kernels.ExpKernel(2.0),
    "matern32": lambda: 1.7 * kernels.Matern32Kernel(0.8),
    "matern52": lambda: 2.0 * kernels.Matern52Kernel(1.3),
    "cosine_plus": lambda: 0.3 * kernels.CosineKernel(log_period=0.7)
        + 1.1 * kernels.Matern32Kernel(2.0),
    "const_plus": lambda: kernels.ConstantKernel(log_constant=-0.5)
        + kernels.ExpKernel(1.0),
    "sum3": lambda: 1.7 * kernels.Matern32Kernel(0.8)
        + 0.5 * kernels.ExpKernel(2.0) + 2.0 * kernels.Matern52Kernel(1.3),
}


@pytest.mark.parametrize("name", sorted(KERNELS))
@pytest.mark.parametrize("method", ["state_space", "state_space_parallel"])
def test_matches_dense(name, method):
    t, y, yerr = _dataset()
    gp = george.GP(
        KERNELS[name](), white_noise=np.log(1e-3), fit_white_noise=True
    )
    lp_dense, theta0 = build_gp_log_prob(gp, t, y, yerr, method="dense")
    lp_ss, _ = build_gp_log_prob(gp, t, y, yerr, method=method)
    np.testing.assert_allclose(
        float(lp_ss(theta0)), float(lp_dense(theta0)), rtol=1e-10
    )


@pytest.mark.parametrize("method", ["state_space", "state_space_parallel"])
def test_gradient_matches_dense(method):
    t, y, yerr = _dataset(n=200, seed=3)
    gp = george.GP(
        1.3 * kernels.Matern32Kernel(0.7) + 0.4 * kernels.ExpKernel(1.5),
        white_noise=np.log(1e-3), fit_white_noise=True,
    )
    lp_dense, theta0 = build_gp_log_prob(gp, t, y, yerr, method="dense")
    lp_ss, _ = build_gp_log_prob(gp, t, y, yerr, method=method)
    g_dense = jax.grad(lp_dense)(jnp.asarray(theta0))
    g_ss = jax.grad(lp_ss)(jnp.asarray(theta0))
    np.testing.assert_allclose(
        np.asarray(g_ss), np.asarray(g_dense), rtol=1e-7, atol=1e-9
    )


def test_auto_selects_state_space_and_agrees():
    t, y, yerr = _dataset(n=150, seed=5)
    gp = george.GP(1.0 * kernels.Matern32Kernel(1.0))
    lp_auto, theta0 = build_gp_log_prob(gp, t, y, yerr)  # method="auto"
    lp_dense, _ = build_gp_log_prob(gp, t, y, yerr, method="dense")
    np.testing.assert_allclose(
        float(lp_auto(theta0)), float(lp_dense(theta0)), rtol=1e-10
    )


def test_unsorted_inputs():
    """The filter sorts internally; likelihood is permutation-invariant."""
    t, y, yerr = _dataset(n=100, seed=7)
    perm = np.random.default_rng(0).permutation(len(t))
    gp = george.GP(1.0 * kernels.Matern32Kernel(1.0))
    lp_sorted, theta0 = build_gp_log_prob(gp, t, y, yerr,
                                          method="state_space")
    lp_perm, _ = build_gp_log_prob(gp, t[perm], y[perm], yerr[perm],
                                   method="state_space")
    np.testing.assert_allclose(
        float(lp_perm(theta0)), float(lp_sorted(theta0)), rtol=1e-10
    )


def test_unsupported_kernels_raise_or_fall_back():
    t, y, yerr = _dataset(n=50)
    gp = george.GP(1.0 * kernels.ExpSquaredKernel(1.0))
    with pytest.raises(StateSpaceUnsupported):
        build_gp_log_prob(gp, t, y, yerr, method="state_space")
    # auto falls back to dense silently.
    lp_auto, theta0 = build_gp_log_prob(gp, t, y, yerr, method="auto")
    lp_dense, _ = build_gp_log_prob(gp, t, y, yerr, method="dense")
    np.testing.assert_allclose(
        float(lp_auto(theta0)), float(lp_dense(theta0)), rtol=1e-12
    )
    # Multi-dim inputs: Markovian kernel but not 1-D.
    x2 = np.column_stack([t, t])
    gp2 = george.GP(1.0 * kernels.Matern32Kernel(1.0, ndim=2))
    with pytest.raises(StateSpaceUnsupported):
        build_gp_log_prob(gp2, x2, y, yerr, method="state_space")


def test_product_of_dynamic_kernels_unsupported():
    k = kernels.Matern32Kernel(1.0) * kernels.ExpKernel(1.0)
    gp = george.GP(k)
    assert not supports_state_space(gp.kernel.spec_node())


def test_extract_terms_structure():
    k = 2.0 * kernels.Matern52Kernel(1.0) + kernels.CosineKernel(
        log_period=0.0
    )
    terms = extract_terms(george.GP(k).kernel.spec_node())
    assert sorted(t["family"] for t in terms) == ["cosine", "matern2"]
    assert sum(t["dim"] for t in terms) == 5


def test_pinned_reference_value_state_space():
    """The scaling.rst anchor (133.946394912) through the Kalman path."""
    rng = np.random.RandomState(1234)
    x = np.sort(rng.uniform(0, 10, 50000))[:100]
    yerr = 0.1 * np.ones_like(x)
    y = np.sin(x)
    # ExpKernel is Markovian; cross-check the dense pinned test's setup but
    # with a state-space-able kernel against the dense path.
    gp = george.GP(1.0 * kernels.ExpKernel(1.0))
    lp_ss, theta0 = build_gp_log_prob(gp, x, y, yerr, method="state_space")
    lp_dense, _ = build_gp_log_prob(gp, x, y, yerr, method="dense")
    np.testing.assert_allclose(
        float(lp_ss(theta0)), float(lp_dense(theta0)), rtol=1e-10
    )


# -- the GP-level StateSpaceSolver -------------------------------------------

def test_state_space_solver_matches_basic():
    from george_tpu.solvers import BasicSolver, StateSpaceSolver

    t, y, yerr = _dataset(n=200, seed=13)
    k = 1.4 * kernels.Matern32Kernel(0.9) + 0.3 * kernels.ExpKernel(1.2)
    gp_basic = george.GP(k, solver=BasicSolver)
    gp_ss = george.GP(k, solver=StateSpaceSolver)
    gp_basic.compute(t, yerr)
    gp_ss.compute(t, yerr)

    np.testing.assert_allclose(
        gp_ss.solver.log_determinant, gp_basic.solver.log_determinant,
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        gp_ss.log_likelihood(y), gp_basic.log_likelihood(y), rtol=1e-9
    )
    # apply_inverse (vector + matrix) via the smoother identity.
    np.testing.assert_allclose(
        gp_ss.solver.apply_inverse(y), gp_basic.solver.apply_inverse(y),
        rtol=1e-7, atol=1e-9,
    )
    R = np.random.default_rng(0).standard_normal((len(t), 3))
    np.testing.assert_allclose(
        gp_ss.solver.apply_inverse(R), gp_basic.solver.apply_inverse(R),
        rtol=1e-7, atol=1e-9,
    )
    # Prediction goes through apply_inverse.
    ts = np.linspace(0, 10, 31)
    mu_ss, var_ss = gp_ss.predict(y, ts, return_var=True)
    mu_b, var_b = gp_basic.predict(y, ts, return_var=True)
    np.testing.assert_allclose(mu_ss, mu_b, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(var_ss, var_b, rtol=1e-6, atol=1e-9)


def test_state_space_solver_grad_log_likelihood():
    from george_tpu.solvers import BasicSolver, StateSpaceSolver

    t, y, yerr = _dataset(n=150, seed=17)
    def mk(solver):
        return george.GP(
            1.2 * kernels.Matern52Kernel(1.1), solver=solver,
            white_noise=np.log(1e-3), fit_white_noise=True,
        )
    gp_basic, gp_ss = mk(BasicSolver), mk(StateSpaceSolver)
    gp_basic.compute(t, yerr)
    gp_ss.compute(t, yerr)
    np.testing.assert_allclose(
        gp_ss.grad_log_likelihood(y), gp_basic.grad_log_likelihood(y),
        rtol=1e-6, atol=1e-9,
    )


def test_state_space_solver_unsorted_inputs():
    from george_tpu.solvers import BasicSolver, StateSpaceSolver

    t, y, yerr = _dataset(n=120, seed=19)
    perm = np.random.default_rng(1).permutation(len(t))
    gp_basic = george.GP(1.0 * kernels.Matern32Kernel(1.0),
                         solver=BasicSolver)
    gp_ss = george.GP(1.0 * kernels.Matern32Kernel(1.0),
                      solver=StateSpaceSolver)
    gp_basic.compute(t[perm], yerr[perm])
    gp_ss.compute(t[perm], yerr[perm])
    np.testing.assert_allclose(
        gp_ss.log_likelihood(y[perm]), gp_basic.log_likelihood(y[perm]),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        gp_ss.solver.apply_inverse(y[perm]),
        gp_basic.solver.apply_inverse(y[perm]),
        rtol=1e-7, atol=1e-9,
    )


def test_state_space_solver_rejects_unsupported():
    from george_tpu.solvers import StateSpaceSolver

    with pytest.raises(ValueError):
        StateSpaceSolver(1.0 * kernels.ExpSquaredKernel(1.0))
    solver = StateSpaceSolver(1.0 * kernels.Matern32Kernel(1.0))
    with pytest.raises(ValueError):
        solver.compute(np.linspace(0, 1, 10), 0.0)   # zero noise variance


def test_state_space_apply_sqrt_covariance():
    """The innovations square root reproduces K + diag(v) empirically and
    exactly (W W^T against the dense covariance)."""
    from george_tpu.solvers import BasicSolver, StateSpaceSolver

    t, _, yerr = _dataset(n=60, seed=23)
    k = 1.3 * kernels.Matern32Kernel(0.8)
    gp_ss = george.GP(k, solver=StateSpaceSolver)
    gp_basic = george.GP(k, solver=BasicSolver)
    gp_ss.compute(t, yerr)
    gp_basic.compute(t, yerr)

    # Exact check: applying to the identity gives a square root W of K.
    W = gp_ss.solver.apply_sqrt(np.eye(len(t)))
    K = gp_basic.get_matrix(t) + np.diag(yerr ** 2)
    np.testing.assert_allclose(W.T @ W, K, rtol=1e-8, atol=1e-10)

    # And GP.sample runs through it.
    s = gp_ss.sample(size=3)
    assert s.shape == (3, len(t))


# Three cases cover every term family and state dims 1..7 (compile time on
# the x64 CPU oracle path is the limiter).
@pytest.mark.parametrize("name", ["exp", "cosine_plus", "sum3"])
def test_scalarized_matches_stacked_filter(name):
    """The chains-in-lanes scalarized scan is the same filter as the stacked
    (M, d, d) oracle — values and hyperparameter gradients agree exactly."""
    t, y, yerr = _dataset(n=150, seed=7)
    gp = george.GP(
        KERNELS[name](), white_noise=np.log(1e-3), fit_white_noise=True
    )
    node = gp.kernel.spec_node()
    theta = jnp.asarray(gp.kernel.get_parameter_vector(include_frozen=True))
    r = jnp.asarray(y)
    v = jnp.asarray(yerr**2 + 1e-3)
    tt = jnp.asarray(t)

    ll_scal = state_space_loglike_fn(node, method="sequential")
    ll_stack = state_space_loglike_fn(node, method="sequential_stacked")
    np.testing.assert_allclose(
        float(ll_scal(theta, tt, r, v)), float(ll_stack(theta, tt, r, v)),
        rtol=1e-12,
    )
    g_scal = np.asarray(jax.grad(ll_scal)(theta, tt, r, v))
    g_stack = np.asarray(jax.grad(ll_stack)(theta, tt, r, v))
    np.testing.assert_allclose(g_scal, g_stack, rtol=1e-8, atol=1e-10)
