# -*- coding: utf-8 -*-
"""DSL compiler unit tests: autodiff gradients must match the closed-form
``grad`` entries declared in the YAML specs (the reference's C++ bodies
serve the same role; here the YAML forms are the golden cross-check)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from george_tpu.dsl.specs import available_kernels
from george_tpu.dsl import compiler


STATIONARY = [s for s in available_kernels().values() if s.stationary]
NONSTATIONARY = [s for s in available_kernels().values() if not s.stationary]


def _default_params(spec):
    rng = np.random.default_rng(abs(hash(spec.name)) % 2 ** 31)
    return jnp.asarray(rng.uniform(0.2, 1.0, len(spec.params)))


def _default_constants(spec):
    return tuple((name, 2.0) for name, _ in spec.constants)


@pytest.mark.parametrize("spec", STATIONARY, ids=lambda s: s.name)
def test_radial_jvp_matches_dsl_grad(spec):
    consts = _default_constants(spec)
    radial = compiler._radial_fn(spec.name, consts)
    p = _default_params(spec)
    r2 = jnp.asarray(np.linspace(0.0, 4.0, 9))

    # d/d r2 through the custom JVP equals the DSL closed form.
    g_auto = jax.vmap(jax.grad(lambda r: radial(p, r)))(r2)
    g_dsl = compiler._compile_scalar_fn(
        spec, dict(consts), ("r2",), spec.grad_dict["r2"]
    )(p, r2)
    assert np.allclose(np.asarray(g_auto), np.asarray(g_dsl))
    assert np.all(np.isfinite(np.asarray(g_auto)))


@pytest.mark.parametrize("spec", STATIONARY, ids=lambda s: s.name)
def test_radial_param_grads_match_dsl(spec):
    # Where the DSL declares closed-form parameter gradients, autodiff
    # through the custom JVP must agree.
    consts = _default_constants(spec)
    radial = compiler._radial_fn(spec.name, consts)
    p = _default_params(spec)
    r2 = jnp.asarray(np.linspace(0.1, 4.0, 7))
    for i, name in enumerate(spec.params):
        if name not in spec.grad_dict:
            continue
        g_auto = jax.vmap(
            jax.grad(lambda q, r: radial(q, r), argnums=0), in_axes=(None, 0)
        )(p, r2)[:, i]
        g_dsl = compiler._compile_scalar_fn(
            spec, dict(consts), ("r2",), spec.grad_dict[name]
        )(p, r2)
        assert np.allclose(np.asarray(g_auto), np.asarray(g_dsl)), name


@pytest.mark.parametrize("spec", NONSTATIONARY, ids=lambda s: s.name)
def test_pair_grads_match_dsl(spec):
    consts = _default_constants(spec)
    pair = compiler._pair_fn(spec.name, consts)
    p = _default_params(spec)
    a = jnp.asarray(np.linspace(-2.0, 2.0, 5))
    b = jnp.asarray(np.linspace(-1.0, 3.0, 5))

    for i, name in enumerate(spec.params):
        if name not in spec.grad_dict:
            continue
        g_auto = jax.vmap(
            jax.grad(lambda q, u, v: pair(q, u, v), argnums=0),
            in_axes=(None, 0, 0),
        )(p, a, b)[:, i]
        g_dsl = compiler._pair_grad_fn(spec.name, consts, name)(p, a, b)
        assert np.allclose(np.asarray(g_auto), np.asarray(g_dsl)), name

    for wrt, argnum in (("x1", 1), ("x2", 2)):
        if wrt not in spec.grad_dict:
            continue
        g_auto = jax.vmap(
            jax.grad(lambda q, u, v: pair(q, u, v), argnums=argnum),
            in_axes=(None, 0, 0),
        )(p, a, b)
        g_dsl = compiler._pair_grad_fn(spec.name, consts, wrt)(p, a, b)
        assert np.allclose(np.asarray(g_auto), np.asarray(g_dsl)), wrt


def test_stable_kernel_type_ids():
    # The ABI table: pinned ids must match the reference enumeration.
    expected = {
        "LinearKernel": 0, "RationalQuadraticKernel": 1, "ExpKernel": 2,
        "LocalGaussianKernel": 3, "EmptyKernel": 4, "CosineKernel": 5,
        "Matern52Kernel": 6, "ExpSine2Kernel": 7, "ConstantKernel": 8,
        "ExpSquaredKernel": 9, "Matern32Kernel": 10, "PolynomialKernel": 11,
        "DotProductKernel": 12,
    }
    specs = available_kernels()
    assert {n: s.kernel_type for n, s in specs.items()} == expected


def test_pairwise_squared_distance_matches_oracle():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((17, 3))
    B = rng.standard_normal((11, 3))
    r2 = np.asarray(compiler.pairwise_squared_distance(
        jnp.asarray(A), jnp.asarray(B)
    ))
    oracle = np.sum((A[:, None, :] - B[None, :, :]) ** 2, axis=-1)
    assert np.allclose(r2, oracle)
    # Self-distances clamp to exactly >= 0.
    r2s = np.asarray(compiler.pairwise_squared_distance(
        jnp.asarray(A), jnp.asarray(A)
    ))
    assert np.all(r2s >= 0.0)
