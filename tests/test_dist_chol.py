# -*- coding: utf-8 -*-
"""Distributed blocked Cholesky vs the dense oracle (8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
import pytest

from george_tpu.parallel import chain_mesh
from george_tpu.parallel.dist_chol import (
    cholesky_local, solve_local, distributed_cholesky,
)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


def test_distributed_cholesky_matches_dense():
    n = 8 * 2 * 16          # P=8 devices x 2 panels of B=16 each
    K = _spd(n)
    mesh = chain_mesh(8, axis="data")
    L, logdet = distributed_cholesky(K, mesh, block_size=16)
    L_ref = np.linalg.cholesky(K)
    _, logdet_ref = np.linalg.slogdet(K)
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(logdet), logdet_ref, rtol=1e-10)


def test_distributed_cholesky_padding():
    # N not divisible by P*B: wrapper pads with identity.
    n = 100
    K = _spd(n, seed=1)
    mesh = chain_mesh(8, axis="data")
    L, logdet = distributed_cholesky(K, mesh, block_size=16)
    _, logdet_ref = np.linalg.slogdet(K)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(K), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(float(logdet), logdet_ref, rtol=1e-10)


def test_distributed_solve_matches_dense():
    n = 8 * 32              # one panel per device shard at B=16
    K = _spd(n, seed=2)
    b = np.random.default_rng(3).standard_normal(n)
    mesh = chain_mesh(8, axis="data")

    def run(K, b):
        L_loc, logdet = cholesky_local(K, "data", block_size=16)
        x = solve_local(L_loc, b, "data", block_size=16)
        # Identical on every device but vma-typed varying; pmean for P().
        return jax.lax.pmean((x, logdet), "data")

    fn = jax.shard_map(
        run, mesh=mesh, in_specs=(P("data", None), P()),
        out_specs=(P(), P()), check_vma=True,
    )
    x, logdet = jax.jit(fn)(jnp.asarray(K), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(K, b), rtol=1e-8, atol=1e-8
    )


def test_distributed_loglike_matches_dense():
    """Full sharded GP likelihood == the single-device fused program."""
    import george_tpu as george
    from george_tpu import kernels
    from george_tpu.parallel.sharded import make_sharded_gp_log_prob_factory

    rng = np.random.default_rng(7)
    n = 8 * 16
    x = np.sort(rng.uniform(0, 10, n))
    yerr = 0.1 * np.ones(n)
    y = np.sin(x) + yerr * rng.standard_normal(n)
    gp = george.GP(
        1.5 * kernels.Matern32Kernel(0.9),
        white_noise=np.log(1e-3), fit_white_noise=True,
    )
    gp.compute(x, yerr)
    ll_ref = gp.log_likelihood(y)

    mesh = chain_mesh(8, axis="data")
    factory, data = make_sharded_gp_log_prob_factory(
        gp, x, y, yerr, distributed_cholesky=True, block_size=16
    )
    theta = jnp.asarray(gp.get_parameter_vector())

    def run(*data_local):
        return factory(*data_local)(theta)

    fn = jax.shard_map(
        run, mesh=mesh, in_specs=tuple(P("data") for _ in data),
        out_specs=P(), check_vma=True,
    )
    ll = jax.jit(fn)(*[jnp.asarray(d) for d in data])
    np.testing.assert_allclose(float(ll), float(ll_ref), rtol=1e-9)


def test_distributed_loglike_gradient():
    """jax.grad flows through the sharded factorization + substitutions."""
    import george_tpu as george
    from george_tpu import kernels
    from george_tpu.parallel.sharded import make_sharded_gp_log_prob_factory
    from george_tpu.samplers import build_gp_log_prob

    rng = np.random.default_rng(11)
    n = 8 * 16
    x = np.sort(rng.uniform(0, 10, n))
    yerr = 0.1 * np.ones(n)
    y = np.sin(x) + yerr * rng.standard_normal(n)
    gp = george.GP(
        1.5 * kernels.Matern32Kernel(0.9),
        white_noise=np.log(1e-3), fit_white_noise=True,
    )
    log_prob_ref, theta0 = build_gp_log_prob(gp, x, y, yerr)
    g_ref = jax.grad(log_prob_ref)(jnp.asarray(theta0))

    mesh = chain_mesh(8, axis="data")
    factory, data = make_sharded_gp_log_prob_factory(
        gp, x, y, yerr, distributed_cholesky=True, block_size=16
    )

    def run(theta, *data_local):
        return jax.grad(factory(*data_local))(theta)

    fn = jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(),) + tuple(P("data") for _ in data),
        out_specs=P(), check_vma=True,
    )
    g = jax.jit(fn)(jnp.asarray(theta0), *[jnp.asarray(d) for d in data])
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-8)


def test_sharded_factory_auto_padding():
    """The data-sharded factory pads internally to a P*block multiple and
    the padded rows contribute nothing: log-likelihood matches the plain
    GP on the unpadded dataset."""
    import george_tpu as george
    from george_tpu import kernels
    from george_tpu.parallel import chain_mesh
    from george_tpu.parallel.sharded import (
        make_sharded_gp_log_prob_factory,
    )

    rng = np.random.default_rng(3)
    n = 300                          # pads to 8 * 32 * ceil = 512
    x = np.sort(rng.uniform(0, 10, n))
    yerr = 0.1 * np.ones(n)
    y = np.sin(x) + yerr * rng.standard_normal(n)

    gp = george.GP(1.0 * kernels.Matern32Kernel(1.0),
                   white_noise=np.log(1e-3), fit_white_noise=True)
    gp.compute(x, yerr)
    theta = jnp.asarray(gp.get_parameter_vector())
    ll_ref = gp.log_likelihood(y)

    mesh = chain_mesh(8, axis="data")
    factory, data = make_sharded_gp_log_prob_factory(
        gp, x, y, yerr, distributed_cholesky=True, block_size=32,
        mesh=mesh,
    )
    assert data[0].shape[0] == 512   # padded global arrays

    def run(x_l, y_l, v_l):
        return factory(x_l, y_l, v_l)(theta)

    fn = jax.shard_map(
        run, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=True,
    )
    ll = float(jax.jit(fn)(*[jnp.asarray(d) for d in data]))
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-8)
