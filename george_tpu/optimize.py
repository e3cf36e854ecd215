# -*- coding: utf-8 -*-
"""On-device MAP / maximum-likelihood hyperparameter optimization.

The reference delegates optimization to host-side ``scipy.optimize.minimize``
over the stateful ``gp.nll`` / ``gp.grad_nll`` pair
(/root/reference/docs/tutorials/first.rst:95-113, gp.py:470-480) — one
covariance factorization per function evaluation, serial restarts.  Here the
whole minimization is ONE jitted XLA program: the objective is the same
compiled marginal likelihood the samplers use
(:func:`george_tpu.samplers.build_gp_log_prob`), the optimizer is L-BFGS with
a zoom line search (optax), and *restarts batch under ``vmap``* — hundreds of
random initializations run in lockstep on one chip, and the best optimum is
selected on device.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
import optax
import optax.tree_utils as otu

from .samplers.logprob import build_gp_log_prob

__all__ = ["minimize", "OptimizeResult"]


@dataclass
class OptimizeResult:
    """Mirror of the scipy result object (the fields tutorials read)."""

    x: np.ndarray          # best active-parameter vector
    fun: float             # objective (NLL or -log-posterior) at ``x``
    grad_norm: float       # |∂fun/∂x| at ``x`` (inf-norm)
    nit: int               # L-BFGS iterations taken by the winning restart
    success: bool          # converged below ``tol`` before ``max_iters``
    restart_funs: np.ndarray = None  # per-restart final objectives

    def __repr__(self):
        return ("OptimizeResult(fun={0:.9g}, grad_norm={1:.3g}, nit={2}, "
                "success={3})".format(self.fun, self.grad_norm, self.nit,
                                      self.success))


def _lbfgs_run(fun, theta0, max_iters, tol, vtol, memory_size):
    """Jittable single-start L-BFGS: returns (theta, fun, grad_norm, nit).

    Stops on any of: gradient inf-norm below ``tol``; objective improvement
    over an iteration below ``vtol * (1 + |f|)`` (the line search has hit the
    dtype's noise floor — essential on the f32 TPU path, where a tight
    gradient tolerance is unreachable); ``max_iters``; non-finite gradient.
    """
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry):
        theta, state, _ = carry
        prev = otu.tree_get(state, "value")
        value, grad = value_and_grad(theta, state=state)
        updates, state = opt.update(
            grad, state, theta, value=value, grad=grad, value_fn=fun
        )
        theta = optax.apply_updates(theta, updates)
        return theta, state, prev

    def cont(carry):
        _, state, prev = carry
        count = otu.tree_get(state, "count")
        value = otu.tree_get(state, "value")
        grad = otu.tree_get(state, "grad")
        err = jnp.max(jnp.abs(grad))
        stalled = (prev - value) <= vtol * (1.0 + jnp.abs(value))
        # The fresh optimizer state carries value=inf, grad=0: always take
        # the first step (prev=inf also reads as "not stalled" there).  NaN
        # err (objective left the feasible region irrecoverably) stops the
        # loop rather than spinning to max_iters.
        return (count == 0) | (
            (count < max_iters) & (err >= tol) & jnp.isfinite(err)
            & ~stalled
        )

    state0 = opt.init(theta0)
    prev0 = jnp.asarray(jnp.inf, dtype=theta0.dtype)
    theta, state, _ = jax.lax.while_loop(
        cont, step, (theta0, state0, prev0)
    )
    value = otu.tree_get(state, "value")
    grad = otu.tree_get(state, "grad")
    nit = otu.tree_get(state, "count")
    return theta, value, jnp.max(jnp.abs(grad)), nit


def minimize(gp, y, x=None, yerr=None, log_prior=None, method="auto",
             restarts=0, key=None, init_scale=1.0, max_iters=500,
             tol=None, vtol=None, memory_size=10, set_params=True):
    """Minimize the GP's negative marginal log-likelihood on device.

    Drop-in for the reference's documented scipy flow::

        gp.compute(x, yerr)
        result = george_tpu.optimize.minimize(gp, y)   # updates gp params

    :param gp: a :class:`george_tpu.GP`.  If it has been ``compute``-d, the
        stored ``(x, yerr)`` are used; otherwise pass them explicitly.
    :param y: observations.
    :param log_prior: optional traceable ``log_prior(theta_active)`` added to
        the objective (MAP instead of ML).  The modeling protocol's *bounds*
        are always enforced (out-of-bounds evaluates to +inf, so the line
        search treats bound crossings as a barrier).
    :param method: likelihood algorithm, as in
        :func:`~george_tpu.samplers.build_gp_log_prob` (``"auto"`` picks the
        exact O(N) state-space filter when the kernel admits it).
    :param restarts: number of *additional* random initializations; they vmap
        into one batched L-BFGS program.  ``theta0 + init_scale * N(0, I)``.
    :param key: PRNG key for the restarts (default ``jax.random.key(0)``).
    :param tol: gradient inf-norm stopping tolerance (default: 1e-8 in
        float64, 1e-5 in float32).
    :param vtol: relative per-iteration improvement below which the run is
        declared stalled-converged (default: 1e-12 in float64, 1e-7 in
        float32 — the f32 TPU path cannot reach tight gradient tolerances).
    :param set_params: write the winning vector back into ``gp`` (and mark it
        dirty so the next ``log_likelihood`` refactorizes), like the
        tutorials' ``gp.set_parameter_vector(result.x)``.
    :return: :class:`OptimizeResult`.
    """
    if x is None:
        if not hasattr(gp, "_x"):
            raise RuntimeError(
                "You need to compute the model first (or pass x=, yerr=)"
            )
        x = gp._x
        yerr = np.sqrt(gp._yerr2)
    elif yerr is None:
        yerr = 0.0

    log_prob, theta0 = build_gp_log_prob(
        gp, x, y, yerr, log_prior=log_prior, method=method
    )

    # Dtype-aware defaults: the f64 CPU path can drive the gradient to
    # ~1e-8; on the f32 TPU path the objective's noise floor is ~1e-6
    # relative, so convergence is detected by value stall instead.
    f64 = jnp.asarray(theta0).dtype == jnp.float64
    if tol is None:
        tol = 1e-8 if f64 else 1e-5
    if vtol is None:
        vtol = 1e-12 if f64 else 1e-7

    def objective(theta):
        return -log_prob(theta)

    run = jax.jit(
        lambda t0: _lbfgs_run(objective, t0, max_iters, tol, vtol,
                              memory_size)
    )

    if restarts and restarts > 0:
        if key is None:
            key = jax.random.key(0)
        noise = init_scale * jax.random.normal(
            key, (restarts, theta0.shape[0]), dtype=theta0.dtype
        )
        t0s = jnp.concatenate(
            [theta0[None, :], theta0[None, :] + noise], axis=0
        )
        thetas, funs, gnorms, nits = jax.jit(jax.vmap(run))(t0s)
        funs_clean = jnp.where(jnp.isnan(funs), jnp.inf, funs)
        best = int(jnp.argmin(funs_clean))
        theta, fun = thetas[best], funs[best]
        gnorm, nit = gnorms[best], nits[best]
        restart_funs = np.asarray(funs)
    else:
        theta, fun, gnorm, nit = run(theta0)
        restart_funs = np.asarray(fun)[None]

    # Converged = exited before max_iters (gradient tolerance or value
    # stall) with a finite optimum and gradient.
    result = OptimizeResult(
        x=np.asarray(theta),
        fun=float(fun),
        grad_norm=float(gnorm),
        nit=int(nit),
        success=bool(
            np.isfinite(fun) and np.isfinite(gnorm)
            and (float(gnorm) < tol or int(nit) < max_iters)
        ),
        restart_funs=restart_funs,
    )
    if set_params and np.all(np.isfinite(result.x)):
        gp.set_parameter_vector(result.x)
    return result
