# -*- coding: utf-8 -*-
"""Adaptive-tempering Sequential Monte Carlo.

For multimodal posteriors (the quasi-periodic ExpSine2 period posterior in
the benchmark ladder) where HMC/NUTS mix poorly between modes.  The particle
cloud anneals from an initial distribution to the target through
ESS-adaptive temperature steps, with systematic resampling and random-walk
Metropolis mutations whose proposal covariance tracks the cloud.

Everything is ``lax.while_loop``/``scan`` inside one jit; particles are the
batch axis, ready for ``shard_map`` sharding with ``psum`` weight reductions
(axis_name hook, SURVEY.md §2.6).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["run_smc", "SMCResult"]


class SMCResult(NamedTuple):
    particles: jnp.ndarray     # (num_particles, dim) final cloud
    log_prob: jnp.ndarray      # (num_particles,) target density at particles
    log_evidence: jnp.ndarray  # log normalizing-constant estimate
    num_stages: jnp.ndarray    # temperature steps taken
    acceptance: jnp.ndarray    # mean MH acceptance of the final stage


def _systematic_resample(key, log_weights, axis_name=None):
    """Systematic resampling; returns parent indices."""
    n = log_weights.shape[0]
    w = jnp.exp(log_weights - jax.nn.logsumexp(log_weights))
    cum = jnp.cumsum(w)
    u = (jax.random.uniform(key) + jnp.arange(n)) / n
    return jnp.searchsorted(cum, u, side="left").clip(0, n - 1)


def _ess(log_w):
    log_norm = jax.nn.logsumexp(log_w)
    return jnp.exp(2.0 * log_norm - jax.nn.logsumexp(2.0 * log_w))


def run_smc(log_prob, log_init_prob, particles0, key, num_mutations=5,
            target_ess_frac=0.5, max_stages=100, rw_scale=0.5,
            mutation="rw", num_leapfrog=8, hmc_step_scale=0.6,
            axis_name=None):
    """Anneal particles from ``exp(log_init_prob)`` to ``exp(log_prob)``.

    :param log_prob: traceable target log density.
    :param log_init_prob: traceable log density the particles were drawn
        from (tempering path: (1-lam) * init + lam * target).
    :param particles0: (num_particles, dim) draws from the init density.
    :param num_mutations: MH / HMC steps per temperature stage.
    :param target_ess_frac: ESS fraction that picks each temperature jump
        (bisection, as in standard adaptive SMC).
    :param mutation: ``"rw"`` — random-walk MH with cloud-covariance
        proposals (gradient-free, cheapest per step); ``"hmc"`` — Metropolis
        HMC with ``num_leapfrog`` leapfrog steps per mutation, mass matrix =
        inverse cloud covariance (the cloud whitens the tempered target, so
        the dimensionless ``hmc_step_scale`` transfers across problems).
        HMC mutations cost ``num_leapfrog`` gradient evaluations each but
        decorrelate far better per step on smooth unimodal-per-mode
        posteriors.
    """
    particles0 = jnp.asarray(particles0)
    n, dim = particles0.shape
    dtype = particles0.dtype

    _v_target = jax.vmap(log_prob)
    _v_init = jax.vmap(log_init_prob)

    def _one_vg(lam_th):
        lam, th = lam_th
        lt = log_prob(th)
        li = log_init_prob(th)
        return lam * lt + (1.0 - lam) * li, (lt, li)

    def _v_tempered_vg(thetas, lam):
        lams = jnp.broadcast_to(lam, (thetas.shape[0],))
        (vals, (lts, lis)), grads = jax.vmap(
            jax.value_and_grad(_one_vg, has_aux=True)
        )((lams, thetas))
        return vals, lts, lis, grads[1]

    def _distributed(vf):
        """Evaluate a particle-batched density sharded over the mesh.

        The cloud is replicated (hyperparameter dim is small); the O(n x
        model-cost) density evaluations are what shard: each device
        evaluates its slice and the results all_gather back, so the
        algorithm (temperatures, resampling, RNG stream) is *identical* to
        the single-device run.  This is the SMC collective design of
        SURVEY.md §2.6.
        """
        if axis_name is None:
            return vf

        def sharded(thetas, *rest):
            n_loc = thetas.shape[0] // jax.lax.axis_size(axis_name)
            start = jax.lax.axis_index(axis_name) * n_loc
            local = jax.lax.dynamic_slice_in_dim(thetas, start, n_loc)
            return jax.tree_util.tree_map(
                lambda a: jax.lax.all_gather(
                    a, axis_name, axis=0, tiled=True
                ),
                vf(local, *rest),
            )

        return sharded

    v_target = _distributed(_v_target)
    v_init = _distributed(_v_init)
    v_tempered_vg = _distributed(_v_tempered_vg)

    def components(thetas):
        """(log target, log init) with NaNs mapped to -inf (rejection)."""
        lt = v_target(thetas)
        li = v_init(thetas)
        return (jnp.where(jnp.isnan(lt), -jnp.inf, lt),
                jnp.where(jnp.isnan(li), -jnp.inf, li))

    def choose_lambda(lam, delta_logw):
        """Largest new lambda in (lam, 1] keeping ESS >= target (bisection)."""
        target = target_ess_frac * n

        def ess_at(new_lam):
            return _ess((new_lam - lam) * delta_logw)

        def cond(carry):
            lo, hi, it = carry
            return (it < 30) & (hi - lo > 1e-6)

        def body(carry):
            lo, hi, it = carry
            mid = 0.5 * (lo + hi)
            ok = ess_at(mid) >= target
            return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid), it + 1)

        full = ess_at(jnp.asarray(1.0, dtype)) >= target
        from .._vma import pvary_like

        carry0 = pvary_like(
            (lam, jnp.asarray(1.0, dtype), jnp.zeros((), jnp.int32)),
            lam, delta_logw,
        )
        lo, hi, _ = jax.lax.while_loop(cond, body, carry0)
        return jnp.where(full, jnp.asarray(1.0, dtype), lo)

    def _run_mutations(key, thetas, lt, li, lam, log_scale, extra,
                       step_fn):
        """Shared mutation driver: scan of propose -> MH accept -> adapt.

        ``step_fn(key, thetas, lt, li, extra, lam, scale) -> (prop, lt1,
        li1, extra1, delta)`` supplies the proposal; ``extra`` carries any
        per-particle state the kernel reuses across steps (the HMC kernel's
        gradients).  The reported acceptance is the *expected* acceptance
        E[min(1, e^delta)] for both kernels (lower-variance than the
        realized fraction, and the same statistic the adaptation tracks).
        """
        def one(carry, key_t):
            thetas, lt, li, extra, accepts, log_scale = carry
            key_p, key_u = jax.random.split(key_t)
            prop, lt1, li1, extra1, delta = step_fn(
                key_p, thetas, lt, li, extra, lam, jnp.exp(log_scale)
            )
            delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
            u = jax.random.uniform(key_u, (n,), dtype)
            take = jnp.log(u) < delta
            thetas = jnp.where(take[:, None], prop, thetas)
            lt = jnp.where(take, lt1, lt)
            li = jnp.where(take, li1, li)
            extra = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    take.reshape((n,) + (1,) * (a.ndim - 1)), a, b
                ),
                extra1, extra,
            )
            acc = jnp.mean(jnp.minimum(1.0, jnp.exp(delta)))
            log_scale = _adapt_scale(log_scale, acc)
            return (thetas, lt, li, extra, accepts + acc, log_scale), None

        keys = jax.random.split(key, num_mutations)
        from .._vma import pvary_like

        carry0 = pvary_like(
            (thetas, lt, li, extra, jnp.zeros((), dtype), log_scale),
            thetas, lam,
        )
        (thetas, lt, li, _, accepts, log_scale), _ = jax.lax.scan(
            one, carry0, keys
        )
        return thetas, lt, li, accepts / num_mutations, log_scale

    def mutate(key, thetas, lt, li, lam, log_scale):
        """Random-walk MH at temperature lam, cloud-covariance proposals.

        ``lt``/``li`` are the carried target/init log densities at
        ``thetas`` — the current state's density is never recomputed, so
        each MH step costs ONE target evaluation (the proposal).
        ``log_scale`` is the acceptance-adapted step multiplier, carried
        across temperature stages.
        """
        mean = jnp.mean(thetas, axis=0)
        centered = thetas - mean
        cov = centered.T @ centered / n
        cov = cov + 1e-10 * jnp.eye(dim, dtype=dtype)
        chol = jnp.linalg.cholesky(cov) * rw_scale

        def step_fn(key_p, thetas, lt, li, extra, lam, scale):
            eps = jax.random.normal(key_p, (n, dim), dtype)
            prop = thetas + scale * (eps @ chol.T)
            lt1, li1 = components(prop)
            delta = lam * (lt1 - lt) + (1.0 - lam) * (li1 - li)
            return prop, lt1, li1, extra, delta

        return _run_mutations(key, thetas, lt, li, lam, log_scale, (),
                              step_fn)

    def mutate_hmc(key, thetas, lt, li, lam, log_scale):
        """Metropolis-HMC mutation at temperature lam.

        Mass matrix = inverse cloud covariance: momenta are drawn with the
        cloud's covariance as M^{-1}, which whitens the tempered target, so
        one dimensionless step size serves every stage.  Gradients carry
        across mutation steps (accept-selected), and the trajectory's final
        evaluation doubles as the proposal's density, so each mutation
        costs exactly ``num_leapfrog`` batched gradient evaluations (plus
        one per stage to seed the carry).
        """
        mean = jnp.mean(thetas, axis=0)
        centered = thetas - mean
        cov = centered.T @ centered / n
        inv_mass = cov + 1e-10 * jnp.eye(dim, dtype=dtype)  # M^{-1} = cov
        # Whitened step: leapfrog stability needs eps < 2 in whitened units;
        # scale down with dimension as d^{-1/4} (standard HMC scaling).
        eps_base = jnp.asarray(hmc_step_scale, dtype) / (1.0 * dim) ** 0.25
        chol_im = jnp.linalg.cholesky(inv_mass)

        def velocity(r):
            return r @ inv_mass.T

        def kinetic(r):
            return 0.5 * jnp.sum(velocity(r) * r, axis=-1)

        def step_fn(key_p, thetas, lt, li, grad, lam, scale):
            eps = eps_base * scale
            # r ~ N(0, M):  r = L^{-T} eps with L = chol(M^{-1}).
            eps_n = jax.random.normal(key_p, (n, dim), dtype)
            r0 = jax.scipy.linalg.solve_triangular(
                chol_im.T, eps_n.T, lower=False
            ).T
            energy0 = -(lam * lt + (1.0 - lam) * li) + kinetic(r0)

            def leap(carry, _):
                z, val, lt_c, li_c, g, r = carry
                r_half = r + 0.5 * eps * g
                z_new = z + eps * velocity(r_half)
                val_new, lt_new, li_new, g_new = v_tempered_vg(z_new, lam)
                r_new = r_half + 0.5 * eps * g_new
                return (z_new, val_new, lt_new, li_new, g_new, r_new), None

            val0 = lam * lt + (1.0 - lam) * li
            (z1, val1, lt1, li1, g1, r1), _ = jax.lax.scan(
                leap, (thetas, val0, lt, li, grad, r0), None,
                length=num_leapfrog,
            )
            energy1 = -val1 + kinetic(r1)
            return z1, lt1, li1, g1, energy0 - energy1

        _, _, _, grad0 = v_tempered_vg(thetas, lam)
        return _run_mutations(key, thetas, lt, li, lam, log_scale, grad0,
                              step_fn)

    accept_target = 0.65 if mutation == "hmc" else 0.234

    def _adapt_scale(log_scale, acc):
        """Robbins-Monro step-scale tracking toward the optimal acceptance
        (0.234 RW / 0.65 HMC), one update per mutation step: the cloud
        covariance over-estimates within-mode scales on multimodal targets,
        so the measured acceptance — not the cloud — sets the step."""
        return jnp.clip(
            log_scale + 1.0 * (acc - accept_target),
            jnp.log(1e-3), jnp.log(30.0),
        )

    @jax.jit
    def _run(particles0, key):
        def cond(carry):
            thetas, lt, li, lam, logz, stage, accept, log_scale, key = carry
            return (lam < 1.0) & (stage < max_stages)

        def body(carry):
            thetas, lt, li, lam, logz, stage, accept, log_scale, key = carry
            key, key_rs, key_mut = jax.random.split(key, 3)

            # Carried densities make the incremental weights free.
            delta_logw = jnp.where(
                jnp.isinf(li) & (li < 0), -jnp.inf, lt - li
            )
            new_lam = choose_lambda(lam, delta_logw)
            log_w = (new_lam - lam) * delta_logw
            logz = logz + jax.nn.logsumexp(log_w) - jnp.log(1.0 * n)

            parents = _systematic_resample(key_rs, log_w)
            thetas = thetas[parents]
            lt = lt[parents]
            li = li[parents]
            do_mutate = mutate_hmc if mutation == "hmc" else mutate
            thetas, lt, li, accept, log_scale = do_mutate(
                key_mut, thetas, lt, li, new_lam, log_scale
            )
            return (thetas, lt, li, new_lam, logz, stage + 1, accept,
                    log_scale, key)

        lt0, li0 = components(particles0)
        init = (particles0, lt0, li0,
                jnp.zeros((), dtype), jnp.zeros((), dtype),
                jnp.zeros((), jnp.int32), jnp.zeros((), dtype),
                jnp.zeros((), dtype), key)
        if axis_name is not None:
            # shard_map vma discipline: the loop body produces values typed
            # varying (they pass through all_gather), so the replicated
            # initial carry must be promoted up front.
            from .._vma import _pvary_axis

            init = jax.tree_util.tree_map(
                lambda x: _pvary_axis(x, axis_name), init
            )
        (thetas, lt, li, lam, logz, stage, accept, _,
         _) = jax.lax.while_loop(cond, body, init)
        out = SMCResult(
            particles=thetas,
            log_prob=lt,
            log_evidence=logz,
            num_stages=stage,
            acceptance=accept,
        )
        if axis_name is not None:
            # Every device holds the identical result (same RNG stream, same
            # gathered weights); reduce to the invariant vma type so callers
            # can use replicated out_specs.
            out = SMCResult(
                particles=jax.lax.pmean(out.particles, axis_name),
                log_prob=jax.lax.pmean(out.log_prob, axis_name),
                log_evidence=jax.lax.pmean(out.log_evidence, axis_name),
                num_stages=jax.lax.pmax(out.num_stages, axis_name),
                acceptance=jax.lax.pmean(out.acceptance, axis_name),
            )
        return out

    return _run(particles0, key)
