# -*- coding: utf-8 -*-
"""Multi-device sampling and data-sharded GP likelihoods.

Two orthogonal parallel axes (both new capability vs. the reference, which
is single-process single-threaded — SURVEY.md §2.6):

  * **chain sharding** — MCMC chains / SMC particles shard over a mesh axis;
    adaptation moments and accept statistics reduce with psum/pmean so all
    chains share one step size and mass matrix (the cross-chain Welford psum
    design from BASELINE.json);
  * **data sharding** — the O(N^2 d) covariance *build* shards over the N
    axis: each device computes its column stripe ``K[:, local]`` against an
    all-gathered coordinate block, and the stripes concatenate with one
    ``all_gather`` over ICI.  With ``distributed_cholesky=True`` the O(N^3)
    factorization itself also runs sharded (blocked panel Cholesky with
    psum substitutions, :mod:`george_tpu.parallel.dist_chol`) so K never
    materializes on a single device.

Everything composes: ``run_mcmc_sharded`` over a ("chains", "data") mesh
runs chain-parallel NUTS whose every log-prob evaluation is itself
data-parallel.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..dsl import compiler
from ..ops.linalg import cholesky_factor, cho_solve
from ..samplers.logprob import traceable_model_fn, _bounds_arrays
from ..samplers.mcmc import make_mcmc_core, MCMCResult

__all__ = ["run_mcmc_sharded", "run_smc_sharded",
           "make_sharded_gp_log_prob_factory"]


# Data-sharded likelihoods at or above this N default onto the fully
# distributed (stripe-resident) Cholesky: below it, the replicated
# factorization is faster and the K-per-device memory is immaterial.
DIST_CHOL_MIN_N = 8192


def make_sharded_gp_log_prob_factory(gp, x, y, yerr=0.0, data_axis="data",
                                     distributed_cholesky="auto",
                                     block_size=256, mesh=None):
    """Build a factory for data-sharded GP log-probs.

    Returns ``(factory, (x, y, yerr2))`` where the arrays are the *global*
    dataset (shard them with in_specs ``P(data_axis)``) and
    ``factory(x_local, y_local, yerr2_local) -> log_prob`` constructs the
    local log-density inside ``shard_map``, using an ``all_gather`` over
    ``data_axis`` to assemble covariance stripes.

    With ``distributed_cholesky`` enabled — ``"auto"`` (the default)
    switches it on at N >= ``DIST_CHOL_MIN_N`` — the O(N^3) factorization
    itself runs sharded (blocked panel Cholesky + psum substitutions — see
    :mod:`george_tpu.parallel.dist_chol`); K never materializes on one
    device.  Pass ``mesh`` so the dataset can be padded internally to a
    ``P * block_size`` multiple (otherwise N/P must already divide
    ``block_size``).
    """
    x_host = np.ascontiguousarray(gp.parse_samples(x), dtype=np.float64)
    y_host = np.asarray(y, dtype=np.float64)
    yerr2 = np.ascontiguousarray(
        np.broadcast_to(np.asarray(yerr, np.float64) ** 2, (len(x_host),))
    )

    node = gp.kernel.spec_node()
    kernel_value = compiler._value_builder(node)

    n_mean = gp.mean.full_size
    n_wn = gp.white_noise.full_size
    theta_full0 = jnp.asarray(gp.get_parameter_vector(include_frozen=True))
    unfrozen = np.flatnonzero(gp.unfrozen_mask)
    lo, hi = _bounds_arrays(gp)
    n_real = x_host.shape[0]
    n_total = n_real
    norm_const = 0.5 * n_real * np.log(2.0 * np.pi)

    if distributed_cholesky == "auto":
        distributed_cholesky = n_real >= DIST_CHOL_MIN_N
        if distributed_cholesky and mesh is None:
            # Without the mesh the dataset cannot be padded to a
            # P * block_size multiple, and the local factorization rejects
            # non-divisible shards downstream — stay replicated, loudly
            # (pass mesh=, or distributed_cholesky=True for the unpadded
            # behavior when N / num_devices already divides block_size).
            distributed_cholesky = False
            from ..samplers.logprob import _engine_note

            _engine_note(
                "no mesh= was passed, so the dataset cannot be padded to "
                "a devices*block_size multiple at N={0}".format(n_real),
                what="data-sharded likelihood: using the replicated "
                     "factorization instead of the distributed Cholesky",
            )

    if distributed_cholesky:
        from .dist_chol import distributed_loglike_fn

        if mesh is not None:
            step = mesh.shape[data_axis] * block_size
            n_total = -(-n_real // step) * step
            if n_total != n_real:
                pad = n_total - n_real
                x_host = np.concatenate(
                    [x_host, np.repeat(x_host[-1:], pad, axis=0)]
                )
                y_host = np.concatenate([y_host, np.zeros(pad)])
                yerr2 = np.concatenate([yerr2, np.ones(pad)])

        # Shape-polymorphic model fns only: the distributed likelihood
        # evaluates the mean on the padded global x and the white noise on
        # per-device shards, so fixed-length baked constants cannot work.
        mean_fn = traceable_model_fn(gp.mean, x_host, allow_baked=False)
        wn_fn = traceable_model_fn(
            gp.white_noise, x_host, allow_baked=False
        )

        dist_ll = distributed_loglike_fn(
            kernel_value, mean_fn, wn_fn, n_total,
            axis_name=data_axis, block_size=block_size, n_real=n_real,
        )

        def factory(x_local, y_local, yerr2_local):
            def log_prob(theta_active):
                theta = theta_full0.at[unfrozen].set(theta_active)
                in_bounds = jnp.all((theta >= lo) & (theta <= hi))
                ll = dist_ll(
                    theta[n_mean + n_wn:], theta[:n_mean],
                    theta[n_mean:n_mean + n_wn],
                    x_local, y_local, yerr2_local,
                )
                lp = jnp.where(in_bounds, ll, -jnp.inf)
                return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

            log_prob.engine = "dist_chol"
            return log_prob

        return factory, (x_host, y_host, yerr2)

    # Replicated-factorization path: the model fns only ever see the
    # all-gathered global x, so baked host constants are fine.
    mean_fn = traceable_model_fn(gp.mean, x_host)
    wn_fn = traceable_model_fn(gp.white_noise, x_host)

    def factory(x_local, y_local, yerr2_local):
        def log_prob(theta_active):
            theta = theta_full0.at[unfrozen].set(theta_active)
            in_bounds = jnp.all((theta >= lo) & (theta <= hi))
            th_mean = theta[:n_mean]
            th_wn = theta[n_mean:n_mean + n_wn]
            th_kernel = theta[n_mean + n_wn:]

            # Assemble the global coordinates (N*d floats — cheap), build
            # only the local column stripe, then gather stripes into the
            # replicated K for the (still replicated) Cholesky.
            x_full = jax.lax.all_gather(
                x_local, data_axis, axis=0, tiled=True
            )
            y_full = jax.lax.all_gather(
                y_local, data_axis, axis=0, tiled=True
            )
            yerr2_full = jax.lax.all_gather(
                yerr2_local, data_axis, axis=0, tiled=True
            )

            stripe = kernel_value(th_kernel, x_full, x_local)  # (N, n_loc)
            K = jax.lax.all_gather(
                stripe.T, data_axis, axis=0, tiled=True
            ).T  # gather stripes of rows of K^T -> columns of K
            # Transposed gather gives K columns in global order; K is
            # symmetric so this is K itself.
            diag_noise = yerr2_full + jnp.exp(wn_fn(th_wn, x_full))
            idx = jnp.arange(n_total)
            K = K.at[idx, idx].add(diag_noise)

            r = y_full - mean_fn(th_mean, x_full)
            L, logdet = cholesky_factor(K)
            alpha = cho_solve(L, r)
            ll = -norm_const - 0.5 * (logdet + jnp.dot(r, alpha))
            lp = jnp.where(in_bounds, ll, -jnp.inf)
            lp = jnp.where(jnp.isnan(lp), -jnp.inf, lp)
            # Identical on every device, but vma-typed varying (built from
            # gathers).  pmean makes it invariant and — the important part —
            # makes jax.grad correct: the transpose psums the per-device
            # partial theta-cotangents.  Without it (check_vma=False) HMC on
            # the data-sharded path silently used one device's partial
            # gradient.
            return jax.lax.pmean(lp, data_axis)

        log_prob.engine = "sharded_replicated_chol"
        return log_prob

    return factory, (x_host, y_host, yerr2)


def run_mcmc_sharded(log_prob_factory, data, z0, key, mesh,
                     chain_axis="chains", data_axis=None, check_vma=True,
                     **mcmc_kwargs):
    """Chain-sharded (optionally data-sharded) MCMC over a mesh.

    :param log_prob_factory: either a plain ``log_prob`` function (when
        ``data_axis`` is None and ``data`` is None) or a factory
        ``f(*local_data) -> log_prob`` invoked inside shard_map on the
        device-local data shards.
    :param data: tuple of global data arrays sharded along their first axis
        over ``data_axis`` (or None).
    :param z0: (chains, dim) global initial positions; chains must divide
        the ``chain_axis`` size.
    :param check_vma: keep shard_map's varying-manual-axes discipline on
        (the default; it is what proves collective transposes — and hence
        data-sharded gradients — correct).  Set False only for
        *interpret-mode* Pallas engines on a CPU mesh: the interpreter
        replays the kernel jaxpr op by op, where in-kernel constants are
        vma-invariant and every mixed op is rejected; the compiled Mosaic
        path does not have this problem (the kernel body is opaque to the
        vma checker and the call's out_shapes carry the chain batch's
        varying type).
    """
    z0 = jnp.asarray(z0)
    num_chains, dim = z0.shape
    n_chain_devices = mesh.shape[chain_axis]
    if num_chains % n_chain_devices:
        raise ValueError(
            "num_chains={0} must divide over {1} devices".format(
                num_chains, n_chain_devices
            )
        )
    local_chains = num_chains // n_chain_devices

    data_spec = () if data is None else tuple(
        P(data_axis) for _ in data
    )
    data = () if data is None else tuple(jnp.asarray(d) for d in data)

    def sharded(z0_local, key, *data_local):
        if data_local:
            log_prob = log_prob_factory(*data_local)
        else:
            log_prob = log_prob_factory
        core = make_mcmc_core(
            log_prob, local_chains, dim, z0_local.dtype,
            axis_name=chain_axis, **mcmc_kwargs
        )
        # Decorrelate the per-device chain RNG streams.
        key = jax.random.fold_in(key, jax.lax.axis_index(chain_axis))
        return core(z0_local, key)

    out_specs = MCMCResult(
        samples=P(chain_axis),
        log_prob=P(chain_axis),
        accept_prob=P(chain_axis),
        diverging=P(chain_axis),
        n_leapfrog=P(chain_axis),
        step_size=P(),     # identical across devices (pooled adaptation)
        inv_mass=P(),
    )
    fn = jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(chain_axis), P()) + data_spec,
        out_specs=out_specs,
        # vma tracking ON by default: it is what guarantees collective
        # transposes (and therefore the per-chain gradients inside the
        # sampler) are correct when the likelihood itself is data-sharded.
        check_vma=check_vma,
    )
    return jax.jit(fn)(z0, jnp.asarray(key), *data)


def run_smc_sharded(log_prob, log_init_prob, particles0, key, mesh,
                    particle_axis="particles", **smc_kwargs):
    """Particle-sharded adaptive-tempering SMC over a mesh.

    The cloud is replicated (hyperparameter dim is small); the O(n x
    model-cost) density evaluations shard over ``particle_axis`` and
    all_gather back, so temperatures, resampling, and the RNG stream are
    identical to :func:`george_tpu.samplers.run_smc` on one device.
    ``particles0.shape[0]`` must divide the axis size.
    """
    from ..samplers.smc import run_smc, SMCResult

    particles0 = jnp.asarray(particles0)
    if particles0.shape[0] % mesh.shape[particle_axis]:
        raise ValueError("num_particles must divide the particle axis")

    def sharded(particles0, key):
        return run_smc(
            log_prob, log_init_prob, particles0, key,
            axis_name=particle_axis, **smc_kwargs
        )

    fn = jax.shard_map(
        sharded, mesh=mesh, in_specs=(P(), P()),
        out_specs=SMCResult(P(), P(), P(), P(), P()),
        check_vma=True,
    )
    return fn(particles0, jnp.asarray(key))
