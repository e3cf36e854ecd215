# -*- coding: utf-8 -*-
"""Pure-functional GP posterior densities for the sampler layer.

The reference delegates hyperparameter inference to external loops (scipy +
emcee, docs/tutorials/hyper.rst:202-246) that re-enter the stateful GP object
per proposal.  Here the entire posterior density — bounds prior + marginal
likelihood, including the covariance build and Cholesky — compiles to ONE
jitted, vmappable, shardable function of the active parameter vector.  This
is the function NUTS/HMC/SMC/ADVI differentiate and evaluate millions of
times; thousands of chains batch over it with ``vmap`` and shard over a
``Mesh`` with ``shard_map``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..dsl import compiler
from ..modeling import ConstantModel, CallableModel
from ..ops.linalg import cholesky_factor, cho_solve

__all__ = ["build_gp_log_prob", "traceable_model_fn"]


def traceable_model_fn(model, x_host, allow_baked=True):
    """Return ``f(params_full, x) -> values`` for a mean/white-noise model.

    Supported forms, in order of preference:
      * the model defines ``jax_value(params, x)`` (the documented hook for
        custom traceable models);
      * :class:`ConstantModel` — closed form;
      * any model with *no active parameters* — its host value at ``x_host``
        is baked in as a fixed-length constant (``allow_baked=True`` only:
        callers that evaluate the model on differently-shaped ``x`` — e.g.
        per-device shards on the distributed-Cholesky path — must pass
        ``allow_baked=False`` and get a shape-polymorphic form or an error);
      * :class:`CallableModel` whose function is JAX-traceable.
    """
    if hasattr(model, "jax_value"):
        return model.jax_value
    if isinstance(model, ConstantModel):
        return lambda params, x: params[0] + jnp.zeros(x.shape[0])
    if allow_baked and model.vector_size == 0:
        const = jnp.asarray(
            np.broadcast_to(model.get_value(x_host), (len(x_host),))
        )
        return lambda params, x: const
    if isinstance(model, CallableModel):
        return lambda params, x: model.function(x)
    raise TypeError(
        "model {0} is not JAX-traceable{1}; define a jax_value(params, x) "
        "method".format(
            type(model).__name__,
            "" if allow_baked else
            " (and baked host constants are not usable here: the model is "
            "evaluated on per-device data shards)",
        )
    )


def _bounds_arrays(gp):
    bounds = gp.get_parameter_bounds(include_frozen=True)
    lo = np.array(
        [-np.inf if b[0] is None else b[0] for b in bounds], dtype=np.float64
    )
    hi = np.array(
        [np.inf if b[1] is None else b[1] for b in bounds], dtype=np.float64
    )
    return lo, hi


def build_gp_log_prob(gp, x, y, yerr=0.0, log_prior=None, method="auto"):
    """Compile a GP hyperparameter posterior into a pure function.

    :param gp: a :class:`george_tpu.GP` (its *current* frozen parameters are
        baked in as constants).
    :param x,y,yerr: the dataset, as in :meth:`GP.compute` /
        :meth:`GP.log_likelihood`.
    :param log_prior: optional extra traceable ``log_prior(theta_active)``
        added on top of the modeling protocol's bounds prior.
    :param method: likelihood algorithm —

        * ``"dense"``: covariance build + Cholesky, O(N^3); works for every
          kernel;
        * ``"state_space"`` / ``"state_space_sequential"``: exact O(N)
          Kalman likelihood via the parallel (associative-scan) or
          sequential filter; 1-D Markovian kernels only
          (:mod:`george_tpu.ops.state_space`);
        * ``"auto"`` (default): state-space when the kernel admits it,
          dense otherwise.  Both compute the same marginal likelihood (to
          fp accuracy), so this is purely a performance decision.

    Returns ``(log_prob, theta0)`` where ``log_prob(theta_active) -> scalar``
    is jit/vmap/grad-safe and ``theta0`` is the current active vector.
    """
    x_host = np.ascontiguousarray(gp.parse_samples(x), dtype=np.float64)
    y_host = np.asarray(y, dtype=np.float64)
    yerr2 = np.broadcast_to(
        np.asarray(yerr, dtype=np.float64) ** 2, (len(x_host),)
    )

    node = gp.kernel.spec_node()

    if method in ("auto", "state_space", "state_space_sequential",
                  "state_space_parallel"):
        from ..ops import state_space as sskf

        usable = x_host.shape[1] == 1 and sskf.supports_state_space(node)
        if not usable and method != "auto":
            raise sskf.StateSpaceUnsupported(
                "kernel/inputs have no exact state-space form; "
                "use method='dense'"
            )
        if usable:
            # Sequential scan is the default: under vmap (many chains) each
            # filter step batches over chains essentially for free, beating
            # both the dense Cholesky and the associative-scan filter (whose
            # O(N) element tensors pay HBM traffic per chain).  The parallel
            # filter wins for few-chain, large-N evaluations (optimization).
            return _build_state_space_log_prob(
                gp, node, x_host, y_host, yerr2, log_prior,
                "parallel" if method == "state_space_parallel"
                else "sequential",
            )

    kernel_value = compiler._value_builder(node)

    mean_fn = traceable_model_fn(gp.mean, x_host)
    wn_fn = traceable_model_fn(gp.white_noise, x_host)
    dense_attach_args = None

    # Layout of the full parameter vector: mean | white_noise | kernel
    # (gp.py:78-95 ordering in the reference; ModelSet order here).
    n_mean = gp.mean.full_size
    n_wn = gp.white_noise.full_size
    theta_full0 = jnp.asarray(gp.get_parameter_vector(include_frozen=True))
    unfrozen = np.flatnonzero(gp.unfrozen_mask)
    lo, hi = _bounds_arrays(gp)

    x_dev = jnp.asarray(x_host)
    y_dev = jnp.asarray(y_host)
    yerr2_dev = jnp.asarray(yerr2)
    n = x_host.shape[0]
    norm_const = 0.5 * n * np.log(2.0 * np.pi)

    def log_prob(theta_active):
        theta = theta_full0.at[unfrozen].set(theta_active)
        in_bounds = jnp.all((theta >= lo) & (theta <= hi))

        th_mean = theta[:n_mean]
        th_wn = theta[n_mean:n_mean + n_wn]
        th_kernel = theta[n_mean + n_wn:]

        r = y_dev - mean_fn(th_mean, x_dev)
        diag_noise = yerr2_dev + jnp.exp(wn_fn(th_wn, x_dev))

        K = kernel_value(th_kernel, x_dev, x_dev)
        idx = jnp.arange(n)
        K = K.at[idx, idx].add(diag_noise)
        L, logdet = cholesky_factor(K)
        alpha = cho_solve(L, r)
        ll = -norm_const - 0.5 * (logdet + jnp.dot(r, alpha))

        lp = jnp.where(in_bounds, ll, -jnp.inf)
        if log_prior is not None:
            lp = lp + log_prior(theta_active)
        # Cholesky failure (non-PD) surfaces as NaN — and an exactly-zero
        # pivot as logdet=-inf hence ll=+inf: map both to -inf so samplers
        # treat them as rejected/divergent proposals (the quiet=True
        # contract, reference gp.py:385-397).  NaN < inf is False, so the
        # comparison folds the NaN case in too.
        return jnp.where(lp < jnp.inf, lp, -jnp.inf)

    # Every built log_prob names the engine that will actually execute it
    # (`log_prob.engine`), so benchmarks and users never have to infer the
    # compute path from timings.  The attach helpers below overwrite this
    # when a fused Pallas kernel takes over the batched hot path.
    log_prob.engine = "xla_dense"
    _attach_pallas_dense_vg(
        log_prob, gp, node, x_host, y_host, yerr2, theta_full0, unfrozen,
        lo, hi, log_prior,
    )

    theta0 = jnp.asarray(gp.get_parameter_vector())
    return log_prob, theta0


def _build_state_space_log_prob(gp, node, x_host, y_host, yerr2, log_prior,
                                ss_method):
    """O(N) Kalman-filter posterior density (1-D Markovian kernels)."""
    from ..ops import state_space as sskf

    # The marginal likelihood is permutation-invariant; the filter needs
    # time-ordered inputs.
    order = np.argsort(x_host[:, 0], kind="stable")
    t_host = x_host[order, 0]
    y_sorted = y_host[order]
    yerr2_sorted = yerr2[order]
    x_sorted = x_host[order]

    mean_fn = traceable_model_fn(gp.mean, x_sorted)
    wn_fn = traceable_model_fn(gp.white_noise, x_sorted)
    ss_ll = sskf.state_space_loglike_fn(node, method=ss_method)

    n_mean = gp.mean.full_size
    n_wn = gp.white_noise.full_size
    theta_full0 = jnp.asarray(gp.get_parameter_vector(include_frozen=True))
    unfrozen = np.flatnonzero(gp.unfrozen_mask)
    lo, hi = _bounds_arrays(gp)

    t_dev = jnp.asarray(t_host)
    x_dev = jnp.asarray(x_sorted)
    y_dev = jnp.asarray(y_sorted)
    yerr2_dev = jnp.asarray(yerr2_sorted)

    def log_prob(theta_active):
        theta = theta_full0.at[unfrozen].set(theta_active)
        in_bounds = jnp.all((theta >= lo) & (theta <= hi))

        th_mean = theta[:n_mean]
        th_wn = theta[n_mean:n_mean + n_wn]
        th_kernel = theta[n_mean + n_wn:]

        r = y_dev - mean_fn(th_mean, x_dev)
        v = yerr2_dev + jnp.exp(wn_fn(th_wn, x_dev))
        ll = ss_ll(th_kernel, t_dev, r, v)

        lp = jnp.where(in_bounds, ll, -jnp.inf)
        if log_prior is not None:
            lp = lp + log_prior(theta_active)
        return jnp.where(lp < jnp.inf, lp, -jnp.inf)

    log_prob.engine = "state_space_" + (
        "parallel" if ss_method == "parallel" else "scan"
    )
    _attach_pallas_vg(
        log_prob, gp, node, t_host, y_sorted, yerr2_sorted, x_sorted,
        theta_full0, unfrozen, lo, hi, log_prior,
    )

    theta0 = jnp.asarray(gp.get_parameter_vector())
    return log_prob, theta0


def _attach_pallas_vg(log_prob, gp, node, t_host, y_sorted, yerr2_sorted,
                      x_sorted, theta_full0, unfrozen, lo, hi, log_prior):
    """Attach ``log_prob.batched_value_and_grad`` when the fused Pallas
    Kalman kernel applies (see :mod:`george_tpu.ops.pallas_kalman`).

    Batch-level samplers (ChEES) use it in place of
    ``vmap(value_and_grad(log_prob))`` — same math, one kernel, ~7x faster
    at large chain counts.  Supported model shapes: mean and white-noise
    each either parameter-free (values baked into the data) or a
    :class:`ConstantModel` scalar (frozen or trainable).
    """
    from .. import config
    from ..ops import pallas_kalman as pk

    mode = getattr(config, "pallas_kalman", "auto")
    if mode == "never":
        return
    interpret = mode == "always" and jax.default_backend() != "tpu"
    if not (pk.pallas_kalman_available() or interpret):
        return
    if len(t_host) > pk.MAX_N:
        # Past this N even the HBM-streaming kernel's footprint bookkeeping
        # runs out; fall back to the scan path (same math) — loudly.
        _engine_note(
            "N={0} > {1}".format(len(t_host), pk.MAX_N),
            what="state-space sampler path: falling back to the XLA "
                 "scan filter",
        )
        return

    mean, wn = gp.mean, gp.white_noise
    if isinstance(mean, ConstantModel) and mean.full_size == 1:
        n_mean, y_eff = 1, np.asarray(y_sorted)
    elif mean.full_size == 0:
        n_mean = 0
        y_eff = np.asarray(y_sorted) - np.broadcast_to(
            mean.get_value(x_sorted), (len(x_sorted),)
        )
    else:
        return
    if isinstance(wn, ConstantModel) and wn.full_size == 1:
        n_wn, v_eff = 1, np.asarray(yerr2_sorted)
    elif wn.full_size == 0:
        n_wn = 0
        v_eff = np.asarray(yerr2_sorted) + np.exp(np.broadcast_to(
            wn.get_value(x_sorted), (len(x_sorted),)
        ))
    else:
        return

    active = tuple(int(i) for i in unfrozen)
    vg_core = pk.make_kalman_vg(
        node, t_host, y_eff, v_eff, n_mean, n_wn, active,
        interpret=interpret,
    )
    log_prob.batched_value_and_grad = _finish_batched_vg(
        vg_core, theta_full0, unfrozen, lo, hi, log_prior
    )
    log_prob.engine = (
        "pallas_kalman_stream" if len(t_host) > pk._SMEM_N
        else "pallas_kalman"
    )


def _finish_batched_vg(vg_core, theta_full0, unfrozen, lo, hi, log_prior):
    """Wrap a fused ``(theta_full (B, D)) -> (ll, grad_active)`` kernel with
    the bounds prior, NaN->(-inf, 0) guards, and the optional extra prior —
    the exact semantics of ``vmap(value_and_grad(log_prob))``."""
    theta_full_f32 = jnp.asarray(theta_full0, jnp.float32)
    lo_d = jnp.asarray(lo)
    hi_d = jnp.asarray(hi)
    unfrozen_d = jnp.asarray(np.asarray(unfrozen))

    def batched_value_and_grad(thetas_active):
        """(B, n_active) -> (lp (B,), d lp / d theta (B, n_active))."""
        B = thetas_active.shape[0]
        theta = jnp.broadcast_to(
            theta_full_f32, (B, theta_full_f32.shape[0])
        ).at[:, unfrozen_d].set(thetas_active.astype(jnp.float32))
        ll, grad = vg_core(theta)
        in_bounds = jnp.all(
            (theta >= lo_d) & (theta <= hi_d), axis=1
        )
        # NaN (failed factorization) AND +inf (exactly-zero pivot:
        # logdet=-inf) both read as rejected proposals.
        ll = jnp.where(ll < jnp.inf, ll, -jnp.inf)
        ok = in_bounds & jnp.isfinite(ll)
        lp = jnp.where(in_bounds, ll, -jnp.inf)
        g = jnp.where(ok[:, None], grad, 0.0)
        g = jnp.where(jnp.isnan(g), 0.0, g)
        if log_prior is not None:
            pv, pg = jax.vmap(jax.value_and_grad(log_prior))(
                thetas_active
            )
            lp = lp + pv
            g = g + pg
        # Same final guard as the scalar log_prob: NaN (e.g. a NaN prior,
        # or -inf likelihood + +inf prior) reads as a rejected proposal.
        lp = jnp.where(lp < jnp.inf, lp, -jnp.inf)
        g = jnp.where(jnp.isnan(g), 0.0, g)
        return lp.astype(thetas_active.dtype), g.astype(
            thetas_active.dtype
        )

    return batched_value_and_grad


def _scalar_or_baked(model, x_sorted, base, transform):
    """ConstantModel-scalar -> (1, base); parameter-free -> (0, baked).

    Anything else returns (None, None): the fused kernels assume the full
    parameter vector is laid out [mean (<=1) | white-noise (<=1) | kernel],
    so a mean/noise model with >1 (even frozen) parameters disqualifies.
    """
    from ..modeling import ConstantModel as _CM

    if isinstance(model, _CM) and model.full_size == 1:
        return 1, base
    if model.full_size == 0:
        vals = np.broadcast_to(
            model.get_value(x_sorted), (len(x_sorted),)
        )
        return 0, transform(base, vals)
    return None, None


def _engine_note(reason, what="dense sampler path: falling back to the "
                              "XLA batched value_and_grad"):
    """One-line, config-gated notice that a computation fell out of a
    fast-engine envelope onto a slower path (silent fallbacks hid which
    engine a run actually used)."""
    from .. import config

    if getattr(config, "engine_log", True):
        import logging

        logging.getLogger("george_tpu").warning(
            "%s (%s); set config.engine_log=False to silence", what, reason,
        )


def _attach_pallas_dense_vg(log_prob, gp, node, x_host, y_host, yerr2,
                            theta_full0, unfrozen, lo, hi, log_prior):
    """Attach a fused batched dense value+gradient engine when one applies.
    This is the config-#5 hot path — thousands of chains x small-N Cholesky
    for kernels with no state-space form.  Two engines:

      * the chains-on-lanes VPU kernel (:mod:`george_tpu.ops.pallas_dense`)
        for N below ``config.dense_mxu_min_n`` and metric types 0/1;
      * the MXU per-chain-matrix hybrid (:mod:`george_tpu.ops.dense_mxu`)
        for N up to 512, any metric type (batched Schur-panel matmuls +
        the Pallas 128-block spine).

    Both require mean and white-noise scalar-or-baked.
    """
    from .. import config
    from ..ops import pallas_dense as pdz
    from ..ops import dense_mxu as pdm

    mode = getattr(config, "pallas_dense", "auto")
    if mode == "never":
        return
    interpret = mode == "always" and jax.default_backend() != "tpu"
    if not (pdz.pallas_dense_available() or interpret):
        return
    n = len(x_host)
    min_mxu = getattr(config, "dense_mxu_min_n", 129)
    use_vpu = n < min_mxu and pdz.supports_pallas_dense(node, n)
    if not use_vpu and not pdm.supports_dense_mxu(node, n):
        _engine_note("N={0} > {1}".format(n, pdm.MXU_MAX_N))
        return

    n_mean, y_eff = _scalar_or_baked(
        gp.mean, x_host, np.asarray(y_host), lambda y, m: y - m
    )
    if n_mean is None:
        _engine_note("mean model is neither a scalar ConstantModel nor "
                     "parameter-free")
        return
    n_wn, v_eff = _scalar_or_baked(
        gp.white_noise, x_host, np.asarray(yerr2),
        lambda v, w: v + np.exp(w),
    )
    if n_wn is None:
        _engine_note("white-noise model is neither a scalar ConstantModel "
                     "nor parameter-free")
        return

    active = tuple(int(i) for i in unfrozen)
    if not active:
        return
    # Frozen scalar mean / white-noise models stay in the full vector (the
    # kernel reads them from theta), so n_mean/n_wn stay 1 even if frozen.
    if use_vpu:
        vg_core = pdz.make_dense_batched_vg(
            node, x_host, y_eff, v_eff, n_mean, n_wn, active,
            interpret=interpret,
        )
        engine = "pallas_dense"
    else:
        vg_core = pdm.make_dense_mxu_vg(
            node, x_host, y_eff, v_eff, n_mean, n_wn, active,
            interpret=interpret,
        )
        engine = "dense_mxu"
    log_prob.batched_value_and_grad = _finish_batched_vg(
        vg_core, theta_full0, unfrozen, lo, hi, log_prior
    )
    log_prob.engine = engine
