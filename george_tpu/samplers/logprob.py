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


def build_gp_log_prob(gp, x, y, yerr=0.0, log_prior=None, method="auto",
                      method_options=None):
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
        * ``"hodlr"``: O(N log^2 N) hierarchical low-rank likelihood —
          the large-N engine for kernels with NO state-space form
          (multi-dimensional inputs, ExpSquared, ...), approximate to the
          solver's ``tol``; gradients via forward-mode sweeps through the
          level-batched factorization.  ``method_options`` accepts
          ``min_size``/``tol``/``max_rank`` (the
          :class:`~george_tpu.solvers.HODLRSolver` constructor knobs) and
          ``rank_margin`` (see :func:`_build_hodlr_log_prob`);
        * ``"auto"`` (default): state-space when the kernel admits it,
          dense otherwise.  The exact methods compute the same marginal
          likelihood (to fp accuracy), so this is purely a performance
          decision; ``"hodlr"`` is opt-in because it is approximate.

    Returns ``(log_prob, theta0)`` where ``log_prob(theta_active) -> scalar``
    is jit/vmap/grad-safe and ``theta0`` is the current active vector.
    """
    x_host = np.ascontiguousarray(gp.parse_samples(x), dtype=np.float64)
    y_host = np.asarray(y, dtype=np.float64)
    yerr2 = np.broadcast_to(
        np.asarray(yerr, dtype=np.float64) ** 2, (len(x_host),)
    )

    node = gp.kernel.spec_node()

    if method == "hodlr":
        return _build_hodlr_log_prob(
            gp, node, x_host, y_host, yerr2, log_prior,
            dict(method_options or {}),
        )

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


def _finish_batched_vg(vg_core, theta_full0, unfrozen, lo, hi, log_prior,
                       compute_dtype=jnp.float32):
    """Wrap a fused ``(theta_full (B, D)) -> (ll, grad_active)`` kernel with
    the bounds prior, NaN->(-inf, 0) guards, and the optional extra prior —
    the exact semantics of ``vmap(value_and_grad(log_prob))``.

    ``compute_dtype`` is f32 for the Pallas engines (their native
    precision); pass ``None`` to keep ``theta_full0``'s dtype (the HODLR
    engine, which runs at whatever precision the session enables).
    """
    if compute_dtype is None:
        theta_full_f32 = jnp.asarray(theta_full0)
    else:
        theta_full_f32 = jnp.asarray(theta_full0, compute_dtype)
    lo_d = jnp.asarray(lo)
    hi_d = jnp.asarray(hi)
    unfrozen_d = jnp.asarray(np.asarray(unfrozen))

    def batched_value_and_grad(thetas_active):
        """(B, n_active) -> (lp (B,), d lp / d theta (B, n_active))."""
        B = thetas_active.shape[0]
        theta = jnp.broadcast_to(
            theta_full_f32, (B, theta_full_f32.shape[0])
        ).at[:, unfrozen_d].set(thetas_active.astype(theta_full_f32.dtype))
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
    # The MXU hybrid is opt-in for sampling: its posterior moments at
    # N=256 measured ~0.85 sd off the XLA engine and a CPU x64 oracle
    # (tests_tpu fidelity test; BENCH_NOTES round 5).  Default routing:
    # the tightly-validated VPU kernel over its WHOLE envelope
    # (N <= 256, metric types 0/1; lp delta ~1e-3 on chip), XLA beyond;
    # opting in restores MXU for N >= dense_mxu_min_n.
    mxu_ok = getattr(config, "dense_mxu_sampling", False) \
        and pdm.supports_dense_mxu(node, n)
    use_vpu = pdz.supports_pallas_dense(node, n) \
        and (n < min_mxu or not mxu_ok)
    if not use_vpu and not mxu_ok:
        _engine_note(
            "N={0} is outside the VPU kernel envelope and "
            "config.dense_mxu_sampling is off (the MXU engine's "
            "posterior-moment envelope is still open)".format(n)
        )
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


def _build_hodlr_log_prob(gp, node, x_host, y_host, yerr2, log_prior,
                          opts):
    """O(N log^2 N) HODLR posterior density for the sampler layer.

    The reference's whole answer to large-N inference is the HODLR
    factorization driven by an *external* emcee loop
    (/root/reference/src/george/include/george/hodlr.h:75-120,
    docs/tutorials/hyper.rst:236-246).  Here the same hierarchical
    compression compiles INTO the posterior density: the level-batched
    factorization (ops/hodlr_core.py) runs as one XLA program per chain
    under ``vmap``, and the gradient runs one forward-mode (jvp) sweep
    per active parameter alongside the primal — never materializing an
    N x N matrix, unlike the reference's dense ``get_inverse`` gradient
    (gp.py:406-468).

    The traced factorization needs static shapes, so the per-block ranks
    are pinned host-side: one rank-adaptive factorization at the GP's
    current parameters (``hodlr_compute``, with its escalation-on-
    saturation loop) fixes the tree plan, then every per-block rank is
    multiplied by ``opts["rank_margin"]`` (default 2, capped at the
    block size) so the compression stays inside tolerance as the sampler
    moves the hyperparameters.  The ACA pivot sequences are ALSO pinned
    (``fixed_pivots=True``, default): replaying recorded pivots makes
    the traced density a smooth deterministic function of theta — the
    adaptive argmax rule's pivot flips put O(1)-nat jumps on the f32
    surface (see :func:`~george_tpu.ops.hodlr_core._aca_fixed_fn`).
    ``min_size``/``tol``/``max_rank`` pass through to the factorization;
    the internal KD ordering matches
    :class:`~george_tpu.solvers.HODLRSolver`.

    Likelihoods are approximate to ``tol`` (like the reference's HODLR
    path); use modest chain counts — each chain carries an
    O(N rank log N) factorization footprint.
    """
    from ..ops import hodlr_core
    from ..solvers.hodlr import HODLRSolver

    min_size = int(opts.pop("min_size", 100))
    tol = float(opts.pop("tol", 0.1))
    max_rank = opts.pop("max_rank", None)
    rank_margin = float(opts.pop("rank_margin", 2.0))
    order = opts.pop("order", "auto")
    fixed_pivots = bool(opts.pop("fixed_pivots", True))
    if opts:
        raise TypeError(
            "unknown hodlr method_options: {0}".format(sorted(opts))
        )

    # Internal compression ordering (KD median splits by default), exactly
    # as the stateful solver does it.  The marginal likelihood is
    # permutation-invariant, so no un-permutation is needed.
    solver = HODLRSolver(gp.kernel, min_size=min_size, tol=tol,
                         max_rank=max_rank, order=order)
    perm = solver._ordering(x_host)
    if perm is not None:
        x_sorted = x_host[perm]
        y_sorted = y_host[perm]
        yerr2_sorted = yerr2[perm]
    else:
        x_sorted, y_sorted, yerr2_sorted = x_host, y_host, yerr2

    mean_fn = traceable_model_fn(gp.mean, x_sorted)
    wn_fn = traceable_model_fn(gp.white_noise, x_sorted)

    n_mean = gp.mean.full_size
    n_wn = gp.white_noise.full_size
    theta_full0 = jnp.asarray(gp.get_parameter_vector(include_frozen=True))
    unfrozen = np.flatnonzero(gp.unfrozen_mask)
    lo, hi = _bounds_arrays(gp)

    # Pin the tree plan and per-block ranks at the current parameters
    # (host-side, rank-adaptive), then widen by the safety margin.
    theta_k0 = np.asarray(
        gp.kernel.get_parameter_vector(include_frozen=True)
    )
    wn0 = np.broadcast_to(
        np.exp(gp.white_noise.get_value(x_sorted)), (len(x_sorted),)
    )
    fact0 = hodlr_core.hodlr_compute(
        node, theta_k0, x_sorted, yerr2_sorted + wn0,
        min_size=min_size, tol=tol, max_rank=max_rank,
    )
    levels, leaf_size, n_pad = fact0.levels, fact0.leaf_size, fact0.n_pad
    full = tuple(n_pad >> (q + 1) for q in range(levels))
    ranks = tuple(
        min(full[q], int(np.ceil(rank_margin * fact0.level_U0[q].shape[-1])))
        for q in range(levels)
    )

    n = len(x_sorted)
    pad = n_pad - n
    d = x_sorted.shape[1]
    x_pad = jnp.asarray(np.concatenate(
        [x_sorted, np.broadcast_to(x_sorted[-1:], (pad, d))]
    ))
    x_dev = jnp.asarray(x_sorted)
    y_dev = jnp.asarray(y_sorted)
    yerr2_dev = jnp.asarray(yerr2_sorted)
    valid = jnp.arange(n_pad) < n
    norm_const = 0.5 * n * np.log(2.0 * np.pi)
    tol_dev = jnp.asarray(tol, x_pad.dtype)
    pad_zeros = jnp.zeros(pad, x_pad.dtype)
    pad_ones = jnp.ones(pad, x_pad.dtype)

    pivots = None
    if fixed_pivots:
        # Record the adaptive pivot sequences ONCE at the build
        # parameters (at a 100x tighter tolerance so margin columns
        # carry real pivots), then REPLAY them inside the traced
        # density: with data-dependent argmax pivoting, the f32
        # likelihood jumps O(1) nats between nearby thetas as pivot
        # choices flip (measured on chip at N=2048), which stalls MCMC
        # acceptance outright.  Replayed pivots make ll_core a smooth
        # deterministic function of theta (CUR-style approximation at
        # fixed index sets); quality degrades only slowly as theta
        # drifts from the build point — rank_margin covers the drift.
        record = hodlr_core._compute_all_fn(
            node, levels, leaf_size, ranks, pivot_mode="record"
        )
        diag0 = np.concatenate([
            yerr2_sorted + wn0, np.ones(pad, np.float64)
        ])
        outs = record(
            jnp.asarray(theta_k0, x_pad.dtype), x_pad,
            jnp.asarray(diag0, x_pad.dtype), valid,
            jnp.asarray(tol * 1e-2, x_pad.dtype),
        )
        pivots = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a)), outs[-1]
        )
    compute = hodlr_core._compute_all_fn(
        node, levels, leaf_size, ranks,
        pivot_mode="fixed" if fixed_pivots else "adaptive",
    )

    def ll_core(theta):
        th_mean = theta[:n_mean]
        th_wn = theta[n_mean:n_mean + n_wn]
        th_kernel = theta[n_mean + n_wn:]

        r = y_dev - mean_fn(th_mean, x_dev)
        diag = yerr2_dev + jnp.exp(wn_fn(th_wn, x_dev))
        r_pad = jnp.concatenate([r, pad_zeros])
        diag_pad = jnp.concatenate([diag, pad_ones])
        leaf_chol, U0s, V0s, Uts, Vts, S_lus, stats = compute(
            th_kernel.astype(x_pad.dtype), x_pad, diag_pad, valid,
            tol_dev, *(() if pivots is None else (pivots,))
        )
        alpha = hodlr_core._solve_all(
            leaf_chol, U0s, V0s, Uts, Vts, S_lus, r_pad[:, None]
        )[:, 0]
        return -norm_const - 0.5 * (stats[0] + jnp.sum(r_pad * alpha))

    lo_dev = jnp.asarray(lo)
    hi_dev = jnp.asarray(hi)
    unfrozen_dev = jnp.asarray(unfrozen)

    def log_prob(theta_active):
        theta = theta_full0.at[unfrozen_dev].set(theta_active)
        in_bounds = jnp.all((theta >= lo_dev) & (theta <= hi_dev))
        ll = ll_core(theta)
        lp = jnp.where(in_bounds, ll, -jnp.inf)
        if log_prior is not None:
            lp = lp + log_prior(theta_active)
        return jnp.where(lp < jnp.inf, lp, -jnp.inf)

    # Batched value+gradient: forward mode, one jvp direction per active
    # parameter (the P primal legs CSE away under jit — the same pattern
    # as hodlr_grad_fn).  This is what NUTS/HMC/ChEES actually execute
    # via the custom_vmap seam; reverse mode through the rank-length ACA
    # loop would checkpoint its U/V carries (~18 GB at N=50k,
    # BENCH_NOTES.md "HODLR") and is never traced on the sampler path.
    active = [int(i) for i in unfrozen]
    eye = np.eye(theta_full0.shape[0])

    def vg_one(theta_full):
        outs = [
            jax.jvp(ll_core, (theta_full,),
                    (jnp.asarray(eye[i], theta_full.dtype),))
            for i in active
        ]
        if not outs:
            return ll_core(theta_full), jnp.zeros((0,), theta_full.dtype)
        return outs[0][0], jnp.stack([t for (_, t) in outs])

    log_prob.batched_value_and_grad = _finish_batched_vg(
        jax.vmap(vg_one), theta_full0, unfrozen, lo, hi, log_prior,
        compute_dtype=None,
    )
    log_prob.engine = "hodlr"

    theta0 = jnp.asarray(gp.get_parameter_vector())
    return log_prob, theta0
