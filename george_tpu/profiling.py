# -*- coding: utf-8 -*-
"""Tracing / profiling hooks.

The reference has no in-library profiling (SURVEY.md §5); its performance
story is best-of-K wall-clock in a notebook.  Here:

  * :func:`trace` — context manager around ``jax.profiler.trace`` producing
    a TensorBoard-loadable device trace of everything inside;
  * :func:`timeit` — synchronized best-of-K wall clock for jitted callables
    (``block_until_ready`` on all outputs), reproducing the reference's
    benchmark methodology (docs/tutorials/scaling.rst:146-200) honestly on
    an async backend;
  * :func:`annotate` — named ``TraceAnnotation`` spans for custom regions.
"""

import contextlib
import time

import jax

__all__ = ["trace", "timeit", "annotate"]


@contextlib.contextmanager
def trace(log_dir):
    """Profile everything inside the block into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    """Label a region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


def _block(out):
    """Synchronize on every output.

    ``block_until_ready`` alone is unreliable on some remote/tunneled
    backends; a host transfer of (an element of) each result is a hard
    synchronization point everywhere.
    """
    import numpy as _np

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
        if hasattr(leaf, "shape"):
            if leaf.size <= (1 << 20):
                _np.asarray(leaf)
            else:
                _np.asarray(leaf[(0,) * leaf.ndim])
    return out


def timeit(fn, *args, repeats=5, warmup=1, vary=None, **kwargs):
    """Best-of-``repeats`` synchronized wall-clock seconds for ``fn``.

    Some backends memoize executions with identical input buffers; pass
    ``vary`` (an int -> extra-kwargs dict) to perturb each call.
    """
    extra = (lambda i: {}) if vary is None else vary
    for i in range(warmup):
        _block(fn(*args, **dict(kwargs, **extra(-1 - i))))
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        _block(fn(*args, **dict(kwargs, **extra(i))))
        best = min(best, time.perf_counter() - t0)
    return best
