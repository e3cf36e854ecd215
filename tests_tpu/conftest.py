# -*- coding: utf-8 -*-
"""On-chip smoke suite configuration.

These tests run on the REAL TPU (the main suite pins a virtual CPU mesh,
so Mosaic-compiled kernels are otherwise only exercised by benchmarks).
Run with:

    python -m pytest tests_tpu/ -q

Skips cleanly when no TPU backend is available.  Uses the persistent
compile cache — the first run pays one-time Mosaic compiles.
"""

import jax
import pytest

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu:
        return
    skip = pytest.mark.skip(reason="no TPU backend available")
    for item in items:
        item.add_marker(skip)


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    # The tunneled backend surfaces chip contention (another process holds
    # the one TPU) as an opaque FailedPrecondition — skip with a message
    # instead of failing the whole suite.
    outcome = yield
    exc = outcome.excinfo
    if exc is not None:
        text = "".join(str(p) for p in exc[:2])
        if "FailedPrecondition" in text or "failed precondition" in text:
            outcome.force_exception(pytest.skip.Exception(
                "TPU chip busy: tunneled backend returned "
                "FailedPrecondition (another process holds the chip)"
            ))


def pytest_sessionfinish(session, exitstatus):
    # Persist the f32 deltas the tests measured (tests_tpu/ledger.json).
    import _ledger

    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    _ledger.flush({"backend": backend, "exitstatus": int(exitstatus)})
