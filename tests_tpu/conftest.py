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
