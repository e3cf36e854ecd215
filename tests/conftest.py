# -*- coding: utf-8 -*-
"""Test configuration: run on a virtual 8-device CPU mesh in float64.

Multi-device sharding logic (shard_map + collectives) runs identically on a
fake CPU mesh, so the whole distributed test surface is exercised without
TPU hardware; the driver separately dry-run-compiles the multi-chip path.
"""

import jax

# Must happen before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
