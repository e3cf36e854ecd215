# -*- coding: utf-8 -*-
"""Global knobs (kept deliberately small, matching the reference's
no-config-file philosophy — everything else is constructor kwargs)."""

__all__ = ["pallas_covariance", "pallas_min_elements"]

# When to route stationary covariance builds through the Pallas TPU kernel:
#   "auto"   — on TPU, float32, unblocked stationary leaves, and the output
#              has at least `pallas_min_elements` entries;
#   "always" — whenever structurally possible (TPU only);
#   "never"  — always use the fused XLA path.
# Read at trace time: set it before the first evaluation of a given shape.
pallas_covariance = "auto"
pallas_min_elements = 1 << 20
