# -*- coding: utf-8 -*-
"""Global knobs (kept deliberately small, matching the reference's
no-config-file philosophy — everything else is constructor kwargs)."""

__all__ = ["pallas_covariance", "pallas_min_elements", "pallas_kalman",
           "pallas_dense", "engine_log"]

# When to route stationary covariance builds through the Pallas TPU kernel:
#   "auto"   — on TPU, float32, unblocked stationary leaves, and the output
#              has at least `pallas_min_elements` entries;
#   "always" — whenever structurally possible (TPU only);
#   "never"  — always use the fused XLA path.
# Read at trace time: set it before the first evaluation of a given shape.
pallas_covariance = "auto"
pallas_min_elements = 1 << 20

# The fused Pallas Kalman value+gradient kernel (ops/pallas_kalman.py):
#   "auto"   — attach to state-space log-probs on TPU (batch-level samplers
#              use it in place of vmap(value_and_grad); ~7x at 16k chains);
#   "always" — also on CPU via the Pallas interpreter (tests);
#   "never"  — scan path only.
pallas_kalman = "auto"

# The fused Pallas batched dense value+gradient engines for multi-dim /
# no-state-space posteriors (the "thousands of chains x small-N Cholesky"
# shape). Same tri-state semantics as `pallas_kalman`; the knob gates BOTH:
#   * the chains-on-lanes VPU kernel (ops/pallas_dense.py) — N below
#     `dense_mxu_min_n`, metric types 0/1;
#   * the MXU per-chain-matrix hybrid (ops/dense_mxu.py) — N up to 512,
#     every metric type (batched Schur-panel matmuls + a Pallas spine for
#     the 128-wide diagonal blocks).
pallas_dense = "auto"

# N at and above which the dense sampler path prefers the MXU hybrid over
# the VPU lanes kernel.  129 = the measured crossover (the VPU kernel wins
# in its unrolled N <= 128 regime); benchmarks set 0 to force the MXU path.
dense_mxu_min_n = 129

# Whether the SAMPLER router may attach the MXU hybrid at all.  Round-5
# on-chip finding (tests_tpu fidelity test + a CPU x64 oracle): ChEES
# posterior moments through dense_mxu at N=256 shifted ~0.8 sd on a
# metric parameter with 30-40% narrowed stds vs the XLA engine — the
# engine's f32 envelope is fast but not yet moment-faithful, so it is
# OPT-IN for sampling (True routes N >= dense_mxu_min_n dense posteriors
# through ops/dense_mxu.py; by default the tightly-validated VPU kernel
# covers its whole envelope — N <= 256, metric types 0/1 — and anything
# beyond falls back to the XLA engine).
dense_mxu_sampling = False

# Emit a one-line warning (logging.getLogger("george_tpu")) when a sampler
# posterior falls OUT of a fused-kernel envelope and silently lands on the
# slower XLA path (e.g. dense N > 512 — the MXU engine covers every metric
# type up to there — or non-scalar mean/white-noise models).
engine_log = True
