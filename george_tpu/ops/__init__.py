# -*- coding: utf-8 -*-
"""Device-side compute: fused covariance/linear-algebra programs and
Pallas TPU kernels."""
