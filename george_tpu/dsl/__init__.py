# -*- coding: utf-8 -*-
"""The YAML kernel DSL: spec loading and compilation to JAX functions."""

from .specs import KernelSpec, load_specs, available_kernels
from . import compiler

__all__ = ["KernelSpec", "load_specs", "available_kernels", "compiler"]
