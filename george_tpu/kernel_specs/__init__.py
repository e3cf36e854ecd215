# -*- coding: utf-8 -*-
"""The YAML kernel DSL specs, shipped as package data.

The reference distributes its generated kernel artifacts inside the wheel
(/root/reference/MANIFEST.in); here the YAML specs *are* the artifacts (they
compile to JAX functions at import time) so they live inside the package and
are loaded through :mod:`importlib.resources` — see
:func:`george_tpu.dsl.specs.load_specs`.
"""
