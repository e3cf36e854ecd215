# -*- coding: utf-8 -*-
"""Loading of the YAML kernel DSL.

The DSL keeps the schema of the reference implementation's ``kernels/*.yml``
files (/root/reference/docs/tutorials/new-kernel.rst describes it): ``name``,
``stationary``, ``params``, ``constants``, ``reparams``, ``value``, ``grad``,
``doc``.  Two deliberate changes:

  * expression bodies are JAX-traceable Python expressions instead of C++
    statement blocks (they compile straight to jitted functions, see
    :mod:`george_tpu.dsl.compiler`);
  * every spec pins an explicit ``kernel_type`` id instead of deriving it
    from glob enumeration order (the reference's ABI hazard, see
    /root/reference/generate_kernels.py:48).  The pinned ids match the
    reference's effective enumeration so kernel_type tags remain
    interchangeable.

The ``grad`` entries are *authoritative* for the radial derivative of
stationary kernels (where naive autodiff produces NaNs at r2=0 through
sqrt) and serve as golden cross-checks for everything autodiff derives.
"""

import glob
import os
from dataclasses import dataclass, field
from typing import Dict, Tuple

import yaml

__all__ = ["KernelSpec", "load_specs", "available_kernels"]

_SEARCH_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "kernels"),
]
# Extra spec directories (colon-separated), e.g. for installed deployments
# or user kernel libraries.
_ENV_PATH = os.environ.get("GEORGE_TPU_KERNEL_PATH")
if _ENV_PATH:
    _SEARCH_PATHS.extend(_ENV_PATH.split(":"))


@dataclass(frozen=True)
class KernelSpec:
    """A parsed, immutable kernel definition."""

    name: str
    kernel_type: int
    stationary: bool
    params: Tuple[str, ...] = ()
    constants: Tuple[Tuple[str, str], ...] = ()  # (name, type)
    reparams: Tuple[Tuple[str, str], ...] = ()   # (name, expression)
    value: str = "0.0"
    grad: Tuple[Tuple[str, str], ...] = ()       # (wrt, expression)
    imports: Tuple[str, ...] = ()                # "module.path:name" extras
    doc: str = ""

    @property
    def grad_dict(self) -> Dict[str, str]:
        return dict(self.grad)

    @property
    def reparam_dict(self) -> Dict[str, str]:
        return dict(self.reparams)

    @property
    def constant_names(self) -> Tuple[str, ...]:
        return tuple(name for name, _ in self.constants)


def _parse_spec(raw: dict, origin: str) -> KernelSpec:
    for key in ("name", "kernel_type", "value"):
        if key not in raw:
            raise ValueError(
                "kernel spec {0} is missing required field '{1}'".format(
                    origin, key
                )
            )
    constants = tuple(
        (c["name"], c.get("type", "float")) for c in raw.get("constants", [])
    )
    return KernelSpec(
        name=str(raw["name"]),
        kernel_type=int(raw["kernel_type"]),
        stationary=bool(raw.get("stationary", False)),
        params=tuple(raw.get("params", []) or []),
        constants=constants,
        reparams=tuple(sorted((raw.get("reparams", {}) or {}).items())),
        value=str(raw["value"]).strip(),
        grad=tuple(sorted(
            (k, str(v).strip()) for k, v in (raw.get("grad", {}) or {}).items()
        )),
        imports=tuple(raw.get("imports", []) or []),
        doc=str(raw.get("doc", "")),
    )


def load_specs(extra_paths=()) -> Dict[str, KernelSpec]:
    """Load every ``*.yml`` kernel spec on the search path, keyed by name."""
    specs: Dict[str, KernelSpec] = {}
    ids = {}
    for root in list(_SEARCH_PATHS) + list(extra_paths):
        for path in sorted(glob.glob(os.path.join(root, "*.yml"))):
            with open(path) as f:
                raw = yaml.safe_load(f)
            spec = _parse_spec(raw, path)
            if spec.kernel_type in ids and ids[spec.kernel_type] != spec.name:
                raise ValueError(
                    "duplicate kernel_type {0} ({1} vs {2})".format(
                        spec.kernel_type, ids[spec.kernel_type], spec.name
                    )
                )
            ids[spec.kernel_type] = spec.name
            specs[spec.name] = spec
    return specs


_CACHE = None


def available_kernels() -> Dict[str, KernelSpec]:
    """Cached view of all registered kernel specs."""
    global _CACHE
    if _CACHE is None:
        _CACHE = load_specs()
    return _CACHE
