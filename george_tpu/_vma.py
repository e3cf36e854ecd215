# -*- coding: utf-8 -*-
"""Helpers for shard_map's varying-manual-axes (vma) type discipline.

With ``check_vma=True`` (which george_tpu uses — it is what guarantees
collective transposes, and therefore gradients, are correct inside sharded
programs), every ``while_loop``/``scan`` carry must keep a consistent vma
type.  Carries initialized from plain zeros are "invariant" while loop
bodies computing from sharded state produce "varying" values; these helpers
promote initial carries to the union type up front.

Outside shard_map all values have an empty vma set and everything here is a
no-op, so single-device code paths are untouched.
"""

import jax

__all__ = ["vma_of", "vma_union", "pvary_like", "_pvary_axis"]


def _pvary_axis(x, axis_name):
    """Promote one array to vary over ``axis_name`` (no-op if it already
    does, or outside shard_map)."""
    if axis_name in frozenset(getattr(jax.typeof(x), "vma", ()) or ()):
        return x
    return jax.lax.pcast(x, (axis_name,), to="varying")


def vma_of(x):
    return frozenset(getattr(jax.typeof(x), "vma", ()) or ())


def vma_union(*trees):
    """The union of vma axes over every array leaf of the given pytrees."""
    axes = set()
    for leaf in jax.tree_util.tree_leaves(trees):
        axes |= vma_of(leaf)
    return tuple(sorted(axes))


def pvary_like(tree, *refs):
    """Promote every leaf of ``tree`` to vary over the union axes of refs.

    ``refs`` defaults to ``tree`` itself, making a mixed-vma carry
    internally consistent.
    """
    axes = vma_union(*refs) if refs else vma_union(tree)

    def fix(x):
        missing = tuple(a for a in axes if a not in vma_of(x))
        if missing:
            x = jax.lax.pcast(x, missing, to="varying")
        return x

    return jax.tree_util.tree_map(fix, tree)
