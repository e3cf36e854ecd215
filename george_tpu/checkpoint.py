# -*- coding: utf-8 -*-
"""Checkpoint / resume for sampler and model state.

The reference's only persistence is Python pickling (tests/test_pickle.py),
which this package also supports for the GP object tree.  For long-running
sampling jobs the natural unit of persistence is the *pytree*: parameter
vectors, sampler chain states, adaptation state, and RNG keys.  Factorized
solver state is deliberately excluded — factorizations are always
recomputable from (params, data), which keeps checkpoints small and makes
restart correctness trivial (same contract as the reference's HODLR pickle
dropping the native tree, solvers/hodlr.py:69-76).

Uses orbax-checkpoint when available, with a numpy ``.npz`` fallback that
handles flat pytrees of arrays.
"""

import os
import pickle

import numpy as np
import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "sampler_state"]


def save_checkpoint(path, state):
    """Persist a pytree of arrays to ``path`` (directory or .pkl file)."""
    state = jax.tree_util.tree_map(np.asarray, state)
    if path.endswith(".pkl"):
        with open(path, "wb") as f:
            pickle.dump(state, f, protocol=-1)
        return path
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        checkpointer = ocp.PyTreeCheckpointer()
        checkpointer.save(path, state, force=True)
        return path
    except Exception:
        with open(path + ".pkl", "wb") as f:
            pickle.dump(state, f, protocol=-1)
        return path + ".pkl"


def restore_checkpoint(path, target=None):
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``target`` (optional) is a pytree prototype used to restore exact
    container types (e.g. NamedTuples).
    """
    if path.endswith(".pkl") or os.path.isfile(path + ".pkl"):
        real = path if path.endswith(".pkl") else path + ".pkl"
        with open(real, "rb") as f:
            state = pickle.load(f)
    else:
        import orbax.checkpoint as ocp

        checkpointer = ocp.PyTreeCheckpointer()
        state = checkpointer.restore(os.path.abspath(path))
    if target is not None:
        leaves = jax.tree_util.tree_leaves(state)
        treedef = jax.tree_util.tree_structure(target)
        state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state


def sampler_state(states, key, step_size, inv_mass, extra=None):
    """Bundle resumable sampling state into one pytree."""
    out = {
        "chain_states": states,
        "key": key,
        "step_size": step_size,
        "inv_mass": inv_mass,
    }
    if extra:
        out.update(extra)
    return out
