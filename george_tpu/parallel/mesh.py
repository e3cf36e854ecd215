# -*- coding: utf-8 -*-
"""Device-mesh helpers.

The reference has no distributed layer at all (SURVEY.md §2.6); every
parallel axis here is new capability.  Conventions:

  * axis "chains"    — data parallelism over MCMC chains / SMC particles
  * axis "data"      — sharding of the N (dataset) axis of the GP
"""

import numpy as np
import jax

__all__ = ["chain_mesh", "chain_data_mesh"]


def chain_mesh(num_devices=None, axis="chains"):
    """A 1-D mesh over all (or the first ``num_devices``) devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return jax.sharding.Mesh(np.array(devices), (axis,))


def chain_data_mesh(chain_devices, data_devices, axes=("chains", "data")):
    """A 2-D (chains x data) mesh."""
    devices = np.array(
        jax.devices()[:chain_devices * data_devices]
    ).reshape(chain_devices, data_devices)
    return jax.sharding.Mesh(devices, axes)
