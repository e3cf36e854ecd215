# -*- coding: utf-8 -*-
"""Multi-device parallelism: meshes, chain sharding, data sharding."""

from .mesh import chain_mesh, chain_data_mesh
from .sharded import run_mcmc_sharded, run_smc_sharded, \
    make_sharded_gp_log_prob_factory

__all__ = [
    "chain_mesh", "chain_data_mesh",
    "run_mcmc_sharded", "run_smc_sharded",
    "make_sharded_gp_log_prob_factory",
]
