"""Mesh-sharded sampler execution.

Runs the same ``run_chain`` program as the single-chip path, but with inputs
placed on a (chain, data) mesh: GSPMD propagates the shardings through the
scan — tau/mix stay position-sharded, gamma/eta/logliks become psum-reduced
replicated values. Because `jax.random`'s threefry is partitionable, the
sampled trajectories are bitwise mesh-shape-invariant: the same seeds give
the same chains on 1 device or 64 (tested in tests/test_sharding.py; the
gate demanded by SURVEY.md §7.2 step 6).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..sampler import SamplerConfig, SamplerResult, run_chain, tau_sweep_xla
from .mesh import Mesh, make_mesh, pad_positions, shard_counts, shard_keys


def run_chains_sharded(
    counts: np.ndarray,
    cfg: SamplerConfig,
    seeds: Sequence[int],
    mesh: Optional[Mesh] = None,
    eta_init=None,
    tau_sweep=tau_sweep_xla,
) -> SamplerResult:
    """Position-sharded, chain-parallel sampler run.

    counts: host [V,S,4]; V is zero-padded to the data-axis size (neutral —
    see ``pad_positions``). Results are returned with the padding stripped.
    """
    mesh = mesh or make_mesh()
    n_data = mesh.shape["data"]
    padded, V = pad_positions(np.asarray(counts, np.float32), n_data)

    n_dev = shard_counts(jnp.asarray(padded), mesh)
    keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
    keys_dev = shard_keys(keys, mesh)
    eta = None if eta_init is None else jnp.asarray(eta_init, jnp.float32)

    @jax.jit
    def go(n, keys):
        return jax.vmap(
            lambda k: run_chain(n, cfg, k, eta_init=eta, tau_sweep=tau_sweep)
        )(keys)

    res = go(n_dev, keys_dev)
    # only the position-axis fields carry padding
    return res._replace(tau_mean=res.tau_mean[:, :V], tau_star=res.tau_star[:, :V])
