"""Data-parallel helpers used inside shard_map step functions.

The actual DP train steps live with the trainers (trainer.py); these are the
shared collectives idioms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psum_mean(tree, axis_name: str = "data"):
    """Allreduce-mean a pytree over the mesh axis (Horovod allreduce equivalent)."""
    n = jax.lax.psum(1, axis_name)
    return jax.tree.map(lambda g: jax.lax.psum(g, axis_name) / n, tree)


def replicate(tree, mesh):
    """Place a host pytree fully replicated on the mesh (broadcast_parameters)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
