"""Mesh construction helpers.

Replaces hvd.init()/horovodrun process wiring (SURVEY.md §4.5): one process
per host, ``jax.distributed.initialize`` on multihost, devices = chips, and a
named mesh over which step programs are sharded.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[dict] = None, devices=None) -> Mesh:
    """Build a Mesh. Default: 1-D ('data',) over all devices.

    ``shape``: e.g. {"data": 4, "model": 2}; axis sizes must multiply to the
    device count (a -1 value is inferred).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if not shape:
        return Mesh(devices.reshape(n), ("data",))
    names = tuple(shape.keys())
    sizes = list(shape.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh shape {dict(zip(names, sizes))} != {n} devices")
    return Mesh(devices.reshape(sizes), names)


def local_batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits batch dim 0 over the data axis (replicated on others)."""
    return NamedSharding(mesh, P(axis))


def equalized_steps(loader, batch_iter):
    """Truncate a loader's iterator to the min per-process batch count.

    Multihost train/CV loops psum over the global mesh, so a host with one
    extra batch deadlocks all of them; uses the loader's metadata-only
    ``num_batches(conservative=True)`` and an allgather-min. No-op on a
    single process.
    """
    if jax.process_count() <= 1:
        return batch_iter
    import itertools

    from jax.experimental import multihost_utils

    local = np.asarray([loader.num_batches(conservative=True)])
    steps = int(multihost_utils.process_allgather(local).min())
    return itertools.islice(batch_iter, steps)
