"""BMUF: blockwise model-update filtering (Chen & Huo style).

Reference context: the PyKaldi2 paper compares Horovod allreduce with BMUF as
distributed modes (SURVEY.md §3.3). Workers train independently for a block
of steps, then synchronize with block momentum:

    G_t  = mean_w(W_w) − W_global          (block gradient)
    Δ_t  = η·Δ_{t−1} + ζ·G_t               (block momentum η, block lr ζ)
    W    = W_global + Δ_t ;  workers restart from W (+ optional Nesterov η·Δ)

TPU-native formulation: worker params carry a leading mesh-sharded axis so
each device diverges during the block; the sync step is a pmean inside
shard_map. No parameter server, no extra library.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class BmufState(NamedTuple):
    global_params: dict
    delta: dict
    block_momentum: float
    block_lr: float


def bmuf_init(params, mesh: Mesh, block_momentum: float = 0.9, block_lr: float = 1.0,
              axis: str = "data"):
    """Returns (worker_params with leading per-device axis, BmufState)."""
    n = mesh.shape[axis]
    worker = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), params)
    worker = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), worker)
    state = BmufState(
        global_params=params,
        delta=jax.tree.map(jnp.zeros_like, params),
        block_momentum=block_momentum,
        block_lr=block_lr,
    )
    return worker, state


def make_bmuf_sync(mesh: Mesh, axis: str = "data", nesterov: bool = True) -> Callable:
    """sync(worker_params, state) → (new worker_params, new state)."""

    def sync(worker, state: BmufState):
        avg = jax.tree.map(lambda x: jnp.mean(x, axis=0), worker)
        g = jax.tree.map(lambda a, w: a - w, avg, state.global_params)
        delta = jax.tree.map(
            lambda d, gg: state.block_momentum * d + state.block_lr * gg,
            state.delta, g)
        new_global = jax.tree.map(lambda w, d: w + d, state.global_params, delta)
        restart = new_global
        if nesterov:  # CBM: workers restart ahead along the momentum direction
            restart = jax.tree.map(
                lambda w, d: w + state.block_momentum * d, new_global, delta)
        n = mesh.shape[axis]
        worker_new = jax.tree.map(
            lambda x: jax.device_put(
                jnp.broadcast_to(x[None], (n,) + x.shape), NamedSharding(mesh, P(axis))),
            restart)
        return worker_new, BmufState(new_global, delta, state.block_momentum, state.block_lr)

    return jax.jit(sync)


def make_bmuf_local_step(local_train_step: Callable, mesh: Mesh, axis: str = "data") -> Callable:
    """Lift step(params, opt_state, batch, key) to per-worker divergent params.

    worker params/opt_state carry a leading [n_dev] axis sharded over the
    mesh; each device runs the plain single-device step on its own replica.
    """

    def per_worker(params, opt_state, batch, key):
        p = jax.tree.map(lambda x: x[0], params)
        o = jax.tree.map(lambda x: x[0], opt_state)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        p, o, metrics = local_train_step(p, o, batch, key)
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis), metrics)
        return (jax.tree.map(lambda x: x[None], p),
                jax.tree.map(lambda x: x[None], o), metrics)

    def step(worker_params, worker_opt, batch, key):
        pspec = jax.tree.map(lambda _: P(axis), worker_params)
        ospec = jax.tree.map(lambda _: P(axis), worker_opt)
        bspec = jax.tree.map(lambda _: P(axis), batch)
        return jax.shard_map(
            per_worker, mesh=mesh,
            in_specs=(pspec, ospec, bspec, P()),
            out_specs=(pspec, ospec, P()),
        )(worker_params, worker_opt, batch, key)

    return jax.jit(step)
