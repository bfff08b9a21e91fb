"""CE training: jitted train step (single-device or shard_map DP) + epoch loop.

Reference behavior: pykaldi2/bin/train_ce.py's hot loop — forward, CE loss,
backward, Horovod allreduce, clipped SGD/Adam step, periodic loss/frame-acc
logging, per-epoch checkpoint (SURVEY.md §4.1).

TPU-native step: one XLA program does front end → model → loss → grad →
psum over the mesh 'data' axis → optax update. Loss is globally normalized
(sum NLL / psum frame count) so padding and uneven shards contribute exactly
their frames, matching single-device math bit-for-tolerance (tested in
tests/test_parallel.py).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pykaldi2_tpu.models.nnet_am import NnetAM
from pykaldi2_tpu.pipeline import FeaturePipeline


def _ce_forward(model: NnetAM, feat_fn: FeaturePipeline, params, batch, key, train: bool):
    """Returns (sum_nll, count, correct) over the local shard.

    ``mask`` is frame validity (feeds the model); supervision is
    mask AND labels >= 0 — they differ when labels are absent.
    """
    dither_key = dropout_key = None
    if key is not None:
        dither_key, dropout_key = jax.random.split(key)
    feats = feat_fn(batch, dither_key=dither_key)
    mask = batch["mask"].astype(jnp.float32)
    logits = model.apply(params, feats, mask, train=train, dropout_key=dropout_key)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    sup = mask * (batch["labels"] >= 0)
    labels = jnp.maximum(batch["labels"], 0)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    sum_nll = -jnp.sum(ll * sup)
    count = jnp.sum(sup)
    correct = jnp.sum((jnp.argmax(logits, -1) == batch["labels"]) * sup)
    return sum_nll, count, correct


def make_ce_train_step(
    model: NnetAM,
    feat_fn: FeaturePipeline,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    grad_compression: str = "none",
) -> Callable:
    """Build step(params, opt_state, batch, key) → (params, opt_state, metrics).

    With a mesh, the batch is sharded over the 'data' axis and gradients are
    psum-reduced (the Horovod-allreduce equivalent, compiled into the step).
    ``grad_compression='bf16'`` rounds local gradients to bf16 before the
    psum (Horovod's optional fp16 compression, SURVEY §6.8) — halves the
    allreduce traffic at a small stochastic-rounding-free precision cost.
    ``metrics`` = dict(loss, frame_acc, frames).
    """
    if grad_compression not in ("none", "bf16"):
        raise ValueError(f"unknown grad_compression {grad_compression!r}")

    def local_step(params, opt_state, batch, key):
        axis = "data" if mesh is not None else None
        if axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))

        def loss_fn(p):
            sum_nll, count, correct = _ce_forward(model, feat_fn, p, batch, key, True)
            gcount = jax.lax.psum(count, axis) if axis else count
            loss = sum_nll / jnp.maximum(gcount, 1.0)
            return loss, (sum_nll, count, correct)

        # NOTE: no manual grad psum — under shard_map's replication tracking
        # (check_vma), the cotangent of replicated params is automatically
        # psum-reduced over the mesh axis; a manual psum would multiply by the
        # axis size (caught by tests/test_parallel.py grad-parity checks).
        if axis is not None and grad_compression == "bf16":
            # pvary makes the params per-device so the cotangent stays local
            # (no auto-psum); the allreduce then runs on bf16 payloads
            pv = jax.tree.map(lambda x: jax.lax.pvary(x, (axis,)), params)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(pv)
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g.astype(jnp.bfloat16), axis)
                .astype(jnp.float32), grads)
        else:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        sum_nll, count, correct = aux
        if axis:
            sum_nll = jax.lax.psum(sum_nll, axis)
            count = jax.lax.psum(count, axis)
            correct = jax.lax.psum(correct, axis)
        metrics = {
            "loss": sum_nll / jnp.maximum(count, 1.0),
            "frame_acc": correct / jnp.maximum(count, 1.0),
            "frames": count,
        }
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(local_step, donate_argnums=(0, 1) if donate else ())

    batch_spec = {"labels": P("data"), "mask": P("data")}
    # wave or feats key is resolved at call time via tree_map over the dict
    def step(params, opt_state, batch, key):
        specs = jax.tree.map(lambda _: P("data"), batch)
        mapped = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P(), specs, P()),
            out_specs=(P(), P(), P()),

        )
        return mapped(params, opt_state, batch, key)

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_se_train_step(
    model: NnetAM,
    feat_fn: FeaturePipeline,
    optimizer: optax.GradientTransformation,
    den_graph,
    criterion: str = "mmi",
    mesh: Optional[Mesh] = None,
    log_prior=None,
    acoustic_scale: float = 0.1,
    den_scale: float = 1.0,
    drop_frames: bool = True,
    ce_ratio: float = 0.0,
    pdf_to_phone=None,
    silence=None,
    donate: bool = True,
) -> Callable:
    """Sequence-discriminative train step (reference train_se hot loop,
    SURVEY.md §4.2) with the fixed-denominator on-device formulation.

    batch needs: wave|feats, labels (pdf alignment), mask, num_frames.
    criterion: mmi | smbr | mpfe (mpe). ce_ratio adds f-smoothing CE.
    ``silence`` (ops/fb.SilenceOpts) applies Kaldi's MpeVariants
    silence-phone rules to the sMBR/MPE frame accuracies (ignored for MMI,
    as in Kaldi).
    """
    from pykaldi2_tpu.ops.se_losses import acoustic_scores, mmi_objective
    from pykaldi2_tpu.ops.fb import fsa_expected_accuracy
    from pykaldi2_tpu.ops.fb_block import (BlockSparseGraph,
                                           fsa_expected_accuracy_block)
    from pykaldi2_tpu.ops.fb_dense import DenseStateGraph, fsa_expected_accuracy_dense

    from pykaldi2_tpu.ops.fb_bigram import BigramDenGraph, bigram_expected_accuracy

    crit = {"mpe": "mpfe"}.get(criterion, criterion)
    if crit not in ("mmi", "smbr", "mpfe"):
        raise ValueError(f"unknown criterion {criterion!r}")
    if crit == "mpfe" and pdf_to_phone is None:
        raise ValueError("mpfe needs a pdf_to_phone mapping")
    structured = isinstance(den_graph, BigramDenGraph)
    lp = None if log_prior is None else jnp.asarray(log_prior)

    def local_step(params, opt_state, batch, key):
        axis = "data" if mesh is not None else None
        if axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        mask = batch["mask"].astype(jnp.float32)
        nf = batch["num_frames"]

        def loss_fn(p):
            dither_key, dropout_key = jax.random.split(key)
            feats = feat_fn(batch, dither_key=dither_key)
            logits = model.apply(p, feats, mask, train=True, dropout_key=dropout_key)
            obs = acoustic_scores(logits, lp, acoustic_scale)
            sup = mask * (batch["labels"] >= 0)
            if crit == "mmi":
                obj_rows = mmi_objective(obs, batch["labels"], den_graph, nf, sup,
                                         drop_frames, den_scale)
            else:
                ref = batch["labels"]
                level = "pdf"
                if crit == "mpfe":
                    ref = jnp.asarray(pdf_to_phone)[jnp.maximum(ref, 0)]
                    level = "phone"
                if structured:
                    acc_fn = bigram_expected_accuracy
                elif isinstance(den_graph, DenseStateGraph):
                    acc_fn = fsa_expected_accuracy_dense
                elif isinstance(den_graph, BlockSparseGraph):
                    acc_fn = fsa_expected_accuracy_block
                else:
                    acc_fn = fsa_expected_accuracy
                obj_rows = acc_fn(obs, den_graph, jnp.maximum(ref, 0), nf,
                                  level, silence)
            # zero-length padded rows would contribute num − logZ(dead) ≈ +1e30
            obj = jnp.sum(jnp.where(nf > 0, obj_rows, 0.0))
            count = jnp.sum(sup)
            gcount = jax.lax.psum(count, axis) if axis else count
            loss = -obj / jnp.maximum(gcount, 1.0)
            sum_nll = jnp.array(0.0)
            if ce_ratio > 0.0:
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                ll = jnp.take_along_axis(logp, jnp.maximum(batch["labels"], 0)[..., None],
                                         axis=-1)[..., 0]
                sum_nll = -jnp.sum(ll * sup)
                loss = loss + ce_ratio * sum_nll / jnp.maximum(gcount, 1.0)
            correct = jnp.sum(
                (jnp.argmax(jax.lax.stop_gradient(logits), -1) == batch["labels"]) * sup)
            return loss, (obj, count, correct, sum_nll)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        obj, count, correct, sum_nll = aux
        if axis:
            obj = jax.lax.psum(obj, axis)
            count = jax.lax.psum(count, axis)
            correct = jax.lax.psum(correct, axis)
            sum_nll = jax.lax.psum(sum_nll, axis)
        metrics = {
            "objective": obj / jnp.maximum(count, 1.0),
            "frame_acc": correct / jnp.maximum(count, 1.0),
            "frames": count,
            "ce": sum_nll / jnp.maximum(count, 1.0),
        }
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(local_step, donate_argnums=(0, 1) if donate else ())

    def step(params, opt_state, batch, key):
        specs = jax.tree.map(lambda _: P("data"), batch)
        return jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), specs, P()), out_specs=(P(), P(), P()),
        )(params, opt_state, batch, key)

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_se_lattice_steps(
    model: NnetAM,
    feat_fn: FeaturePipeline,
    optimizer: optax.GradientTransformation,
    log_prior=None,
    acoustic_scale: float = 0.1,
    den_scale: float = 1.0,
    drop_frames: bool = True,
    ce_ratio: float = 0.0,
    criterion: str = "mmi",
    pdf_to_phone=None,
    silence=None,
    mesh: Optional[Mesh] = None,
    obs_transfer_dtype: str = "bfloat16",
):
    """On-the-fly denominator-lattice training (the reference's signature
    mode, SURVEY.md §4.2): returns (forward_fn, train_fn).

    forward_fn(params, batch) → scaled obs [B, T, P] (host decodes lattices
    from it); train_fn(params, opt_state, batch, den_graphs, key) applies the
    lattice update, recomputing the forward under autodiff. den_graphs is a
    BatchedGraphs whose bucketed shapes bound recompilation.

    ``obs_transfer_dtype``: dtype of the returned obs — the device→host copy
    the host decoder consumes. "bfloat16" (default) halves the transfer (an
    on-the-fly-mode cost the reference pays too, SURVEY §4.2 "per-utterance
    device→host copy"); rounding loglikes to bf16 (~2-3 significant digits)
    is far inside the decode beam. The loss-side forward recomputes obs in
    full precision under autodiff, so training math is unaffected.

    criterion: mmi (num alignment − lattice logZ) or smbr/mpfe (expected
    frame accuracy over the decoded lattice, Kaldi
    LatticeForwardBackwardMpeVariants semantics). With a mesh, batch AND
    per-utterance graphs shard over 'data' (every process still decodes its
    own local batch on the host).

    den_graphs may be a BatchedGraphs (generic per-utterance arc tables) or
    a TimeSyncLattice (banded decoded lattices, ops/fb_lattice.py — the
    scalable form: activations are [T, B, max_active] instead of
    [T, B, num_states]).
    """
    from pykaldi2_tpu.ops.fb_batched import (
        batched_expected_accuracy, mmi_objective_lattice)
    from pykaldi2_tpu.ops.fb_lattice import (
        TimeSyncLattice, lattice_expected_accuracy_ts, mmi_objective_lattice_ts)
    from pykaldi2_tpu.ops.se_losses import acoustic_scores

    crit = {"mpe": "mpfe"}.get(criterion, criterion)
    if crit not in ("mmi", "smbr", "mpfe"):
        raise ValueError(f"unknown criterion {criterion!r}")
    if crit == "mpfe" and pdf_to_phone is None:
        raise ValueError("mpfe needs a pdf_to_phone mapping")
    lp = None if log_prior is None else jnp.asarray(log_prior)
    p2p = None if pdf_to_phone is None else jnp.asarray(pdf_to_phone)
    eval_feat_fn = feat_fn.for_eval()

    @jax.jit
    def forward_fn(params, batch):
        feats = eval_feat_fn(batch)
        logits = model.apply(params, feats, batch["mask"])
        obs = acoustic_scores(logits, lp, acoustic_scale)
        return obs.astype(jnp.dtype(obs_transfer_dtype))

    def local_step(params, opt_state, batch, den_graphs, key):
        axis = "data" if mesh is not None else None
        if axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        mask = batch["mask"].astype(jnp.float32)
        nf = batch["num_frames"]

        def loss_fn(p):
            dither_key, dropout_key = jax.random.split(key)
            feats = feat_fn(batch, dither_key=dither_key)
            logits = model.apply(p, feats, mask, train=True, dropout_key=dropout_key)
            obs = acoustic_scores(logits, lp, acoustic_scale)
            sup = mask * (batch["labels"] >= 0)
            banded = isinstance(den_graphs, TimeSyncLattice)
            if crit == "mmi":
                mmi_fn = mmi_objective_lattice_ts if banded else mmi_objective_lattice
                obj_rows = mmi_fn(obs, batch["labels"], den_graphs,
                                  nf, sup, drop_frames, den_scale)
            else:
                ref = batch["labels"]
                level = "pdf"
                if crit == "mpfe":
                    ref = p2p[jnp.maximum(ref, 0)]
                    level = "phone"
                acc_fn = (lattice_expected_accuracy_ts if banded
                          else batched_expected_accuracy)
                obj_rows = acc_fn(obs, den_graphs, jnp.maximum(ref, 0), nf,
                                  level, p2p, silence)
            obj = jnp.sum(jnp.where(nf > 0, obj_rows, 0.0))
            count = jnp.sum(sup)
            gcount = jax.lax.psum(count, axis) if axis else count
            loss = -obj / jnp.maximum(gcount, 1.0)
            if ce_ratio > 0.0:
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                ll = jnp.take_along_axis(logp, jnp.maximum(batch["labels"], 0)[..., None],
                                         axis=-1)[..., 0]
                loss = loss - ce_ratio * jnp.sum(ll * sup) / jnp.maximum(gcount, 1.0)
            correct = jnp.sum(
                (jnp.argmax(jax.lax.stop_gradient(logits), -1) == batch["labels"]) * sup)
            return loss, (obj, count, correct)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        obj, count, correct = aux
        if axis:
            obj = jax.lax.psum(obj, axis)
            count = jax.lax.psum(count, axis)
            correct = jax.lax.psum(correct, axis)
        metrics = {"objective": obj / jnp.maximum(count, 1.0),
                   "frame_acc": correct / jnp.maximum(count, 1.0),
                   "frames": count}
        return params, opt_state, metrics

    if mesh is None:
        return forward_fn, jax.jit(local_step)

    def step(params, opt_state, batch, den_graphs, key):
        bspecs = jax.tree.map(lambda _: P("data"), batch)
        gspecs = jax.tree.map(lambda _: P("data"), den_graphs)
        return jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), bspecs, gspecs, P()),
            out_specs=(P(), P(), P()),
        )(params, opt_state, batch, den_graphs, key)

    return forward_fn, jax.jit(step)


def make_eval_step(model: NnetAM, feat_fn: FeaturePipeline, mesh: Optional[Mesh] = None):
    """step(params, batch) → (sum_nll, frames, correct) — for dev-loss tracking."""
    eval_fn = feat_fn.for_eval()  # deterministic: no dither at eval

    def local_eval(params, batch):
        sum_nll, count, correct = _ce_forward(model, eval_fn, params, batch, None, False)
        if mesh is not None:
            sum_nll = jax.lax.psum(sum_nll, "data")
            count = jax.lax.psum(count, "data")
            correct = jax.lax.psum(correct, "data")
        return sum_nll, count, correct

    if mesh is None:
        return jax.jit(local_eval)

    def step(params, batch):
        specs = jax.tree.map(lambda _: P("data"), batch)
        return jax.shard_map(
            local_eval, mesh=mesh, in_specs=(P(), specs), out_specs=(P(), P(), P()),

        )(params, batch)

    return jax.jit(step)


class Throughput:
    """utt/sec and frames/sec over a sliding window (the reference logs utt/sec)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.time()
        self.utts = 0
        self.frames = 0

    def update(self, utts: int, frames: float):
        self.utts += utts
        self.frames += frames

    def rates(self):
        dt = max(time.time() - self.t0, 1e-9)
        return self.utts / dt, self.frames / dt
