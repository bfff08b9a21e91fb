"""2-D (data × model) parallel CE train step: DP batch + TP output layer.

The reference is DP-only (SURVEY.md §3.3); senone output layers are the one
genuinely wide tensor here (hidden × ~9k pdf-ids), so the TPU-native design
optionally shards ``out_w``/``out_b`` over a 'model' mesh axis: each device
computes logits for its vocab shard, log-softmax normalization uses psum over
'model', and the label log-prob is contributed by the owning shard. Gradients
for replicated (backbone) params psum over both axes; output-shard grads psum
over 'data' only.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pykaldi2_tpu.models.nnet_am import NnetAM
from pykaldi2_tpu.pipeline import FeaturePipeline


def param_specs(params) -> dict:
    """PartitionSpecs: output head sharded over 'model' on its wide dim."""
    return {
        "nnet": jax.tree.map(lambda _: P(), params["nnet"]),
        "out_w": P(None, "model"),
        "out_b": P("model"),
    }


def shard_params(params, mesh: Mesh):
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def tp_ce_terms(logits_local, labels, mask, vocab_offset, axis="model"):
    """Masked CE over a vocab-sharded logit tensor.

    logits_local: [B, T, C_local] this shard's slice of the vocab.
    Returns (sum_nll, count, correct) — identical on every model shard.
    """
    logits_local = logits_local.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    # max is a stability shift only — no gradient needed (pmax has no VJP rule)
    gmax = jax.lax.stop_gradient(
        jax.lax.pmax(jax.lax.stop_gradient(jnp.max(logits_local, axis=-1)), axis)
    )
    sumexp = jnp.sum(jnp.exp(logits_local - gmax[..., None]), axis=-1)
    logz = jnp.log(jax.lax.psum(sumexp, axis)) + gmax
    c_local = logits_local.shape[-1]
    local_label = labels - vocab_offset
    owned = (local_label >= 0) & (local_label < c_local)
    safe = jnp.clip(local_label, 0, c_local - 1)
    picked = jnp.take_along_axis(logits_local, safe[..., None], axis=-1)[..., 0]
    label_logit = jax.lax.psum(jnp.where(owned, picked, 0.0), axis)
    ll = label_logit - logz
    sum_nll = -jnp.sum(ll * m)
    count = jnp.sum(m)
    # global argmax for frame accuracy (metrics only — no gradient)
    ll_sg = jax.lax.stop_gradient(logits_local)
    amax_local = jnp.argmax(ll_sg, axis=-1) + vocab_offset
    vmax_local = jnp.max(ll_sg, axis=-1)
    vmax = jax.lax.pmax(vmax_local, axis)
    is_max = vmax_local >= vmax
    pred = jax.lax.pmin(jnp.where(is_max, amax_local, jnp.iinfo(jnp.int32).max), axis)
    correct = jnp.sum((pred == labels) * m)
    return sum_nll, count, correct


def make_ce_train_step_2d(
    model: NnetAM,
    feat_fn: FeaturePipeline,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    donate: bool = True,
    grad_clip: float = 0.0,
) -> Callable:
    """DP×TP CE train step over a mesh with ('data', 'model') axes.

    NOTE: pass an optimizer WITHOUT clip_by_global_norm and give the clip
    threshold here instead — a shard-local clip inside shard_map would compute
    the wrong global norm for the vocab-sharded output layer (the clip below
    psums the sharded leaves' square-sums over 'model').
    """
    if set(mesh.axis_names) != {"data", "model"}:
        raise ValueError("mesh must have axes ('data', 'model')")

    def local_step(params, opt_state, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        c_local = params["out_w"].shape[1]
        vocab_offset = jax.lax.axis_index("model") * c_local

        def loss_fn(p):
            dither_key, dropout_key = jax.random.split(key)
            feats = feat_fn(batch, dither_key=dither_key)
            mask = batch["mask"].astype(jnp.float32)
            h = model.nnet.apply(p["nnet"], feats, mask, train=True, dropout_key=dropout_key)
            cd = model.compute_dtype
            logits_local = jnp.dot(h.astype(cd), p["out_w"].astype(cd),
                                   preferred_element_type=jnp.float32) + p["out_b"]
            sum_nll, count, correct = tp_ce_terms(logits_local, batch["labels"], mask, vocab_offset)
            gcount = jax.lax.psum(count, "data")
            return sum_nll / jnp.maximum(gcount, 1.0), (sum_nll, count, correct)

        # No manual grad psums: replication tracking reduces cotangents of
        # replicated params over both axes and of 'model'-sharded out_w/out_b
        # over 'data' automatically (see trainer.py note).
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if grad_clip > 0.0:
            sq_rep = sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads["nnet"]))
            sq_shard = jnp.sum(jnp.square(grads["out_w"])) + jnp.sum(jnp.square(grads["out_b"]))
            gnorm = jnp.sqrt(sq_rep + jax.lax.psum(sq_shard, "model"))
            scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        sum_nll, count, correct = aux
        sum_nll = jax.lax.psum(sum_nll, "data")
        count = jax.lax.psum(count, "data")
        correct = jax.lax.psum(correct, "data")
        metrics = {"loss": sum_nll / jnp.maximum(count, 1.0),
                   "frame_acc": correct / jnp.maximum(count, 1.0),
                   "frames": count}
        return params, opt_state, metrics

    def step(params, opt_state, batch, key):
        pspecs = param_specs(params)
        ospecs = _opt_specs(opt_state, params)
        bspecs = jax.tree.map(lambda _: P("data"), batch)
        return jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(pspecs, ospecs, bspecs, P()),
            out_specs=(pspecs, ospecs, P()),

        )(params, opt_state, batch, key)

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def _opt_specs(opt_state, params):
    """Optimizer-state leaves whose shape equals a sharded param's shape get
    that param's spec (optax moments mirror param shapes); everything else is
    replicated."""
    w_shape = tuple(jnp.shape(params["out_w"]))
    b_shape = tuple(jnp.shape(params["out_b"]))

    def spec_for(leaf):
        s = tuple(jnp.shape(leaf))
        if s == w_shape:
            return P(None, "model")
        if s == b_shape and len(s) == 1:
            return P("model")
        return P()

    return jax.tree.map(spec_for, opt_state)
