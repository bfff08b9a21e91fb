"""Frame-level cross-entropy with padding masks.

Reference behavior: ``nn.CrossEntropyLoss`` over [B*T, C] with padded frames
excluded (SURVEY.md §3.1 "CE trainer"); here padding contributes exactly zero
loss and gradient (tested), replacing ignore_index with masks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def ce_loss(
    logits: jax.Array,   # [B, T, C] fp32
    labels: jax.Array,   # [B, T] int32, -1 on padding
    mask: jax.Array,     # [B, T] float32
) -> Tuple[jax.Array, jax.Array]:
    """Returns (mean CE over supervised frames, supervised frame count)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.maximum(labels, 0)
    ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(m), 1.0)
    return -jnp.sum(ll * m) / count, count


def frame_accuracy(logits: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32) * mask
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1.0)
