"""Frame splicing (context windows), Kaldi ``splice-feats`` semantics.

Reference behavior: kaldi/src/feat/feature-functions.cc ``SpliceFrames`` —
concatenate frames t-L..t+R with clamped (replicated) edges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def splice_frames(feats: jax.Array, left: int, right: int) -> jax.Array:
    """[..., T, D] → [..., T, D*(left+1+right)]."""
    if left == 0 and right == 0:
        return feats
    t = feats.shape[-2]
    first = jnp.repeat(feats[..., :1, :], left, axis=-2) if left else feats[..., :0, :]
    last = jnp.repeat(feats[..., -1:, :], right, axis=-2) if right else feats[..., :0, :]
    padded = jnp.concatenate([first, feats, last], axis=-2)
    cols = [
        jax.lax.dynamic_slice_in_dim(padded, off, t, axis=-2)
        for off in range(left + 1 + right)
    ]
    return jnp.concatenate(cols, axis=-1)
