"""Delta features, Kaldi semantics.

Reference behavior: kaldi/src/feat/feature-functions.cc ``DeltaFeatures`` —
regression coefficients built recursively per order; edge frames use
replicated (clamped) context.

TPU-first: the whole delta stack is one depthwise 1-D convolution with a
host-built kernel, so it fuses into the input pipeline under jit.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def delta_matrix(order: int = 2, window: int = 2) -> np.ndarray:
    """Per-order filter taps; returns [order+1, max_len] (centered, zero-padded).

    Matches Kaldi's DeltaFeaturesOptions(order, window) coefficient recursion:
    scale for each order o is window-normalized: taps_o = taps_{o-1} * d where
    d = [-w..w]/sum(i^2).
    """
    scales = [np.array([1.0])]
    for _ in range(order):
        prev = scales[-1]
        w = window
        norm = sum(i * i for i in range(-w, w + 1))
        cur = np.zeros(prev.size + 2 * w)
        for off in range(-w, w + 1):
            cur[off + w : off + w + prev.size] += (off / norm) * prev
        scales.append(cur)
    max_len = scales[-1].size
    out = np.zeros((order + 1, max_len), dtype=np.float32)
    for o, s in enumerate(scales):
        pad = (max_len - s.size) // 2
        out[o, pad : pad + s.size] = s
    return out


def add_deltas(feats: jax.Array, order: int = 2, window: int = 2) -> jax.Array:
    """[..., T, D] → [..., T, D*(order+1)] with edge replication like Kaldi."""
    taps = delta_matrix(order, window)  # [order+1, K]
    k = taps.shape[1]
    half = k // 2
    # replicate edges (Kaldi clamps the frame index at the boundaries)
    first = jnp.repeat(feats[..., :1, :], half, axis=-2)
    last = jnp.repeat(feats[..., -1:, :], half, axis=-2)
    padded = jnp.concatenate([first, feats, last], axis=-2)
    t = feats.shape[-2]
    outs = []
    taps_j = jnp.asarray(taps)
    for o in range(order + 1):
        # correlation: out[t] = sum_j taps[o, j] * padded[t + j]
        acc = jnp.zeros_like(feats)
        for j in range(k):
            w = taps[o, j]
            if w == 0.0:
                continue
            acc = acc + taps_j[o, j] * jax.lax.dynamic_slice_in_dim(padded, j, t, axis=-2)
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)
