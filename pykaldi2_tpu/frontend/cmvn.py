"""Cepstral mean/variance normalization, Kaldi semantics.

Reference behavior: kaldi/src/transform/cmvn.{h,cc} and
featbin/{compute-cmvn-stats,apply-cmvn}.cc (SURVEY.md §3.2 "Kaldi CMVN").

Stats layout follows Kaldi: a [2, dim+1] matrix — row 0 = per-dim sums with
count in the last column; row 1 = per-dim sum-of-squares (last col unused).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def acc_cmvn_stats(feats: np.ndarray, stats: np.ndarray | None = None, mask=None) -> np.ndarray:
    """Accumulate Kaldi-layout CMVN stats from [T, D] features (host-side)."""
    feats = np.asarray(feats, dtype=np.float64)
    t, d = feats.shape
    if stats is None:
        stats = np.zeros((2, d + 1), dtype=np.float64)
    if mask is not None:
        mask = np.asarray(mask, dtype=np.float64)[:, None]
        feats = feats * mask
        count = float(mask.sum())
    else:
        count = float(t)
    stats = stats.astype(np.float64).copy()
    stats[0, :d] += feats.sum(axis=0)
    stats[0, d] += count
    stats[1, :d] += (feats * feats).sum(axis=0)
    return stats


def cmvn_mean_std(stats: np.ndarray, norm_vars: bool, var_floor: float = 1e-20):
    """stats [2, D+1] → (mean [D], scale [D]) with Kaldi's variance flooring."""
    stats = np.asarray(stats, dtype=np.float64)
    d = stats.shape[1] - 1
    count = stats[0, d]
    if count < 1.0:
        raise ValueError("CMVN stats have zero count")
    mean = stats[0, :d] / count
    if norm_vars:
        var = stats[1, :d] / count - mean * mean
        var = np.maximum(var, var_floor)
        scale = 1.0 / np.sqrt(var)
    else:
        scale = np.ones(d)
    return mean.astype(np.float32), scale.astype(np.float32)


def apply_cmvn(feats: jax.Array, mean: jax.Array, scale: jax.Array, norm_means: bool = True) -> jax.Array:
    """[..., T, D] → normalized; mean/scale broadcast over leading dims."""
    if norm_means:
        feats = feats - mean
    return feats * scale


def utterance_cmvn(
    feats: jax.Array, norm_vars: bool = False, mask: jax.Array | None = None, var_floor: float = 1e-20
) -> jax.Array:
    """Per-utterance CMVN under jit; ``mask`` [.., T] excludes padding frames."""
    # Centered two-pass variance: E[(x-m)^2], not E[x^2]-E[x]^2 — the latter
    # catastrophically cancels in fp32 for near-constant dims.
    if mask is None:
        mean = jnp.mean(feats, axis=-2, keepdims=True)
        out = feats - mean
        if norm_vars:
            var = jnp.mean(out * out, axis=-2, keepdims=True)
    else:
        m = mask[..., None].astype(feats.dtype)
        count = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
        mean = jnp.sum(feats * m, axis=-2, keepdims=True) / count
        out = feats - mean
        if norm_vars:
            var = jnp.sum(out * out * m, axis=-2, keepdims=True) / count
    if norm_vars:
        out = out * jax.lax.rsqrt(jnp.maximum(var, var_floor))
    return out


class SpeakerCmvn:
    """Per-speaker CMVN (Kaldi ``apply-cmvn --utt2spk=ark:utt2spk
    scp:cmvn.scp`` semantics, SURVEY.md §3.1 Dataset row): an utt2spk table
    plus per-speaker [2, D+1] stats resolve each utterance to its speaker's
    (mean, scale)."""

    def __init__(self, utt2spk_path: str, spk_stats_scp: str,
                 norm_means: bool = True, norm_vars: bool = False):
        from pykaldi2_tpu.data import kaldi_io

        self.norm_means = norm_means
        self.utt2spk = {}
        with open(utt2spk_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    self.utt2spk[parts[0]] = parts[1]
        self.spk_ms = {}
        for spk, rx in kaldi_io.read_scp(spk_stats_scp):
            stats = kaldi_io.read_scp_entry(rx, "mat")
            self.spk_ms[spk] = cmvn_mean_std(stats, norm_vars)
        self.dim = next(iter(self.spk_ms.values()))[0].shape[0] if self.spk_ms else 0

    def lookup(self, utt_id: str):
        """(mean [D], scale [D]) for an utterance; KeyError like Kaldi if the
        utterance or its speaker has no stats."""
        spk = self.utt2spk.get(utt_id)
        if spk is None:
            raise KeyError(f"utterance {utt_id!r} missing from utt2spk")
        ms = self.spk_ms.get(spk)
        if ms is None:
            raise KeyError(f"speaker {spk!r} has no CMVN stats")
        return ms

    def batch(self, utt_ids):
        """Stacked (mean [B, D], scale [B, D]) numpy arrays for a batch."""
        ms = [self.lookup(u) for u in utt_ids]
        return (np.stack([m for m, _ in ms]).astype(np.float32),
                np.stack([s for _, s in ms]).astype(np.float32))


def apply_cmvn_sliding(
    feats: jax.Array, window: int = 600, norm_vars: bool = False, var_floor: float = 1e-10
) -> jax.Array:
    """Sliding-window CMVN (kaldi apply-cmvn-sliding, center=true semantics).

    Implemented with cumulative sums — O(T) and jit-friendly.
    """
    t = feats.shape[-2]
    cs = jnp.cumsum(feats, axis=-2)
    cs2 = jnp.cumsum(feats * feats, axis=-2)
    zeros = jnp.zeros_like(cs[..., :1, :])
    cs = jnp.concatenate([zeros, cs], axis=-2)
    cs2 = jnp.concatenate([zeros, cs2], axis=-2)
    idx = jnp.arange(t)
    lo = jnp.clip(idx - window // 2, 0, t)
    hi = jnp.clip(idx + (window + 1) // 2, 0, t)
    # widen truncated edge windows to `window` frames where possible, as Kaldi does
    lo = jnp.where(hi - lo < window, jnp.clip(hi - window, 0, t), lo)
    hi = jnp.where(hi - lo < window, jnp.clip(lo + window, 0, t), hi)
    count = (hi - lo).astype(feats.dtype)[..., None]
    s = cs[..., hi, :] - cs[..., lo, :]
    s2 = cs2[..., hi, :] - cs2[..., lo, :]
    mean = s / count
    out = feats - mean
    if norm_vars:
        var = s2 / count - mean * mean
        out = out * jax.lax.rsqrt(jnp.maximum(var, var_floor))
    return out
