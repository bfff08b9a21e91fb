"""Batched on-device simulation: reverb + noise + gain inside the train step.

BASELINE.json north star: "on-the-fly data simulation ... become fused Pallas
kernels producing HBM-resident batches". These are the batched JAX ops (the
FFT convolution and mixing are XLA-fused elementwise/FFT work on device);
RIR/noise *sampling* stays host-side (tiny), shipped as batch tensors.

Speed perturbation changes sequence length, so it remains host-side
(simulation/resample.py) where shapes are still dynamic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_fft_convolve(waves: jax.Array, rirs: jax.Array) -> jax.Array:
    """[B, N] ⊛ [B, L] → [B, N] (truncated to keep label alignment)."""
    n = waves.shape[-1]
    nfft = 1 << (n + rirs.shape[-1] - 2).bit_length()
    out = jnp.fft.irfft(jnp.fft.rfft(waves, nfft) * jnp.fft.rfft(rirs, nfft), nfft)
    return out[..., :n].astype(jnp.float32)


def batch_mix_noise_at_snr(
    waves: jax.Array,      # [B, N]
    noises: jax.Array,     # [B, N]
    snr_db: jax.Array,     # [B]
    mask: jax.Array | None = None,  # [B, N] 1.0 on real samples
) -> jax.Array:
    m = jnp.ones_like(waves) if mask is None else mask
    count = jnp.maximum(jnp.sum(m, -1, keepdims=True), 1.0)
    ps = jnp.sum(waves * waves * m, -1, keepdims=True) / count + 1e-10
    pn = jnp.sum(noises * noises * m, -1, keepdims=True) / count + 1e-10
    scale = jnp.sqrt(ps / (pn * 10.0 ** (snr_db[:, None] / 10.0)))
    return (waves + scale * noises * m).astype(jnp.float32)


def batch_gain_db(waves: jax.Array, gain_db: jax.Array) -> jax.Array:
    return (waves * 10.0 ** (gain_db[:, None] / 20.0)).astype(jnp.float32)


def simulate_batch(
    waves: jax.Array,
    key: jax.Array,
    rirs: jax.Array | None = None,       # [B, L] sampled host-side
    noises: jax.Array | None = None,     # [B, N]
    snr_range=(0.0, 20.0),
    gain_range=None,
    reverb_prob: float = 1.0,
    noise_prob: float = 1.0,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """Apply reverb/noise/gain to a waveform batch under jit.

    Per-row Bernoulli gates choose which distortions apply; randomness is
    fully device-side given the PRNG key (run-to-run reproducible).
    """
    b = waves.shape[0]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    out = waves
    if rirs is not None:
        rev = batch_fft_convolve(out, rirs)
        gate = jax.random.bernoulli(k1, reverb_prob, (b, 1)).astype(jnp.float32)
        out = gate * rev + (1.0 - gate) * out
    if noises is not None:
        snr = jax.random.uniform(k2, (b,), minval=snr_range[0], maxval=snr_range[1])
        noisy = batch_mix_noise_at_snr(out, noises, snr, sample_mask)
        gate = jax.random.bernoulli(k3, noise_prob, (b, 1)).astype(jnp.float32)
        out = gate * noisy + (1.0 - gate) * out
    if gain_range is not None:
        gain = jax.random.uniform(k4, (b,), minval=gain_range[0], maxval=gain_range[1])
        out = batch_gain_db(out, gain)
    return out
