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


class DeviceSimulator:
    """Host half of the on-device simulation path: samples per-row RIR and
    noise tensors (reusing the host Simulator's RIR library / synthesis and
    noise cutting) that the jitted step then applies via ``simulate_batch``
    inside FeaturePipeline. Bernoulli gates, SNR, and gain draw on device
    from the step's PRNG key, so only the bulky tensors cross the host
    boundary.

    ``batch_extras(utt_ids, n_samples)`` plugs into the loaders' extras hook
    alongside FeaturePipeline.batch_extras.
    """

    def __init__(self, cfg, samp_freq: float = 16000.0, rir_len: int = 8000,
                 frame_shift: int = 160):
        from pykaldi2_tpu.simulation.simulator import Simulator

        self.cfg = cfg
        self.rir_len = rir_len
        self._host = Simulator(cfg, samp_freq=samp_freq, frame_shift=frame_shift)

    def _row_rng(self, utt_id: str):
        """Deterministic per-utterance RNG (matches the host loaders'
        crc-keyed convention): same utterance → same RIR/noise tensors on
        every rank and across resumes; step-level variety comes from the
        device-side gates/SNR/gain draws."""
        import zlib

        import numpy as np

        h = zlib.crc32(f"{self.cfg.seed}|sim|{utt_id}".encode()) & 0x7FFFFFFF
        return np.random.RandomState(h or 1)

    def batch_extras(self, utt_ids, n_samples=None) -> dict:
        import numpy as np

        out = {}
        b = len(utt_ids)
        if self.cfg.reverb.use_reverb:
            rirs = np.zeros((b, self.rir_len), np.float32)
            for i, uid in enumerate(utt_ids):
                r = self._host._rir(self._row_rng(uid))
                n = min(r.shape[0], self.rir_len)
                rirs[i, :n] = r[:n]
            out["sim_rir"] = rirs
        if self.cfg.noise.use_noise:
            if n_samples is None:
                raise ValueError("on-device noise mixing needs the batch "
                                 "sample length (wave-mode corpora only)")
            noises = np.zeros((b, n_samples), np.float32)
            for i, uid in enumerate(utt_ids):
                nz = self._host._noise(self._row_rng(uid), n_samples)
                if nz.shape[0] < n_samples:
                    nz = np.tile(nz, int(np.ceil(n_samples / nz.shape[0])))
                noises[i] = nz[:n_samples]
            out["sim_noise"] = noises
        return out


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
