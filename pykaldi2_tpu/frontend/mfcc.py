"""MFCC features with Kaldi semantics.

Reference behavior: kaldi/src/feat/feature-mfcc.{h,cc} — orthonormal DCT-II
over log-mel energies, cepstral liftering (coeff 1 + 0.5*Q*sin(pi*i/Q)),
optional log-energy in c0 (SURVEY.md §3.2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.config import MfccOpts
from pykaldi2_tpu.frontend import window as W
from pykaldi2_tpu.frontend.fbank import power_spectrum
from pykaldi2_tpu.frontend.mel import mel_banks


@functools.lru_cache(maxsize=8)
def dct_matrix(num_ceps: int, num_bins: int) -> np.ndarray:
    """Orthonormal DCT-II matrix rows 0..num_ceps-1 (Kaldi ComputeDctMatrix)."""
    m = np.zeros((num_ceps, num_bins), dtype=np.float64)
    m[0, :] = np.sqrt(1.0 / num_bins)
    n = np.arange(num_bins, dtype=np.float64)
    for k in range(1, num_ceps):
        m[k, :] = np.sqrt(2.0 / num_bins) * np.cos(np.pi / num_bins * (n + 0.5) * k)
    return m.astype(np.float32)


@functools.lru_cache(maxsize=8)
def lifter_coeffs(num_ceps: int, q: float) -> np.ndarray:
    """Kaldi ComputeLifterCoeffs: c[i] = 1 + 0.5*Q*sin(pi*i/Q)."""
    i = np.arange(num_ceps, dtype=np.float64)
    return (1.0 + 0.5 * q * np.sin(np.pi * i / q)).astype(np.float32)


def compute_mfcc(
    wave: jax.Array,
    opts: MfccOpts,
    *,
    dither_key: jax.Array | None = None,
    use_matmul_dft: bool = True,
    mel_weights: jax.Array | None = None,
    warp_select: jax.Array | None = None,
) -> jax.Array:
    """[..., n_samples] fp32 waveform → [..., n_frames, num_ceps] MFCCs.

    mel_weights/warp_select: per-utterance VTLN, see compute_fbank.
    """
    fopts = opts.frame_opts
    frames = W.extract_frames(wave, fopts)
    need_energy = opts.use_energy and opts.raw_energy
    out = W.process_frames(frames, fopts, dither_key=dither_key, return_log_energy=need_energy)
    if need_energy:
        proc, log_energy = out
    else:
        proc = out
        if opts.use_energy:
            log_energy = jnp.log(jnp.maximum(jnp.sum(proc * proc, axis=-1), W.FLT_EPSILON))
    padded = W.padded_frames(proc, fopts)
    spec = power_spectrum(padded, fopts.padded_window_size, use_matmul_dft)
    if mel_weights is not None and warp_select is not None:
        per_row = jnp.take(jnp.asarray(mel_weights), warp_select, axis=0)
        mel_e = jnp.einsum("btf,bmf->btm", spec, per_row,
                           precision=jax.lax.Precision.HIGHEST)
    else:
        mel_w = jnp.asarray(mel_banks(opts.mel_opts, fopts))
        mel_e = jnp.dot(spec, mel_w.T, precision=jax.lax.Precision.HIGHEST)
    log_mel = jnp.log(jnp.maximum(mel_e, W.FLT_EPSILON))
    dct = jnp.asarray(dct_matrix(opts.num_ceps, opts.mel_opts.num_bins))
    ceps = jnp.dot(log_mel, dct.T, precision=jax.lax.Precision.HIGHEST)
    if opts.cepstral_lifter != 0.0:
        ceps = ceps * jnp.asarray(lifter_coeffs(opts.num_ceps, opts.cepstral_lifter))
    if opts.use_energy:
        if opts.energy_floor > 0.0:
            log_energy = jnp.maximum(log_energy, np.log(opts.energy_floor))
        ceps = ceps.at[..., 0].set(log_energy)
    return ceps
