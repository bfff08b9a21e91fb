"""Log-mel filterbank features with Kaldi semantics, batched JAX.

Reference behavior: kaldi/src/feat/feature-fbank.{h,cc} (SURVEY.md §3.2).

TPU-first design: the waveform batch is framed with a static gather, processed
elementwise on the VPU, and the spectrum + mel stages are GEMMs (real-DFT as a
matmul against host-built cos/sin matrices — the GEMM-native NDFT pattern,
PAPERS.md "MelT") so the whole front end lands on the MXU. ``jnp.fft.rfft``
is also supported (``use_matmul_dft=False``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.config import FbankOpts
from pykaldi2_tpu.frontend import window as W
from pykaldi2_tpu.frontend.mel import mel_banks

# Kaldi floors mel energies at std::numeric_limits<float>::epsilon() before log.
_LOG_FLOOR = W.FLT_EPSILON


@functools.lru_cache(maxsize=8)
def _dft_matrices(n: int):
    """Real-DFT cos/sin matrices [n, n//2] (Nyquist excluded — mel ignores it)."""
    k = np.arange(n // 2, dtype=np.float64)[None, :]
    t = np.arange(n, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * t * k / n
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def power_spectrum(frames: jax.Array, n_fft: int, use_matmul_dft: bool) -> jax.Array:
    """[..., n_fft] padded frames → [..., n_fft//2] power spectrum (no Nyquist)."""
    if use_matmul_dft:
        # HIGHEST precision: the front end is fp32-exact by contract; without
        # this the TPU MXU would run these GEMMs in bf16 (SURVEY.md §8).
        cos_m, sin_m = _dft_matrices(n_fft)
        re = jnp.dot(frames, jnp.asarray(cos_m), precision=jax.lax.Precision.HIGHEST)
        im = jnp.dot(frames, jnp.asarray(sin_m), precision=jax.lax.Precision.HIGHEST)
        return re * re + im * im
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)[..., : n_fft // 2]
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def fbank_dim(opts: FbankOpts) -> int:
    return opts.mel_opts.num_bins + (1 if opts.use_energy else 0)


def compute_fbank(
    wave: jax.Array,
    opts: FbankOpts,
    *,
    dither_key: jax.Array | None = None,
    use_matmul_dft: bool = True,
    mel_weights: jax.Array | None = None,
    warp_select: jax.Array | None = None,
) -> jax.Array:
    """[..., n_samples] fp32 waveform → [..., n_frames, dim] fbank features.

    Matches Kaldi's FbankComputer pipeline: frame → dither → DC removal →
    (raw energy) → pre-emphasis → window → pad-to-pow2 → power spectrum →
    mel GEMM → log with epsilon floor; energy prepended if use_energy.

    Per-utterance VTLN (kaldi featbin --vtln-map semantics): pass
    ``mel_weights`` [W, num_bins, n_fft_bins] (one mel matrix per quantized
    warp factor) and ``warp_select`` [B] int32 row indices; the mel
    projection then runs as a per-row batched GEMM (still MXU-shaped).
    """
    fopts = opts.frame_opts
    frames = W.extract_frames(wave, fopts)
    need_energy = opts.use_energy and opts.raw_energy
    out = W.process_frames(
        frames, fopts, dither_key=dither_key, return_log_energy=need_energy
    )
    if need_energy:
        proc, log_energy = out
    else:
        proc = out
        if opts.use_energy:  # non-raw: energy after windowing
            log_energy = jnp.log(jnp.maximum(jnp.sum(proc * proc, axis=-1), W.FLT_EPSILON))
    padded = W.padded_frames(proc, fopts)
    spec = power_spectrum(padded, fopts.padded_window_size, use_matmul_dft)
    if not opts.use_power:
        spec = jnp.sqrt(spec)
    if mel_weights is not None and warp_select is not None:
        per_row = jnp.take(jnp.asarray(mel_weights), warp_select, axis=0)  # [B, M, F]
        mel_e = jnp.einsum("btf,bmf->btm", spec, per_row,
                           precision=jax.lax.Precision.HIGHEST)
    else:
        mel_w = jnp.asarray(mel_banks(opts.mel_opts, fopts))
        mel_e = jnp.dot(spec, mel_w.T, precision=jax.lax.Precision.HIGHEST)
    feats = jnp.log(jnp.maximum(mel_e, _LOG_FLOOR)) if opts.use_log_fbank else mel_e
    if opts.use_energy:
        if opts.energy_floor > 0.0:
            log_energy = jnp.maximum(log_energy, np.log(opts.energy_floor))
        feats = jnp.concatenate([log_energy[..., None], feats], axis=-1)
    return feats
